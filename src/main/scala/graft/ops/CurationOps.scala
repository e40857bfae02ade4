package graft.ops

import org.apache.spark.sql.functions._

/** End-to-end curation composition (the flagship training-data shape): one
  * declarative plan spanning the text, dedup and similarity surfaces —
  * language filter + quality threshold + exact-dedup keep-set + embedding
  * join — per-source acceptance stats. The point is compositionality: each
  * stage is the same Column algebra the standalone operators use, so
  * Catalyst fuses the whole pipeline (scan → score → dedup-join → filter →
  * embedding join → aggregate) into a handful of codegen'd stages with
  * pushdown intact. At 100 TB this runs as: one documents pass (scoring is
  * map-only), a fingerprint shuffle for the keep-set, and a doc_id-keyed
  * join to embeddings — no quadratic or collect steps anywhere.
  */
object CurationOps {

  import Tables._

  private val sqlToks = "string_split_regex(trim(text), '\\s+')"

  val queries: Seq[Q] = Seq(
    Q(
      "q70_curation",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        // quality rides as integral 1e-4 units so the acceptance threshold
        // is an integer compare and the per-source average is an integer
        // sum — order-independent, so bit-stable across engines
        val scored = documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            col("lang"),
            TextOps.qualityScore10k(toks).cast("long").as("q10k"),
            md5(lower(trim(col("text")))).as("fp")
          )
        // canonical doc per exact-dup group (keep the lowest doc_id)
        val keep = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
        val kept = scored
          .join(keep, Seq("fp"))
          .filter(col("doc_id") === col("keep_id"))
        // norms also ride as integral 1e-4 units — averaging raw doubles is
        // summation-order-dependent and can straddle a rounding boundary
        // between engines (the exact drift class the q10k units avoid)
        val e = embeddings(s, d)
          .select(
            col("vec_id"),
            floor(
              graft.functions.VectorFunctions.norm(col("embedding").cast("array<double>")) * 10000
            ).cast("long").as("n10k")
          )
        kept
          .filter(col("lang") === "en" && col("q10k") >= 5000L)
          .join(e, col("doc_id") === col("vec_id"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            (floor(sum(col("q10k")).cast("double") / count(lit(1))) / 10000.0).as("avg_quality"),
            (floor(sum(col("n10k")).cast("double") / count(lit(1))) / 10000.0).as("avg_norm")
          )
          .orderBy(col("source"))
      },
      Some(s"""WITH s AS (SELECT doc_id, source, lang,
              |    CAST(${TextOps.sqlQuality10k(sqlToks)} AS BIGINT) AS q10k,
              |    md5(lower(trim(text))) AS fp
              |  FROM documents),
              |k AS (SELECT fp, min(doc_id) AS keep_id FROM s GROUP BY fp),
              |kept AS (SELECT s.* FROM s JOIN k ON s.fp = k.fp AND s.doc_id = k.keep_id),
              |e AS (SELECT vec_id,
              |        CAST(floor(sqrt(list_dot_product(v, v)) * 10000) AS BIGINT) AS n10k
              |      FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |            FROM embeddings) z)
              |SELECT source, count(*) AS docs,
              |  floor(CAST(sum(q10k) AS DOUBLE) / count(*)) / 10000.0 AS avg_quality,
              |  floor(CAST(sum(n10k) AS DOUBLE) / count(*)) / 10000.0 AS avg_norm
              |FROM kept JOIN e ON doc_id = vec_id
              |WHERE lang = 'en' AND q10k >= 5000
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    )
  )
}
