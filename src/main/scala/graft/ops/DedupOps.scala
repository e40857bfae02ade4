package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.9 E13): exact (content-hash
  * groupBy), MinHash+LSH near-dup (shingle → minhash → band → bucket join →
  * verify), SimHash signatures, and the end-to-end "kept documents" pass.
  *
  * Scale design: the LSH path never computes O(n²) pairs — candidates come
  * from an equi-join on (band, band-signature), which Spark executes as a
  * shuffle hash join keyed by the bucket. At 100 TB the bucket join is the
  * only wide edge and its key space grows with corpus size, so it stays
  * balanced; the final verify join touches only candidate pairs.
  *
  * All hashes are md5-derived so the DuckDB oracle can reproduce them
  * bit-for-bit (minhash compares 16-hex-char prefixes lexicographically —
  * order-isomorphic to comparing the numeric hash).
  */
object DedupOps {

  import Tables._

  val NumHashes = 8 // 4 bands × 2 rows (LSH banding)
  val NumBands = 4

  /** Whitespace tokens (shared with TextOps). */
  private def toks: Column = split(trim(col("text")), "\\s+")

  /** Distinct word-3gram shingles of the document text. */
  def shingles(tokens: Column): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(tokens) - lit(3)),
        i =>
          concat_ws(
            " ",
            element_at(tokens, i + 1),
            element_at(tokens, i + 2),
            element_at(tokens, i + 3)
          )
      )
    )

  /** k-th minhash of a shingle set: lexicographic min of the first 16 hex
    * chars of md5("<k>:" + shingle).
    */
  def minhash(sh: Column, k: Int): Column =
    array_min(transform(sh, x => substring(md5(concat(lit(s"$k:"), x)), 1, 16)))

  /** DuckDB SQL fragments mirroring the Spark expressions above. */
  private val sqlTok = "string_split_regex(trim(text), '\\s+')"
  private val sqlShingles =
    "list_distinct(list_transform(range(1, len(tok)-1), i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))"
  private def sqlMinhash(k: Int) =
    s"list_min(list_transform(s, x -> substr(md5('$k:' || x), 1, 16)))"

  /** Exact word-3gram Jaccard between two distinct shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)), 4)

  /** Spark side of the MinHash-LSH candidate-pair pipeline: returns
    * (doc_a, doc_b, jaccard) for verified near-dup pairs.
    */
  def lshPairs(s: SparkSession, d: String, threshold: Double): DataFrame = {
    val sh = documents(s, d)
      .select(col("doc_id"), shingles(toks).as("s"))
    val sigs = sh.select(
      col("doc_id"),
      col("s"),
      array((0 until NumHashes).map(k => minhash(col("s"), k)): _*).as("sig")
    )
    val bands = sigs.select(
      col("doc_id"),
      explode(
        array((0 until NumBands).map { b =>
          struct(
            lit(b).as("band"),
            concat(element_at(col("sig"), 2 * b + 1), element_at(col("sig"), 2 * b + 2)).as("bsig")
          )
        }: _*)
      ).as("bk")
    ).select(col("doc_id"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band", "bsig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Shared oracle CTE prefix: tokens → shingles → signatures → bands →
    * verified pairs at the given threshold.
    */
  private def sqlPairsCte(threshold: Double): String = {
    val sigList = (0 until NumHashes).map(sqlMinhash).mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
       |sh AS (SELECT doc_id, $sqlShingles AS s FROM t),
       |mh AS (SELECT doc_id, s, $sigList AS sig FROM sh),
       |bands AS (SELECT doc_id, b AS band, sig[2*b + 1] || sig[2*b + 2] AS bsig
       |          FROM mh CROSS JOIN (SELECT unnest(range($NumBands)) AS b) r),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |pairs AS (SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
       |          / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
       |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b) v
       |  WHERE jaccard >= $threshold)""".stripMargin
  }

  /** 16-bit SimHash: bit p is the sign of the sum over tokens of ±1 by the
    * parity of hex digit p of md5(token). Duplicate tokens weight naturally.
    */
  def simhashExpr(tokens: Column): Column =
    concat((1 to 16).map { p =>
      val contrib = transform(
        tokens,
        t => lit(2) * (conv(substring(md5(t), p, 1), 16, 10).cast("int") % 2) - 1
      )
      when(aggregate(contrib, lit(0), (acc, x) => acc + x) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  private val sqlSimhash: String =
    (1 to 16).map { p =>
      s"""CASE WHEN list_sum(list_transform(tok,
         |  t -> 2 * ((strpos('0123456789abcdef', substr(md5(t), $p, 1)) - 1) % 2) - 1)) >= 0
         |THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")

  val queries: Seq[Q] = Seq(
    // Exact dedup: content-hash groups with kept (min) id.
    Q(
      "q30_exact_dedup",
      (s, d) =>
        documents(s, d)
          .groupBy(md5(lower(trim(col("text")))).as("fingerprint"))
          .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
          .orderBy(col("fingerprint")),
      Some("""SELECT md5(lower(trim(text))) AS fingerprint,
             |  count(*) AS cnt, min(doc_id) AS keep_id
             |FROM documents
             |GROUP BY 1
             |ORDER BY fingerprint""".stripMargin)
    ),

    // MinHash signatures (first 4 hash functions).
    Q(
      "q31_minhash_sig",
      (s, d) => {
        val sh = shingles(toks)
        documents(s, d)
          .select(
            col("doc_id") +: (0 until 4).map(k => minhash(sh, k).as(s"mh$k")): _*
          )
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |sh AS (SELECT doc_id, $sqlShingles AS s FROM t)
              |SELECT doc_id, ${(0 until 4).map(k => s"${sqlMinhash(k)} AS mh$k").mkString(", ")}
              |FROM sh
              |ORDER BY doc_id""".stripMargin)
    ),

    // MinHash-LSH near-dup pairs, band-join candidates verified by exact
    // 3-gram Jaccard ≥ 0.8.
    Q(
      "q32_minhash_lsh_pairs",
      (s, d) => lshPairs(s, d, 0.8).orderBy(col("doc_a"), col("doc_b")),
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT doc_a, doc_b, jaccard FROM pairs
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // SimHash signatures.
    Q(
      "q33_simhash",
      (s, d) =>
        documents(s, d)
          .select(col("doc_id"), simhashExpr(toks).as("simhash"))
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents)
              |SELECT doc_id, $sqlSimhash AS simhash
              |FROM t
              |ORDER BY doc_id""".stripMargin)
    ),

    // End-to-end dedup: documents surviving near-dup removal (keep the
    // lower doc_id of every verified pair) — anti-join against pair RHS.
    Q(
      "q34_dedup_kept",
      (s, d) => {
        val dropIds = lshPairs(s, d, 0.8).select(col("doc_b").as("doc_id")).distinct()
        documents(s, d)
          .join(dropIds, Seq("doc_id"), "left_anti")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("kept_docs"))
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT source, count(*) AS kept_docs
              |FROM documents
              |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    )
  )
}
