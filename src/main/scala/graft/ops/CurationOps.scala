package graft.ops

import org.apache.spark.sql.expressions.Window
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

  /** Quality + fingerprint scoring over a documents-shaped frame (batch or
    * streaming — pure Column algebra, no shuffle). Quality rides as
    * integral 1e-4 units so the acceptance threshold is an integer compare
    * and per-source averages are integer sums — order-independent, so
    * bit-stable across engines and across batch/stream execution.
    */
  def scoreDocs(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs.select(
      col("doc_id"),
      col("source"),
      col("lang"),
      TextOps.qualityScore10k(toks).cast("long").as("q10k"),
      md5(lower(trim(col("text")))).as("fp")
    )
  }

  /** Embedding norms as integral 1e-4 units (see scoreDocs on why units). */
  def embNorms10k(emb: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    emb.select(
      col("vec_id"),
      floor(
        graft.functions.VectorFunctions.norm(col("embedding").cast("array<double>")) * 10000
      ).cast("long").as("n10k")
    )

  /** The per-source acceptance rollup shared by batch q70 and the
    * streaming pipeline: expects (source, q10k, n10k) rows of ACCEPTED
    * canonical docs.
    */
  def acceptanceStats(accepted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    accepted
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        (floor(sum(col("q10k")).cast("double") / count(lit(1))) / 10000.0).as("avg_quality"),
        (floor(sum(col("n10k")).cast("double") / count(lit(1))) / 10000.0).as("avg_norm")
      )

  val queries: Seq[Q] = Seq(

    // Leave-one-source-out ablation manifest: for every source, the token
    // mass the corpus loses if it is dropped, and how hard the remaining
    // mixture shifts (the LARGEST renormalized share gain among surviving
    // sources, in basis points) — the planning table consulted before an
    // ablation run or a licensing-driven source removal. One corpus scan
    // builds the per-source token table; everything after is |sources|
    // metadata rows against a 1-row global stats frame (max1/cnt/max2
    // resolve "largest OTHER source" without a self-join). Integer-exact:
    // the shift divides positive quantities only.
    Q(
      "q186_ablation_manifest",
      (s, d) => {
        val toks = documents(s, d)
          .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("t"))
          .groupBy(col("source"))
          .agg(sum(col("t")).as("tokens"))
        val m1 = toks.agg(max(col("tokens")).as("max1"), sum(col("tokens")).as("total"))
        val m2 = toks
          .crossJoin(broadcast(m1))
          .agg(
            max(col("max1")).as("max1"),
            max(col("total")).as("total"),
            sum(when(col("tokens") === col("max1"), 1L).otherwise(0L)).as("cnt_max1"),
            max(when(col("tokens") < col("max1"), col("tokens"))).as("max2")
          )
        toks
          .crossJoin(broadcast(m2))
          .withColumn("share_bp", expr("(tokens * 10000L) div total"))
          .withColumn("tokens_without", col("total") - col("tokens"))
          .withColumn(
            "t_other",
            when(col("tokens") === col("max1") && col("cnt_max1") === 1L,
              coalesce(col("max2"), lit(0L))
            ).otherwise(col("max1"))
          )
          .withColumn(
            "max_shift_bp",
            when(
              col("tokens_without") > 0L,
              expr("(t_other * 10000L) div tokens_without - (t_other * 10000L) div total")
            )
          )
          .select(
            col("source"),
            col("tokens"),
            col("share_bp"),
            col("tokens_without"),
            col("max_shift_bp")
          )
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tokens
             |  FROM documents GROUP BY source),
             |m AS (SELECT CAST(max(tokens) AS BIGINT) AS max1,
             |        CAST(sum(tokens) AS BIGINT) AS total FROM t),
             |m2 AS (SELECT max(max1) AS max1, max(total) AS total,
             |         CAST(sum(CASE WHEN tokens = max1 THEN 1 ELSE 0 END) AS BIGINT)
             |           AS cnt_max1,
             |         CAST(max(CASE WHEN tokens < max1 THEN tokens END) AS BIGINT) AS max2
             |       FROM t CROSS JOIN m)
             |SELECT source, tokens,
             |  (tokens * 10000) // total AS share_bp,
             |  total - tokens AS tokens_without,
             |  CASE WHEN total - tokens > 0 THEN
             |    (CASE WHEN tokens = max1 AND cnt_max1 = 1
             |          THEN coalesce(max2, 0) ELSE max1 END) * 10000
             |      // (total - tokens)
             |    - (CASE WHEN tokens = max1 AND cnt_max1 = 1
             |            THEN coalesce(max2, 0) ELSE max1 END) * 10000 // total
             |  END AS max_shift_bp
             |FROM t CROSS JOIN m2
             |ORDER BY source""".stripMargin)
    ),
    Q(
      "q70_curation",
      (s, d) => {
        val scored = scoreDocs(documents(s, d))
        // canonical doc per exact-dup group (keep the lowest doc_id)
        val keep = scored.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
        val kept = scored
          .join(keep, Seq("fp"))
          .filter(col("doc_id") === col("keep_id"))
        // norms also ride as integral 1e-4 units — averaging raw doubles is
        // summation-order-dependent and can straddle a rounding boundary
        // between engines (the exact drift class the q10k units avoid)
        val e = embNorms10k(embeddings(s, d))
        acceptanceStats(
          kept
            .filter(col("lang") === "en" && col("q10k") >= 5000L)
            .join(e, col("doc_id") === col("vec_id"))
        ).orderBy(col("source"))
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
    ),

    // Sequence-packing statistics: documents concatenated in doc_id order
    // per source and chunked into 2048-token context windows (the
    // concat-then-chunk packing every pre-training dataloader runs).
    // Reports per source: total tokens, windows needed, and how many
    // documents straddle a window boundary (the quantity packing
    // strategies trade against padding). One window cumulative sum per
    // source — integer end-to-end, single shuffle, no state beyond the
    // running total; at 100 TB the partition key is (source, shard) and
    // the same cumsum runs per shard.
    Q(
      "q72_seq_packing",
      (s, d) => {
        val w = Window
          .partitionBy(col("source"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("n")
          )
          .withColumn("cum", sum(col("n")).over(w))
        cum
          .select(
            col("source"),
            col("n"),
            col("cum"),
            expr("(cum - n) div 2048").as("sbin"),
            expr("(cum - 1) div 2048").as("ebin")
          )
          .groupBy(col("source"))
          .agg(
            sum(col("n")).as("total_tokens"),
            expr("(max(cum) + 2047) div 2048").as("windows"),
            sum(when(col("sbin") =!= col("ebin"), 1L).otherwise(0L)).as("crossing_docs")
          )
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |c AS (
             |  SELECT source, n,
             |    sum(n) OVER (PARTITION BY source ORDER BY doc_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM d)
             |SELECT source,
             |  CAST(sum(n) AS BIGINT) AS total_tokens,
             |  CAST((max(cum) + 2047) // 2048 AS BIGINT) AS windows,
             |  CAST(sum(CASE WHEN (cum - n) // 2048 <> (cum - 1) // 2048
             |               THEN 1 ELSE 0 END) AS BIGINT) AS crossing_docs
             |FROM c
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Deterministic stratified sampling — the data-mixing primitive: each
    // source gets a target rate (derived here from its index; production
    // passes a weights table), and a document is kept iff a stable hash
    // of its id lands under the rate. Hash-gated sampling is reproducible
    // across runs/engines (unlike rand()), map-only, and composable: the
    // same predicate applied on any subset yields consistent membership.
    // Reports per source: population, sample size, achieved rate units.
    Q(
      "q38_stratified_sample",
      (s, d) => {
        val bucket =
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 100")
        val rate = (lit(10L) + (col("src_idx") * 7L) % 80L).as("rate")
        documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            // uncapped suffix, matching the oracle's substr(source, 4):
            // a length-capped variant would silently diverge for source
            // names longer than 13 characters
            expr("substring(source, 4)").cast("long").as("src_idx"),
            bucket.as("bucket")
          )
          .select(col("source"), col("bucket"), rate)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("population"),
            sum(when(col("bucket") < col("rate"), 1L).otherwise(0L)).as("sampled"),
            max(col("rate")).as("rate_pct")
          )
          .withColumn(
            "achieved_units",
            floor(col("sampled") * lit(10000.0) / col("population")).cast("long")
          )
          .orderBy(col("source"))
      },
      Some {
        val hex4 = (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
          )
          .mkString("(", " + ", ")")
        s"""WITH b AS (
           |  SELECT source,
           |    CAST($hex4 AS BIGINT) % 100 AS bucket,
           |    10 + (CAST(substr(source, 4) AS BIGINT) * 7) % 80 AS rate
           |  FROM documents)
           |SELECT source,
           |  count(*) AS population,
           |  CAST(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
           |  CAST(max(rate) AS BIGINT) AS rate_pct,
           |  CAST(floor(sum(CASE WHEN bucket < rate THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT)
           |    AS achieved_units
           |FROM b
           |GROUP BY source
           |ORDER BY source""".stripMargin
      }
    ),

    // Deterministic WEIGHTED sampling without replacement (priority
    // sampling, Duffield–Lund–Thorup): each document draws a stable
    // pseudo-uniform u from md5(doc_id) and competes with priority u/w
    // where w = token count — the k smallest priorities form a sample
    // whose inclusion probability is proportional to weight (long
    // documents count for more token mass, so token-weighted stats from
    // the sample are unbiased). Everything is integer: u ∈ [1, 2¹⁶] from
    // the first 4 md5 hex chars, pri = u·10⁶ div w, ties broken by
    // doc_id — bit-identical across engines and runs, unlike rand().
    // Scale shape: map-only scoring then orderBy.limit(k) =
    // TakeOrderedAndProject (per-partition top-k + single k-row merge);
    // no global sort, no window, survives any corpus size.
    Q(
      "q199_weighted_sample",
      (s, d) => {
        val scored = documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("n")
          )
          .withColumn(
            "pri",
            expr(
              """(cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) + 1L)
                | * 1000000L div greatest(n, 1L)""".stripMargin
            )
          )
          .orderBy(col("pri"), col("doc_id"))
          .limit(100)
        val w = Window.orderBy(col("pri"), col("doc_id"))
        // ranking AFTER the 100-row top-k: the single-partition window
        // only ever sees k rows (the q128 discipline)
        scored
          .withColumn("rk", row_number().over(w).cast("long"))
          .orderBy(col("rk"))
      },
      Some {
        val hex4 = (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
          )
          .mkString("(", " + ", ")")
        s"""WITH scored AS (
           |  SELECT doc_id, source,
           |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n,
           |    (CAST($hex4 AS BIGINT) + 1) * 1000000
           |      // greatest(CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT), 1) AS pri
           |  FROM documents),
           |top AS (SELECT * FROM scored ORDER BY pri, doc_id LIMIT 100)
           |SELECT doc_id, source, n, CAST(pri AS BIGINT) AS pri,
           |  CAST(row_number() OVER (ORDER BY pri, doc_id) AS BIGINT) AS rk
           |FROM top
           |ORDER BY rk""".stripMargin
      }
    ),

    // Per-source document cap — the repetition-control pass every corpus
    // mix runs (cap any one domain/source at N docs so it can't dominate
    // the mixture). Selection is deterministic: rank by md5(doc_id) with
    // a doc_id tie-break, keep rank ≤ 15 — reproducible across runs and
    // engines, unlike rand()-based subsampling. One shuffle on source.
    // At 100 TB a hot source would skew its partition; the fix is the
    // two-phase hash-threshold refinement (pre-filter by a hash prefix
    // that overshoots the cap, then rank only the survivors) — same
    // predicate algebra, bounded partition width.
    Q(
      "q79_source_cap",
      (s, d) => {
        val w = Window
          .partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        documents(s, d)
          .select(col("doc_id"), col("source"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 15)
          .orderBy(col("source"), col("rk"))
      },
      Some("""SELECT doc_id, source, rk FROM (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
             |  FROM documents) t
             |WHERE rk <= 15
             |ORDER BY source, rk""".stripMargin)
    ),

    // Token-length histogram + padding waste — the packing-prep profile:
    // bucket documents by 64-token length classes and report how many
    // pad tokens per-doc padding to the next 64 boundary would burn (the
    // number sequence packing, q72, exists to avoid). Map-only expression
    // work into one small aggregation; integer end-to-end.
    Q(
      "q80_token_histogram",
      (s, d) =>
        documents(s, d)
          .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
          .select(expr("n div 64").as("bucket"), col("n"))
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("n")).as("tokens"),
            sum(expr("(n + 63) div 64 * 64 - n")).as("pad_waste")
          )
          .orderBy(col("bucket")),
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents)
             |SELECT n // 64 AS bucket, count(*) AS docs,
             |  CAST(sum(n) AS BIGINT) AS tokens,
             |  CAST(sum((n + 63) // 64 * 64 - n) AS BIGINT) AS pad_waste
             |FROM d
             |GROUP BY bucket
             |ORDER BY bucket""".stripMargin)
    ),

    // Epoch shard assignment — the deterministic global "shuffle" a
    // training run performs per epoch: every document hashes to one of 16
    // shards under an epoch-seeded md5, and the output is the per-shard
    // balance profile (doc count, token mass) a job validates before
    // launch. Map-only hashing plus one small aggregation; reseeding the
    // epoch string re-deals every document without any stateful shuffle
    // bookkeeping, and the hash is engine-portable (md5 hex → integer) so
    // the same shards fall out of any runner. At 100 TB the write path
    // would be `.partitionBy(shard)` on this exact frame.
    Q(
      "q88_epoch_shards",
      (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("n"),
            expr(
              "cast(conv(substring(md5(concat('epoch1:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 16"
            ).as("shard")
          )
          .groupBy(col("shard"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("n")).as("tokens"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc")
          )
          .orderBy(col("shard")),
      Some {
        val hex4 = (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
          )
          .mkString("(", " + ", ")")
        s"""WITH d AS (
           |  SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n,
           |    $hex4 % 16 AS shard
           |  FROM documents)
           |SELECT shard, count(*) AS docs, CAST(sum(n) AS BIGINT) AS tokens,
           |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |FROM d
           |GROUP BY shard
           |ORDER BY shard""".stripMargin
      }
    ),

    // Mixture interleave — the data-mixing pass that builds a training
    // stream from per-source quotas: rank each source's documents under a
    // deterministic md5 pseudo-shuffle, keep the top 10 per source, and
    // lay them out round-robin (position = (rank−1)·20 + source index) so
    // consecutive training examples cycle through all 20 sources instead
    // of batching one domain. Everything is integer algebra over one
    // source-partitioned window — no global sort until the final bounded
    // 200-row output; at scale the position column IS the sort key a
    // sharded writer range-partitions on.
    Q(
      "q89_mixture_interleave",
      (s, d) => {
        val w = Window
          .partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        documents(s, d)
          .select(col("doc_id"), col("source"), expr("substring(source, 4)").cast("long").as("src_idx"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 10)
          .select(
            ((col("rk") - 1L) * 20L + col("src_idx")).as("position"),
            col("doc_id"),
            col("source")
          )
          .orderBy(col("position"))
      },
      Some("""SELECT (rk - 1) * 20 + CAST(substr(source, 4) AS BIGINT) AS position,
             |       doc_id, source FROM (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
             |  FROM documents) t
             |WHERE rk <= 10
             |ORDER BY position""".stripMargin)
    ),

    // Temperature-scaled mixture sampling (α = 0.5): each source's target
    // rate is proportional to sqrt(its size) — the square-root temperature
    // mix that up-weights small sources relative to proportional sampling
    // (the GPT-3/Pile mixing recipe). Weights ride as floor(sqrt(n)·100)
    // integers so the cross-source normalization is an integer sum (a
    // 20-double sum would be summation-order-dependent across engines);
    // membership is the same md5 hash gate as q38 — reproducible, map-only,
    // composable. Plan shape: one tiny per-source aggregate (broadcast both
    // ways), one documents pass for the gate — the weight table is O(
    // sources), never a corpus shuffle.
    Q(
      "q110_temperature_mix",
      (s, d) => {
        val docs = documents(s, d).select(
          col("doc_id"),
          col("source"),
          expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint) % 10000")
            .as("gate")
        )
        val weights = docs
          .groupBy(col("source"))
          .agg(count(lit(1)).as("population"))
          .withColumn("w", floor(sqrt(col("population")) * 100).cast("long"))
        val total = weights.agg(sum(col("w")).as("tw"))
        val rates = weights
          .join(broadcast(total))
          .select(
            col("source"),
            col("population"),
            expr("w * 10000 div tw").as("rate_bp")
          )
        docs
          .join(broadcast(rates), "source")
          .groupBy(col("source"))
          .agg(
            max(col("population")).as("population"),
            max(col("rate_bp")).as("rate_bp"),
            sum(when(col("gate") < col("rate_bp"), 1L).otherwise(0L)).as("sampled")
          )
          .withColumn(
            "achieved_bp",
            expr("sampled * 10000 div population")
          )
          .orderBy(col("source"))
      },
      Some {
        val hex4 = (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
          )
          .mkString("(", " + ", ")")
        s"""WITH docs AS (
           |  SELECT doc_id, source, CAST($hex4 AS BIGINT) % 10000 AS gate
           |  FROM documents),
           |w AS (
           |  SELECT source, count(*) AS population,
           |    CAST(floor(sqrt(count(*)) * 100) AS BIGINT) AS w
           |  FROM docs GROUP BY source),
           |r AS (
           |  SELECT source, population,
           |    w * 10000 // (SELECT CAST(sum(w) AS BIGINT) FROM w) AS rate_bp
           |  FROM w)
           |SELECT d.source, max(r.population) AS population,
           |  max(r.rate_bp) AS rate_bp,
           |  CAST(sum(CASE WHEN d.gate < r.rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
           |  CAST(sum(CASE WHEN d.gate < r.rate_bp THEN 1 ELSE 0 END) AS BIGINT) * 10000
           |    // max(r.population) AS achieved_bp
           |FROM docs d JOIN r ON d.source = r.source
           |GROUP BY d.source
           |ORDER BY d.source""".stripMargin
      }
    ),

    // Right-to-be-forgotten purge: subtract a deletion list from the
    // corpus and account for what was removed — the GDPR/takedown pass
    // every stored corpus needs on a schedule. The deletion list is
    // derived here (doc_id ≡ 0 mod 97) for oracle parity; in production
    // it is a small table that BROADCASTS, making the purge a map-side
    // anti join — one corpus pass, no shuffle of the big side (the plan
    // this query demonstrates). Audit output counts both sides so the
    // job can assert purged + kept == population before swapping the
    // table pointer.
    Q(
      "q112_purge_audit",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("source"))
        val deletions = docs
          .filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), lit(1).as("hit"))
        // ONE corpus pass: broadcast-left-join the marker, aggregate both
        // counts conditionally (an anti-join for kept + a second scan for
        // population would read the corpus twice)
        docs
          .join(broadcast(deletions), Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("population"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("kept"),
            sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("purged")
          )
          .orderBy(col("source"))
      },
      Some("""WITH del AS (SELECT doc_id, 1 AS hit FROM documents WHERE doc_id % 97 = 0)
             |SELECT source, count(*) AS population,
             |  CAST(sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept,
             |  CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS purged
             |FROM documents LEFT JOIN del USING (doc_id)
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Column-profile (data-sheet) pass: per string column of the corpus,
    // null count, distinct cardinality, and min/max length — the schema-QA
    // report a pipeline publishes alongside a dataset release. ONE corpus
    // scan computes every column's stats in a single multi-distinct
    // aggregate (Catalyst Expands the scan once per distinct column —
    // still one file read); the per-column unpivot explodes a 1-row
    // aggregate, so everything after the scan is metadata work. At 100 TB
    // swap countDistinct for approx_count_distinct (E6's HLL) — the shape
    // is unchanged.
    Q(
      "q116_column_profile",
      (s, d) => {
        val agg = documents(s, d).agg(
          count(lit(1)).as("rows"),
          sum(col("lang").isNull.cast("long")).as("lang_nulls"),
          countDistinct(col("lang")).as("lang_distinct"),
          min(length(col("lang"))).cast("long").as("lang_minl"),
          max(length(col("lang"))).cast("long").as("lang_maxl"),
          sum(col("source").isNull.cast("long")).as("source_nulls"),
          countDistinct(col("source")).as("source_distinct"),
          min(length(col("source"))).cast("long").as("source_minl"),
          max(length(col("source"))).cast("long").as("source_maxl"),
          sum(col("text").isNull.cast("long")).as("text_nulls"),
          countDistinct(col("text")).as("text_distinct"),
          min(length(col("text"))).cast("long").as("text_minl"),
          max(length(col("text"))).cast("long").as("text_maxl")
        )
        agg
          .select(
            explode(
              array(
                Seq("lang", "source", "text").map(c =>
                  struct(
                    lit(c).as("col_name"),
                    col(s"${c}_nulls").as("nulls"),
                    col(s"${c}_distinct").as("n_distinct"),
                    col(s"${c}_minl").as("min_len"),
                    col(s"${c}_maxl").as("max_len")
                  )
                ): _*
              )
            ).as("p")
          )
          .select(col("p.*"))
          .orderBy(col("col_name"))
      },
      Some("""SELECT 'lang' AS col_name,
             |  count(*) - count(lang) AS nulls, count(DISTINCT lang) AS n_distinct,
             |  CAST(min(length(lang)) AS BIGINT) AS min_len,
             |  CAST(max(length(lang)) AS BIGINT) AS max_len
             |FROM documents
             |UNION ALL
             |SELECT 'source', count(*) - count(source), count(DISTINCT source),
             |  CAST(min(length(source)) AS BIGINT), CAST(max(length(source)) AS BIGINT)
             |FROM documents
             |UNION ALL
             |SELECT 'text', count(*) - count(text), count(DISTINCT text),
             |  CAST(min(length(text)) AS BIGINT), CAST(max(length(text)) AS BIGINT)
             |FROM documents
             |ORDER BY col_name""".stripMargin)
    ),

    // Token-budget epoch planner — the step AFTER q110's temperature mix:
    // given a target training budget B (10M tokens here), allocate it
    // across sources by the α=0.5 sqrt-weights and report each source's
    // REPEAT FACTOR (allocation / natural size, in 1e-4 units) — epochs
    // >1.0 mean upsampling (the Pile ran Wikipedia 3×; web 1×), <1.0 mean
    // subsampling. Everything is one per-source aggregate + a broadcast
    // 1-row weight total (the q93/q110 scalar idiom) + integer division —
    // floor-truncated so the plan is bit-identical across engines. The
    // planner's output is exactly what q38's md5 gate and q88's epoch
    // sharding consume downstream.
    Q(
      "q123_epoch_plan",
      (s, d) => {
        val budget = 10000000L
        val n = documents(s, d)
          .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
          .groupBy(col("source"))
          .agg(sum(col("n")).as("n_tokens"))
          .withColumn("w", floor(sqrt(col("n_tokens")) * 100).cast("long"))
        val total = n.agg(sum(col("w")).as("tw"))
        n.join(broadcast(total))
          .select(
            col("source"),
            col("n_tokens"),
            col("w").as("weight"),
            expr(s"$budget * w div tw").as("alloc_tokens"),
            expr(s"($budget * w div tw) * 10000 div n_tokens").as("epochs_e4")
          )
          .orderBy(col("source"))
      },
      Some("""WITH n AS (
             |  SELECT source,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source),
             |w AS (SELECT source, n_tokens,
             |        CAST(floor(sqrt(n_tokens) * 100) AS BIGINT) AS weight FROM n),
             |t AS (SELECT CAST(sum(weight) AS BIGINT) AS tw FROM w)
             |SELECT source, n_tokens, weight,
             |  10000000 * weight // tw AS alloc_tokens,
             |  (10000000 * weight // tw) * 10000 // n_tokens AS epochs_e4
             |FROM w, t
             |ORDER BY source""".stripMargin)
    ),

    // Dataset card: the per-source datasheet a corpus release ships —
    // volume (docs, tokens), language share, mean quality, and near-dup
    // rate, in one report. Composes the engine's cached passes instead of
    // recomputing them: the near-dup drop set rides q32/q34's persisted
    // lshPairs materialization (CacheManager-shared), the quality score is
    // q70's integral-units algebra, and everything else is one corpus
    // pass + a tiny broadcast left-join of the drop list. The card is the
    // artifact the q110/q123 mixture planning reads as input. All ratios
    // are floor basis points; mean quality is q70's floor(sum/count)
    // convention — every value hash-exact cross-engine.
    Q(
      "q124_dataset_card",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val base = documents(s, d).select(
          col("doc_id"),
          col("source"),
          col("lang"),
          size(toks).cast("long").as("n"),
          TextOps.qualityScore10k(toks).cast("long").as("q10k")
        )
        val dropIds = DedupOps
          .lshPairs(s, d, 0.8)
          .select(col("doc_b").as("doc_id"))
          .distinct()
          .withColumn("isdup", lit(1L))
        base
          .join(broadcast(dropIds), Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("n")).as("total_tokens"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en_docs"),
            floor(sum(col("q10k")).cast("double") / count(lit(1))).cast("long").as("avg_q10k"),
            sum(when(col("isdup").isNotNull, 1L).otherwise(0L)).as("dup_docs")
          )
          .select(
            col("source"),
            col("docs"),
            col("total_tokens"),
            expr("en_docs * 10000 div docs").as("en_share_bp"),
            col("avg_q10k"),
            col("dup_docs"),
            expr("dup_docs * 10000 div docs").as("dup_bp")
          )
          .orderBy(col("source"))
      },
      Some(s"""${DedupOps.sqlPairsCte(0.8)},
              |drop_ids AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
              |base AS (
              |  SELECT doc_id, source, lang,
              |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n,
              |    ${TextOps.sqlQuality10k("string_split_regex(trim(text), '\\s+')")} AS q10k
              |  FROM documents)
              |SELECT source, count(*) AS docs,
              |  CAST(sum(n) AS BIGINT) AS total_tokens,
              |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) * 10000
              |    // count(*) AS en_share_bp,
              |  CAST(floor(CAST(sum(q10k) AS DOUBLE) / count(*)) AS BIGINT) AS avg_q10k,
              |  CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
              |  CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000
              |    // count(*) AS dup_bp
              |FROM base LEFT JOIN drop_ids dr USING (doc_id)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // DSIR-style importance resampling weights (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score
    // every raw document by how much its hashed-unigram distribution
    // resembles a target domain (here: the lang='en' slice). The
    // importance weight of a document is the sum over its tokens of the
    // target/raw probability ratio of the token's hash bucket. All
    // arithmetic is integer (ratios scaled 1e6 with BIGINT floor
    // division) so the weight is summation-order independent and
    // bit-identical across engines.
    //
    // Scale shape: one explode pass over the corpus builds the 64-row
    // bucket table (map-side partial counts → 64 rows of metadata), the
    // per-token scoring is a broadcast join against those 64 rows, and
    // the per-doc weight is one hash aggregation on doc_id. Nothing in
    // the plan is wider than (doc_id, bucket) — at 100 TB this is two
    // linear passes and a 64-row broadcast, the exact shape the DSIR
    // paper runs over the Pile. The 1e6 ratio scale bounds the products
    // at ct·R·1e6 ≤ ~1e17 for corpora up to ~1e5 target tokens per
    // bucket; production corpora would move the bucket table to DECIMAL
    // or renormalize per shard.
    Q(
      "q141_dsir_weights",
      (s, d) => {
        val toks = documents(s, d)
          .select(
            col("doc_id"),
            col("lang"),
            explode(TextOps.tokens(col("text"))).as("t")
          )
          .select(
            col("doc_id"),
            col("lang"),
            expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 64").as("bucket")
          )
        val stats = toks
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("cr"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct")
          )
        val tot = stats.agg(sum(col("cr")).as("r"), sum(col("ct")).as("t"))
        val score = stats
          .crossJoin(broadcast(tot))
          .select(
            col("bucket"),
            when(col("t") > 0, expr("ct * r * 1000000 div (cr * t)"))
              .otherwise(0L)
              .as("sc")
          )
        toks
          .join(broadcast(score), Seq("bucket"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("sc")).as("dsir_w"))
          .select(col("doc_id"), col("lang"), col("dsir_w"))
          .orderBy(col("dsir_w").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS t
              |  FROM documents),
              |b AS (
              |  SELECT doc_id, lang, ${TextOps.sqlHex8("md5(t)")} % 64 AS bucket FROM tok),
              |stats AS (
              |  SELECT bucket, count(*) AS cr,
              |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
              |  FROM b GROUP BY bucket),
              |tot AS (SELECT sum(cr) AS r, sum(ct) AS t FROM stats),
              |score AS (
              |  SELECT bucket,
              |         CASE WHEN t > 0 THEN ct * r * 1000000 // (cr * t) ELSE 0 END AS sc
              |  FROM stats, tot)
              |SELECT doc_id, lang, CAST(sum(sc) AS BIGINT) AS dsir_w
              |FROM b JOIN score USING (bucket)
              |GROUP BY doc_id, lang
              |ORDER BY dsir_w DESC, doc_id
              |LIMIT 20""".stripMargin)
    ),

    // Context-window padding-waste audit: the dataloader-side cost model
    // for LENGTH-BUCKETED batching (the alternative to q72's
    // concat-and-chunk packing). Documents are binned to the next
    // power-of-two context length (16..2048, longer docs truncate to
    // 2048), and each bin reports how much of its padded token budget is
    // waste — the padding fraction a bucketed sampler would pay at that
    // boundary. Pure integer CASE/aggregate algebra: one linear pass,
    // map-side partial aggregation into ≤8 bins of metadata; exact at
    // any scale.
    Q(
      "q143_padding_waste",
      (s, d) => {
        val binCase =
          """CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
            |     WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
            |     WHEN n <= 1024 THEN 1024 ELSE 2048 END""".stripMargin
        documents(s, d)
          .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
          .select(expr(binCase).as("bin"), expr("least(n, 2048)").as("eff"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("docs"), sum(col("eff")).as("total_tokens"))
          .select(
            col("bin"),
            col("docs"),
            col("total_tokens"),
            expr("(docs * bin - total_tokens) * 10000 div (docs * bin)").as("waste_bp")
          )
          .orderBy(col("bin"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |b AS (
             |  SELECT CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
             |              WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
             |              WHEN n <= 1024 THEN 1024 ELSE 2048 END AS bin,
             |         least(n, 2048) AS eff
             |  FROM d)
             |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS docs,
             |  CAST(sum(eff) AS BIGINT) AS total_tokens,
             |  CAST((count(*) * bin - sum(eff)) * 10000 // (count(*) * bin) AS BIGINT) AS waste_bp
             |FROM b
             |GROUP BY bin
             |ORDER BY bin""".stripMargin)
    ),

    // Truncation-loss audit — the other half of q143's context-length
    // fitting question: q143 prices the padding SHORT documents cost
    // inside their bucket; this prices the tokens LONG documents lose
    // when the packer hard-truncates at the context length (L = 256
    // here). Per source: how many docs overflow, what fraction of the
    // source's token mass falls off the end, and what survives — the
    // report that decides between truncating, splitting (q72's packing),
    // and dropping. One map + one aggregate, integer-exact, scale-free.
    Q(
      "q150_truncation_loss",
      (s, d) => {
        val L = 256L
        documents(s, d)
          .select(
            col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("n")
          )
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(when(col("n") > L, 1L).otherwise(0L)).as("docs_truncated"),
            sum(col("n")).as("tokens"),
            sum(greatest(col("n") - L, lit(0L))).as("tokens_lost")
          )
          .select(
            col("source"),
            col("docs"),
            col("docs_truncated"),
            col("tokens"),
            col("tokens_lost"),
            expr("tokens_lost * 10000 div tokens").as("loss_bp")
          )
          .orderBy(col("source"))
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents)
             |SELECT source, count(*) AS docs,
             |  CAST(sum(CASE WHEN n > 256 THEN 1 ELSE 0 END) AS BIGINT) AS docs_truncated,
             |  CAST(sum(n) AS BIGINT) AS tokens,
             |  CAST(sum(greatest(n - 256, 0)) AS BIGINT) AS tokens_lost,
             |  CAST(sum(greatest(n - 256, 0)) * 10000 // sum(n) AS BIGINT) AS loss_bp
             |FROM d
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Stratified evaluation sample with EXACT apportionment: allocate a
    // fixed budget of K=100 eval slots across language strata by the
    // largest-remainder (Hamilton) method — base_h = n_h·K div N, the
    // leftover slots going to the largest remainders — then fill each
    // stratum's quota with its lowest-hash documents. Every step is
    // integer-exact and deterministic (re-running the pipeline
    // reproduces the identical eval set — the property an eval split
    // must have), and the allocation is the proportional-rounding
    // standard that never strands a slot or over-allocates one. Scale
    // shape: allocation works on STRATUM METADATA (|langs| rows — the
    // apportionment window is over bounded metadata); the per-stratum
    // fill uses the native GroupTopK aggregate (negated hash → lowest-k
    // ascending) so each map task reduces its slice to ≤K candidates per
    // stratum and only k-row partials shuffle — no rank window ever
    // sorts a stratum's corpus slice in one task. A stratum smaller than
    // its quota yields all its docs on both engines (heap and
    // row_number cap at n_h alike).
    Q(
      "q165_stratified_sample",
      (s, d) => {
        val K = 100
        val docs = Caches.persisted(
          documents(s, d).select(
            col("doc_id"),
            col("lang"),
            expr(
              "cast(conv(substring(md5(concat('samp:', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"
            ).as("hv")
          )
        )
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        val total = docs.count()
        val alloc = counts.select(
          col("lang"),
          expr(s"n * $K div $total").as("base"),
          expr(s"n * $K % $total").as("rem")
        )
        val leftover = (K - alloc.agg(coalesce(sum(col("base")), lit(0L))).head().getLong(0)).toInt
        val aw = Window.orderBy(col("rem").desc, col("lang"))
        val quotas = alloc
          .withColumn("rk", row_number().over(aw))
          .select(
            col("lang"),
            (col("base") + when(col("rk") <= leftover, 1L).otherwise(0L)).as("quota")
          )
        docs
          .groupBy(col("lang"))
          .agg(graft.functions.AggFunctions.topK(-col("hv"), col("doc_id"), K).as("top"))
          .join(broadcast(quotas), Seq("lang"))
          .select(col("lang"), col("quota"), posexplode(col("top")).as(Seq("pos", "p")))
          .filter(col("pos") < col("quota"))
          .select(col("lang"), (col("pos") + 1L).cast("long").as("rk"), col("p.id").as("doc_id"))
          .orderBy(col("lang"), col("rk"))
      },
      Some {
        val h = TextOps.sqlHex8("md5('samp:' || CAST(doc_id AS VARCHAR))")
        s"""WITH h AS (SELECT doc_id, lang, $h AS hv FROM documents),
           |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY 1),
           |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
           |a AS (SELECT lang, n, n * 100 // total AS base, n * 100 % total AS rem
           |      FROM c, t),
           |l AS (SELECT CAST(100 - sum(base) AS BIGINT) AS leftover FROM a),
           |af AS (SELECT lang,
           |         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
           |                       <= leftover THEN 1 ELSE 0 END AS quota
           |       FROM a, l),
           |r AS (SELECT lang, doc_id,
           |        row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
           |      FROM h)
           |SELECT r.lang AS lang, CAST(rk AS BIGINT) AS rk, doc_id
           |FROM r JOIN af USING (lang)
           |WHERE rk <= af.quota
           |ORDER BY lang, rk""".stripMargin
      }
    ),

    // Context-length sizing curve: the truncation-vs-padding tradeoff
    // swept over candidate context lengths in ONE corpus pass — q150
    // prices truncation at a fixed L and q143 prices padding at fixed
    // power-of-two buckets; the sizing DECISION needs both costs as a
    // function of L. For each candidate: tokens lost to hard truncation
    // (falls with L) and padding share under one-doc-per-sequence
    // batching (rises with L) — the config call is the crossover. The
    // sweep is a 4-way literal explode on the per-doc token count (map
    // fan-out of metadata, not a re-scan), then one hash aggregate per
    // candidate; all ratios exact positive floor division.
    Q(
      "q171_context_sweep",
      (s, d) =>
        documents(s, d)
          .select(size(TextOps.tokens(col("text"))).cast("long").as("n"))
          .select(
            col("n"),
            explode(array(lit(128L), lit(256L), lit(512L), lit(1024L))).as("ctx_len")
          )
          .groupBy(col("ctx_len"))
          .agg(
            count(lit(1)).as("docs"),
            sum(when(col("n") > col("ctx_len"), 1L).otherwise(0L)).as("docs_truncated"),
            sum(least(col("n"), col("ctx_len"))).as("kept_tokens"),
            sum(greatest(col("n") - col("ctx_len"), lit(0L))).as("lost_tokens")
          )
          .select(
            col("ctx_len"),
            col("docs"),
            col("docs_truncated"),
            col("kept_tokens"),
            col("lost_tokens"),
            expr("lost_tokens * 10000 div (kept_tokens + lost_tokens)").as("lost_bp"),
            expr("(docs * ctx_len - kept_tokens) * 10000 div (docs * ctx_len)").as("pad_bp")
          )
          .orderBy(col("ctx_len")),
      Some("""WITH d AS (
             |  SELECT CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |e AS (SELECT n, unnest([128, 256, 512, 1024]) AS ctx_len FROM d),
             |f AS (SELECT CAST(ctx_len AS BIGINT) AS ctx_len, count(*) AS docs,
             |    CAST(sum(CASE WHEN n > ctx_len THEN 1 ELSE 0 END) AS BIGINT) AS docs_truncated,
             |    CAST(sum(least(n, ctx_len)) AS BIGINT) AS kept_tokens,
             |    CAST(sum(greatest(n - ctx_len, 0)) AS BIGINT) AS lost_tokens
             |  FROM e GROUP BY 1)
             |SELECT ctx_len, docs, docs_truncated, kept_tokens, lost_tokens,
             |  CAST(lost_tokens * 10000 // (kept_tokens + lost_tokens) AS BIGINT) AS lost_bp,
             |  CAST((docs * ctx_len - kept_tokens) * 10000 // (docs * ctx_len) AS BIGINT) AS pad_bp
             |FROM f
             |ORDER BY ctx_len""".stripMargin)
    ),

    // Token-budget greedy fill: the curation primitive behind "train on
    // the best N tokens" — rank the corpus by quality (q22's q10k units,
    // ties to the lowest doc_id so the cut is a total order) and keep
    // documents until the cumulative token count exceeds the budget
    // (here ⅓ of the corpus token mass, computed from the data so the
    // query is scale-invariant). The global prefix sum NEVER runs as a
    // single-task window: the q91/q135 two-pass discipline —
    // repartitionByRange on (q10k DESC, doc_id) + per-partition running
    // sums (a window PARTITIONED by range-partition id: one linear pass
    // per partition) + 32 broadcast per-partition token offsets; at
    // 100 TB the partition count rises with the cluster, nothing else
    // changes. Output: per-source docs/tokens admitted + budget share in
    // basis points — the mixture a fixed token budget actually buys,
    // next to q89's target mixture.
    Q(
      "q229_budget_fill",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val base = documents(s, d).select(
          col("doc_id"),
          col("source"),
          TextOps.qualityScore10k(toks).cast("long").as("q10k"),
          size(toks).cast("long").as("ntok")
        )
        val budget = base.agg(expr("sum(ntok) div 3").as("budget"))
        val stamped = Caches.persisted(
          base
            .repartitionByRange(32, col("q10k").desc, col("doc_id"))
            .sortWithinPartitions(col("q10k").desc, col("doc_id"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
        )
        val wOff = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
        val offsets = stamped
          .groupBy(col("pid"))
          .agg(sum(col("ntok")).as("ptok"))
          .withColumn("off", coalesce(sum(col("ptok")).over(wOff), lit(0L)))
        val wLoc = Window
          .partitionBy(col("pid"))
          .orderBy(col("mid"))
          .rowsBetween(Window.unboundedPreceding, 0)
        stamped
          .withColumn("loc_cum", sum(col("ntok")).over(wLoc))
          .join(broadcast(offsets.select(col("pid"), col("off"))), Seq("pid"))
          .crossJoin(broadcast(budget))
          .filter(col("off") + col("loc_cum") <= col("budget"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs_sel"),
            sum(col("ntok")).as("tokens_sel"),
            min(col("q10k")).as("min_q10k")
          )
          .crossJoin(broadcast(budget))
          .select(
            col("source"),
            col("docs_sel"),
            col("tokens_sel"),
            col("min_q10k"),
            expr("(tokens_sel * 10000L) div budget").as("share_bp")
          )
          .orderBy(col("source"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, source,
              |    CAST(${TextOps.sqlQuality10k(sqlToks)} AS BIGINT) AS q10k,
              |    CAST(len($sqlToks) AS BIGINT) AS ntok
              |  FROM documents),
              |b AS (SELECT CAST(sum(ntok) AS BIGINT) // 3 AS budget FROM base),
              |c AS (SELECT *, CAST(sum(ntok) OVER (ORDER BY q10k DESC, doc_id
              |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
              |      FROM base)
              |SELECT source, CAST(count(*) AS BIGINT) AS docs_sel,
              |  CAST(sum(ntok) AS BIGINT) AS tokens_sel,
              |  CAST(min(q10k) AS BIGINT) AS min_q10k,
              |  (CAST(sum(ntok) AS BIGINT) * 10000) // budget AS share_bp
              |FROM c CROSS JOIN b
              |WHERE cum <= budget
              |GROUP BY source, budget
              |ORDER BY source""".stripMargin)
    )
  )
}
