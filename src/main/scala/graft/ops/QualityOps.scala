package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-quality / scale-diagnostics suite (with q116's column profile and
  * q117's drift monitor): the audits a 100 TB ingest runs BEFORE committing
  * to a layout or join strategy. Every statistic is exact int64 (rank-based
  * discrete quantiles, floor-scaled ratios) so the DuckDB oracle
  * hash-matches with no float caveats.
  */
object QualityOps {

  import Tables._

  /** Correlation in basis points from exact int64 moment numerators
    * (cov = n·Σxy − Σx·Σy, var = n·Σx² − (Σx)²): the magnitude rides
    * integer division over ⌊√var_x⌋·⌊√var_y⌋ (floor(sqrt(int)) is
    * IEEE-exact in both engines) and the SIGN is carried separately.
    * (Both engines truncate integer division toward zero — verified:
    * DuckDB -7//2 = -3 — so carrying the sign separately is a clarity
    * choice, not a cross-engine necessity.)
    * Arguments are column NAMES (the expression references them by name).
    * A zero variance (constant signal) makes correlation undefined — it
    * reports 0 instead of dividing by zero (ANSI mode throws).
    */
  /** Exact global rank of `v` (ties broken by doc_id — a total order)
    * WITHOUT a single-reducer sort: repartitionByRange + local sort +
    * monotonically_increasing_id, ranks recovered by adding the 32
    * broadcast (pid, offset) metadata rows (the q135/q91 discipline).
    * `base` must carry (doc_id, v); the stamped frame persists so the
    * offset reader and the join see identical ids.
    */
  private[graft] def globalRanks(
      base: org.apache.spark.sql.DataFrame,
      v: String,
      rkName: String
  ): org.apache.spark.sql.DataFrame = {
    // innermost scope wins, so this charge is always named global_ranks
    val stamped = Caches.buildScope("global_ranks")(Caches.persisted(
      base
        .select(col("doc_id"), col(v))
        // Spark sorts NULLs first while the DuckDB oracles' ORDER BY
        // defaults to NULLS LAST — exclude NULLs so the tie conventions
        // can never diverge on nullable inputs (ranks of NULL are
        // meaningless for every caller: Spearman, deciles, Gini).
        .where(col(v).isNotNull)
        .repartitionByRange(32, col(v), col("doc_id"))
        .sortWithinPartitions(col(v), col("doc_id"))
        .withColumn("mid", monotonically_increasing_id())
        .withColumn("pid", shiftright(col("mid"), 33))
        .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
    ))
    val w = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = stamped
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(w), lit(0L)))
    stamped
      .join(broadcast(offsets.select(col("pid"), col("off"))), Seq("pid"))
      .select(col("doc_id"), (col("off") + col("loc") + 1).as(rkName))
  }

  /** The deterministic hash-classifier shared by q142/q162/q174/q183/q193:
    * 256 md5-derived bucket weights in [−100, 100]; a document's score is
    * the sum of its tokens' bucket weights. `base` must carry (doc_id,
    * tok: array<string>) plus any `carry` columns, which ride through the
    * explode and the aggregate unchanged (no join-back). ONE definition of
    * the model feeds every gate/calibration/agreement query — they cannot
    * drift weight-by-weight.
    */
  private[graft] def classifierScores(
      s: org.apache.spark.sql.SparkSession,
      base: org.apache.spark.sql.DataFrame,
      carry: Seq[String] = Nil
  ): org.apache.spark.sql.DataFrame = {
    val weights = s
      .range(256)
      .select(
        col("id").as("bucket"),
        expr(
          "cast(conv(substring(md5(concat('w:', cast(id as string))), 1, 8), 16, 10) as bigint) % 201 - 100"
        ).as("wt")
      )
    val keys = col("doc_id") +: carry.map(col)
    base
      .select(keys :+ explode(col("tok")).as("t"): _*)
      .select(keys :+ expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % 256").as("bucket"): _*)
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(keys: _*)
      .agg(sum(col("wt")).as("score"))
  }

  /** DuckDB twin of [[classifierScores]]'s weight table — embed as a CTE
    * named `w(bucket, wt)`; the token-side bucket is
    * [[sqlClassifierBucketExpr]] over a token column `t`.
    */
  private[graft] val sqlClassifierWeightCte: String =
    s"""w AS (
       |  SELECT i AS bucket,
       |         ${TextOps.sqlHex8("md5('w:' || CAST(i AS VARCHAR))")} % 201 - 100 AS wt
       |  FROM range(0, 256) r(i))""".stripMargin

  private[graft] val sqlClassifierBucketExpr: String =
    s"""${TextOps.sqlHex8("md5(t)")} % 256"""

  private[graft] def corrBpExpr(cov: String, varX: String, varY: String) =
    when(col(varX) === 0L || col(varY) === 0L, 0L)
      .otherwise(
        when(col(cov) < 0, -1L).when(col(cov) > 0, 1L).otherwise(0L) *
          expr(
            s"abs($cov) * 10000 div (cast(floor(sqrt($varX)) as bigint)" +
              s" * cast(floor(sqrt($varY)) as bigint))"
          )
      )
      .cast("long")

  def queries: Seq[Q] = Seq(

    // Join-key skew report: the diagnostic that decides between a plain
    // shuffle join, AQE skew splitting, and q87's explicit salting — per
    // key frequencies of the fact table's join key reduced to their
    // distribution headline (mean, p99, max, max/mean ratio). Plan shape:
    // one fact pass → per-key counts (map-side partial), then ALL further
    // work happens on key METADATA (one row per distinct key). The key
    // table itself is unbounded at 100 TB (10⁸–10⁹ users), so the p99
    // rank uses the q135 range-partition trick instead of a global rank
    // window: repartitionByRange + local sort, then per-partition row
    // counts (32 metadata rows) prefix-summed into offsets recover the
    // exact global rank — no single task ever holds the whole key table.
    // The p99/quantile is rank-discrete (value at row ceil(q·n)) —
    // deterministic integer, no interpolation drift. n_keys arrives via
    // one scalar head() (the q86/q108 driver-scalar idiom, metadata not
    // data); an empty input short-circuits to the oracle's aggregate row
    // (n_keys=0, NULL distribution columns) instead of throwing.
    Q(
      "q119_skew_report",
      (s, d) => {
        val c = Caches.persisted(
          events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        )
        val head = c.agg(
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("total"),
          max(col("cnt")).as("max_cnt")
        ).head()
        val nKeys = head.getAs[Long]("n_keys")
        if (nKeys == 0L) {
          val nul = lit(null).cast("long")
          c.sparkSession
            .range(1)
            .select(
              lit(0L).as("n_keys"),
              nul.as("mean_cnt_centi"),
              nul.as("p99_cnt"),
              nul.as("max_cnt"),
              nul.as("skew_centi")
            )
        } else {
          val total = head.getAs[Long]("total")
          val maxCnt = head.getAs[Long]("max_cnt")
          val p99Idx = (99L * nKeys + 99L) / 100L
          val stamped = Caches.persisted(
            c.repartitionByRange(32, col("cnt"), col("user_id"))
              .sortWithinPartitions(col("cnt"), col("user_id"))
              .withColumn("mid", monotonically_increasing_id())
              .withColumn("pid", shiftright(col("mid"), 33))
              .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
          )
          val ow = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
          val offsets = stamped
            .groupBy(col("pid"))
            .agg(count(lit(1)).as("pcnt"))
            .withColumn("off", coalesce(sum(col("pcnt")).over(ow), lit(0L)))
            .select(col("pid"), col("off"))
          stamped
            .join(broadcast(offsets), Seq("pid"))
            .filter(col("off") + col("loc") + 1 === p99Idx)
            .select(
              lit(nKeys).as("n_keys"),
              lit(total * 100L / nKeys).as("mean_cnt_centi"),
              col("cnt").as("p99_cnt"),
              lit(maxCnt).as("max_cnt"),
              lit(maxCnt * 100L * nKeys / total).as("skew_centi")
            )
        }
      },
      Some("""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
             |s AS (SELECT count(*) AS n_keys, sum(cnt) AS total, max(cnt) AS max_cnt FROM c),
             |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS rk FROM c)
             |SELECT CAST(n_keys AS BIGINT) AS n_keys,
             |  CAST(total * 100 // n_keys AS BIGINT) AS mean_cnt_centi,
             |  (SELECT CAST(cnt AS BIGINT) FROM r, s WHERE rk = (99 * n_keys + 99) // 100) AS p99_cnt,
             |  CAST(max_cnt AS BIGINT) AS max_cnt,
             |  CAST(max_cnt * 100 * n_keys // total AS BIGINT) AS skew_centi
             |FROM s""".stripMargin)
    ),

    // Referential-integrity audit: orphaned facts (lineitems whose order
    // is missing) and childless parents (orders with no lineitems) in ONE
    // shuffle — both sides pre-aggregate to per-key counts before a
    // full-outer join of the COUNTS (the q97 reconciliation shape), so
    // neither anti-join pass re-shuffles the fact table. The audit a
    // pipeline runs after every ingest batch before downstream joins
    // assume the FK holds.
    Q(
      "q120_fk_audit",
      (s, d) => {
        val l = lineitem(s, d)
          .groupBy(col("l_orderkey").as("k"))
          .agg(count(lit(1)).as("l_cnt"))
        val o = orders(s, d)
          .groupBy(col("o_orderkey").as("k"))
          .agg(count(lit(1)).as("o_cnt"))
        l.join(o, Seq("k"), "full_outer")
          .agg(
            sum(coalesce(col("l_cnt"), lit(0L))).as("facts"),
            sum(when(col("o_cnt").isNull, coalesce(col("l_cnt"), lit(0L))).otherwise(0L))
              .as("orphan_facts"),
            sum(when(col("o_cnt").isNotNull, 1L).otherwise(0L)).as("parents"),
            sum(when(col("o_cnt").isNotNull && col("l_cnt").isNull, 1L).otherwise(0L))
              .as("childless_parents")
          )
      },
      Some("""WITH l AS (SELECT l_orderkey AS k, count(*) AS l_cnt FROM lineitem GROUP BY 1),
             |o AS (SELECT o_orderkey AS k, count(*) AS o_cnt FROM orders GROUP BY 1)
             |SELECT CAST(sum(coalesce(l_cnt, 0)) AS BIGINT) AS facts,
             |  CAST(sum(CASE WHEN o_cnt IS NULL THEN coalesce(l_cnt, 0) ELSE 0 END) AS BIGINT) AS orphan_facts,
             |  CAST(sum(CASE WHEN o_cnt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS parents,
             |  CAST(sum(CASE WHEN o_cnt IS NOT NULL AND l_cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS childless_parents
             |FROM l FULL OUTER JOIN o USING (k)""".stripMargin)
    ),

    // IQR outlier audit: per return flag, rank-discrete quartiles of the
    // integer-cent price and the count of rows outside the Tukey fences
    // (q1 − 1.5·IQR, q3 + 1.5·IQR) — the numeric-column anomaly gate.
    // Quartiles are values AT ranks ceil(n/4)/ceil(3n/4) (no
    // interpolation → engine-exact); the fence comparison is ×2 integer
    // algebra so the 1.5 factor never touches floats. Plan: a
    // `Window.partitionBy(flag)` rank would sort EACH FLAG'S whole slice
    // of the fact table in one task (3 flags → 3 tasks own the corpus —
    // LOW key cardinality is what makes a partitioned window a
    // scale-killer here), so the per-flag global rank is recovered with
    // the q135 range-partition trick instead: repartitionByRange(flag,
    // cents) + local sort, then per-(partition, flag) counts and min
    // positions (≤ 32×|flags| metadata rows) prefix-summed into offsets
    // give the exact rank with no task ever holding more than 1/32 of
    // the data. Quartiles fall out of a conditional aggregate on the
    // rank-recovered rows; the tiny per-flag fence frame joins back
    // (broadcast) for the outlier count — two passes over ONE cached
    // projection, no fact-table re-scan.
    Q(
      "q121_price_outliers",
      (s, d) => {
        val base = Caches.buildScope("q121_flag_cents")(Caches.persisted(
          lineitem(s, d)
            .select(
              col("l_returnflag").as("flag"),
              expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")
            )
            .repartitionByRange(32, col("flag"), col("cents"))
            .sortWithinPartitions(col("flag"), col("cents"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        ))
        val meta = base
          .groupBy(col("pid"), col("flag"))
          .agg(count(lit(1)).as("cnt"), min(col("loc")).as("minloc"))
        val wf = Window
          .partitionBy(col("flag"))
          .orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = meta
          .withColumn("off", coalesce(sum(col("cnt")).over(wf), lit(0L)))
          .select(col("pid"), col("flag"), col("minloc"), col("off"))
        val nPer = meta.groupBy(col("flag")).agg(sum(col("cnt")).as("n"))
        val quarts = base
          .join(broadcast(offsets), Seq("pid", "flag"))
          .join(broadcast(nPer), Seq("flag"))
          .withColumn("rk", col("loc") - col("minloc") + col("off") + 1)
          .filter(
            col("rk") === expr("(n + 3) div 4") || col("rk") === expr("(3 * n + 3) div 4")
          )
          .groupBy(col("flag"))
          .agg(
            max(col("n")).as("n"),
            max(when(col("rk") === expr("(n + 3) div 4"), col("cents"))).as("q1_cents"),
            max(when(col("rk") === expr("(3 * n + 3) div 4"), col("cents"))).as("q3_cents")
          )
        base
          .join(broadcast(quarts), Seq("flag"))
          .groupBy(col("flag"))
          .agg(
            max(col("n")).as("n"),
            max(col("q1_cents")).as("q1_cents"),
            max(col("q3_cents")).as("q3_cents"),
            sum(
              when(
                lit(2L) * col("cents") < lit(5L) * col("q1_cents") - lit(3L) * col("q3_cents"),
                1L
              ).otherwise(0L)
            ).as("outliers_lo"),
            sum(
              when(
                lit(2L) * col("cents") > lit(5L) * col("q3_cents") - lit(3L) * col("q1_cents"),
                1L
              ).otherwise(0L)
            ).as("outliers_hi")
          )
          .orderBy(col("flag"))
      },
      Some("""WITH b AS (SELECT l_returnflag AS flag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem),
             |r AS (SELECT flag, cents,
             |    row_number() OVER (PARTITION BY flag ORDER BY cents) AS rk,
             |    count(*) OVER (PARTITION BY flag) AS n
             |  FROM b),
             |qt AS (SELECT flag, max(n) AS n,
             |    max(CASE WHEN rk = (n + 3) // 4 THEN cents END) AS q1_cents,
             |    max(CASE WHEN rk = (3 * n + 3) // 4 THEN cents END) AS q3_cents
             |  FROM r GROUP BY flag)
             |SELECT b.flag AS flag, CAST(max(qt.n) AS BIGINT) AS n,
             |  CAST(max(q1_cents) AS BIGINT) AS q1_cents,
             |  CAST(max(q3_cents) AS BIGINT) AS q3_cents,
             |  CAST(sum(CASE WHEN 2 * cents < 5 * q1_cents - 3 * q3_cents THEN 1 ELSE 0 END) AS BIGINT) AS outliers_lo,
             |  CAST(sum(CASE WHEN 2 * cents > 5 * q3_cents - 3 * q1_cents THEN 1 ELSE 0 END) AS BIGINT) AS outliers_hi
             |FROM b JOIN qt ON b.flag = qt.flag
             |GROUP BY b.flag
             |ORDER BY flag""".stripMargin)
    ),

    // Skyline (2-D pareto frontier) selection: the documents not dominated
    // on (token count, quality) — i.e. no other document is ≥ on both axes
    // and > on at least one. The multi-objective data-selection primitive:
    // "longest docs at every quality level" without collapsing the two
    // signals into one weighted score (q70's gate) — the frontier IS the
    // tradeoff curve. Scale shape: the corpus reduces to max-quality per
    // distinct length (one map-side-combinable aggregate), the frontier
    // is a running max over that LENGTH METADATA (single-partition window
    // over ≤|distinct lengths| rows — the q115/q119 metadata-window
    // discipline, never the corpus), and survivors come back via a
    // broadcast equi-join on (length, max quality). The oracle is the
    // DEFINITIONAL NOT EXISTS dominance test — quadratic in DuckDB at
    // test scale, which is exactly why the engine side must be the
    // aggregate+metadata algorithm instead. Quality rides its integral
    // 1e-4 units (exact int64, the q22/q70 rule).
    Q(
      "q131_skyline",
      (s, d) => {
        val toksC = TextOps.tokens(col("text"))
        val t = Caches.persisted(
          documents(s, d).select(
            col("doc_id"),
            size(toksC).cast("long").as("n_tokens"),
            TextOps.qualityScore10k(toksC).cast("long").as("q10k")
          )
        )
        val byN = t.groupBy(col("n_tokens")).agg(max(col("q10k")).as("mq"))
        val longerMax = Window
          .orderBy(col("n_tokens").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = byN
          .withColumn("m1", max(col("mq")).over(longerMax))
          .filter(col("m1").isNull || col("mq") > col("m1"))
          .select(col("n_tokens"), col("mq"))
        t.join(broadcast(frontier), Seq("n_tokens"))
          .filter(col("q10k") === col("mq"))
          .select(col("doc_id"), col("n_tokens"), col("q10k"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH z AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              |          FROM documents),
              |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
              |        CAST(${TextOps.sqlQuality10k("toks")} AS BIGINT) AS q10k
              |      FROM z)
              |SELECT doc_id, n_tokens, q10k FROM t a
              |WHERE NOT EXISTS (SELECT 1 FROM t b
              |  WHERE b.n_tokens >= a.n_tokens AND b.q10k >= a.q10k
              |    AND (b.n_tokens > a.n_tokens OR b.q10k > a.q10k))
              |ORDER BY doc_id""".stripMargin)
    ),

    // Per-key trend detection: ordinary-least-squares slope of daily event
    // volume against the day index, per event type — the drift probe that
    // says WHICH direction a source is moving, where q117's two-epoch
    // comparison only says it moved. The regression is an AGGREGATE, not
    // an iteration: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) over
    // (x = day index, y = daily count), so the whole fit is one
    // map-side-combinable groupBy over per-day counts (corpus → |days|
    // rows per key → 5 sums per key). Division is NEVER taken: both
    // engines emit the exact int64 NUMERATOR and DENOMINATOR raw (the
    // q111 report-the-sums convention — Spark `div` and DuckDB `//` both
    // truncate toward zero, but raw sums keep the fit exact); the sign and
    // magnitude comparisons a monitor needs are exact on the fraction.
    Q(
      "q132_trend",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(
            col("event_type"),
            datediff(date_trunc("day", col("ts")), lit("2024-01-01").cast("date"))
              .cast("long")
              .as("x")
          )
          .agg(count(lit(1)).as("y"))
        daily
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_days"),
            sum(col("x")).as("sum_x"),
            sum(col("y")).as("sum_y"),
            sum(col("x") * col("y")).as("sum_xy"),
            sum(col("x") * col("x")).as("sum_xx")
          )
          .select(
            col("event_type"),
            col("n_days"),
            col("sum_y").as("total_events"),
            (col("n_days") * col("sum_xy") - col("sum_x") * col("sum_y")).as("slope_num"),
            (col("n_days") * col("sum_xx") - col("sum_x") * col("sum_x")).as("slope_den")
          )
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type,
             |    CAST(date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) AS BIGINT) AS x,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |f AS (SELECT event_type, count(*) AS n_days,
             |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
             |    CAST(sum(x * y) AS BIGINT) AS sum_xy, CAST(sum(x * x) AS BIGINT) AS sum_xx
             |  FROM daily GROUP BY 1)
             |SELECT event_type, CAST(n_days AS BIGINT) AS n_days, sum_y AS total_events,
             |  n_days * sum_xy - sum_x * sum_y AS slope_num,
             |  n_days * sum_xx - sum_x * sum_x AS slope_den
             |FROM f
             |ORDER BY event_type""".stripMargin)
    ),

    // Hashed linear classifier gate — the fastText-style quality filter
    // every web-scale corpus runs (CCNet/LLaMA-style "looks like a
    // reference page" gating), reduced to its engine shape: a fixed
    // weight per hashed token bucket (md5-derived here so both engines
    // re-derive the same model; production loads trained weights), a
    // per-document score that is the sum of its tokens' bucket weights,
    // and a keep/drop decision at score >= 0. Per-source acceptance
    // report. Integer end-to-end: weights are exact ints in [-100, 100],
    // the doc score is an order-independent integer sum.
    //
    // Scale shape: the 256-row weight table is BUILT once and broadcast;
    // scoring is explode → broadcast join → one hash aggregation on
    // doc_id — inference is embarrassingly parallel, no shuffle wider
    // than (doc_id, bucket). The same plan serves any linear model over
    // hashed n-gram features (a trained fastText binary exports exactly
    // this table).
    Q(
      "q142_classifier_gate",
      (s, d) => {
        val scored = classifierScores(
          s,
          documents(s, d)
            .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("tok")),
          carry = Seq("source")
        )
        scored
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(when(col("score") >= 0, 1L).otherwise(0L)).as("kept_docs"),
            sum(col("score")).as("net_score")
          )
          .select(
            col("source"),
            col("docs"),
            col("kept_docs"),
            expr("kept_docs * 10000 div docs").as("kept_bp"),
            col("net_score")
          )
          .orderBy(col("source"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, source, unnest(string_split_regex(trim(text), '\\s+')) AS t
              |  FROM documents),
              |b AS (
              |  SELECT doc_id, source, $sqlClassifierBucketExpr AS bucket FROM tok),
              |$sqlClassifierWeightCte,
              |ds AS (
              |  SELECT doc_id, source, sum(wt) AS score
              |  FROM b JOIN w USING (bucket)
              |  GROUP BY doc_id, source)
              |SELECT source, count(*) AS docs,
              |  CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
              |  CAST(sum(CASE WHEN score >= 0 THEN 1 ELSE 0 END) AS BIGINT) * 10000
              |    // count(*) AS kept_bp,
              |  CAST(sum(score) AS BIGINT) AS net_score
              |FROM ds
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Quality-signal correlation screen — the Deequ-style column-pair
    // audit run before trusting a cheap signal as a proxy for an
    // expensive one (if token count correlates ~1 with char length, one
    // of them is redundant in the gating policy; if distinct-token count
    // decorrelates, it carries signal). One corpus pass computes every
    // per-doc signal and ONE aggregate row holds all the moment sums;
    // the pair matrix then unpivots from that single row — the whole
    // report costs one map + one scalar-sized aggregate at any corpus
    // size. Exact int64 algebra throughout: covariance numerator
    // n·Σxy − Σx·Σy, variance numerators likewise, and the correlation
    // in basis points rides floor(sqrt(int)) (IEEE-exact both engines)
    // so the hash matches with no float caveats. Bounds: cov_num grows as
    // ~n²·x̄² and corrBpExpr multiplies it by 10⁴, so with ~2k-magnitude
    // signals int64 holds only to n ≈ 5·10⁴ docs — fine for a per-shard /
    // per-source screen (this query's unit), NOT for one global pass over
    // a 10⁸-doc corpus: at that scale shard the screen and combine, or
    // move the moment sums to DECIMAL (q141's note).
    Q(
      "q145_signal_correlation",
      (s, d) => {
        val sig = documents(s, d).select(
          length(col("text")).cast("long").as("l"),
          size(TextOps.tokens(col("text"))).cast("long").as("t"),
          size(array_distinct(TextOps.tokens(col("text")))).cast("long").as("u")
        )
        val m = sig.agg(
          count(lit(1)).as("n"),
          sum(col("l")).as("sl"),
          sum(col("t")).as("st"),
          sum(col("u")).as("su"),
          sum(col("l") * col("l")).as("sll"),
          sum(col("t") * col("t")).as("stt"),
          sum(col("u") * col("u")).as("suu"),
          sum(col("l") * col("t")).as("slt"),
          sum(col("l") * col("u")).as("slu"),
          sum(col("t") * col("u")).as("stu")
        )
        m.selectExpr(
          """stack(3,
            |  'len_vs_tokens',   n*slt - sl*st, n*sll - sl*sl, n*stt - st*st,
            |  'len_vs_distinct', n*slu - sl*su, n*sll - sl*sl, n*suu - su*su,
            |  'tokens_vs_distinct', n*stu - st*su, n*stt - st*st, n*suu - su*su
            |) AS (pair, cov_num, var_x, var_y)""".stripMargin
        ).select(
          col("pair"),
          col("cov_num"),
          corrBpExpr("cov_num", "var_x", "var_y").as("corr_bp")
        ).orderBy(col("pair"))
      },
      Some("""WITH sig AS (
             |  SELECT CAST(len(text) AS BIGINT) AS l,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS t,
             |    CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS u
             |  FROM documents),
             |m AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(l) AS BIGINT) AS sl, CAST(sum(t) AS BIGINT) AS st,
             |    CAST(sum(u) AS BIGINT) AS su,
             |    CAST(sum(l*l) AS BIGINT) AS sll, CAST(sum(t*t) AS BIGINT) AS stt,
             |    CAST(sum(u*u) AS BIGINT) AS suu,
             |    CAST(sum(l*t) AS BIGINT) AS slt, CAST(sum(l*u) AS BIGINT) AS slu,
             |    CAST(sum(t*u) AS BIGINT) AS stu
             |  FROM sig),
             |p AS (
             |  SELECT 'len_vs_tokens' AS pair, n*slt - sl*st AS cov_num,
             |    n*sll - sl*sl AS var_x, n*stt - st*st AS var_y FROM m
             |  UNION ALL
             |  SELECT 'len_vs_distinct', n*slu - sl*su, n*sll - sl*sl, n*suu - su*su FROM m
             |  UNION ALL
             |  SELECT 'tokens_vs_distinct', n*stu - st*su, n*stt - st*st, n*suu - su*su FROM m)
             |SELECT pair, cov_num,
             |  CASE WHEN var_x = 0 OR var_y = 0 THEN 0
             |       ELSE CAST(sign(cov_num) AS BIGINT)
             |    * (abs(cov_num) * 10000 // (CAST(floor(sqrt(var_x)) AS BIGINT)
             |       * CAST(floor(sqrt(var_y)) AS BIGINT))) END AS corr_bp
             |FROM p ORDER BY pair""".stripMargin)
    ),

    // Robust volume-anomaly detector: daily ingest counts vs a
    // median/MAD fence — the monitoring query that catches a
    // double-delivered day or a dead upstream BEFORE mixture weights and
    // dedup admission silently absorb the distortion (mean/stddev fences
    // move with the outlier they hunt; the median/MAD pair doesn't).
    // Scale shape: one fact pass reduces to per-day counts — bounded
    // calendar metadata — and both order statistics come from
    // orderBy.limit(k) (TakeOrderedAndProject) over those ~hundreds of
    // rows, never a global sort or an unpartitioned window; the two
    // driver-held scalars are the q108/q119 bounded-metadata idiom. The
    // fence is integer-exact: |cnt − med| · 10000 > 3 · 14826 · MAD
    // (1.4826 in fixed-point, the normal-consistency constant).
    Q(
      "q147_volume_anomaly",
      (s, d) => {
        val daily = Caches.persisted(
          events(s, d)
            .groupBy(to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("cnt"))
        )
        val n = daily.count()
        val medRank = ((n + 1L) / 2L).toInt
        // n == 0 → the final select over the empty `daily` is empty no
        // matter what the fences are; 0 just keeps the scalar reads total
        val med =
          if (n == 0L) 0L
          else
            daily
              .orderBy(col("cnt"), col("day"))
              .limit(medRank)
              .agg(max(col("cnt")))
              .head()
              .getLong(0)
        val mad =
          if (n == 0L) 0L
          else
            daily
              .select(abs(col("cnt") - med).as("dev"))
              .orderBy(col("dev"))
              .limit(medRank)
              .agg(max(col("dev")))
              .head()
              .getLong(0)
        daily
          .select(
            col("day"),
            col("cnt"),
            lit(med).as("med"),
            lit(mad).as("mad"),
            (abs(col("cnt") - med) * 10000L > lit(3L * 14826L) * mad).as("anomaly")
          )
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, count(*) AS cnt FROM events GROUP BY 1),
             |s AS (SELECT count(*) AS n FROM daily),
             |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt, day) AS rk FROM daily),
             |med AS (SELECT CAST(cnt AS BIGINT) AS med FROM r, s WHERE rk = (n + 1) // 2),
             |r2 AS (SELECT abs(cnt - med) AS dev,
             |         row_number() OVER (ORDER BY abs(cnt - med)) AS rk
             |       FROM daily, med),
             |mad AS (SELECT CAST(dev AS BIGINT) AS mad FROM r2, s WHERE rk = (n + 1) // 2)
             |SELECT day, CAST(cnt AS BIGINT) AS cnt, med, mad,
             |  (abs(cnt - med) * 10000 > 3 * 14826 * mad) AS anomaly
             |FROM daily, med, mad
             |ORDER BY day""".stripMargin)
    ),

    // Join-fanout audit: PREDICT a join's output size before paying for
    // it. Both sides reduce to per-key counts (map-side combinable), the
    // counts inner-join (one metadata-sized shuffle — one row per shared
    // key, never a fact row), and Σ cnt_a·cnt_b IS the exact output
    // cardinality of the real join — the number that decides whether the
    // join is safe, needs q87's salting, or signals a broken key
    // (many-to-many where the model says 1-to-many). Reported per key
    // tier: clean 1:n keys vs m:n amplifying keys vs the single worst
    // key's fanout. The q119/q120 family completed: skew tells you about
    // one side's distribution, FK audit about unmatched keys, fanout
    // about what their JOIN will do.
    Q(
      "q148_join_fanout",
      (s, d) => {
        val l = lineitem(s, d)
          .groupBy(col("l_orderkey").as("k"))
          .agg(count(lit(1)).as("ca"))
        val e = events(s, d)
          .groupBy(col("user_id").as("k"))
          .agg(count(lit(1)).as("cb"))
        l.join(e, Seq("k"))
          .select(col("ca"), col("cb"), (col("ca") * col("cb")).as("fan"))
          .agg(
            count(lit(1)).as("shared_keys"),
            sum(col("fan")).as("join_rows"),
            sum(when(col("ca") === 1L || col("cb") === 1L, col("fan")).otherwise(0L))
              .as("clean_rows"),
            sum(when(col("ca") > 1L && col("cb") > 1L, col("fan")).otherwise(0L))
              .as("amplified_rows"),
            max(col("fan")).as("max_key_fanout")
          )
      },
      Some("""WITH a AS (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1),
             |b AS (SELECT user_id AS k, count(*) AS cb FROM events GROUP BY 1),
             |j AS (SELECT ca, cb, ca * cb AS fan FROM a JOIN b USING (k))
             |SELECT CAST(count(*) AS BIGINT) AS shared_keys,
             |  CAST(sum(fan) AS BIGINT) AS join_rows,
             |  CAST(sum(CASE WHEN ca = 1 OR cb = 1 THEN fan ELSE 0 END) AS BIGINT) AS clean_rows,
             |  CAST(sum(CASE WHEN ca > 1 AND cb > 1 THEN fan ELSE 0 END) AS BIGINT) AS amplified_rows,
             |  CAST(max(fan) AS BIGINT) AS max_key_fanout
             |FROM j""".stripMargin)
    ),

    // Equi-width histogram profile of a numeric column — the engine
    // primitive behind every "show me the distribution" panel and the
    // input to range-partition planning (q135's exact quantiles answer
    // point questions; the histogram shows SHAPE — modes, gaps, spike
    // bins). Two passes: one scalar min/max aggregate (driver-held bounds,
    // the q108/q119 metadata idiom), then one map + hash aggregate on the
    // bin id — both map-side combinable, no sort, no window, scale-free.
    // Bin algebra is integer-exact on cents: id = (v−lo)·B div (hi−lo+1),
    // every row lands in [0, B); bin EDGES are reported back in cents so
    // the result is self-describing. Empty input returns the empty frame
    // (no bins), matching the oracle.
    Q(
      "q149_value_histogram",
      (s, d) => {
        val cents = lineitem(s, d)
          .select(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("v"))
        val bounds = cents.agg(min(col("v")).as("lo"), max(col("v")).as("hi")).head()
        if (bounds.isNullAt(0)) {
          s.range(0)
            .select(
              col("id").as("bin"),
              col("id").as("lo_cents"),
              col("id").as("hi_cents"),
              col("id").as("cnt")
            )
        } else {
          val lo = bounds.getLong(0)
          val span = bounds.getLong(1) - lo + 1L
          val bins = 20L
          cents
            .select(expr(s"(v - $lo) * $bins div $span").as("bin"))
            .groupBy(col("bin"))
            .agg(count(lit(1)).as("cnt"))
            .select(
              col("bin"),
              expr(s"$lo + bin * $span div $bins").as("lo_cents"),
              expr(s"$lo + (bin + 1) * $span div $bins - 1").as("hi_cents"),
              col("cnt")
            )
            .orderBy(col("bin"))
        }
      },
      Some("""WITH c AS (
             |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
             |b AS (SELECT min(v) AS lo, max(v) - min(v) + 1 AS span FROM c),
             |h AS (SELECT (v - lo) * 20 // span AS bin FROM c, b)
             |SELECT bin, count(*) AS cnt,
             |  CAST(lo + bin * span // 20 AS BIGINT) AS lo_cents,
             |  CAST(lo + (bin + 1) * span // 20 - 1 AS BIGINT) AS hi_cents
             |FROM h, b
             |GROUP BY bin, lo, span
             |ORDER BY bin""".stripMargin)
    ),

    // Categorical-distribution drift: per event type, the basis-point gap
    // between its share of the early epoch and its share of the late one,
    // plus the global total-variation distance — the "did the event MIX
    // shift" monitor that complements q117 (which watches each type's
    // VALUE mean) and q132 (which watches each type's volume trend). TVD
    // is the canonical bounded drift statistic (½·Σ|p−q|, 0..10⁴ bp) and
    // needs no χ²-style squaring, so the integer algebra stays far from
    // int64 overflow (each term |o_a·N_b − o_b·N_a| ≤ N_a·N_b; safe to
    // ~10⁹ rows per epoch, beyond that shard per source as in q145's
    // envelope note). Scale shape: ONE fact pass reduces to per-type
    // epoch counts (map-side combinable conditional aggregate, the q117
    // shape); epoch totals and the TVD numerator are driver-held scalars
    // over that type-metadata frame (the q147 idiom) — no self-join, no
    // window, no second corpus scan.
    Q(
      "q155_category_drift",
      (s, d) => {
        val c = Caches.persisted(
          events(s, d)
            .select(
              col("event_type"),
              (col("ts") < lit("2024-01-16").cast("timestamp")).as("early")
            )
            .groupBy(col("event_type"))
            .agg(
              sum(when(col("early"), 1L).otherwise(0L)).as("o_a"),
              sum(when(!col("early"), 1L).otherwise(0L)).as("o_b")
            )
        )
        val tot = c.agg(
          coalesce(sum(col("o_a")), lit(0L)).as("na"),
          coalesce(sum(col("o_b")), lit(0L)).as("nb")
        ).head()
        val nA = tot.getLong(0)
        val nB = tot.getLong(1)
        val sumG =
          if (nA == 0L || nB == 0L) 0L
          else
            c.agg(coalesce(sum(expr(s"abs(o_a * $nB - o_b * $nA)")), lit(0L)))
              .head()
              .getLong(0)
        val tvdBp = if (nA == 0L || nB == 0L) 0L else sumG * 10000L / (2L * nA * nB)
        c.select(
          col("event_type"),
          col("o_a"),
          col("o_b"),
          (if (nA == 0L || nB == 0L) lit(null).cast("long")
           else expr(s"abs(o_a * $nB - o_b * $nA) * 10000 div (${nA * nB})"))
            .as("gap_bp"),
          lit(tvdBp).as("tvd_bp")
        ).orderBy(col("event_type"))
      },
      Some("""WITH c AS (SELECT event_type,
             |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS o_a,
             |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS o_b
             |  FROM events GROUP BY 1),
             |t AS (SELECT CAST(sum(o_a) AS BIGINT) AS na, CAST(sum(o_b) AS BIGINT) AS nb FROM c),
             |g AS (SELECT event_type, o_a, o_b,
             |        abs(o_a * nb - o_b * na) AS gnum, na, nb FROM c, t)
             |SELECT event_type, o_a, o_b,
             |  CAST(gnum * 10000 // (na * nb) AS BIGINT) AS gap_bp,
             |  CAST((SELECT sum(gnum) FROM g) * 10000 // (2 * na * nb) AS BIGINT) AS tvd_bp
             |FROM g ORDER BY event_type""".stripMargin)
    ),

    // Equi-DEPTH histogram (exact decile buckets): q149 shows shape on a
    // fixed value grid; this one answers the planner's question — WHERE
    // do the range-partition split points fall so every bucket holds the
    // same row count. That is exactly the statistic a 1000-executor sort
    // or range-bucketed layout (Bucketing.rangeSorted) needs, and the
    // naive formulation (ntile over a global ORDER BY) is a
    // single-reducer sort of the fact table. Instead the global rank is
    // recovered with the q119/q121/q135 range-partition machinery:
    // repartitionByRange + local sort + per-partition offsets gives every
    // row its exact rank with no task holding more than 1/32 of the
    // data; bin = (rk−1)·B div n is then pure integer algebra and the
    // per-bin (cnt, lo, hi) falls out of one hash aggregate. Ties at a
    // bin edge may split across bins — counts and edges are still
    // deterministic because tied rows carry identical values (and the
    // unique (orderkey, linenumber) tiebreak keeps the recovered rank a
    // total order on both engines).
    Q(
      "q156_equidepth_hist",
      (s, d) => {
        val base = Caches.persisted(
          lineitem(s, d)
            .select(
              expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("v"),
              col("l_orderkey"),
              col("l_linenumber")
            )
            .repartitionByRange(32, col("v"), col("l_orderkey"), col("l_linenumber"))
            .sortWithinPartitions(col("v"), col("l_orderkey"), col("l_linenumber"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val n = base.count()
        if (n == 0L) {
          s.range(0)
            .select(
              col("id").as("bin"),
              col("id").as("cnt"),
              col("id").as("lo_cents"),
              col("id").as("hi_cents")
            )
        } else {
          val ow = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
          val offsets = base
            .groupBy(col("pid"))
            .agg(count(lit(1)).as("pcnt"))
            .withColumn("off", coalesce(sum(col("pcnt")).over(ow), lit(0L)))
            .select(col("pid"), col("off"))
          base
            .join(broadcast(offsets), Seq("pid"))
            .select(expr(s"(off + loc) * 10 div $n").as("bin"), col("v"))
            .groupBy(col("bin"))
            .agg(
              count(lit(1)).as("cnt"),
              min(col("v")).as("lo_cents"),
              max(col("v")).as("hi_cents")
            )
            .orderBy(col("bin"))
        }
      },
      Some("""WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
             |    l_orderkey, l_linenumber FROM lineitem),
             |s AS (SELECT count(*) AS n FROM c),
             |r AS (SELECT v, row_number()
             |        OVER (ORDER BY v, l_orderkey, l_linenumber) AS rk FROM c)
             |SELECT (rk - 1) * 10 // n AS bin, count(*) AS cnt,
             |  CAST(min(v) AS BIGINT) AS lo_cents,
             |  CAST(max(v) AS BIGINT) AS hi_cents
             |FROM r, s
             |GROUP BY bin, n
             |ORDER BY bin""".stripMargin)
    ),

    // Lag-1 autocorrelation of daily ingest volume — the seasonality/
    // momentum probe on the ops dashboard next to q147's anomaly fence
    // (a high positive value says volume moves in multi-day waves, so a
    // fence tripped yesterday predicts one today; near zero says spikes
    // are isolated). One fact pass reduces to per-day counts; the lag
    // pairing is a lead() window over CALENDAR METADATA (bounded rows —
    // the q115/q131 unpartitioned-window discipline), and the correlation
    // reuses q145's exact int64 moment algebra and corrBpExpr (sign
    // carried separately, floor(sqrt) magnitude).
    Q(
      "q157_volume_autocorr",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val p = daily
          .withColumn("nxt", lead(col("cnt"), 1).over(Window.orderBy(col("day"))))
          .filter(col("nxt").isNotNull)
        p.agg(
          count(lit(1)).as("n"),
          sum(col("cnt")).as("sx"),
          sum(col("nxt")).as("sy"),
          sum(col("cnt") * col("nxt")).as("sxy"),
          sum(col("cnt") * col("cnt")).as("sxx"),
          sum(col("nxt") * col("nxt")).as("syy")
        ).select(
          col("n").as("n_pairs"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("var_x"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("var_y")
        ).select(
          col("n_pairs"),
          col("cov_num"),
          col("var_x"),
          col("var_y"),
          corrBpExpr("cov_num", "var_x", "var_y").as("corr_bp")
        )
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1),
             |p AS (SELECT cnt AS x, lead(cnt) OVER (ORDER BY day) AS y FROM daily),
             |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy
             |  FROM p WHERE y IS NOT NULL),
             |g AS (SELECT n AS n_pairs, n * sxy - sx * sy AS cov_num,
             |    n * sxx - sx * sx AS var_x, n * syy - sy * sy AS var_y FROM f)
             |SELECT n_pairs, cov_num, var_x, var_y,
             |  CASE WHEN var_x = 0 OR var_y = 0 THEN 0
             |       ELSE CAST(sign(cov_num) AS BIGINT)
             |    * (abs(cov_num) * 10000 // (CAST(floor(sqrt(var_x)) AS BIGINT)
             |       * CAST(floor(sqrt(var_y)) AS BIGINT))) END AS corr_bp
             |FROM g""".stripMargin)
    ),

    // Source-concentration profile: per language, the inverse-Simpson
    // "effective number of sources" — (Σn)² / Σn² in centi-units — next
    // to the raw source count. A lang served by 12 sources where one
    // contributes 95% has eff≈1: its mixture weight (q89) rests on a
    // single upstream feed and one crawler outage silently rewrites the
    // training mix. Inverse Simpson is the diversity index that needs NO
    // libm (pure integer squares — the entropy-based alternative runs
    // into the cross-engine log() ban, NOTES rule) and it is exactly
    // 1/Σp² so it reads as a head-count. Two nested map-side-combinable
    // aggregates: corpus → (lang, source) counts → lang rows; integer
    // envelope docs²·100 holds to ~3·10⁸ docs per language, beyond that
    // move the squares to DECIMAL (q145's note).
    Q(
      "q159_source_diversity",
      (s, d) => {
        val c = documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"))
        c.groupBy(col("lang"))
          .agg(
            sum(col("n")).as("docs"),
            count(lit(1)).as("n_sources"),
            sum(col("n") * col("n")).as("sq")
          )
          .select(
            col("lang"),
            col("docs"),
            col("n_sources"),
            expr("docs * docs * 100 div sq").as("eff_sources_centi")
          )
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2)
             |SELECT lang, CAST(sum(n) AS BIGINT) AS docs,
             |  CAST(count(*) AS BIGINT) AS n_sources,
             |  CAST(sum(n) * sum(n) * 100 // sum(n * n) AS BIGINT) AS eff_sources_centi
             |FROM c
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)
    ),

    // Gini coefficient of per-user activity — the inequality headline
    // that complements q119's point statistics (p99, max/mean): skew says
    // how bad the WORST key is, Gini says how concentrated the whole
    // distribution is (0 = uniform, →10⁴ bp = one user is the firehose).
    // The rank formulation G = Σ(2·rk − n − 1)·x₍rk₎ / (n·Σx) needs every
    // key's exact global rank by activity — recovered with the
    // q119/q121/q135 range-partition machinery (repartitionByRange +
    // local sort + per-partition offsets), never a single-reducer sort
    // of the 10⁸–10⁹-key table. Numerator and denominator are reported
    // raw (the q111 convention; both fit int64 to ~10⁹ keys × ~10⁹
    // events before the DECIMAL escape) and the ratio rides positive
    // floor division (ascending ranks keep the numerator ≥ 0).
    Q(
      "q161_activity_gini",
      (s, d) => {
        val c = Caches.persisted(
          events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("x"))
        )
        val head =
          c.agg(count(lit(1)).as("n"), sum(col("x")).as("sx")).head()
        val n = head.getLong(0)
        if (n == 0L) {
          val nul = lit(null).cast("long")
          s.range(1)
            .select(
              lit(0L).as("n_users"),
              nul.as("total_events"),
              nul.as("gini_num"),
              nul.as("gini_den"),
              nul.as("gini_bp")
            )
        } else {
          val sx = head.getLong(1)
          val stamped = c
            .repartitionByRange(32, col("x"), col("user_id"))
            .sortWithinPartitions(col("x"), col("user_id"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
            .transform(Caches.persisted)
          val ow = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
          val offsets = stamped
            .groupBy(col("pid"))
            .agg(count(lit(1)).as("pcnt"))
            .withColumn("off", coalesce(sum(col("pcnt")).over(ow), lit(0L)))
            .select(col("pid"), col("off"))
          val num = stamped
            .join(broadcast(offsets), Seq("pid"))
            .agg(sum((lit(2L) * (col("off") + col("loc") + 1L) - n - 1L) * col("x")))
            .head()
            .getLong(0)
          val den = n * sx
          s.range(1)
            .select(
              lit(n).as("n_users"),
              lit(sx).as("total_events"),
              lit(num).as("gini_num"),
              lit(den).as("gini_den"),
              lit(num * 10000L / den).as("gini_bp")
            )
        }
      },
      Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |s AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx FROM c),
             |r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk FROM c),
             |g AS (SELECT CAST(sum((2 * rk - n - 1) * x) AS BIGINT) AS num FROM r, s)
             |SELECT CAST(n AS BIGINT) AS n_users, sx AS total_events,
             |  num AS gini_num,
             |  CASE WHEN n = 0 THEN NULL ELSE CAST(n * sx AS BIGINT) END AS gini_den,
             |  CASE WHEN n = 0 THEN NULL
             |       ELSE CAST(num * 10000 // (n * sx) AS BIGINT) END AS gini_bp
             |FROM g, s""".stripMargin)
    ),

    // Classifier-score calibration: the q142 hashed-linear gate's score,
    // cut into exact global deciles, against the independent q22-style
    // quality signal — the audit that decides whether a trained filter's
    // score is MONOTONE in the thing it claims to proxy before anyone
    // sets a keep threshold on it (a non-monotone decile table means the
    // gate is rejecting good documents at some score band). Scale shape:
    // one corpus pass computes (score, quality) per doc (explode →
    // broadcast weight join → per-doc sum, the q142 plan); deciles come
    // from the q156 range-partition rank recovery over the per-doc
    // METADATA (one row per doc, never re-scanning text); per-decile
    // sums are reported raw (q111 convention — scores can be negative,
    // where floor-vs-truncate division diverges across engines).
    Q(
      "q162_score_calibration",
      (s, d) => {
        val toksC = TextOps.tokens(col("text"))
        val docs = Caches.persisted(
          documents(s, d).select(
            col("doc_id"),
            toksC.as("tok"),
            TextOps.qualityScore10k(toksC).cast("long").as("q10k")
          )
        )
        val scored = classifierScores(s, docs, carry = Seq("q10k"))
        val base = Caches.persisted(
          scored
            .repartitionByRange(32, col("score"), col("doc_id"))
            .sortWithinPartitions(col("score"), col("doc_id"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val n = base.count()
        if (n == 0L) {
          s.range(0)
            .select(
              col("id").as("decile"),
              col("id").as("n_docs"),
              col("id").as("lo_score"),
              col("id").as("hi_score"),
              col("id").as("sum_score"),
              col("id").as("sum_q10k")
            )
        } else {
          val ow = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
          val offsets = base
            .groupBy(col("pid"))
            .agg(count(lit(1)).as("pcnt"))
            .withColumn("off", coalesce(sum(col("pcnt")).over(ow), lit(0L)))
            .select(col("pid"), col("off"))
          base
            .join(broadcast(offsets), Seq("pid"))
            .select(
              expr(s"(off + loc) * 10 div $n").as("decile"),
              col("score"),
              col("q10k")
            )
            .groupBy(col("decile"))
            .agg(
              count(lit(1)).as("n_docs"),
              min(col("score")).as("lo_score"),
              max(col("score")).as("hi_score"),
              sum(col("score")).as("sum_score"),
              sum(col("q10k")).as("sum_q10k")
            )
            .orderBy(col("decile"))
        }
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
              |  FROM documents),
              |b AS (
              |  SELECT doc_id, $sqlClassifierBucketExpr AS bucket FROM tok),
              |$sqlClassifierWeightCte,
              |q AS (
              |  SELECT doc_id,
              |    CAST(${TextOps.sqlQuality10k("string_split_regex(trim(text), '\\s+')")} AS BIGINT) AS q10k
              |  FROM documents),
              |ds AS (
              |  SELECT b.doc_id, CAST(sum(wt) AS BIGINT) AS score, max(q10k) AS q10k
              |  FROM b JOIN w USING (bucket) JOIN q ON q.doc_id = b.doc_id
              |  GROUP BY b.doc_id),
              |s AS (SELECT count(*) AS n FROM ds),
              |r AS (SELECT score, q10k,
              |        row_number() OVER (ORDER BY score, doc_id) AS rk FROM ds)
              |SELECT (rk - 1) * 10 // n AS decile, count(*) AS n_docs,
              |  CAST(min(score) AS BIGINT) AS lo_score,
              |  CAST(max(score) AS BIGINT) AS hi_score,
              |  CAST(sum(score) AS BIGINT) AS sum_score,
              |  CAST(sum(q10k) AS BIGINT) AS sum_q10k
              |FROM r, s
              |GROUP BY decile, n
              |ORDER BY decile""".stripMargin)
    ),

    // Burstiness (Fano factor) of daily volume per event type: the
    // variance-to-mean ratio of per-day counts — the dispersion probe
    // that separates Poisson-like steady arrival (Fano ≈ 1) from bursty
    // campaign/batch-upload traffic (Fano ≫ 1), which decides whether
    // rate limits and micro-batch sizing can assume smooth arrival.
    // Complements q132 (trend direction) and q157 (day-over-day
    // momentum) on the same per-day count reduction: one fact pass →
    // per-(type, day) counts → five map-side-combinable sums per type.
    // Exact int64 throughout; the ratio is reported as raw variance
    // numerator (n·Σx² − (Σx)², always ≥ 0) against n·Σx (the q111
    // convention) plus its positive floor-division centi value.
    Q(
      "q164_burstiness",
      (s, d) =>
        events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx")
          )
          .select(
            col("event_type"),
            col("n_days"),
            col("sx").as("total_events"),
            (col("n_days") * col("sxx") - col("sx") * col("sx")).as("var_num"),
            (col("n_days") * col("sx")).as("var_den"),
            expr("(n_days * sxx - sx * sx) * 100 div (n_days * sx)").as("fano_centi")
          )
          .orderBy(col("event_type")),
      Some("""WITH daily AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1, 2),
             |f AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM daily GROUP BY 1)
             |SELECT event_type, n_days, sx AS total_events,
             |  n_days * sxx - sx * sx AS var_num,
             |  n_days * sx AS var_den,
             |  CAST((n_days * sxx - sx * sx) * 100 // (n_days * sx) AS BIGINT) AS fano_centi
             |FROM f
             |ORDER BY event_type""".stripMargin)
    ),

    // Behavioral (Markov-transition) drift: per FROM-state, the TVD
    // between the early and late epoch's conditional next-event
    // distribution P(next | prev) — q155 says the event MIX moved, this
    // says users' SEQUENTIAL behavior moved (the same mix can hide a
    // changed funnel). Transition pairs come from the q104 machinery
    // (lag over the per-user window — high-cardinality partitions, a
    // legitimate window at scale) with each pair assigned to the LATER
    // event's epoch; everything after the one fact pass is |types|²
    // metadata: per-(prev, next) epoch counts, per-prev totals joined
    // back broadcast, and the same exact cross-multiplied TVD integer
    // algebra as q155 (q155's overflow envelope applies per prev-state).
    Q(
      "q169_transition_drift",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(byUser))
          .filter(col("prev").isNotNull)
          .select(
            col("prev"),
            col("event_type").as("nxt"),
            (col("ts") < lit("2024-01-16").cast("timestamp")).as("early")
          )
        val c = pairs
          .groupBy(col("prev"), col("nxt"))
          .agg(
            sum(when(col("early"), 1L).otherwise(0L)).as("o_a"),
            sum(when(!col("early"), 1L).otherwise(0L)).as("o_b")
          )
        val t = c
          .groupBy(col("prev"))
          .agg(sum(col("o_a")).as("na"), sum(col("o_b")).as("nb"))
        c.join(broadcast(t), Seq("prev"))
          .groupBy(col("prev"))
          .agg(
            max(col("na")).as("n_a"),
            max(col("nb")).as("n_b"),
            sum(abs(col("o_a") * col("nb") - col("o_b") * col("na"))).as("gnum")
          )
          .select(
            col("prev"),
            col("n_a"),
            col("n_b"),
            when(col("n_a") > 0L && col("n_b") > 0L, expr("gnum * 10000 div (2 * n_a * n_b)"))
              .cast("long")
              .as("tvd_bp")
          )
          .orderBy(col("prev"))
      },
      Some("""WITH p AS (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             |    event_type AS nxt,
             |    ts < TIMESTAMP '2024-01-16' AS early
             |  FROM events),
             |c AS (SELECT prev, nxt,
             |    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS o_a,
             |    CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS o_b
             |  FROM p WHERE prev IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT prev, CAST(sum(o_a) AS BIGINT) AS n_a,
             |    CAST(sum(o_b) AS BIGINT) AS n_b
             |  FROM c GROUP BY 1)
             |SELECT c.prev AS prev, max(n_a) AS n_a, max(n_b) AS n_b,
             |  CASE WHEN max(n_a) > 0 AND max(n_b) > 0
             |       THEN CAST(sum(abs(o_a * n_b - o_b * n_a)) * 10000
             |         // (2 * max(n_a) * max(n_b)) AS BIGINT)
             |       ELSE NULL END AS tvd_bp
             |FROM c JOIN t ON t.prev = c.prev
             |GROUP BY c.prev
             |ORDER BY prev""".stripMargin)
    ),

    // Weighted (token-MASS) quantiles: the document-length thresholds at
    // which 50% / 90% of the corpus's TOKENS sit at-or-below — the
    // statistic that sizes context windows and packing (q135/q156 rank
    // rows, but training cost is paid per token, and long docs carry
    // disproportionate mass: "p90 of documents" and "p90 of tokens" can
    // differ by an order of magnitude). Extends the range-partition rank
    // recovery from row counts to WEIGHTS: repartitionByRange + local
    // sort, per-partition (row count, token mass) metadata prefix-summed
    // into offsets, then a running within-partition mass sum (a window
    // partitioned by pid — parallelism scales with the partition count,
    // not a data property) gives every row its exact global cumulative
    // mass; the quantile row is the first crossing of ceil(q·M/100).
    // Reports the threshold plus how many docs sit at-or-below it — the
    // "half the tokens live in the longest X% of documents" headline.
    Q(
      "q172_token_mass_quantiles",
      (s, d) => {
        val base = Caches.persisted(
          documents(s, d)
            .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
            .repartitionByRange(32, col("n"), col("doc_id"))
            .sortWithinPartitions(col("n"), col("doc_id"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val meta = base
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("pcnt"), sum(col("n")).as("pmass"))
        val totals = meta
          .agg(coalesce(sum(col("pmass")), lit(0L)), coalesce(sum(col("pcnt")), lit(0L)))
          .head()
        val m = totals.getLong(0)
        if (m == 0L) {
          s.range(0)
            .select(
              col("id").as("pq"),
              col("id").as("mass_target"),
              col("id").as("threshold_tokens"),
              col("id").as("docs_cum"),
              col("id").as("mass_cum")
            )
        } else {
          val ow = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
          val offsets = meta
            .withColumn("off", coalesce(sum(col("pcnt")).over(ow), lit(0L)))
            .withColumn("woff", coalesce(sum(col("pmass")).over(ow), lit(0L)))
            .select(col("pid"), col("off"), col("woff"))
          val rw = Window
            .partitionBy(col("pid"))
            .orderBy(col("loc"))
            .rowsBetween(Window.unboundedPreceding, 0)
          val cum = base
            .join(broadcast(offsets), Seq("pid"))
            .withColumn("cum", col("woff") + sum(col("n")).over(rw))
            .withColumn("rk", col("off") + col("loc") + 1L)
          val targets = Seq(50L, 90L).map(pq => (pq, (pq * m + 99L) / 100L))
          val qframe = targets
            .map { case (pq, t) =>
              s"SELECT CAST($pq AS BIGINT) AS pq, CAST($t AS BIGINT) AS mass_target"
            }
            .mkString(" UNION ALL ")
          cum
            .join(broadcast(s.sql(qframe)))
            .filter(col("cum") >= col("mass_target") && col("cum") - col("n") < col("mass_target"))
            .select(
              col("pq"),
              col("mass_target"),
              col("n").as("threshold_tokens"),
              col("rk").as("docs_cum"),
              col("cum").as("mass_cum")
            )
            .orderBy(col("pq"))
        }
      },
      Some("""WITH d AS (
             |  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |r AS (SELECT n, row_number() OVER (ORDER BY n, doc_id) AS rk,
             |        sum(n) OVER (ORDER BY n, doc_id ROWS UNBOUNDED PRECEDING) AS cum
             |      FROM d),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS m FROM d),
             |q AS (SELECT CAST(unnest([50, 90]) AS BIGINT) AS pq)
             |SELECT pq, CAST((pq * m + 99) // 100 AS BIGINT) AS mass_target,
             |  n AS threshold_tokens, CAST(rk AS BIGINT) AS docs_cum,
             |  CAST(cum AS BIGINT) AS mass_cum
             |FROM r, t, q
             |WHERE cum >= (pq * m + 99) // 100 AND cum - n < (pq * m + 99) // 100
             |ORDER BY pq""".stripMargin)
    ),

    // Kolmogorov–Smirnov source-vs-rest length drift: the max CDF gap
    // between each source's document-length distribution and the rest of
    // the corpus, in exact integer basis points — the ORDINAL
    // distribution-equality test beside q155's categorical TVD (a source
    // whose lengths drift can poison packing and truncation budgets even
    // when its event mix is stable). Exactness: the K-S sup is attained
    // right after a CDF jump, so evaluating |cum_s·N_r − cum_r·N_s| at
    // every DISTINCT length (cross-multiplied counts — never a float
    // CDF) is the exact statistic. Scale shape: the corpus reduces to
    // (source, length) counts; the evaluation grid is sources ×
    // distinct lengths — METADATA (whitelisted broadcast of the length
    // grid), with running sums as windows over bounded length metadata
    // per source; no corpus re-scan, no float.
    Q(
      "q173_ks_length_drift",
      (s, d) => {
        val sl = Caches.persisted(
          documents(s, d)
            .select(col("source"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
            .groupBy(col("source"), col("n"))
            .agg(count(lit(1)).as("c"))
        )
        val lw = Window.orderBy(col("n")).rowsBetween(Window.unboundedPreceding, 0)
        val lens = sl
          .groupBy(col("n"))
          .agg(sum(col("c")).as("tot"))
          .withColumn("cum_all", sum(col("tot")).over(lw))
          .select(col("n"), col("cum_all"))
        val perSource = sl.groupBy(col("source")).agg(sum(col("c")).as("ns"))
        val total = perSource.agg(coalesce(sum(col("ns")), lit(0L))).head().getLong(0)
        val sw = Window
          .partitionBy(col("source"))
          .orderBy(col("n"))
          .rowsBetween(Window.unboundedPreceding, 0)
        perSource
          .join(broadcast(lens))
          .join(sl, Seq("source", "n"), "left")
          .withColumn("cum_s", sum(coalesce(col("c"), lit(0L))).over(sw))
          .withColumn("cum_r", col("cum_all") - col("cum_s"))
          .groupBy(col("source"))
          .agg(
            max(col("ns")).as("docs"),
            max(abs(col("cum_s") * (lit(total) - col("ns")) - col("cum_r") * col("ns")))
              .as("ks_num")
          )
          .select(
            col("source"),
            col("docs"),
            when(
              col("docs") > 0L && col("docs") < total,
              expr(s"ks_num * 10000 div (docs * ($total - docs))")
            ).cast("long").as("ks_bp")
          )
          .orderBy(col("source"))
      },
      Some("""WITH sl AS (
             |  SELECT source, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1, 2),
             |lens AS (SELECT n, CAST(sum(tot) OVER (ORDER BY n ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_all
             |         FROM (SELECT n, sum(c) AS tot FROM sl GROUP BY n) t),
             |ps AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sl GROUP BY 1),
             |tt AS (SELECT CAST(sum(ns) AS BIGINT) AS total FROM ps),
             |grid AS (
             |  SELECT ps.source, ps.ns, lens.n, lens.cum_all,
             |    CAST(sum(coalesce(sl.c, 0)) OVER (PARTITION BY ps.source ORDER BY lens.n
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s
             |  FROM ps CROSS JOIN lens
             |  LEFT JOIN sl ON sl.source = ps.source AND sl.n = lens.n)
             |SELECT source, max(ns) AS docs,
             |  CASE WHEN max(ns) > 0 AND max(ns) < (SELECT total FROM tt)
             |       THEN CAST(max(abs(cum_s * ((SELECT total FROM tt) - ns)
             |              - (cum_all - cum_s) * ns)) * 10000
             |         // (max(ns) * ((SELECT total FROM tt) - max(ns))) AS BIGINT)
             |       ELSE NULL END AS ks_bp
             |FROM grid
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Exact AUC of the classifier gate against an external label — the
    // Mann–Whitney U formulation with midrank tie handling, kept entirely
    // in int64 by carrying 2×midrank (a tie group's doubled midrank is
    // first+last, an integer): AUC = (2R₊ − n₊(n₊+1)) / (2·n₊·n₋). Where
    // q162's decile table shows the calibration CURVE, this is the single
    // threshold-free ranking-quality number — and the exactness matters
    // because hashed-gate scores tie heavily, where a naive rank AUC is
    // off by the tie mass. The binary label joins from the embeddings
    // table (label < 5, the deterministic split; doc_id == vec_id in
    // this corpus). Scale shape: one scoring pass (the q142 plan), one
    // per-score aggregate, and the rank algebra runs on DISTINCT-SCORE
    // metadata (the hashed gate's score range is bounded by weight
    // magnitudes, not corpus size) under an ordered metadata window —
    // never a corpus-wide rank window.
    Q(
      "q174_gate_auc",
      (s, d) => {
        val scored = classifierScores(
          s,
          documents(s, d).select(col("doc_id"), TextOps.tokens(col("text")).as("tok"))
        )
        val labeled = scored
          .join(
            embeddings(s, d).select(col("vec_id").as("doc_id"), (col("label") < 5).as("pos")),
            "doc_id"
          )
        val byScore = labeled
          .groupBy(col("score"))
          .agg(
            count(lit(1)).as("n_s"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("pos_s")
          )
        val ow = Window.orderBy(col("score")).rowsBetween(Window.unboundedPreceding, -1)
        val agg = byScore
          .withColumn("cum_prev", coalesce(sum(col("n_s")).over(ow), lit(0L)))
          .agg(
            coalesce(sum(col("pos_s") * (lit(2L) * col("cum_prev") + col("n_s") + 1L)), lit(0L))
              .as("r2"),
            coalesce(sum(col("pos_s")), lit(0L)).as("n_pos"),
            coalesce(sum(col("n_s") - col("pos_s")), lit(0L)).as("n_neg")
          )
          .head()
        val r2 = agg.getLong(0)
        val nPos = agg.getLong(1)
        val nNeg = agg.getLong(2)
        val u2 = r2 - nPos * (nPos + 1L)
        s.range(1)
          .select(
            lit(nPos).as("n_pos"),
            lit(nNeg).as("n_neg"),
            lit(u2).as("u2"),
            lit(if (nPos == 0L || nNeg == 0L) null else u2 * 10000L / (2L * nPos * nNeg))
              .cast("long")
              .as("auc_bp")
          )
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
              |  FROM documents),
              |b AS (SELECT doc_id, $sqlClassifierBucketExpr AS bucket FROM tok),
              |$sqlClassifierWeightCte,
              |ds AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score
              |       FROM b JOIN w USING (bucket) GROUP BY doc_id),
              |lab AS (SELECT ds.score, (e.label < 5) AS pos
              |        FROM ds JOIN embeddings e ON e.vec_id = ds.doc_id),
              |g AS (SELECT score, CAST(count(*) AS BIGINT) AS n_s,
              |        CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_s
              |      FROM lab GROUP BY score),
              |c AS (SELECT n_s, pos_s,
              |        CAST(coalesce(sum(n_s) OVER (ORDER BY score
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_prev
              |      FROM g),
              |f AS (SELECT CAST(coalesce(sum(pos_s * (2 * cum_prev + n_s + 1)), 0) AS BIGINT) AS r2,
              |        CAST(coalesce(sum(pos_s), 0) AS BIGINT) AS n_pos,
              |        CAST(coalesce(sum(n_s - pos_s), 0) AS BIGINT) AS n_neg
              |      FROM c)
              |SELECT n_pos, n_neg, r2 - n_pos * (n_pos + 1) AS u2,
              |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
              |       ELSE CAST((r2 - n_pos * (n_pos + 1)) * 10000
              |         // (2 * n_pos * n_neg) AS BIGINT) END AS auc_bp
              |FROM f""".stripMargin)
    ),

    // Pearson chi-square independence screen between two categorical
    // columns (source × lang): is language mix homogeneous across crawl
    // sources, or does a source skew the mixture? Uses the algebraic
    // identity chi2 = Σ_observed o²·N/(r·c) − N, which needs ONLY the
    // observed cells — empty cells contribute o²/e = 0 — so no cross
    // join materializing the full contingency grid is ever built. The
    // whole computation is three metadata aggregates off one tiny
    // (source, lang, count) cell table plus broadcast rejoins; the only
    // corpus-width work is the first groupBy. Exact int64 throughout:
    // per-cell terms floor-scaled ×10000 (the documented convention —
    // both engines floor identically), dof = (R−1)(C−1).
    Q(
      "q176_chi2_independence",
      (s, d) => {
        val cells = documents(s, d)
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("obs"))
        val r = cells.groupBy("source").agg(sum("obs").as("r_tot"))
        val c = cells.groupBy("lang").agg(sum("obs").as("c_tot"))
        val tot = cells.agg(sum("obs").as("n"))
        cells
          .join(broadcast(r), "source")
          .join(broadcast(c), "lang")
          .crossJoin(broadcast(tot))
          // obs²·n·10⁴ ~ n³·10⁴ for a dominant cell — past ~97k docs the
          // int64 product wraps, so it rides DECIMAL(38,0) (HUGEINT in
          // DuckDB); each floored cell term is ≤ 10⁴·n and returns to int64
          .withColumn(
            "cx",
            expr("CAST((CAST(obs AS DECIMAL(38,0)) * obs * n * 10000) div (r_tot * c_tot) AS BIGINT)")
          )
          .agg(
            max(col("n")).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("cx")).as("cx_sum")
          )
          .select(
            col("n_docs"),
            col("n_sources"),
            col("n_langs"),
            ((col("n_sources") - 1L) * (col("n_langs") - 1L)).as("dof"),
            (col("cx_sum") - lit(10000L) * col("n_docs")).as("chi2_x10000")
          )
      },
      Some("""WITH cells AS (
             |  SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
             |  FROM documents GROUP BY source, lang),
             |r AS (SELECT source, CAST(sum(obs) AS BIGINT) AS r_tot
             |      FROM cells GROUP BY source),
             |c AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS c_tot
             |      FROM cells GROUP BY lang),
             |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells),
             |cell AS (
             |  SELECT source, cells.lang, obs,
             |    CAST((CAST(obs AS HUGEINT) * obs * n * 10000)
             |      // (r_tot * c_tot) AS BIGINT) AS cx
             |  FROM cells JOIN r USING (source) JOIN c USING (lang) CROSS JOIN t)
             |SELECT max(n) AS n_docs,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |  CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)
             |    AS BIGINT) AS dof,
             |  CAST(sum(cx) - 10000 * max(n) AS BIGINT) AS chi2_x10000
             |FROM cell CROSS JOIN t""".stripMargin)
    ),

    // k-anonymity audit over quasi-identifier columns (nation ×
    // market segment on customer): how many equivalence classes fall
    // below each candidate k, and what share of rows they expose — the
    // privacy gate run before releasing curated metadata. One corpus
    // groupBy builds the class-size table; the k sweep is a literal
    // explode over the metadata-sized class table (classes × 4 rows),
    // never re-scanning the corpus.
    Q(
      "q178_k_anonymity",
      (s, d) => {
        val g = table(s, d, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("sz"))
        g.select(explode(array(lit(2), lit(5), lit(10), lit(25))).as("k"), col("sz"))
          .groupBy(col("k"))
          .agg(
            count(lit(1)).as("classes"),
            sum(when(col("sz") < col("k"), 1L).otherwise(0L)).as("violating_classes"),
            sum(when(col("sz") < col("k"), col("sz")).otherwise(0L)).as("exposed_rows"),
            sum(col("sz")).as("rows_total")
          )
          .withColumn("exposed_bp", expr("(exposed_rows * 10000L) div rows_total"))
          .orderBy(col("k"))
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS sz
             |  FROM customer GROUP BY 1, 2),
             |e AS (SELECT CAST(k AS INTEGER) AS k, sz
             |      FROM g CROSS JOIN (SELECT unnest([2, 5, 10, 25]) AS k) kk)
             |SELECT k, count(*) AS classes,
             |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
             |    AS violating_classes,
             |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
             |    AS exposed_rows,
             |  CAST(sum(sz) AS BIGINT) AS rows_total,
             |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) * 10000
             |    // sum(sz) AS BIGINT) AS exposed_bp
             |FROM e
             |GROUP BY k
             |ORDER BY k""".stripMargin)
    ),

    // l-diversity audit — q178's k-anonymity only counts CLASS SIZES; a
    // class can hold 100 rows that all share one sensitive value, so a
    // linkage attacker learns the attribute anyway (the homogeneity
    // attack, Machanavajjhala et al. 2007). Here each quasi-identifier
    // class (nation, segment) is scored by its count of DISTINCT
    // sensitive values (account balance in $1000 buckets); classes with
    // fewer than l distinct values violate l-diversity, swept over
    // l ∈ {2, 3, 5}. Scale shape: one grouped distinct-aggregate over
    // the QI key (map-side partial), then a literal explode over class
    // METADATA — the corpus is scanned once, the sweep costs |classes|·3.
    Q(
      "q211_l_diversity",
      (s, d) => {
        val g = table(s, d, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(
            countDistinct(expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000")).as("lv"),
            count(lit(1)).as("sz")
          )
        g.select(explode(array(lit(2), lit(3), lit(5))).as("l"), col("lv"), col("sz"))
          .groupBy(col("l"))
          .agg(
            count(lit(1)).as("classes"),
            sum(when(col("lv") < col("l"), 1L).otherwise(0L)).as("violating_classes"),
            sum(when(col("lv") < col("l"), col("sz")).otherwise(0L)).as("exposed_rows"),
            sum(col("sz")).as("rows_total")
          )
          .withColumn("exposed_bp", expr("(exposed_rows * 10000L) div rows_total"))
          .orderBy(col("l"))
      },
      Some("""WITH g AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(count(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) // 100000)
             |      AS BIGINT) AS lv,
             |    CAST(count(*) AS BIGINT) AS sz
             |  FROM customer GROUP BY 1, 2),
             |e AS (SELECT CAST(l AS INTEGER) AS l, lv, sz
             |      FROM g CROSS JOIN (SELECT unnest([2, 3, 5]) AS l) ll)
             |SELECT l, count(*) AS classes,
             |  CAST(sum(CASE WHEN lv < l THEN 1 ELSE 0 END) AS BIGINT)
             |    AS violating_classes,
             |  CAST(sum(CASE WHEN lv < l THEN sz ELSE 0 END) AS BIGINT)
             |    AS exposed_rows,
             |  CAST(sum(sz) AS BIGINT) AS rows_total,
             |  CAST(sum(CASE WHEN lv < l THEN sz ELSE 0 END) * 10000
             |    // sum(sz) AS BIGINT) AS exposed_bp
             |FROM e
             |GROUP BY l
             |ORDER BY l""".stripMargin)
    ),

    // Exact Spearman rank correlation between two per-document signals
    // (n_chars vs token count) WITHOUT a single-reducer sort: each
    // signal's global rank comes from the q135/q91 range-partition trick
    // — repartitionByRange + local sort + monotonically_increasing_id,
    // with only 32 (pid, offset) metadata rows crossing partitions — then
    // one join on doc_id and one Σd² aggregate. Monotone-transform-robust
    // where q145's Pearson is not (outliers in either signal can't move
    // ranks more than one slot each). Ranks use the (value, doc_id) TOTAL
    // order (deterministic tie-break, not average ranks — the convention
    // both engines share); ρ_bp = 10000 − 6·10⁴·Σd²/(n(n²−1)) with the
    // division kept on the non-negative term so floor == truncate.
    Q(
      "q182_spearman",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val base = Caches.persisted(
          documents(s, d).select(
            col("doc_id"),
            col("n_chars").cast("long").as("a"),
            size(toks).cast("long").as("bt")
          )
        )
        globalRanks(base, "a", "rka")
          .join(globalRanks(base, "bt", "rkb"), "doc_id")
          .select((col("rka") - col("rkb")).as("dd"))
          .agg(count(lit(1)).as("n"), sum(col("dd") * col("dd")).as("sum_d2"))
          // 60000·Σd² reaches 2·10⁴·n³ (anti-correlation) and overflows
          // int64 past ~77k rows — the product rides DECIMAL(38,0)
          // (DuckDB: HUGEINT), exact to n ≈ 10¹¹, and only the ≤2·10⁴
          // quotient returns to int64
          .withColumn(
            "rho_bp",
            expr(
              "10000L - CAST((CAST(60000 AS DECIMAL(38,0)) * sum_d2)" +
                " div (CAST(n AS DECIMAL(38,0)) * n * n - n) AS BIGINT)"
            )
          )
      },
      Some("""WITH b AS (
             |  SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS bt
             |  FROM documents),
             |ra AS (SELECT doc_id,
             |         CAST(row_number() OVER (ORDER BY a, doc_id) AS BIGINT) AS rka
             |       FROM b),
             |rb AS (SELECT doc_id,
             |         CAST(row_number() OVER (ORDER BY bt, doc_id) AS BIGINT) AS rkb
             |       FROM b),
             |j AS (SELECT rka - rkb AS dd FROM ra JOIN rb USING (doc_id)),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(dd * dd) AS BIGINT) AS sum_d2
             |      FROM j)
             |SELECT n, sum_d2,
             |  10000 - CAST((CAST(60000 AS HUGEINT) * sum_d2)
             |    // (CAST(n AS HUGEINT) * n * n - n) AS BIGINT) AS rho_bp
             |FROM s""".stripMargin)
    ),

    // Joint length × quality decile grid: the 2-D view whose 1-D
    // marginals are q156's equi-depth bins and whose single-number
    // summary is q182's Spearman — off-diagonal mass shows WHERE the
    // length-quality confound lives (e.g. short docs crowding the top
    // quality deciles because the length term saturates), which decides
    // whether gates need decoupling. Both decile assignments ride the
    // exact range-partition rank recovery (no single-reducer sort);
    // decile = (rank−1)·10 / n is exact integer.
    Q(
      "q196_joint_deciles",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val base = Caches.persisted(
          documents(s, d).select(
            col("doc_id"),
            col("n_chars").cast("long").as("len"),
            TextOps.qualityScore10k(toks).cast("long").as("q")
          )
        )
        val n = base.count()
        globalRanks(base, "len", "rkl")
          .join(globalRanks(base, "q", "rkq"), "doc_id")
          .select(
            expr(s"((rkl - 1L) * 10L) div ${n}L").as("len_decile"),
            expr(s"((rkq - 1L) * 10L) div ${n}L").as("q_decile")
          )
          .groupBy(col("len_decile"), col("q_decile"))
          .agg(count(lit(1)).as("docs"))
          .orderBy(col("len_decile"), col("q_decile"))
      },
      Some(s"""WITH b AS (
              |  SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
              |    CAST(${TextOps.sqlQuality10k("string_split_regex(trim(text), '\\s+')")}
              |      AS BIGINT) AS q
              |  FROM documents),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
              |rl AS (SELECT doc_id,
              |         CAST(row_number() OVER (ORDER BY len, doc_id) AS BIGINT) AS rkl
              |       FROM b),
              |rq AS (SELECT doc_id,
              |         CAST(row_number() OVER (ORDER BY q, doc_id) AS BIGINT) AS rkq
              |       FROM b)
              |SELECT ((rkl - 1) * 10) // n AS len_decile,
              |  ((rkq - 1) * 10) // n AS q_decile,
              |  count(*) AS docs
              |FROM rl JOIN rq USING (doc_id) CROSS JOIN n
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Cohen's kappa between two independent quality raters — the
    // heuristic gate (length/stopword score ≥ 0.5, q22's formula) and the
    // hash-classifier gate (q174's bucket-weight scorer, positive score)
    // — chance-corrected agreement, the label-quality audit run before
    // trusting any single filter. Everything beyond the per-doc scoring
    // passes is a 2×2 confusion matrix: po and pe ride cleared
    // denominators (·n, ·n²), the kappa quotient keeps its sign outside
    // the division for clarity (Spark div and DuckDB // both truncate
    // toward zero, so a signed division would also agree),
    // and pe = 1 (degenerate raters) reports 0 instead of dividing by 0.
    Q(
      "q183_rater_kappa",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val scored = classifierScores(
          s,
          documents(s, d).select(col("doc_id"), TextOps.tokens(col("text")).as("tok"))
        )
        documents(s, d)
          .select(col("doc_id"), (TextOps.qualityScore10k(toks) >= 5000).as("a"))
          .join(scored, "doc_id")
          .select(col("a"), (col("score") > 0L).as("b"))
          .agg(
            sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
            sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
            sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
            sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00")
          )
          .withColumn("n", expr("n11 + n10 + n01 + n00"))
          .withColumn("po_bp", expr("((n11 + n00) * 10000L) div n"))
          .withColumn("pe_x", expr("(n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)"))
          .withColumn("num", expr("(n11 + n00) * n - pe_x"))
          .withColumn("den", expr("n * n - pe_x"))
          .withColumn(
            "kappa_bp",
            when(col("den") === 0L, 0L).otherwise(
              when(col("num") < 0L, -1L).otherwise(lit(1L)) *
                expr("(abs(num) * 10000L) div den")
            )
          )
          .select(col("n11"), col("n10"), col("n01"), col("n00"), col("po_bp"), col("kappa_bp"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents),
              |tb AS (SELECT doc_id, unnest(ts) AS t FROM tok),
              |bkt AS (SELECT doc_id, $sqlClassifierBucketExpr AS bucket FROM tb),
              |$sqlClassifierWeightCte,
              |sc AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score
              |       FROM bkt JOIN w USING (bucket) GROUP BY doc_id),
              |g AS (SELECT (${TextOps.sqlQuality10k("ts")} >= 5000) AS a,
              |        (score > 0) AS b
              |      FROM tok JOIN sc USING (doc_id)),
              |m AS (SELECT
              |  CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
              |  CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
              |  CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
              |  CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
              |  FROM g),
              |k AS (SELECT n11, n10, n01, n00,
              |        n11 + n10 + n01 + n00 AS n,
              |        (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS pe_x
              |      FROM m)
              |SELECT n11, n10, n01, n00,
              |  ((n11 + n00) * 10000) // n AS po_bp,
              |  CASE WHEN n * n - pe_x = 0 THEN 0
              |       ELSE (CASE WHEN (n11 + n00) * n - pe_x < 0 THEN -1 ELSE 1 END)
              |         * (abs((n11 + n00) * n - pe_x) * 10000 // (n * n - pe_x))
              |  END AS kappa_bp
              |FROM k""".stripMargin)
    ),

    // CUSUM control chart over per-source quality in arrival (doc_id)
    // order: the sequential drift detector that catches a slow quality
    // slide long before a mean shift is visible in aggregate. The CUSUM
    // recurrence S_i = max(0, S_{i-1} + (x_i − target)) is nonlinear, but
    // linearizes exactly as S_i = P_i − min_{j≤i} P_j over the prefix sums
    // P of (x − target) — two RUNNING windows per source partition
    // (streamed, never buffering the frame), no recursion, exact int64.
    // Headline per source: worst upward and downward excursions plus the
    // net drift.
    Q(
      "q188_cusum_drift",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val w = Window
          .partitionBy(col("source"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        documents(s, d)
          .select(
            col("source"),
            col("doc_id"),
            (TextOps.qualityScore10k(toks).cast("long") - 5000L).as("x")
          )
          .withColumn("p", sum(col("x")).over(w))
          .withColumn("up", col("p") - min(col("p")).over(w))
          .withColumn("down", max(col("p")).over(w) - col("p"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            max(col("up")).as("max_up_cusum"),
            max(col("down")).as("max_down_cusum"),
            // net drift = the final prefix value = Σx
            sum(col("x")).as("net_drift")
          )
          .orderBy(col("source"))
      },
      Some(s"""WITH b AS (
              |  SELECT source, doc_id,
              |    CAST(${TextOps.sqlQuality10k("string_split_regex(trim(text), '\\s+')")}
              |      AS BIGINT) - 5000 AS x
              |  FROM documents),
              |pp AS (
              |  SELECT source, doc_id, x,
              |    sum(x) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
              |  FROM b),
              |c AS (
              |  SELECT source, x, p,
              |    p - min(p) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS up,
              |    max(p) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - p AS down
              |  FROM pp)
              |SELECT source, count(*) AS docs,
              |  CAST(max(up) AS BIGINT) AS max_up_cusum,
              |  CAST(max(down) AS BIGINT) AS max_down_cusum,
              |  CAST(sum(x) AS BIGINT) AS net_drift
              |FROM c
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Gate-funnel attrition: the per-source survival table through the
    // SEQUENTIAL quality gates (length → stopword ratio → classifier) —
    // the planning view that says where corpus mass dies and which
    // source a gate change would hit. Gates are evaluated in one corpus
    // scan as boolean columns and folded as nested conjunctions, so the
    // funnel is one aggregate, not one pass per stage; the classifier
    // score reuses q174's bucket-weight scorer (one explode + broadcast
    // join). Integer survival shares.
    Q(
      "q193_gate_funnel",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val scored = classifierScores(
          s,
          documents(s, d).select(col("doc_id"), TextOps.tokens(col("text")).as("tok"))
        )
        documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            (size(toks) >= 30).as("g1"),
            (TextOps.stopwordCount(toks) * 5 <= size(toks)).as("g2")
          )
          .join(scored, "doc_id")
          .withColumn("g3", col("score") > 0L)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(when(col("g1"), 1L).otherwise(0L)).as("pass_length"),
            sum(when(col("g1") && col("g2"), 1L).otherwise(0L)).as("pass_stopword"),
            sum(when(col("g1") && col("g2") && col("g3"), 1L).otherwise(0L)).as("pass_classifier")
          )
          .withColumn("survival_bp", expr("(pass_classifier * 10000L) div docs"))
          .orderBy(col("source"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS ts
              |  FROM documents),
              |tb AS (SELECT doc_id, unnest(ts) AS t FROM tok),
              |bkt AS (SELECT doc_id, $sqlClassifierBucketExpr AS bucket FROM tb),
              |$sqlClassifierWeightCte,
              |sc AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score
              |       FROM bkt JOIN w USING (bucket) GROUP BY doc_id),
              |g AS (SELECT source,
              |        (len(ts) >= 30) AS g1,
              |        (len(list_filter(ts, t -> t IN (${TextOps.stopwords
               .map("'" + _ + "'")
               .mkString(",")}))) * 5 <= len(ts)) AS g2,
              |        (score > 0) AS g3
              |      FROM tok JOIN sc USING (doc_id))
              |SELECT source, count(*) AS docs,
              |  CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_length,
              |  CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopword,
              |  CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS pass_classifier,
              |  CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) * 10000
              |    // count(*) AS BIGINT) AS survival_bp
              |FROM g
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Benford first-significant-digit audit of a monetary column: a
    // synthetic-data / fraud / unit-mixing canary — organically-grown
    // magnitudes follow log10(1+1/d); a uniform or truncated generator
    // shows up as a large deviation. The expected distribution is
    // hardcoded in basis points (no libm at query time, per the
    // cross-engine rules); the digit comes from the integer part's
    // decimal string (floor of a shared double is exact in both
    // engines). One scan → 9-row digit histogram → scalar-broadcast
    // total; everything after the first groupBy is metadata.
    Q(
      "q179_benford",
      (s, d) => {
        val benford =
          "CASE digit WHEN 1 THEN 3010L WHEN 2 THEN 1760L WHEN 3 THEN 1249L" +
            " WHEN 4 THEN 969L WHEN 5 THEN 791L WHEN 6 THEN 669L" +
            " WHEN 7 THEN 579L WHEN 8 THEN 511L ELSE 457L END"
        val obs = table(s, d, "orders")
          .select(
            expr(
              "cast(substring(cast(cast(floor(o_totalprice) as bigint) as string), 1, 1) as int)"
            ).as("digit")
          )
          .groupBy(col("digit"))
          .agg(count(lit(1)).as("obs"))
        val tot = obs.agg(sum("obs").as("n"))
        obs
          .crossJoin(broadcast(tot))
          .withColumn("obs_bp", expr("(obs * 10000L) div n"))
          .withColumn("benford_bp", expr(benford))
          .withColumn("dev_bp", abs(col("obs_bp") - col("benford_bp")))
          .select(col("digit"), col("obs"), col("obs_bp"), col("benford_bp"), col("dev_bp"))
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
             |    1, 1) AS INTEGER) AS digit
             |  FROM orders),
             |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY digit),
             |t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o)
             |SELECT digit, obs,
             |  CAST((obs * 10000) // n AS BIGINT) AS obs_bp,
             |  CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760 WHEN 3 THEN 1249
             |    WHEN 4 THEN 969 WHEN 5 THEN 791 WHEN 6 THEN 669 WHEN 7 THEN 579
             |    WHEN 8 THEN 511 ELSE 457 END AS BIGINT) AS benford_bp,
             |  abs(CAST((obs * 10000) // n AS BIGINT)
             |    - CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1760 WHEN 3 THEN 1249
             |      WHEN 4 THEN 969 WHEN 5 THEN 791 WHEN 6 THEN 669 WHEN 7 THEN 579
             |      WHEN 8 THEN 511 ELSE 457 END) AS dev_bp
             |FROM o CROSS JOIN t
             |ORDER BY digit""".stripMargin)
    ),

    // Day-of-week seasonal decomposition of ingest volume — the missing
    // piece between q157's lag-1 autocorrelation (is there ANY temporal
    // structure?) and q147's anomaly fence (which flags seasonal peaks as
    // anomalies unless the expected weekday level is subtracted first).
    // Per weekday: the seasonal index in basis points of a flat profile
    // (10000 = that weekday ingests exactly the uniform share) and the
    // count of days that deviate >25% from their OWN weekday's average —
    // i.e. residual outliers AFTER seasonal adjustment, the days a
    // capacity plan actually has to explain. Weekday is epoch-day mod 7
    // anchored at 2024-01-01 (a Monday): both engines subtract dates to
    // integer days, so no dependence on either engine's dayofweek
    // origin/locale convention. Shape: one fact pass reduces to per-day
    // counts; the 7-row weekday profile broadcasts back onto the daily
    // frame (equi-join) and the grand total is a 1-row scalar cross.
    // Integer envelope: total·days·10⁴ holds to ~10¹⁰ events across ~10⁴
    // days; beyond that move the index numerator to DECIMAL (q159 note).
    Q(
      "q228_dow_seasonality",
      (s, d) => {
        val daily = events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn(
            "dow",
            pmod(datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01"))), lit(7)).cast("long")
          )
        val prof = daily
          .groupBy(col("dow"))
          .agg(count(lit(1)).as("days"), sum(col("cnt")).as("total"))
        val grand = prof.agg(
          sum(col("days")).as("all_days"),
          sum(col("total")).as("grand")
        )
        val outliers = daily
          .join(broadcast(prof), Seq("dow"))
          .withColumn("dev_bp", expr("(cnt * days * 10000L) div total"))
          .filter(abs(col("dev_bp") - lit(10000L)) > 2500L)
          .groupBy(col("dow"))
          .agg(count(lit(1)).as("outlier_days"))
        prof
          .crossJoin(broadcast(grand))
          .join(outliers, Seq("dow"), "left")
          .select(
            col("dow"),
            col("days"),
            col("total"),
            expr("(total * all_days * 10000L) div (days * grand)").as("index_bp"),
            coalesce(col("outlier_days"), lit(0L)).as("outlier_days")
          )
          .orderBy(col("dow"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1),
             |dd AS (SELECT day, cnt,
             |         CAST(((day - DATE '2024-01-01') % 7 + 7) % 7 AS BIGINT) AS dow
             |       FROM daily),
             |prof AS (SELECT dow, CAST(count(*) AS BIGINT) AS days,
             |           CAST(sum(cnt) AS BIGINT) AS total
             |         FROM dd GROUP BY dow),
             |grand AS (SELECT CAST(sum(days) AS BIGINT) AS all_days,
             |            CAST(sum(total) AS BIGINT) AS grand FROM prof),
             |outl AS (SELECT dd.dow, CAST(count(*) AS BIGINT) AS outlier_days
             |         FROM dd JOIN prof USING (dow)
             |         WHERE abs((cnt * days * 10000) // total - 10000) > 2500
             |         GROUP BY dd.dow)
             |SELECT prof.dow, days, total,
             |  (total * all_days * 10000) // (days * grand) AS index_bp,
             |  coalesce(outlier_days, 0) AS outlier_days
             |FROM prof CROSS JOIN grand LEFT JOIN outl ON prof.dow = outl.dow
             |ORDER BY prof.dow""".stripMargin)
    ),

    // Total-variation distance between hour-of-day profiles of event
    // types — the drift metric the KS (q173) and χ² (q176) audits can't
    // give: TVD is the fraction of one distribution's mass that would
    // have to MOVE to match the other, directly interpretable as "how
    // differently is this event type timed". Unlike KL/JS divergences
    // (banned by the cross-engine log() rule, NOTES), TVD is pure
    // rational algebra: ½·Σ|p_a − p_b| over the 24 hour buckets =
    // Σ|cntₐ·T_b − cnt_b·Tₐ| · 5000 // (Tₐ·T_b) — one exact int64
    // division AFTER the exact numerator sum. Missing (type, hour) cells
    // count as zero mass, so the profile is zero-filled against a
    // |types|×24 broadcast grid before pairing (a type that never fires
    // at night must still pay that mass gap). Shape: one fact pass →
    // (type, hour) counts; everything after is metadata-sized (|types|·24
    // rows, |types|² pairs). Integer envelope: cnt·T ≤ ~3·10⁹ events
    // before the numerator product needs DECIMAL (q159 note).
    Q(
      "q231_tvd_drift",
      (s, d) => {
        val byHour = events(s, d)
          .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val totals = byHour
          .groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("total"))
        val grid = broadcast(totals)
          .crossJoin(broadcast(s.range(24).select(col("id").as("hr"))))
        val prof = grid
          .join(byHour, Seq("event_type", "hr"), "left")
          .select(
            col("event_type"),
            col("hr"),
            coalesce(col("cnt"), lit(0L)).as("cnt"),
            col("total")
          )
        val a = prof.select(
          col("event_type").as("type_a"),
          col("hr"),
          col("cnt").as("ca"),
          col("total").as("total_a")
        )
        val b = prof.select(
          col("event_type").as("type_b"),
          col("hr"),
          col("cnt").as("cb"),
          col("total").as("total_b")
        )
        a.join(b, Seq("hr"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"), col("total_a"), col("total_b"))
          .agg(sum(abs(col("ca") * col("total_b") - col("cb") * col("total_a"))).as("num"))
          .select(
            col("type_a"),
            col("type_b"),
            col("total_a"),
            col("total_b"),
            expr("(num * 5000L) div (total_a * total_b)").as("tvd_bp")
          )
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH c AS (
             |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total
             |      FROM c GROUP BY 1),
             |grid AS (SELECT event_type, total, CAST(h AS BIGINT) AS hr
             |         FROM t CROSS JOIN range(0, 24) r(h)),
             |prof AS (SELECT grid.event_type, grid.hr,
             |           coalesce(cnt, 0) AS cnt, total
             |         FROM grid LEFT JOIN c
             |           ON grid.event_type = c.event_type AND grid.hr = c.hr)
             |SELECT a.event_type AS type_a, b.event_type AS type_b,
             |  a.total AS total_a, b.total AS total_b,
             |  (CAST(sum(abs(a.cnt * b.total - b.cnt * a.total)) AS BIGINT) * 5000)
             |    // (a.total * b.total) AS tvd_bp
             |FROM prof a JOIN prof b
             |  ON a.hr = b.hr AND a.event_type < b.event_type
             |GROUP BY 1, 2, 3, 4
             |ORDER BY type_a, type_b""".stripMargin)
    ),

    // Cardinality-estimator audit: how wrong would a 32-bucket equi-depth
    // histogram (the stats object ANALYZE-style CBO row estimates come
    // from) be on this data? For three range predicates of very different
    // widths, estimate rows the way an optimizer does — per overlapping
    // bucket, cnt · overlap/width under the uniform-within-bucket
    // assumption, all integer cents so the interpolation is exact — and
    // compare against the true count. err_bp is the number that decides
    // whether join reordering on these stats can be trusted (the q148
    // fanout prediction consumes exactly this kind of estimate). The
    // histogram rides the q156/q135 range-partition machinery (no global
    // window); everything downstream of the 32-row histogram is metadata
    // (32 buckets × 3 predicates).
    Q(
      "q234_selectivity_audit",
      (s, d) => {
        val base = Caches.persisted(
          orders(s, d)
            .select(
              expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("v"),
              col("o_orderkey")
            )
            .repartitionByRange(32, col("v"), col("o_orderkey"))
            .sortWithinPartitions(col("v"), col("o_orderkey"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val tot = base.agg(count(lit(1)).as("n"))
        val ow = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
        val offsets = base
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("pcnt"))
          .withColumn("off", coalesce(sum(col("pcnt")).over(ow), lit(0L)))
          .select(col("pid"), col("off"))
        val hist = base
          .join(broadcast(offsets), Seq("pid"))
          .crossJoin(broadcast(tot))
          .select(expr("(off + loc) * 32L div n").as("bucket"), col("v"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"), min(col("v")).as("lo"), max(col("v")).as("hi"))
        // three predicate widths in cents: ~1%, ~10%, ~50% of the price axis
        val preds = s
          .createDataFrame(
            Seq(
              ("narrow", 10000000L, 10500000L),
              ("medium", 10000000L, 15000000L),
              ("wide", 10000000L, 35000000L)
            )
          )
          .toDF("pred", "p_lo", "p_hi")
        val est = hist
          .crossJoin(broadcast(preds))
          .select(
            col("pred"),
            col("p_lo"),
            col("p_hi"),
            expr(
              """cnt * greatest(0L, least(hi, p_hi) - greatest(lo, p_lo) + 1L)
                |  div (hi - lo + 1L)""".stripMargin
            ).as("part")
          )
          .groupBy(col("pred"), col("p_lo"), col("p_hi"))
          .agg(sum(col("part")).as("est_rows"))
        val truth = base
          .crossJoin(broadcast(preds))
          .filter(col("v") >= col("p_lo") && col("v") <= col("p_hi"))
          .groupBy(col("pred"))
          .agg(count(lit(1)).as("true_rows"))
        est
          .join(truth, Seq("pred"))
          .select(
            col("pred"),
            col("est_rows"),
            col("true_rows"),
            expr("abs(est_rows - true_rows) * 10000L div true_rows").as("err_bp")
          )
          .orderBy(col("pred"))
      },
      Some("""WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
             |    o_orderkey FROM orders),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
             |r AS (SELECT v, CAST(row_number()
             |        OVER (ORDER BY v, o_orderkey) AS BIGINT) AS rk FROM c),
             |hist AS (SELECT (rk - 1) * 32 // n AS bucket,
             |    CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
             |  FROM r CROSS JOIN s GROUP BY 1),
             |preds AS (SELECT * FROM (VALUES
             |    ('narrow', 10000000, 10500000),
             |    ('medium', 10000000, 15000000),
             |    ('wide',   10000000, 35000000)) p(pred, p_lo, p_hi)),
             |est AS (SELECT pred, p_lo, p_hi,
             |    CAST(sum(cnt * greatest(0, least(hi, p_hi) - greatest(lo, p_lo) + 1)
             |      // (hi - lo + 1)) AS BIGINT) AS est_rows
             |  FROM hist CROSS JOIN preds GROUP BY 1, 2, 3),
             |tr AS (SELECT pred, CAST(count(*) AS BIGINT) AS true_rows
             |  FROM c CROSS JOIN preds WHERE v BETWEEN p_lo AND p_hi GROUP BY 1)
             |SELECT pred, est_rows, true_rows,
             |  abs(est_rows - true_rows) * 10000 // true_rows AS err_bp
             |FROM est JOIN tr USING (pred)
             |ORDER BY pred""".stripMargin)
    )
  )
}
