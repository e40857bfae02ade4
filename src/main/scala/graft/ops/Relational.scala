package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface (SURVEY.md §2.9 E1–E12): scan, project/filter,
  * joins (broadcast / sort-merge / semi / anti), keyed aggregates, distinct,
  * windows/top-k, event-time bucketing, sessionization.
  *
  * Broadway itself has no relational algebra (SURVEY §2.8) — these are the
  * idiomatic Spark closure of its per-message transform (`handle_message`,
  * reference lib/broadway.ex:949-999), routing (`put_batcher`,
  * lib/broadway/message.ex:90-96) and batch-grouping
  * (lib/broadway/topology/batcher_stage.ex:106-257) semantics over the
  * driver's star-schema testdata.
  *
  * Scale notes (100 TB design intent):
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast —
  *    no shuffle of the fact table for star joins;
  *  - fact-fact joins (orders⋈lineitem) are shuffle hash/sort-merge on the
  *    join key, which is also the natural bucketing key at scale;
  *  - aggregates are partial (map-side combine) by construction via groupBy;
  *  - every filter is a deterministic Column expression so Catalyst pushes it
  *    into the Parquet scan.
  */
object Relational {

  import Tables._

  /** Generic k-step ordered funnel over an event frame with columns
    * (user_id, event_type, ts): stage k's survivors are the keys whose
    * first `steps(k)` hit is strictly after their stage-(k-1) first hit.
    * Returns one survivor frame per stage as (user_id, t). Every stage is
    * an equi-join + min aggregate on user_id — bucket the event table by
    * user_id and the whole chain is exchange-free at scale. Streaming
    * twin: graft.streaming.FunnelStream (same first-hit semantics).
    */
  def funnelStages(ev: DataFrame, steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.foldLeft(Vector.empty[DataFrame]) { (acc, step) =>
      val hits = ev.filter(col("event_type") === step)
      val stage = acc.lastOption match {
        case None =>
          hits.groupBy(col("user_id")).agg(min(col("ts")).as("t"))
        case Some(prev) =>
          hits
            .join(prev.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
            .filter(col("ts") > col("t_prev"))
            .groupBy(col("user_id"))
            .agg(min(col("ts")).as("t"))
      }
      acc :+ stage
    }
  }

  // Deterministic rounding applied on BOTH sides (Spark + DuckDB oracle) so
  // double accumulation order (which differs across engines/partitionings)
  // cannot flip the driver's hash compare. Sums of ~1e6-magnitude doubles
  // agree to ~1e-9 relative, so 2-4 decimals is far from the noise floor.

  val queries: Seq[Q] = Seq(

    // Sweep-line temporal concurrency: how many sessions are OPEN in each
    // hour — the interval-overlap aggregation (peak-load / capacity
    // planning) that a point-in-interval join (q84) cannot answer without
    // joining every timestamp against every interval. Sessions (30-min
    // gap rule, q12's definition extended with per-user session ids)
    // reduce to ±1 deltas at their start/end hours; the running sum over
    // the CHANGE-POINT hours — bounded by calendar hours, metadata-sized
    // like q157's daily grid — is the concurrency step function. O(n)
    // in events, never O(intervals × probes).
    Q(
      "q197_concurrency",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val sess = events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn(
            "ns",
            when(
              col("prev_us").isNull ||
                unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000,
              1L
            ).otherwise(0L)
          )
          .withColumn("sid", sum(col("ns")).over(byUser))
          .groupBy(col("user_id"), col("sid"))
          .agg(
            min(unix_micros(col("ts"))).as("s_us"),
            max(unix_micros(col("ts"))).as("e_us")
          )
        val deltas = sess
          .select(expr("s_us div 3600000000L").as("hour_bucket"), lit(1L).as("d"))
          .unionAll(
            sess.select(expr("e_us div 3600000000L + 1L").as("hour_bucket"), lit(-1L).as("d"))
          )
        val w = Window.orderBy(col("hour_bucket")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        deltas
          .groupBy(col("hour_bucket"))
          .agg(sum(col("d")).as("delta"))
          .withColumn("concurrent", sum(col("delta")).over(w))
          .orderBy(col("hour_bucket"))
      },
      Some("""WITH t1 AS (
             |  SELECT user_id, event_id, ts,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |      AS prev_us
             |  FROM events),
             |t2 AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
             |         THEN 1 ELSE 0 END AS ns
             |  FROM t1),
             |t3 AS (
             |  SELECT user_id, ts,
             |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
             |  FROM t2),
             |sess AS (
             |  SELECT user_id, sid,
             |    CAST(min(epoch_us(ts)) AS BIGINT) AS s_us,
             |    CAST(max(epoch_us(ts)) AS BIGINT) AS e_us
             |  FROM t3 GROUP BY 1, 2),
             |d AS (
             |  SELECT s_us // 3600000000 AS hour_bucket, 1 AS dd FROM sess
             |  UNION ALL
             |  SELECT e_us // 3600000000 + 1, -1 FROM sess),
             |bh AS (SELECT hour_bucket, CAST(sum(dd) AS BIGINT) AS delta
             |       FROM d GROUP BY hour_bucket)
             |SELECT hour_bucket, delta,
             |  CAST(sum(delta) OVER (ORDER BY hour_bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS concurrent
             |FROM bh
             |ORDER BY hour_bucket""".stripMargin)
    ),

    // Last-touch revenue attribution THROUGH the native as-of operator
    // (plans/AsOfJoinExec) in left-outer mode: every purchase joins the
    // latest preceding click of the same user (inclusive, equal-ts click
    // counts, ties to the highest click id), unattributed purchases
    // null-extend — then a per-day rollup of purchase counts, attribution
    // rate and attributed revenue in exact cents. q180 proved the
    // operator == the rank oracle; this is the operator doing the job
    // it exists for, in its second physical shape (outer + aggregation
    // above it, exercising the null-extension path end-to-end).
    Q(
      "q195_attribution",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(
            col("event_id").as("click_id"),
            col("user_id").as("c_user"),
            col("ts").as("cts")
          )
        graft.plans.AsOf
          .asofJoin(
            purchases,
            clicks,
            Seq("user_id"),
            Seq("c_user"),
            "ts",
            "cts",
            rightTieBreak = Seq("click_id"),
            outer = true
          )
          .groupBy(to_date(col("ts")).as("day"))
          .agg(
            count(lit(1)).as("purchases"),
            sum(when(col("click_id").isNotNull, 1L).otherwise(0L)).as("attributed"),
            sum(
              when(
                col("click_id").isNotNull,
                expr("CAST(round(value * 100) AS BIGINT)")
              ).otherwise(0L)
            ).as("attributed_rev_cents"),
            sum(
              when(
                col("click_id").isNotNull,
                expr("(unix_micros(ts) - unix_micros(cts)) div 1000000L")
              ).otherwise(0L)
            ).as("lag_seconds")
          )
          .orderBy(col("day"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts, value FROM events
             |  WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT event_id AS click_id, user_id, ts AS cts FROM events
             |  WHERE event_type = 'click'),
             |m AS (
             |  SELECT p.event_id, p.user_id, p.ts, p.value, a.click_id, a.cts FROM p
             |  LEFT JOIN (
             |    SELECT * FROM (
             |      SELECT p2.event_id AS pe, c.click_id, c.cts,
             |        row_number() OVER (PARTITION BY p2.event_id
             |                           ORDER BY c.cts DESC, c.click_id DESC) AS rk
             |      FROM p p2 JOIN c ON c.user_id = p2.user_id AND c.cts <= p2.ts) t
             |    WHERE rk = 1) a ON a.pe = p.event_id)
             |SELECT CAST(ts AS DATE) AS day,
             |  count(*) AS purchases,
             |  CAST(sum(CASE WHEN click_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS attributed,
             |  CAST(sum(CASE WHEN click_id IS NOT NULL
             |    THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
             |    AS attributed_rev_cents,
             |  CAST(sum(CASE WHEN click_id IS NOT NULL
             |    THEN (epoch_us(ts) - epoch_us(cts)) // 1000000 ELSE 0 END) AS BIGINT)
             |    AS lag_seconds
             |FROM m
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Snapshot diff / reconciliation: compare two corpus states by
    // content hash per key — added, removed, modified, unchanged — the
    // audit run between dataset versions before retraining ("what
    // actually changed?"). The two states derive deterministically from
    // the one corpus (base drops doc_id ≡ 0 mod 7; current amends
    // doc_id ≡ 0 mod 11), so the oracle reproduces them exactly. Scale
    // shape: each side reduces to (key, md5) BEFORE the one full-outer
    // shuffle join — only two narrow columns ever move, never the
    // payloads.
    Q(
      "q194_snapshot_diff",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        val base = docs
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), md5(col("text")).as("hb"))
        val curr = docs
          .select(
            col("doc_id"),
            md5(
              when(col("doc_id") % 11 === 0, concat(col("text"), lit(" amended")))
                .otherwise(col("text"))
            ).as("hc")
          )
        base
          .join(curr, Seq("doc_id"), "full_outer")
          .agg(
            sum(when(col("hb").isNull, 1L).otherwise(0L)).as("added"),
            sum(when(col("hc").isNull, 1L).otherwise(0L)).as("removed"),
            sum(
              when(col("hb").isNotNull && col("hc").isNotNull && col("hb") =!= col("hc"), 1L)
                .otherwise(0L)
            ).as("modified"),
            sum(when(col("hb") === col("hc"), 1L).otherwise(0L)).as("unchanged")
          )
      },
      Some("""WITH base AS (
             |  SELECT doc_id, md5(text) AS hb FROM documents WHERE doc_id % 7 <> 0),
             |curr AS (
             |  SELECT doc_id,
             |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' amended' ELSE text END) AS hc
             |  FROM documents)
             |SELECT
             |  CAST(sum(CASE WHEN hb IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
             |  CAST(sum(CASE WHEN hc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
             |  CAST(sum(CASE WHEN hb IS NOT NULL AND hc IS NOT NULL AND hb <> hc
             |    THEN 1 ELSE 0 END) AS BIGINT) AS modified,
             |  CAST(sum(CASE WHEN hb = hc THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
             |FROM base FULL OUTER JOIN curr USING (doc_id)""".stripMargin)
    ),

    // Recency-weighted event volume with EXACT integer exponential decay:
    // weight = 2^(horizon − age_days) (one-day half-life over a 30-day
    // horizon, older mass decays to 0) — power-of-two decay turns the
    // usual float exp() into bit shifts, so the decayed mass is exact
    // int64 on both engines (the libm-free discipline). The shape is one
    // scan + one metadata aggregate; the newest-day anchor is a 1-row
    // scalar broadcast. The recency-biased sampling weight a
    // freshness-sensitive training mix uses.
    Q(
      "q187_recency_decay",
      (s, d) => {
        val ev = events(s, d).select(col("event_type"), to_date(col("ts")).as("day"))
        val anchor = ev.agg(max(col("day")).as("maxd"))
        ev.crossJoin(broadcast(anchor))
          .withColumn("age", datediff(col("maxd"), col("day")))
          .withColumn(
            "wt",
            expr("CASE WHEN age BETWEEN 0 AND 30 THEN shiftleft(1L, 30 - age) ELSE 0L END")
          )
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("events"),
            sum(col("wt")).as("decayed_mass"),
            sum(when(col("age") === 0, 1L).otherwise(0L)).as("newest_day_events")
          )
          .orderBy(col("event_type"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
             |a AS (SELECT max(day) AS maxd FROM ev)
             |SELECT event_type, count(*) AS events,
             |  CAST(sum(CASE WHEN date_diff('day', day, maxd) BETWEEN 0 AND 30
             |       THEN (CAST(1 AS BIGINT) << (30 - date_diff('day', day, maxd)))
             |       ELSE 0 END) AS BIGINT) AS decayed_mass,
             |  CAST(sum(CASE WHEN day = maxd THEN 1 ELSE 0 END) AS BIGINT)
             |    AS newest_day_events
             |FROM ev CROSS JOIN a
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)
    ),
    // E1+E6: full-scan grouped aggregate (TPC-H Q1 pricing summary).
    Q(
      "q01_pricing_summary",
      (s, d) =>
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // E2+E3: projection + selective filter (predicate pushdown to Parquet).
    Q(
      "q02_filter_project",
      (s, d) =>
        lineitem(s, d)
          .filter(
            col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24 &&
              col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          )
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice * l_discount, 4) AS disc_revenue
             |FROM lineitem
             |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
             |  AND l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // E11: broadcast dim join + fact-fact shuffle join, grouped revenue.
    Q(
      "q03_segment_revenue",
      (s, d) =>
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("line_count")
          )
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  count(*) AS line_count
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)
    ),

    // E11: 5-way star join through region→nation→customer (TPC-H Q5 shape).
    Q(
      "q04_region_nation_revenue",
      (s, d) =>
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)
    ),

    // E12: global top-k by aggregate (sort + limit after shuffle agg).
    Q(
      "q05_top_customers",
      (s, d) =>
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_custkey"))
          .limit(10),
      Some("""SELECT o_custkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_custkey
             |ORDER BY revenue DESC, o_custkey
             |LIMIT 10""".stripMargin)
    ),

    // E11: left-semi join (existence filter — dedup-style membership probe).
    Q(
      "q06_semi_join_big_spenders",
      (s, d) =>
        customer(s, d)
          .join(
            orders(s, d).filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"),
            "left_semi"
          )
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)
    ),

    // E11: left-anti join (absence filter).
    Q(
      "q07_anti_join_no_urgent",
      (s, d) =>
        customer(s, d)
          .join(
            orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"),
            "left_anti"
          )
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS cnt
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)
    ),

    // E12: top-k per group via ranking window.
    Q(
      "q08_topk_per_segment",
      (s, d) => {
        val w = Window
          .partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        customer(s, d)
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_mktsegment"), col("rk"))
      },
      Some("""SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
             |  FROM customer) t
             |WHERE rk <= 3
             |ORDER BY c_mktsegment, rk""".stripMargin)
    ),

    // E12: running-total window (ordered cumulative state per key).
    Q(
      "q09_running_order_total",
      (s, d) => {
        val w = Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orders(s, d)
          .filter(col("o_custkey") < 50)
          .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
          .select(col("o_custkey"), col("o_orderkey"), col("running_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
             |FROM orders
             |WHERE o_custkey < 50
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),

    // E6: exact distinct aggregation (shuffle on distinct key).
    Q(
      "q10_distinct_parts",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("distinct_parts"),
            countDistinct(col("l_suppkey")).as("distinct_supps")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  count(DISTINCT l_partkey) AS distinct_parts,
             |  count(DISTINCT l_suppkey) AS distinct_supps
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),

    // E5/E6: event-time bucketing (daily tumbling window over the stream table).
    Q(
      "q28_sliding_windows",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"))
          .agg(
            count(lit(1)).as("cnt"),
            round(sum(col("value")), 4).as("sum_value")
          )
          .select(col("w.start").as("w_start"), col("cnt"), col("sum_value"))
          .orderBy(col("w_start")),
      // Sliding (hopping) event-time windows: width 6h, slide 3h — every
      // event lands in exactly 2 windows. Oracle: epoch-anchored 3h buckets
      // (matching Spark's epoch-aligned window origin), each event emitted
      // into its bucket and the preceding one.
      Some("""WITH b AS (SELECT time_bucket(INTERVAL 3 HOURS, ts, TIMESTAMP '1970-01-01') AS tb, value
             |          FROM events),
             |w AS (SELECT tb AS w_start, value FROM b
             |      UNION ALL
             |      SELECT tb - INTERVAL 3 HOURS, value FROM b)
             |SELECT w_start, count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM w
             |GROUP BY w_start
             |ORDER BY w_start""".stripMargin)
    ),

    Q(
      "q11_events_daily",
      (s, d) =>
        events(s, d)
          .groupBy(
            date_trunc("day", col("ts")).as("day"),
            col("event_type")
          )
          .agg(
            count(lit(1)).as("cnt"),
            round(sum(col("value")), 4).as("sum_value"),
            round(avg(col("value")), 6).as("avg_value")
          )
          .orderBy(col("day"), col("event_type")),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             |  count(*) AS cnt,
             |  round(sum(value), 4) AS sum_value,
             |  round(avg(value), 6) AS avg_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY day, event_type""".stripMargin)
    ),

    // E7: sessionization — per-key event-time ordering with 30-min gap cut.
    // Exact integer µs arithmetic on both engines (unix_micros / epoch_us).
    Q(
      "q12_sessions",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn(
            "new_session",
            when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0)
          )
          .groupBy(col("user_id"))
          .agg(
            sum(col("new_session")).as("sessions"),
            count(lit(1)).as("events")
          )
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(sum(new_session) AS BIGINT) AS sessions, count(*) AS events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN prev_us IS NULL
             |              OR epoch_us(ts) - prev_us > 30 * 60 * 1000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM (
             |    SELECT user_id, ts,
             |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
             |    FROM events) t1) t2
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // E2: semi-structured extraction from the JSON props column.
    Q(
      "q13_json_extract",
      (s, d) =>
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(
            round(avg(col("k")), 4).as("avg_k"),
            max(col("k")).as("max_k"),
            count(lit(1)).as("cnt")
          )
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(avg(k), 4) AS avg_k, max(k) AS max_k, count(*) AS cnt
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |      FROM events) t
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)
    ),

    // E11+E6: correlated-existence aggregate (TPC-H Q4 shape).
    Q(
      "q14_priority_with_returns",
      (s, d) =>
        orders(s, d)
          .join(
            lineitem(s, d).filter(col("l_returnflag") === "R").select(col("l_orderkey")).distinct(),
            col("o_orderkey") === col("l_orderkey"),
            "left_semi"
          )
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),

    // E6 at scale: salted two-phase aggregation — the skew pattern. Phase 1
    // aggregates on (key, salt) spreading a hot key over 8 reducers; phase 2
    // combines partials. Result is identical to a plain groupBy (the oracle
    // is the plain formulation), but the shuffle no longer funnels a hot key
    // through one task — the shape that survives skewed 100 TB keys.
    Q(
      "q16_salted_agg",
      (s, d) =>
        lineitem(s, d)
          .withColumn("salt", pmod(col("l_orderkey") * 2654435761L + col("l_linenumber"), lit(8)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(
            sum(col("l_quantity")).as("part_qty"),
            count(lit(1)).as("part_cnt")
          )
          .groupBy(col("l_returnflag"))
          .agg(
            round(sum(col("part_qty")), 2).as("sum_qty"),
            sum(col("part_cnt")).as("cnt")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  count(*) AS cnt
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),

    // E6: hierarchical rollup (subtotals + grand total in one pass —
    // Spark expands grouping sets before the shuffle, partials included).
    Q(
      "q17_rollup",
      (s, d) =>
        orders(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            round(sum(col("o_totalprice")), 2).as("total")
          )
          .orderBy(
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first
          ),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),

    // Set operations (beyond Broadway — SURVEY §2.8 — but part of the
    // relational closure): segment members without any urgent order.
    Q(
      "q18_set_except",
      (s, d) => {
        val auto = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))
        auto.except(urgent).orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
             |EXCEPT
             |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY c_custkey""".stripMargin)
    ),

    // E11+E6: fact⋈dim aggregate by part brand.
    Q(
      "q15_brand_revenue",
      (s, d) =>
        lineitem(s, d)
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("cnt")
          )
          .orderBy(col("p_brand")),
      Some("""SELECT p_brand,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  count(*) AS cnt
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin)
    ),

    // As-of join: each click matched to the latest view at-or-before it for
    // the same user — the temporal-join operator Spark has no native form
    // of. The scale-safe shape is NOT a range join (which explodes to
    // clicks×views per user before picking the max): union both event
    // roles, ONE shuffle on user_id, and a running `last(view attrs,
    // ignoreNulls)` window — linear in events, no pair blowup, the same
    // partition serving both roles. Ties: a view AT the click's timestamp
    // counts as preceding (view sorts first at equal ts); equal-ts views
    // resolve to the highest event_id (window order is ascending, `last`
    // wins). The oracle is the classic row_number-over-range-join
    // formulation — quadratic but exact, fine at oracle scale.
    Q(
      "q19_asof_join",
      (s, d) => {
        val ev = events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        val w = Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").asc, (col("event_type") === "view").desc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val lastView = last(
          when(
            col("event_type") === "view",
            struct(col("ts").as("vts"), col("event_id").as("vid"), col("value").as("vval"))
          ),
          ignoreNulls = true
        ).over(w)
        ev.withColumn("lv", lastView)
          .filter(col("event_type") === "click" && col("lv").isNotNull)
          .select(
            col("event_id"),
            col("user_id"),
            col("lv.vid").as("view_id"),
            (unix_micros(col("ts")) - unix_micros(col("lv.vts"))).as("gap_us"),
            col("lv.vval").as("view_value")
          )
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, ts, user_id, event_type, value FROM events
             |  WHERE event_type IN ('view', 'click'))
             |SELECT event_id, user_id, view_id, gap_us, view_value FROM (
             |  SELECT c.event_id, c.user_id, v.event_id AS view_id,
             |    epoch_us(c.ts) - epoch_us(v.ts) AS gap_us, v.value AS view_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY v.ts DESC, v.event_id DESC) AS rk
             |  FROM ev c JOIN ev v
             |    ON v.user_id = c.user_id AND v.event_type = 'view'
             |   AND v.ts <= c.ts AND c.event_type = 'click') t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // The SAME as-of semantics as q19 through the NATIVE sort-merge
    // operator (plans/AsOfJoinExec: custom LogicalPlan + SparkStrategy +
    // BinaryExecNode, SURVEY §2.9 preference (c)): both sides
    // hash-clustered on user and sorted by (user, ts), then one forward
    // merge per partition with O(1) carried state — no union row-widening
    // and no window state, the point-in-time join shape that survives any
    // key skew. Same oracle as q19 (two physical algorithms, one logical
    // operator — the q35/q130 convention); DuckDB's own ASOF JOIN would
    // drop equal-timestamp matches (strict <), so the rank formulation
    // stays.
    Q(
      "q180_asof_native",
      (s, d) => {
        val ev = events(s, d)
          .filter(col("event_type").isin("view", "click"))
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev
          .filter(col("event_type") === "view")
          .select(
            col("event_id").as("view_id"),
            col("user_id").as("v_user"),
            col("ts").as("vts"),
            col("value").as("view_value")
          )
        graft.plans.AsOf
          .asofJoin(
            clicks,
            views,
            Seq("user_id"),
            Seq("v_user"),
            "ts",
            "vts",
            rightTieBreak = Seq("view_id")
          )
          .select(
            col("event_id"),
            col("user_id"),
            col("view_id"),
            (unix_micros(col("ts")) - unix_micros(col("vts"))).as("gap_us"),
            col("view_value")
          )
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (
             |  SELECT event_id, ts, user_id, event_type, value FROM events
             |  WHERE event_type IN ('view', 'click'))
             |SELECT event_id, user_id, view_id, gap_us, view_value FROM (
             |  SELECT c.event_id, c.user_id, v.event_id AS view_id,
             |    epoch_us(c.ts) - epoch_us(v.ts) AS gap_us, v.value AS view_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY v.ts DESC, v.event_id DESC) AS rk
             |  FROM ev c JOIN ev v
             |    ON v.user_id = c.user_id AND v.event_type = 'view'
             |   AND v.ts <= c.ts AND c.event_type = 'click') t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // As-of SEMI: purchases by users with a PRIOR same-user click — the
    // single-bound `EXISTS (… WHERE rk = k AND rt <= t)` "has a prior
    // version" idiom, answered by the as-of merge's O(1) carried state
    // (no right-group buffering, left columns only). Per-user attribution
    // gating: a purchase without any preceding click is unattributable.
    Q(
      "q253_asof_semi_attributable",
      (s, d) => {
        val ev = events(s, d)
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("cts"))
        graft.plans.AsOf
          .asofSemiJoin(purchases, clicks, Seq("user_id"), Seq("c_user"), "ts", "cts")
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("attributable"),
            round(sum(col("value")), 4).as("attributable_value")
          )
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS attributable,
             |  round(sum(value), 4) AS attributable_value
             |FROM events p
             |WHERE p.event_type = 'purchase'
             |  AND EXISTS (SELECT 1 FROM events c
             |              WHERE c.event_type = 'click'
             |                AND c.user_id = p.user_id AND c.ts <= p.ts)
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // As-of ANTI through the SQL surface: purchases with NO prior
    // same-user click (`NOT EXISTS` + a single inclusive bound), written
    // as plain spark.sql so the ORACLE GATE itself proves the
    // RangeJoinRewrite single-bound arm — the optimizer must plan the
    // subquery as the as-of Anti merge (RangeJoinRewriteSpec pins the
    // plan; this pins the answers on real parquet).
    Q(
      "q254_asof_anti_unattributed",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d).createOrReplaceTempView("g254_events")
        s.sql("""SELECT user_id, CAST(count(*) AS BIGINT) AS unattributed,
                |  round(sum(value), 4) AS unattributed_value
                |FROM g254_events p
                |WHERE p.event_type = 'purchase'
                |  AND NOT EXISTS (SELECT 1 FROM g254_events c
                |                  WHERE c.event_type = 'click'
                |                    AND c.user_id = p.user_id AND c.ts <= p.ts)
                |GROUP BY user_id
                |ORDER BY user_id""".stripMargin)
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS unattributed,
             |  round(sum(value), 4) AS unattributed_value
             |FROM events p
             |WHERE p.event_type = 'purchase'
             |  AND NOT EXISTS (SELECT 1 FROM events c
             |                  WHERE c.event_type = 'click'
             |                    AND c.user_id = p.user_id AND c.ts <= p.ts)
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // BACKWARD (next-event) as-of join: each click matched to the
    // EARLIEST same-user purchase at or after it — forward-looking
    // attribution (click → next conversion), the mirror of q180's
    // point-in-time lookup, answered by the same O(1) merge run over
    // descending-time sorted runs. Ties (equal purchase ts) resolve to
    // the smallest event_id, matching row_number ASC in the oracle.
    Q(
      "q255_next_purchase",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(
            col("event_id").as("p_id"),
            col("user_id").as("p_user"),
            col("ts").as("pts"),
            col("value").as("p_value")
          )
        graft.plans.AsOf
          .asofNextJoin(clicks, purchases, Seq("user_id"), Seq("p_user"), "ts", "pts",
            rightTieBreak = Seq("p_id"))
          .select(
            col("event_id"),
            col("user_id"),
            col("p_id"),
            (unix_micros(col("pts")) - unix_micros(col("ts"))).as("wait_us"),
            col("p_value")
          )
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT event_id AS p_id, user_id AS p_user, ts AS pts, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT event_id, user_id, p_id, wait_us, p_value FROM (
             |  SELECT c.event_id, c.user_id, p.p_id,
             |    epoch_us(p.pts) - epoch_us(c.ts) AS wait_us, p.p_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY p.pts ASC, p.p_id ASC) AS rk
             |  FROM c JOIN p ON p.p_user = c.user_id AND p.pts >= c.ts) t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // BACKWARD as-of SEMI through the Scala API (forward = false): clicks
    // with ≥ 1 same-user purchase AT OR AFTER them — the "converting
    // click" existence test, `EXISTS (… pts >= ts)` answered by the
    // descending-run merge's O(1) carried state. Completes the API's
    // mode×direction lattice (the rewrite path is gated by q254; this
    // gates the direct entry point).
    Q(
      "q256_converting_clicks",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("pts"))
        graft.plans.AsOf
          .asofSemiJoin(clicks, purchases, Seq("user_id"), Seq("p_user"), "ts", "pts",
            forward = false)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("converting_clicks"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS converting_clicks
             |FROM events c
             |WHERE c.event_type = 'click'
             |  AND EXISTS (SELECT 1 FROM events p
             |              WHERE p.event_type = 'purchase'
             |                AND p.user_id = c.user_id AND p.ts >= c.ts)
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // BACKWARD as-of ANTI through the Scala API (forward = false): clicks
    // with NO later same-user purchase — dead-end sessions, `NOT EXISTS
    // (… pts >= ts)`. The row-level projection (not an aggregate) also
    // pins that Anti emits left columns only, unchanged.
    Q(
      "q257_dead_end_clicks",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("pts"))
        graft.plans.AsOf
          .asofAntiJoin(clicks, purchases, Seq("user_id"), Seq("p_user"), "ts", "pts",
            forward = false)
          .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, round(value, 4) AS value
             |FROM events c
             |WHERE c.event_type = 'click'
             |  AND NOT EXISTS (SELECT 1 FROM events p
             |                  WHERE p.event_type = 'purchase'
             |                    AND p.user_id = c.user_id AND p.ts >= c.ts)
             |ORDER BY event_id""".stripMargin)
    ),

    // Bounded-lookback as-of through EventTime.asofJoinBounded — the
    // both-streams as-of remediation, here gated on BATCH frames (the
    // watermark is a no-op in batch, the interval-join + max_by
    // composition is identical): each click's latest same-user view
    // within a 15-minute lookback, outer so lookback-misses survive
    // null-extended. The oracle is the rank formulation over the same
    // bounded window (ties: latest ts, then largest view_id — the batch
    // as-of's forward tie-break).
    Q(
      "q258_bounded_asof",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = ev
          .filter(col("event_type") === "view")
          .select(
            col("user_id"),
            col("event_id").as("view_id"),
            col("ts").as("vts"),
            col("value").as("view_value")
          )
        graft.streaming.EventTime
          .asofJoinBounded(clicks, "ts", views, "vts", Seq("user_id"),
            watermarkDelay = "1 hour", lookback = "15 minutes",
            rightTieBreak = Seq("view_id"), outer = true)
          .select(
            col("event_id"),
            col("user_id"),
            col("view_id"),
            (unix_micros(col("ts")) - unix_micros(col("vts"))).as("gap_us"),
            round(col("view_value"), 4).as("view_value")
          )
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT user_id, event_id AS view_id, ts AS vts, value AS view_value
             |  FROM events WHERE event_type = 'view')
             |SELECT event_id, user_id, view_id, gap_us, view_value FROM (
             |  SELECT c.event_id, c.user_id, v.view_id,
             |    epoch_us(c.ts) - epoch_us(v.vts) AS gap_us,
             |    round(v.view_value, 4) AS view_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY v.vts DESC, v.view_id DESC) AS rk
             |  FROM c LEFT JOIN v
             |    ON v.user_id = c.user_id
             |   AND v.vts <= c.ts AND v.vts >= c.ts - INTERVAL 15 MINUTE) t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // The NEXT-EVENT direction of the bounded as-of (forward = false):
    // each click's EARLIEST same-user purchase within a 30-minute
    // lookahead, outer — conversion attribution with an explicit horizon
    // (the bound that makes the both-streams twin's state finite). Ties:
    // earliest pts, then smallest p_id — the batch next-event merge's
    // tie-break, mirrored by the oracle's row_number ASC.
    Q(
      "q259_bounded_next",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(
            col("user_id"),
            col("event_id").as("p_id"),
            col("ts").as("pts"),
            col("value").as("p_value")
          )
        graft.streaming.EventTime
          .asofJoinBounded(clicks, "ts", purchases, "pts", Seq("user_id"),
            watermarkDelay = "1 hour", lookback = "30 minutes",
            rightTieBreak = Seq("p_id"), outer = true, forward = false)
          .select(
            col("event_id"),
            col("user_id"),
            col("p_id"),
            (unix_micros(col("pts")) - unix_micros(col("ts"))).as("wait_us"),
            round(col("p_value"), 4).as("p_value")
          )
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id, event_id AS p_id, ts AS pts, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT event_id, user_id, p_id, wait_us, p_value FROM (
             |  SELECT c.event_id, c.user_id, p.p_id,
             |    epoch_us(p.pts) - epoch_us(c.ts) AS wait_us,
             |    round(p.p_value, 4) AS p_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY p.pts ASC, p.p_id ASC) AS rk
             |  FROM c LEFT JOIN p
             |    ON p.user_id = c.user_id
             |   AND p.pts >= c.ts AND p.pts <= c.ts + INTERVAL 30 MINUTE) t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // The bounded as-of through PLAIN SQL — the hand-written idiom
    // (row_number OVER (PARTITION BY left ORDER BY rt DESC, tb DESC) = 1
    // above an equi + two-sided-range LEFT JOIN) that users actually
    // write for "latest within a horizon". The ORACLE GATE itself proves
    // the RangeJoinRewrite window-top-1 arm: the optimizer must reduce
    // the join under the window to the as-of merge (RangeJoinRewriteSpec
    // pins the plan; this pins the answers on real parquet). Same
    // numbers as q258, which reaches the bounded as-of through the API.
    Q(
      "q260_bounded_asof_sql",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d).createOrReplaceTempView("g260_events")
        s.sql("""WITH c AS (
                |  SELECT event_id, user_id, ts FROM g260_events WHERE event_type = 'click'),
                |v AS (
                |  SELECT user_id, event_id AS view_id, ts AS vts, value AS view_value
                |  FROM g260_events WHERE event_type = 'view')
                |SELECT event_id, user_id, view_id, gap_us, view_value FROM (
                |  SELECT c.event_id, c.user_id, v.view_id,
                |    unix_micros(c.ts) - unix_micros(v.vts) AS gap_us,
                |    round(v.view_value, 4) AS view_value,
                |    row_number() OVER (PARTITION BY c.event_id
                |                       ORDER BY v.vts DESC, v.view_id DESC) AS rk
                |  FROM c LEFT JOIN v
                |    ON v.user_id = c.user_id
                |   AND v.vts <= c.ts AND v.vts >= c.ts - INTERVAL 15 MINUTE) t
                |WHERE rk = 1
                |ORDER BY event_id""".stripMargin)
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT user_id, event_id AS view_id, ts AS vts, value AS view_value
             |  FROM events WHERE event_type = 'view')
             |SELECT event_id, user_id, view_id, gap_us, view_value FROM (
             |  SELECT c.event_id, c.user_id, v.view_id,
             |    epoch_us(c.ts) - epoch_us(v.vts) AS gap_us,
             |    round(v.view_value, 4) AS view_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY v.vts DESC, v.view_id DESC) AS rk
             |  FROM c LEFT JOIN v
             |    ON v.user_id = c.user_id
             |   AND v.vts <= c.ts AND v.vts >= c.ts - INTERVAL 15 MINUTE) t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // The BACKWARD direction of q260 through plain SQL: earliest
    // same-user purchase within a lookahead horizon (row_number ASC over
    // the mirrored bound pair) — the rewrite's min_by/backward arm,
    // oracle-gated end to end like the forward one. Same numbers as
    // q259, which reaches it through the API.
    Q(
      "q261_bounded_next_sql",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d).createOrReplaceTempView("g261_events")
        s.sql("""WITH c AS (
                |  SELECT event_id, user_id, ts FROM g261_events WHERE event_type = 'click'),
                |p AS (
                |  SELECT user_id, event_id AS p_id, ts AS pts, value AS p_value
                |  FROM g261_events WHERE event_type = 'purchase')
                |SELECT event_id, user_id, p_id, wait_us, p_value FROM (
                |  SELECT c.event_id, c.user_id, p.p_id,
                |    unix_micros(p.pts) - unix_micros(c.ts) AS wait_us,
                |    round(p.p_value, 4) AS p_value,
                |    row_number() OVER (PARTITION BY c.event_id
                |                       ORDER BY p.pts ASC, p.p_id ASC) AS rk
                |  FROM c LEFT JOIN p
                |    ON p.user_id = c.user_id
                |   AND p.pts >= c.ts AND p.pts <= c.ts + INTERVAL 30 MINUTE) t
                |WHERE rk = 1
                |ORDER BY event_id""".stripMargin)
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id, event_id AS p_id, ts AS pts, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT event_id, user_id, p_id, wait_us, p_value FROM (
             |  SELECT c.event_id, c.user_id, p.p_id,
             |    epoch_us(p.pts) - epoch_us(c.ts) AS wait_us,
             |    round(p.p_value, 4) AS p_value,
             |    row_number() OVER (PARTITION BY c.event_id
             |                       ORDER BY p.pts ASC, p.p_id ASC) AS rk
             |  FROM c LEFT JOIN p
             |    ON p.user_id = c.user_id
             |   AND p.pts >= c.ts AND p.pts <= c.ts + INTERVAL 30 MINUTE) t
             |WHERE rk = 1
             |ORDER BY event_id""".stripMargin)
    ),

    // The BACKWARD (next-event) direction through the TABLE-function SQL
    // surface — graft_asof_join(..., 'next'): earliest same-user purchase
    // at or after each click, ties to the SMALLEST purchase id (the
    // backward merge's min-by contract), aggregated per user like q241.
    // q241 oracle-gates the TVF's forward arm and q259 the backward arm
    // through the API; this closes the last SQL-surface × direction cell
    // against the DuckDB ASC-rank oracle.
    Q(
      "q262_next_tvf_sql",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .createOrReplaceTempView("g262_clicks")
        ev.filter(col("event_type") === "purchase")
          .select(
            col("event_id").as("p_id"),
            col("user_id").as("p_user"),
            col("ts").as("pts"),
            col("value").as("p_value")
          )
          .createOrReplaceTempView("g262_purch")
        s.sql(
          """SELECT user_id,
            |  count(*) AS clicks,
            |  sum((unix_micros(pts) - unix_micros(ts)) div 1000000L) AS wait_seconds,
            |  sum(CAST(round(p_value * 100) AS BIGINT)) AS bought_cents
            |FROM graft_asof_join(TABLE(g262_clicks), TABLE(g262_purch),
            |                     'user_id', 'p_user', 'ts', 'pts', 'p_id', 'next')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT event_id AS p_id, user_id AS p_user, ts AS pts,
             |    value AS p_value
             |  FROM events WHERE event_type = 'purchase'),
             |m AS (
             |  SELECT * FROM (
             |    SELECT c.user_id, c.ts, p.pts, p.p_value,
             |      row_number() OVER (PARTITION BY c.event_id
             |                         ORDER BY p.pts ASC, p.p_id ASC) AS rk
             |    FROM c JOIN p ON p.p_user = c.user_id AND p.pts >= c.ts) t
             |  WHERE rk = 1)
             |SELECT user_id,
             |  CAST(count(*) AS BIGINT) AS clicks,
             |  CAST(sum((epoch_us(pts) - epoch_us(ts)) // 1000000) AS BIGINT)
             |    AS wait_seconds,
             |  CAST(sum(CAST(round(p_value * 100) AS BIGINT)) AS BIGINT)
             |    AS bought_cents
             |FROM m
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Flagged-EXISTS through the TVF mode argument — graft_asof_join(…,
    // 'exists'): every click once plus a boolean `matched` ("has a prior
    // same-user purchase"), so ONE pass answers both the semi and the
    // anti question (q253/q254 need two). Completes the SQL-surface mode
    // lattice's forward existence cell; the exec's cost shape is semi's
    // (merge stops at the first qualifying right row per left row).
    // Scale shape: one shuffle per side on user_id, sort-merge sweep,
    // no fan-out — the flag aggregates map-side.
    Q(
      "q264_exists_tvf_sql",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .createOrReplaceTempView("g264_clicks")
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("pts"))
          .createOrReplaceTempView("g264_purch")
        s.sql(
          """SELECT user_id, count(*) AS clicks,
            |  sum(CASE WHEN matched THEN 1L ELSE 0L END) AS attributed
            |FROM graft_asof_join(TABLE(g264_clicks), TABLE(g264_purch),
            |                     'user_id', 'p_user', 'ts', 'pts', 'exists')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id AS p_user, ts AS pts FROM events
             |  WHERE event_type = 'purchase')
             |SELECT user_id, CAST(count(*) AS BIGINT) AS clicks,
             |  CAST(sum(CASE WHEN EXISTS (
             |    SELECT 1 FROM p WHERE p.p_user = c.user_id AND p.pts <= c.ts)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS attributed
             |FROM c
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // The BACKWARD existence cell — graft_asof_join(…, 'next_exists'):
    // every click once plus "a later same-user purchase exists" (the
    // will-this-click-ever-convert flag, q256/q257's two queries as one
    // column). With q264 this closes the full mode × direction TVF
    // lattice: {inner,outer,semi,anti,exists} × {asof,next}.
    Q(
      "q265_next_exists_tvf_sql",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .createOrReplaceTempView("g265_clicks")
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("pts"))
          .createOrReplaceTempView("g265_purch")
        s.sql(
          """SELECT user_id, count(*) AS clicks,
            |  sum(CASE WHEN matched THEN 1L ELSE 0L END) AS converting
            |FROM graft_asof_join(TABLE(g265_clicks), TABLE(g265_purch),
            |                     'user_id', 'p_user', 'ts', 'pts', 'next_exists')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT user_id AS p_user, ts AS pts FROM events
             |  WHERE event_type = 'purchase')
             |SELECT user_id, CAST(count(*) AS BIGINT) AS clicks,
             |  CAST(sum(CASE WHEN EXISTS (
             |    SELECT 1 FROM p WHERE p.p_user = c.user_id AND p.pts >= c.ts)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS converting
             |FROM c
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Interval flagged-EXISTS — graft_interval_join(…, 'exists'): every
    // event once plus "covered by a LONG (≥ 10 min) session of its user"
    // (q243's semi and its complement in one sweep; the uncovered count
    // is n_events − in_long with no second join). Closes the interval
    // TVF's existence cell.
    Q(
      "q266_interval_exists_tvf_sql",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .createOrReplaceTempView("g266_events")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g266_events),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS s_user, min(us) AS s_start, max(us) AS s_end
            |FROM s3 GROUP BY user_id, sid
            |HAVING max(us) - min(us) >= 600000000""".stripMargin
        ).createOrReplaceTempView("g266_long_sessions")
        s.sql(
          """SELECT user_id, count(*) AS n_events,
            |  sum(CASE WHEN matched THEN 1L ELSE 0L END) AS in_long
            |FROM graft_interval_join(TABLE(g266_events), TABLE(g266_long_sessions),
            |                         'user_id', 's_user', 'us', 's_start', 's_end',
            |                         'exists')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |sess AS (
             |  SELECT user_id, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY user_id, sid
             |  HAVING max(us) - min(us) >= 600000000)
             |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN EXISTS (
             |    SELECT 1 FROM sess WHERE sess.user_id = e.user_id
             |      AND e.us >= sess.s_start AND e.us <= sess.s_end)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS in_long
             |FROM e
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Exact linear-interpolation percentiles per group (the OLAP quantile
    // surface; Spark's `percentile` sorts within each group — at 100 TB
    // you'd reach for approx_percentile's t-digest sketch, whose merge is
    // implementation-specific and therefore not oracle-comparable; the
    // exact form IS, and both engines interpolate lower + f·(upper−lower)).
    // l_quantity is integer-valued with dense ties, so interpolated values
    // land on representable doubles and round(…,4) is boundary-safe.
    Q(
      "q73_percentiles",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("cnt"),
            round(expr("percentile(l_quantity, 0.25d)"), 4).as("p25_qty"),
            round(expr("percentile(l_quantity, 0.5d)"), 4).as("p50_qty"),
            round(expr("percentile(l_quantity, 0.95d)"), 4).as("p95_qty")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS cnt,
             |  round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
             |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
             |  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)
    ),

    // Pivot: order counts per market segment × order priority — the
    // cross-tab reshaping OLAP surface. Spark's pivot() compiles to one
    // aggregation with a conditional-count per pivot value (no extra
    // shuffle vs the plain groupBy); the oracle is the portable
    // FILTER-aggregation spelling of the same thing. Pivot values are
    // declared explicitly — at scale an unlisted-values pivot triggers a
    // driver-side distinct pass first.
    Q(
      "q74_pivot",
      (s, d) => {
        val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_mktsegment"))
          .pivot("o_orderpriority", pr)
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(
            col("c_mktsegment"),
            col("1-URGENT").as("urgent"),
            col("2-HIGH").as("high"),
            col("3-MEDIUM").as("medium"),
            col("4-NOT SPECIFIED").as("unspecified"),
            col("5-LOW").as("low")
          )
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
             |  CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS high,
             |  CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
             |  CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS unspecified,
             |  CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS low
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)
    ),

    // Analytic-window suite: lag/lead deltas, ntile quartiles and
    // percent_rank over each customer's order history — one shuffle on
    // the partition key serves every window function (same spec). All
    // outputs are exact: integer totals-in-cents, ntile ints, and
    // percent_rank's (rank−1)/(n−1) division of small ints.
    Q(
      "q75_window_suite",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        // round-before-cast: DuckDB CAST(double AS BIGINT) rounds while
        // Spark's cast truncates — an off-by-1e-9 product would diverge
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        orders(s, d)
          .filter(col("o_custkey") < 200)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            cents.as("cents"),
            (cents - lag(cents, 1, 0).over(w)).as("delta_prev"),
            lead(col("o_orderkey"), 1, -1L).over(w).as("next_order"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank")
          )
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |  CAST(round(o_totalprice * 100) AS BIGINT)
             |    - lag(CAST(round(o_totalprice * 100) AS BIGINT), 1, 0)
             |        OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_prev,
             |  lead(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |    AS next_order,
             |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |    AS BIGINT) AS quartile,
             |  round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6)
             |    AS pct_rank
             |FROM orders
             |WHERE o_custkey < 200
             |ORDER BY o_custkey, o_orderkey""".stripMargin)
    ),

    // Cube with grouping_id: all four (status × priority) grouping
    // combinations in one pass, with the grouping id disambiguating the
    // "all" marker NULLs from real nulls — the part of the grouping-sets
    // surface plain rollup (q17) can't express. Spark expands the cube
    // into one aggregate over a 4×-expanded input (map-side partial agg
    // still applies); gid bit k set = column k aggregated away.
    Q(
      "q76_cube_grouping",
      (s, d) =>
        orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            grouping_id().as("gid"),
            count(lit(1)).as("cnt"),
            round(sum(col("o_totalprice")), 2).as("total")
          )
          .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"), col("cnt"), col("total"))
          .orderBy(
            col("gid"),
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first
          ),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),

    // Explicit grouping sets: exactly the (status-only), (priority-only)
    // and grand-total groupings — the general form of which rollup (q17)
    // and cube (q76) are special cases. Spark expands the sets into one
    // aggregate over a set-count-replicated input, so map-side partial
    // aggregation still applies and the shuffle carries one row per
    // (set, key) — no per-set re-scan of the fact table.
    Q(
      "q77_grouping_sets",
      (s, d) =>
        orders(s, d)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty[org.apache.spark.sql.Column]),
            col("o_orderstatus"),
            col("o_orderpriority")
          )
          .agg(
            grouping_id().as("gid"),
            count(lit(1)).as("cnt"),
            round(sum(col("o_totalprice")), 2).as("total")
          )
          .select(col("o_orderstatus"), col("o_orderpriority"), col("gid"), col("cnt"), col("total"))
          .orderBy(
            col("gid"),
            col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first
          ),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
             |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    ),

    // Correlated scalar subqueries: parts priced >5% above their brand's
    // average — Catalyst decorrelates both aggregating subqueries into
    // one brand-keyed aggregate joined back to the probe side (verified:
    // the plan is scan → partial/final agg on p_brand → broadcast join,
    // not a per-row re-scan), which is exactly the shape that survives
    // 100 TB. The comparison rides exact integer cents algebra
    // (cents·count·100 > 105·sum_cents) so no double average can straddle
    // a rounding boundary between engines.
    Q(
      "q78_brand_premium",
      (s, d) => {
        part(s, d).createOrReplaceTempView("graft_part")
        s.sql("""SELECT p_partkey, p_brand,
                |  CAST(round(p_retailprice * 100) AS BIGINT) AS cents
                |FROM graft_part p
                |WHERE CAST(round(p_retailprice * 100) AS BIGINT)
                |      * (SELECT count(*) FROM graft_part x WHERE x.p_brand = p.p_brand) * 100
                |    > 105 * (SELECT sum(CAST(round(x.p_retailprice * 100) AS BIGINT))
                |             FROM graft_part x WHERE x.p_brand = p.p_brand)
                |ORDER BY p_partkey""".stripMargin)
      },
      Some("""SELECT p_partkey, p_brand,
             |  CAST(round(p_retailprice * 100) AS BIGINT) AS cents
             |FROM part p
             |WHERE CAST(round(p_retailprice * 100) AS BIGINT)
             |      * (SELECT count(*) FROM part x WHERE x.p_brand = p.p_brand) * 100
             |    > 105 * (SELECT sum(CAST(round(x.p_retailprice * 100) AS BIGINT))
             |             FROM part x WHERE x.p_brand = p.p_brand)
             |ORDER BY p_partkey""".stripMargin)
    ),

    // Aggregating scalar subquery over the FACT table (the TPC-H Q17
    // "small-lot" pattern): lineitems whose quantity is under 20% of their
    // part's average order quantity, rolled up to brand revenue. Written
    // pre-decorrelated — one partkey-keyed aggregate joined back to the
    // probe — because that is the only shape that survives 100 TB (a
    // correlated per-row re-scan of lineitem is quadratic). The aggregate
    // side shuffles on l_partkey and the join-back reuses that exchange;
    // the part dimension then joins on the same key. The 0.2·avg compare
    // rides exact integers (qty·cnt·5 < sum_qty) and revenue is exact
    // int64 cents — no double averaging anywhere.
    Q(
      "q82_small_lot_revenue",
      (s, d) => {
        val li = lineitem(s, d).select(
          col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")
        )
        val stats = li.groupBy(col("l_partkey"))
          .agg(sum(col("qty")).as("sq"), count(lit(1)).as("cq"))
        li.join(stats, "l_partkey")
          .filter(col("qty") * col("cq") * lit(5L) < col("sq"))
          .join(
            part(s, d).select(col("p_partkey").as("l_partkey"), col("p_brand")),
            "l_partkey"
          )
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("small_lots"), sum(col("cents")).as("rev_cents"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem),
             |st AS (
             |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sq, count(*) AS cq
             |  FROM li GROUP BY 1)
             |SELECT p_brand, count(*) AS small_lots,
             |       CAST(sum(cents) AS BIGINT) AS rev_cents
             |FROM li JOIN st USING (l_partkey)
             |JOIN part ON p_partkey = l_partkey
             |WHERE qty * cq * 5 < sq
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Correlated EXISTS / NOT EXISTS (the TPC-H Q4/Q21 family): priority
    // mix of orders that had a returned item but never an oversized lot.
    // Catalyst decorrelates the two subqueries into a left-semi and a
    // left-anti join on o_orderkey — each one pass over lineitem with the
    // extra predicate pushed into the scan, no per-order re-scan. At scale
    // both joins shuffle on the order key (the fact tables' natural
    // bucketing key), and the semi/anti sides carry only (l_orderkey).
    Q(
      "q83_returned_no_bulk",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders")
        lineitem(s, d).createOrReplaceTempView("graft_lineitem")
        s.sql("""SELECT o_orderpriority, count(*) AS cnt
                |FROM graft_orders o
                |WHERE EXISTS (SELECT 1 FROM graft_lineitem l
                |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
                |  AND NOT EXISTS (SELECT 1 FROM graft_lineitem l
                |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
                |GROUP BY o_orderpriority
                |ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l
             |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),

    // KEYED point-in-interval containment through the NATIVE sweep-line
    // join (plans/IntervalJoinExec): assign every event to its user's
    // 30-min-gap session by interval membership and count members per
    // session. Where Spark's own planning of `equi-key AND t BETWEEN s,e`
    // buffers each key's whole interval group and post-filters
    // (points×intervals per hot key), the native exec merges both sorted
    // sides once with only the ACTIVE intervals buffered — linear in
    // input+output, memory bounded by per-key overlap degree (here 1:
    // sessions are disjoint). Every event lands in exactly one session,
    // so Σ n_events telescopes to |events| — the membership invariant the
    // oracle re-derives relationally. Complements q84 (keyless variant →
    // hour-bucket blocking) and q180 (as-of = "latest before" where this
    // is "all covering").
    Q(
      "q202_session_membership",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val sess = ev
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn(
            "new_s",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1L)
              .otherwise(0L)
          )
          .withColumn("sid", sum(col("new_s")).over(w))
          .groupBy(col("user_id").as("s_user"), col("sid"))
          .agg(min(col("us")).as("s_start"), max(col("us")).as("s_end"))
        graft.plans.Interval
          .intervalJoin(ev, sess, Seq("user_id"), Seq("s_user"), "us", "s_start", "s_end")
          .groupBy(col("s_user").as("user_id"), col("sid"))
          .agg(count(lit(1)).as("n_events"), min(col("s_start")).as("s_start"))
          .orderBy(col("user_id"), col("sid"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |sess AS (
             |  SELECT user_id, sid, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY 1, 2)
             |SELECT sess.user_id, CAST(sess.sid AS BIGINT) AS sid,
             |  count(*) AS n_events, CAST(min(s_start) AS BIGINT) AS s_start
             |FROM e JOIN sess ON e.user_id = sess.user_id
             |  AND e.us >= sess.s_start AND e.us <= sess.s_end
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)
    ),

    // Point-in-interval range join, bucketed: for every error event, how
    // many user sessions (30-min-gap sessionization, any user) were active
    // at that instant. A naive interval join is an inequality-only join —
    // BroadcastNestedLoopJoin, quadratic, dead at scale. The scale shape
    // bucketizes time: each session interval explodes into the hours it
    // covers (bounded by session length), each point event hashes to its
    // hour, and the join becomes an EQUI-join on the hour bucket with the
    // exact range predicate as a post-filter. Pair volume drops from
    // |errors|·|sessions| to Σ per-bucket products — linear for bounded
    // session lengths, and shuffle-partitioned by bucket (time-local skew
    // salts naturally by widening the bucket key). A session never
    // double-counts an event: the event lives in exactly one bucket.
    Q(
      "q84_session_range_join",
      (s, d) => {
        val hourUs = 3600L * 1000000L
        val ev = events(s, d).select(
          col("event_id"),
          col("user_id"),
          col("event_type"),
          unix_micros(col("ts")).as("us")
        )
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val sess = ev
          .withColumn("prev_us", lag(col("us"), 1).over(byUser))
          .withColumn(
            "new_s",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 30L * 60 * 1000000, 1L)
              .otherwise(0L)
          )
          .withColumn("sid", sum(col("new_s")).over(byUser))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("us")).as("s_start"), max(col("us")).as("s_end"))
        val sessByHour = sess.select(
          col("s_start"),
          col("s_end"),
          explode(expr(s"sequence(s_start div $hourUs, s_end div $hourUs)")).as("bucket")
        )
        ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("us"), (col("us") / hourUs).cast("long").as("bucket"))
          .join(sessByHour, "bucket")
          .filter(col("us") >= col("s_start") && col("us") <= col("s_end"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |sess AS (
             |  SELECT user_id, sid, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY 1, 2)
             |SELECT e.event_id, count(*) AS n_active
             |FROM e JOIN sess ON e.us >= sess.s_start AND e.us <= sess.s_end
             |WHERE e.event_type = 'error'
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Bloom-filter pre-join pruning: revenue of lineitems belonging to
    // urgent half-million-dollar orders. The build side (filtered orders)
    // folds into a bloom filter whose might_contain() prunes the probe
    // scan BELOW the join's shuffle — ~96% of lineitem rows never leave
    // the map stage — and the exact equi-join afterwards removes the false
    // positives, so the result is byte-identical to the plain join (which
    // is what the oracle runs). This is the explicit form of Spark's
    // runtime-filter injection (spark.sql.optimizer.runtime.bloomFilter.*),
    // spelled out so the pruning is guaranteed rather than cost-based; the
    // one-row aggregate→driver materialization is the same subquery
    // materialization the built-in rule performs (a scalar, not a data
    // collect).
    Q(
      "q86_bloom_prejoin",
      (s, d) => {
        import org.apache.spark.sql.GraftColumns
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.catalyst.expressions.Literal
        val build = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000.0)
          .select(col("o_orderkey"), col("o_totalprice"))
        val bloomAgg = GraftColumns.lift(
          new BloomFilterAggregate(
            new XxHash64(Seq(GraftColumns.unlift(col("o_orderkey")))),
            Literal(100000L),
            Literal(800000L)
          ).toAggregateExpression()
        )
        val bloom = build.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
        val mightContain = GraftColumns.lift(
          BloomFilterMightContain(
            Literal(bloom),
            new XxHash64(Seq(GraftColumns.unlift(col("l_orderkey"))))
          )
        )
        lineitem(s, d)
          .select(
            col("l_orderkey"),
            col("l_returnflag"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents")
          )
          .filter(mightContain)
          .join(build.select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("items"), sum(col("cents")).as("rev_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS items,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Salted skew join: events (fact, user-keyed and skewable) joined to a
    // per-user dimension that is too big to broadcast at scale. A plain
    // shuffle join lands each hot user on ONE task; salting replicates
    // each dim row S=8 ways and splinters the fact side by a deterministic
    // salt, so a hot key spreads over 8 tasks at the cost of an 8×
    // replication of only the DIM side — the manual form of what AQE skew
    // handling does cost-based, spelled out so the worst key's partition
    // width is bounded by construction. The salt never reaches the result
    // (it only widens the join key), so the oracle is the plain join.
    // (At test SF the salted dim is tiny, so Catalyst rightly broadcasts
    // it — adaptivity working as intended; past the broadcast threshold
    // the identical plan degrades to the salted shuffle join, which is
    // the case the salt exists for.)
    Q(
      "q87_salted_skew_join",
      (s, d) => {
        val S = 8L
        val dim = customer(s, d)
          .filter(col("c_custkey") <= 150)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
          .withColumn("salt", explode(expr(s"sequence(0L, ${S - 1}L)")))
        val fact = events(s, d)
          .select(
            col("user_id"),
            col("event_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents")
          )
          .withColumn("salt", pmod(col("event_id"), lit(S)))
        fact
          .join(dim, Seq("user_id", "salt"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("events"), sum(col("cents")).as("value_cents"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS events,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM events
             |JOIN customer ON c_custkey = user_id
             |WHERE c_custkey <= 150
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Global row numbering WITHOUT a single-reducer window: the classic
    // two-pass distributed rank. `row_number() OVER (ORDER BY ...)` with no
    // PARTITION BY collapses the whole table onto ONE task — the canonical
    // does-not-survive-100TB plan. Instead: (1) range-repartition + local
    // sort (the same machinery as a global ORDER BY — boundary sampling,
    // then each partition holds a contiguous key range); (2) per-partition
    // row counts (32 rows of metadata) prefix-summed into offsets — the
    // only single-partition step is over THAT metadata, not the data;
    // (3) rank = partition offset + local position, recovered from
    // monotonically_increasing_id (pid in the high bits, a per-partition
    // sequential counter in the low 33). The id-stamped frame is persisted
    // so the offset pass and the join-back see identical ids.
    Q(
      "q91_global_rank",
      (s, d) => {
        val sorted = orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
          .repartitionByRange(32, col("o_totalprice").desc, col("o_orderkey"))
          .sortWithinPartitions(col("o_totalprice").desc, col("o_orderkey"))
        val withMid = Caches.persisted(
          sorted
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val w = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
        val offsets = withMid
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(w), lit(0L)))
          .select(col("pid"), col("off"))
        withMid
          .join(broadcast(offsets), Seq("pid"))
          .select(
            col("o_orderkey"),
            col("o_totalprice"),
            (col("off") + col("loc") + 1).as("rank")
          )
          .orderBy(col("rank"))
      },
      Some("""SELECT o_orderkey, o_totalprice,
             |  row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
             |FROM orders
             |ORDER BY rank""".stripMargin)
    ),

    // INTERSECT set semantics (q18 covers EXCEPT): parts that appear both
    // in urgent-priority orders and in returned lineitems, rolled up by
    // brand. Both input sets are distinct projections of the fact table;
    // the intersect itself is a shuffle on the (already-distinct) key, and
    // the brand rollup joins the small part dimension broadcast.
    Q(
      "q92_part_intersect",
      (s, d) => {
        val li = lineitem(s, d)
        val urgent = li
          .join(
            orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey")
          )
          .select(col("l_partkey"))
          .distinct()
        val returned = li
          .filter(col("l_returnflag") === "R")
          .select(col("l_partkey"))
          .distinct()
        urgent
          .intersect(returned)
          .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("parts"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH u AS (
             |  SELECT DISTINCT l_partkey FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderpriority = '1-URGENT'),
             |r AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
             |b AS (SELECT l_partkey FROM u INTERSECT SELECT l_partkey FROM r)
             |SELECT p_brand, count(*) AS parts
             |FROM b JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // TPC-H Q11 shape: keep the groups whose aggregate exceeds a fraction
    // of the GLOBAL aggregate — a HAVING against a scalar subquery. The
    // fact table is scanned ONCE: per-part sums are persisted, the global
    // total re-aggregates those groups (parts ≪ lineitems), and the
    // 1-row total broadcasts back over the groups. Money rides exact
    // integer cents (floor(price·(1−disc)·100) per row, int64 sums) so the
    // threshold comparison is integer algebra — no double-sum-order
    // boundary flips between engines.
    Q(
      "q93_important_parts",
      (s, d) => {
        val grouped = Caches.persisted(
          lineitem(s, d)
            .select(
              col("l_partkey"),
              expr("CAST(floor(l_extendedprice * (1d - l_discount) * 100d) AS BIGINT)")
                .as("cents")
            )
            .groupBy(col("l_partkey"))
            .agg(sum(col("cents")).as("value_cents"))
        )
        val total = grouped.agg(sum(col("value_cents")).as("total_cents"))
        grouped
          .join(broadcast(total))
          .filter(col("value_cents") * 1500 > col("total_cents"))
          .select(col("l_partkey"), col("value_cents"))
          .orderBy(col("value_cents").desc, col("l_partkey"))
      },
      Some("""WITH g AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
             |      AS value_cents
             |  FROM lineitem GROUP BY 1)
             |SELECT l_partkey, value_cents
             |FROM g CROSS JOIN (SELECT sum(value_cents) AS total_cents FROM g) t
             |WHERE value_cents * 1500 > total_cents
             |ORDER BY value_cents DESC, l_partkey""".stripMargin)
    ),

    // FULL OUTER join — the reconciliation shape (which keys exist on only
    // one side?). Both sides pre-aggregate BEFORE the join (counts per key,
    // orders of magnitude smaller than the fact rows), then full-outer on
    // the key. A full outer can't broadcast either side, so it's a shuffle
    // join by construction — shrinking the inputs first is what keeps that
    // shuffle cheap at 100 TB.
    Q(
      "q97_order_event_reconcile",
      (s, d) => {
        val o = orders(s, d)
          .groupBy(col("o_custkey").as("cust"))
          .agg(count(lit(1)).as("n_orders"))
        val e = events(s, d)
          .groupBy(col("user_id").as("cust"))
          .agg(count(lit(1)).as("n_events"))
        o.join(e, Seq("cust"), "full_outer")
          .select(
            col("cust"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            when(col("n_orders").isNotNull && col("n_events").isNotNull, "both")
              .when(col("n_orders").isNotNull, "orders_only")
              .otherwise("events_only")
              .as("status")
          )
          .orderBy(col("cust"))
      },
      Some("""WITH o AS (SELECT o_custkey AS cust, count(*) AS n_orders FROM orders GROUP BY 1),
             |e AS (SELECT user_id AS cust, count(*) AS n_events FROM events GROUP BY 1)
             |SELECT coalesce(o.cust, e.cust) AS cust,
             |  coalesce(n_orders, 0) AS n_orders,
             |  coalesce(n_events, 0) AS n_events,
             |  CASE WHEN o.cust IS NOT NULL AND e.cust IS NOT NULL THEN 'both'
             |       WHEN o.cust IS NOT NULL THEN 'orders_only'
             |       ELSE 'events_only' END AS status
             |FROM o FULL OUTER JOIN e ON o.cust = e.cust
             |ORDER BY cust""".stripMargin)
    ),

    // Ordered funnel analysis: users who did view → click → purchase IN
    // ORDER (each stage strictly after the previous stage's first hit) —
    // the product-analytics sequence-pattern query, built on the generic
    // k-step `funnelStages`. Each stage is an equi-join on user_id against
    // the shrinking survivor set + a min aggregate; never a per-user event
    // sort or a cross of event pairs. At scale all stage joins/aggs share
    // the user_id key — bucket the events table by user_id and the whole
    // funnel is exchange-free. Streaming twin: streaming/FunnelStream.scala.
    Q(
      "q98_funnel",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val stages = funnelStages(ev, Seq("view", "click", "purchase"))
        stages.zipWithIndex
          .map { case (df, i) =>
            df.select(lit(s"${i + 1}_${Seq("view", "click", "purchase")(i)}").as("stage"), col("user_id"))
          }
          .reduce(_.union(_))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("users"))
          .orderBy(col("stage"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
             |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
             |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
             |SELECT stage, users FROM (
             |  SELECT '1_view' AS stage, count(*) AS users FROM v
             |  UNION ALL SELECT '2_click', count(*) FROM c
             |  UNION ALL SELECT '3_purchase', count(*) FROM p) u
             |ORDER BY stage""".stripMargin)
    ),

    // HLL++ sketch distinct-count with a driver-visible accuracy contract.
    // A sketch VALUE is engine-specific by construction (DuckDB's HLL uses
    // different parameters), so the cross-engine gate is the ERROR BOUND:
    // the Spark side computes both the exact distinct and the sketch and
    // emits whether the sketch landed within 3σ of its configured 5% rsd;
    // the oracle asserts that bound unconditionally — if Spark's estimate
    // ever drifts out of contract, the hash check goes red. At 100 TB the
    // sketch column is the one you can afford: fixed-size mergeable state,
    // no shuffle of the key set (the exact column here is the auditor).
    Q(
      "q99_hll_profile",
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("exact_d"),
            approx_count_distinct(col("l_partkey"), 0.05).as("approx_d")
          )
          .select(
            col("l_returnflag"),
            col("exact_d"),
            (abs(col("approx_d") - col("exact_d")).cast("double") / col("exact_d") < 0.15)
              .as("within_bound")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_d,
             |  TRUE AS within_bound
             |FROM lineitem
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Mergeable-sketch rollup (DataSketches HLL): sketch each
    // (event_type, day) slice ONCE, then answer the per-type distinct
    // question by MERGING the slice sketches — never re-scanning the fact
    // table. This is the property q99's plain estimate doesn't show and
    // the reason sketches are the 100 TB distinct-count architecture: a
    // daily job materializes fixed-size slice sketches, and any later
    // rollup (per type, per week, global) is a union over kilobytes.
    // Distincts do NOT sum across slices (users repeat daily) — the merge
    // handles overlap correctly, which is what the bound check proves.
    // Same oracle convention as q99: the VALUE is engine-specific, the
    // 3σ error bound is the cross-engine contract.
    Q(
      "q100_sketch_rollup",
      (s, d) => {
        val ev = events(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        val slices = ev
          .groupBy(col("event_type"), col("day"))
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        val merged = slices
          .groupBy(col("event_type"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_d"))
        val exact = ev
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_d"))
        merged
          .join(exact, Seq("event_type"))
          .select(
            col("event_type"),
            col("exact_d"),
            (abs(col("approx_d") - col("exact_d")).cast("double") / col("exact_d") < 0.15)
              .as("within_bound")
          )
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_d,
             |  TRUE AS within_bound
             |FROM events
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Funnel conversion latency: exact percentiles of the time between
    // consecutive funnel stages (first view → first qualifying click →
    // first qualifying purchase) — the "how long does conversion take"
    // companion to q98's "how many convert". Built on the same
    // funnelStages survivor frames; latencies are exact integer SECONDS
    // (µs diff via unix_micros/epoch_us — q12's idiom — floor-divided to
    // seconds) so percentile interpolation is cross-engine comparable.
    // Seconds, not µs: q73's integer-input rule is necessary but not
    // sufficient — at ~1e11-µs magnitudes the interpolation multiply's
    // engine-specific rounding surfaces in the 4th decimal (observed at
    // sf0.1); second-scale values keep the noise ~1e-11, far under the
    // round(4).
    Q(
      "q102_funnel_latency",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
        val Seq(v, c, p) = funnelStages(ev, Seq("view", "click", "purchase"))
        val leg1 = c
          .join(v.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
          .select(
            lit("1_view_to_click").as("leg"),
            expr("(unix_micros(t) - unix_micros(t_prev)) div 1000000").as("secs")
          )
        val leg2 = p
          .join(c.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
          .select(
            lit("2_click_to_purchase").as("leg"),
            expr("(unix_micros(t) - unix_micros(t_prev)) div 1000000").as("secs")
          )
        leg1
          .union(leg2)
          .groupBy(col("leg"))
          .agg(
            count(lit(1)).as("conversions"),
            round(expr("percentile(secs, 0.5d)"), 4).as("p50_s"),
            round(expr("percentile(secs, 0.9d)"), 4).as("p90_s")
          )
          .orderBy(col("leg"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
             |  WHERE event_type = 'click' AND ts > t1 GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
             |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1),
             |legs AS (
             |  SELECT '1_view_to_click' AS leg,
             |    (epoch_us(t2) - epoch_us(t1)) // 1000000 AS secs
             |  FROM c JOIN v USING (user_id)
             |  UNION ALL
             |  SELECT '2_click_to_purchase', (epoch_us(t3) - epoch_us(t2)) // 1000000
             |  FROM p JOIN c USING (user_id))
             |SELECT leg, count(*) AS conversions,
             |  round(quantile_cont(secs, 0.5), 4) AS p50_s,
             |  round(quantile_cont(secs, 0.9), 4) AS p90_s
             |FROM legs
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Retention cohorts: users grouped by first-seen day, activity counted
    // by day offset from that first day — the standard cohort/retention
    // triangle. Two shuffles, both on user_id/day keys: a min-aggregate
    // for the cohort assignment (map-side combinable) and the offset
    // rollup; the cohort table joins back broadcast-small relative to the
    // event stream. Day arithmetic is integer (datediff of date-truncated
    // timestamps) — no timezone or interval ambiguity across engines
    // (both sessions run UTC).
    Q(
      "q103_retention_cohorts",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
        val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        ev.join(cohorts, Seq("user_id"))
          .select(
            col("cohort_day"),
            datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"),
            col("user_id")
          )
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
             |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
             |SELECT cohort_day,
             |  CAST(datediff('day', cohort_day, day) AS BIGINT) AS day_offset,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
             |FROM ev JOIN cohorts USING (user_id)
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)
    ),

    // Event-type transition matrix: counts of consecutive (prev → next)
    // event-type pairs per user, ordered by time — the Markov-chain /
    // session-flow profile. One shuffle: the lag window partitions by
    // user_id (the same key every funnel/session op shuffles on), then a
    // map-side-combinable pair rollup. Ordering ties break on event_id,
    // the q12-sessions idiom, so the lag sequence is deterministic.
    Q(
      "q104_event_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("transitions"))
          .orderBy(col("prev_type"), col("next_type"))
      },
      Some("""SELECT prev_type, event_type AS next_type, count(*) AS transitions
             |FROM (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events) t
             |WHERE prev_type IS NOT NULL
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)
    ),

    // CDC / MERGE INTO compaction: apply a changeset (updates + deletes)
    // over a base snapshot with latest-version-wins semantics — the
    // upsert pass every lakehouse table maintenance job runs. The
    // changeset here is derived deterministically from the base (orderkey
    // % 10 == 3 → repriced, % 10 == 7 → deleted) so the oracle sees the
    // identical input. The merge itself is ONE aggregate: max_by(payload,
    // version) per key — no window sort, map-side combinable, shuffling
    // each key exactly once. At 100 TB base and changes are bucketed on
    // the merge key so compaction runs exchange-free per bucket, and the
    // money column rides integer cents end-to-end (floor of the same IEEE
    // multiply both engines evaluate identically).
    Q(
      "q107_cdc_upsert",
      (s, d) => {
        // the changeset is DERIVED from the base for oracle parity, so the
        // base projection is persisted — otherwise each derived branch
        // re-scans orders (3 scans of the fact table for what is one pass
        // of map work); in production base and changes are separate tables
        // and no cache is needed
        val base = Caches.persisted(orders(s, d).select(
          col("o_orderkey").as("k"),
          col("o_orderstatus").as("status"),
          expr("cast(floor(o_totalprice * 100) as bigint)").as("cents"),
          lit(1L).as("version"),
          lit("U").as("op")
        ))
        val upd = base
          .filter(col("k") % 10 === 3)
          .select(col("k"), col("status"), (col("cents") + 12345L).as("cents"), lit(2L).as("version"), lit("U").as("op"))
        val del = base
          .filter(col("k") % 10 === 7)
          .select(col("k"), col("status"), col("cents"), lit(2L).as("version"), lit("D").as("op"))
        base
          .union(upd)
          .union(del)
          .groupBy(col("k"))
          .agg(max_by(struct(col("status"), col("cents"), col("op")), col("version")).as("m"))
          .filter(col("m.op") === "U")
          .groupBy(col("m.status").as("status"))
          .agg(count(lit(1)).as("live_orders"), sum(col("m.cents")).as("total_cents"))
          .orderBy(col("status"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_orderstatus AS status,
             |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
             |    1 AS version, 'U' AS op
             |  FROM orders),
             |changes AS (
             |  SELECT k, status, cents + 12345 AS cents, 2 AS version, 'U' AS op
             |  FROM base WHERE k % 10 = 3
             |  UNION ALL
             |  SELECT k, status, cents, 2 AS version, 'D' AS op
             |  FROM base WHERE k % 10 = 7),
             |merged AS (
             |  SELECT k, status, cents, op,
             |    row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rk
             |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes) u)
             |SELECT status, count(*) AS live_orders,
             |  CAST(sum(cents) AS BIGINT) AS total_cents
             |FROM merged
             |WHERE rk = 1 AND op = 'U'
             |GROUP BY status
             |ORDER BY status""".stripMargin)
    ),

    // Two-epoch distribution-drift profile: per event type, compare the
    // value distribution of the first half-month against the second in
    // ONE scan — conditional (pivot-style) aggregation instead of the
    // naive two-scans-plus-self-join, the shape that matters when the
    // fact table is 100 TB. All statistics are exact int64 (floor-cent
    // quantization; per-epoch means as floor(sum/n) integer units), and
    // the drift signal is the absolute mean gap in cents — the
    // data-quality monitor a training pipeline runs between ingestion
    // snapshots to catch upstream distribution shifts before they reach
    // a training run.
    Q(
      "q117_epoch_drift",
      (s, d) =>
        events(s, d)
          .select(
            col("event_type"),
            (col("ts") < lit("2024-01-16").cast("timestamp")).as("early"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("cents")
          )
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("early"), 1L).otherwise(0L)).as("n_a"),
            sum(when(!col("early"), 1L).otherwise(0L)).as("n_b"),
            sum(when(col("early"), col("cents")).otherwise(0L)).as("sum_a"),
            sum(when(!col("early"), col("cents")).otherwise(0L)).as("sum_b")
          )
          .select(
            col("event_type"),
            col("n_a"),
            col("n_b"),
            floor(col("sum_a").cast("double") / col("n_a")).cast("long").as("mean_a_cents"),
            floor(col("sum_b").cast("double") / col("n_b")).cast("long").as("mean_b_cents"),
            abs(
              floor(col("sum_a").cast("double") / col("n_a")).cast("long") -
                floor(col("sum_b").cast("double") / col("n_b")).cast("long")
            ).as("gap_cents")
          )
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |  CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             |  CAST(floor(CAST(sum(CASE WHEN early THEN cents ELSE 0 END) AS DOUBLE)
             |       / sum(CASE WHEN early THEN 1 ELSE 0 END)) AS BIGINT) AS mean_a_cents,
             |  CAST(floor(CAST(sum(CASE WHEN early THEN 0 ELSE cents END) AS DOUBLE)
             |       / sum(CASE WHEN early THEN 0 ELSE 1 END)) AS BIGINT) AS mean_b_cents,
             |  abs(CAST(floor(CAST(sum(CASE WHEN early THEN cents ELSE 0 END) AS DOUBLE)
             |       / sum(CASE WHEN early THEN 1 ELSE 0 END)) AS BIGINT)
             |    - CAST(floor(CAST(sum(CASE WHEN early THEN 0 ELSE cents END) AS DOUBLE)
             |       / sum(CASE WHEN early THEN 0 ELSE 1 END)) AS BIGINT)) AS gap_cents
             |FROM (SELECT event_type,
             |        ts < TIMESTAMP '2024-01-16' AS early,
             |        CAST(floor(value * 100) AS BIGINT) AS cents
             |      FROM events) t
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)
    ),

    // Grouped top-k WITHOUT a rank window: the native GroupTopK aggregate
    // (graft.functions.GroupTopK, a TypedImperativeAggregate holding a
    // k-element heap per group) reduces each map task's slice to ≤k pairs
    // per group BEFORE the shuffle — only k-row partials move, where the
    // row_number() formulation (q08) shuffles and sorts the whole fact
    // table per partition. PlanSpec asserts the two-stage
    // ObjectHashAggregate (partial + final). The top-3 array is formatted
    // to one deterministic string per group ("id:score,…") — a ≤3-element
    // HOF is post-aggregate metadata, and the driver comparator needs
    // scalars (the q66 rule). Oracle: the definitional rank-window SQL.
    Q(
      "q133_agg_topk",
      (s, d) => {
        val perUser = events(s, d)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        perUser
          .groupBy(col("event_type"))
          .agg(graft.functions.AggFunctions.topK(col("cnt"), col("user_id"), 3).as("top"))
          .select(
            col("event_type"),
            concat_ws(
              ",",
              transform(col("top"), x => concat(x.getField("id"), lit(":"), x.getField("score")))
            ).as("top3")
          )
          .orderBy(col("event_type"))
      },
      Some("""WITH c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
             |          FROM events GROUP BY 1, 2),
             |r AS (SELECT event_type, user_id, cnt,
             |        row_number() OVER (PARTITION BY event_type
             |                           ORDER BY cnt DESC, user_id) AS rk
             |      FROM c)
             |SELECT event_type,
             |  string_agg(user_id || ':' || cnt, ',' ORDER BY rk) AS top3
             |FROM r WHERE rk <= 3
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)
    ),

    // EXACT global order statistics (p50/p90/p99) WITHOUT a single-reducer
    // sort — the q91 range-partition trick pointed at quantiles. A global
    // `row_number() OVER (ORDER BY v)` plans one task holding the whole
    // table; q73's per-group window only survives because groups are
    // small, and q121's per-flag window still sorts the fact table inside
    // 3 partitions. Here: repartitionByRange (sampled range boundaries →
    // balanced partitions) + per-partition LOCAL sort, then
    // monotonically_increasing_id = (partition << 33 | local index) turns
    // per-partition OFFSETS (32 metadata rows) into exact global ranks —
    // the only cross-partition step is a broadcast of 32 (pid, offset)
    // rows. Values at ranks ⌈q·n⌉ are rank-discrete (no interpolation) so
    // ties in the value column cannot make the answer nondeterministic:
    // every row at a given rank position carries the same value. This is
    // the exact-quantile architecture for 100 TB; q100/q73's
    // percentile_approx sketch is the one-pass approximation beside it.
    Q(
      "q135_exact_quantiles",
      (s, d) => {
        val sorted = lineitem(s, d)
          .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
          .repartitionByRange(32, col("cents"))
          .sortWithinPartitions(col("cents"))
        val stamped = Caches.persisted(
          sorted
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val w = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
        val offsets = stamped
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(w), lit(0L)))
        // an empty input leaves sum(cnt) NULL — mirror the oracle's
        // aggregate-over-empty row (all NULLs) instead of throwing
        val nRow = offsets.agg(sum(col("cnt"))).head()
        if (nRow.isNullAt(0)) {
          val nul = lit(null).cast("long")
          s.range(1)
            .select(nul.as("n"), nul.as("p50_cents"), nul.as("p90_cents"), nul.as("p99_cents"))
        } else {
          val n = nRow.getLong(0)
          def idx(pct: Long): Long = (pct * n + 99L) / 100L // ceil(pct·n/100)
          stamped
            .join(broadcast(offsets.select(col("pid"), col("off"))), Seq("pid"))
            .withColumn("rk", col("off") + col("loc") + 1)
            .filter(col("rk").isin(idx(50), idx(90), idx(99)))
            .agg(
              lit(n).as("n"),
              max(when(col("rk") === idx(50), col("cents"))).as("p50_cents"),
              max(when(col("rk") === idx(90), col("cents"))).as("p90_cents"),
              max(when(col("rk") === idx(99), col("cents"))).as("p99_cents")
            )
        }
      },
      Some("""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |          FROM lineitem),
             |r AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rk,
             |        count(*) OVER () AS n
             |      FROM v)
             |SELECT CAST(max(n) AS BIGINT) AS n,
             |  max(CASE WHEN rk = (50 * n + 99) // 100 THEN cents END) AS p50_cents,
             |  max(CASE WHEN rk = (90 * n + 99) // 100 THEN cents END) AS p90_cents,
             |  max(CASE WHEN rk = (99 * n + 99) // 100 THEN cents END) AS p99_cents
             |FROM r""".stripMargin)
    ),

    // Quantile-SKETCH error bound — the scale path q135's header points
    // at: approx_percentile's mergeable Greenwald–Khanna sketch replaces
    // the global sort at 100 TB, but its state is implementation-specific
    // so the value can't hash-match an oracle. The q99/q100/q109 sketch
    // convention instead: verify the published guarantee (rank error
    // ≤ N/accuracy) and emit THAT as a boolean the oracle asserts TRUE.
    // Tie-safe check: the pivot value occupies rank interval
    // [count(<pivot)+1, count(<=pivot)]; the guarantee holds iff that
    // interval intersects [target − εN − 1, target + εN + 1]. Two linear
    // passes over one cached 1-column projection (sketch pass, rank pass).
    Q(
      "q212_quantile_sketch_bound",
      (s, d) => {
        val v = Caches.persisted(
          lineitem(s, d).select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
        )
        val st = v
          .agg(count(lit(1)).as("n"), expr("approx_percentile(cents, 0.5D, 1000)").as("pivot"))
          .head()
        val n = st.getAs[Long]("n")
        if (n == 0L) {
          s.range(1).select(lit(0L).as("n"), lit(true).as("median_rank_ok"))
        } else {
          val pivot = st.getAs[Long]("pivot")
          val target = (n + 1L) / 2L
          val slack = n / 1000L + 1L
          v.agg(
            sum(when(col("cents") < pivot, 1L).otherwise(0L)).as("rk_lo"),
            sum(when(col("cents") <= pivot, 1L).otherwise(0L)).as("rk_hi")
          ).select(
            lit(n).as("n"),
            (col("rk_lo") + 1L <= lit(target + slack) &&
              col("rk_hi") >= lit(target - slack)).as("median_rank_ok")
          )
        }
      },
      Some("SELECT CAST(count(*) AS BIGINT) AS n, TRUE AS median_rank_ok FROM lineitem")
    ),

    // TPC-H Q21 shape (suppliers who kept orders waiting) on the slimmed
    // schema: suppliers with a RETURNED line on a multi-supplier order
    // where NO OTHER supplier on that order had a return — the
    // double-correlated EXISTS / NOT EXISTS against the SAME fact table,
    // the classic decorrelation stress test. Spark-first: both
    // subqueries become one semi- and one anti-join on the orderkey equi
    // key with a supplier-disequality residual — no per-row re-scan, the
    // fact table is projected to distinct (order, supplier [, returned])
    // pairs first so the joins carry key-sized rows only. The supplier
    // name attaches by broadcast AFTER the per-supplier aggregate
    // (|suppliers| rows, never the fact table).
    Q(
      "q213_sole_blame",
      (s, d) => {
        val l = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
        val pairsAll = l.select(col("l_orderkey"), col("l_suppkey")).distinct()
        val pairsR = l
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_suppkey"))
          .distinct()
        val multi = pairsR
          .as("a")
          .join(
            pairsAll.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_suppkey") =!= col("b.l_suppkey"),
            "left_semi"
          )
        val sole = multi
          .as("a")
          .join(
            pairsR.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_suppkey") =!= col("b.l_suppkey"),
            "left_anti"
          )
        sole
          .groupBy(col("l_suppkey").as("s_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(table(s, d, "supplier").select(col("s_suppkey"), col("s_name"))), "s_suppkey")
          .orderBy(col("numwait").desc, col("s_suppkey"))
          .limit(10)
          .select(col("s_suppkey"), col("s_name"), col("numwait"))
      },
      Some("""WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
             |pr AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
             |       WHERE l_returnflag = 'R'),
             |sole AS (
             |  SELECT a.l_orderkey, a.l_suppkey FROM pr a
             |  WHERE EXISTS (SELECT 1 FROM p b
             |                WHERE b.l_orderkey = a.l_orderkey
             |                  AND b.l_suppkey <> a.l_suppkey)
             |    AND NOT EXISTS (SELECT 1 FROM pr c
             |                    WHERE c.l_orderkey = a.l_orderkey
             |                      AND c.l_suppkey <> a.l_suppkey))
             |SELECT s_suppkey, s_name, numwait FROM (
             |  SELECT l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
             |  FROM sole GROUP BY 1) t
             |JOIN supplier USING (s_suppkey)
             |ORDER BY numwait DESC, s_suppkey
             |LIMIT 10""".stripMargin)
    ),

    // Calendar-spine gap-fill (the warehouse resample): hourly ERROR
    // counts zero-filled over the corpus's full activity window, so the
    // series q157 (autocorrelation) / q188 (CUSUM) consume has no silent
    // holes — a missing hour reads as 0, not as absent (absence biases
    // every lag/drift statistic toward the populated hours). Spine =
    // distributed spark.range over driver-held integer hour bounds (two
    // scalars — the q129 stats idiom), LEFT join of the sparse counts,
    // coalesce 0. Scale shape: the spine is |hours| rows (calendar
    // metadata), the event scan aggregates map-side to |hours| partials;
    // nothing corpus-sized shuffles.
    Q(
      "q214_hourly_gapfill",
      (s, d) => {
        val ev = events(s, d).select(
          expr("unix_micros(ts) div 3600000000L").as("hr"),
          col("event_type")
        )
        val b = ev.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi")).head()
        // empty input: the oracle's spine over NULL bounds is zero rows
        if (b.isNullAt(0)) {
          s.range(0).select(lit(0L).as("hr"), lit(0L).as("errors"), lit(false).as("is_gap"))
        } else {
          val (lo, hi) = (b.getAs[Long]("lo"), b.getAs[Long]("hi"))
          val errs = ev
            .filter(col("event_type") === "error")
            .groupBy(col("hr"))
            .agg(count(lit(1)).as("cnt"))
          s.range(lo, hi + 1)
            .toDF("hr")
            .join(errs, Seq("hr"), "left")
            .select(
              col("hr"),
              coalesce(col("cnt"), lit(0L)).as("errors"),
              (coalesce(col("cnt"), lit(0L)) === 0L).as("is_gap")
            )
            .orderBy(col("hr"))
        }
      },
      Some("""WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS hr, event_type
             |           FROM events),
             |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM ev),
             |sp AS (SELECT unnest(range((SELECT lo FROM b), (SELECT hi FROM b) + 1)) AS hr),
             |er AS (SELECT hr, CAST(count(*) AS BIGINT) AS cnt FROM ev
             |       WHERE event_type = 'error' GROUP BY 1)
             |SELECT sp.hr, coalesce(er.cnt, 0) AS errors,
             |  coalesce(er.cnt, 0) = 0 AS is_gap
             |FROM sp LEFT JOIN er USING (hr)
             |ORDER BY hr""".stripMargin)
    ),

    // SCD2 timeline construction — turn the event changelog into
    // validity intervals [valid_from, valid_to): per user, each event
    // opens a state (its event_type) that stays current until the next
    // event; the last state closes at the corpus's max timestamp. The
    // rollup answers "how much wall-clock time did users SPEND in each
    // state" — duration-weighted, where q104's transition matrix only
    // counts changes. Exact integer µs → seconds. Scale shape: one
    // per-user lead() window (keyed partition sort, no global sort), a
    // 1-row max-ts broadcast for the close-out, then a 5-row aggregate.
    Q(
      "q215_state_durations",
      (s, d) => {
        val ev = events(s, d).select(
          col("user_id"),
          col("event_type"),
          expr("unix_micros(ts)").as("us"),
          col("event_id")
        )
        val mxRow = ev.agg(max(col("us"))).head()
        // empty input: the oracle's grouped aggregate over no rows is empty
        if (mxRow.isNullAt(0)) {
          s.range(0)
            .select(
              lit("").as("event_type"),
              lit(0L).as("intervals"),
              lit(0L).as("total_state_sec")
            )
        } else {
          val maxUs = mxRow.getLong(0)
          val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
          ev.withColumn("valid_to", coalesce(lead(col("us"), 1).over(w), lit(maxUs)))
            .groupBy(col("event_type"))
            .agg(
              count(lit(1)).as("intervals"),
              expr("CAST(sum(valid_to - us) div 1000000L AS BIGINT)").as("total_state_sec")
            )
            .orderBy(col("event_type"))
        }
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
             |           FROM events),
             |mx AS (SELECT max(us) AS max_us FROM ev),
             |iv AS (SELECT event_type,
             |         coalesce(lead(us) OVER (PARTITION BY user_id
             |                                 ORDER BY us, event_id),
             |                  (SELECT max_us FROM mx)) - us AS dur_us
             |       FROM ev)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS intervals,
             |  CAST(sum(dur_us) // 1000000 AS BIGINT) AS total_state_sec
             |FROM iv
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)
    ),

    // Pareto concentration cut — the actionable companion to q161's Gini
    // scalar: the SMALLEST number of users whose purchase revenue covers
    // ≥ 80% of the total, plus their population share in bp. Needs a
    // DESCENDING global rank and a global prefix sum — both built
    // WITHOUT a single-partition window: range-repartition on negated
    // cents, per-partition local rank/cumsum from monotonically
    // _increasing_id (the q91/q135 two-pass recovery), and per-partition
    // (count, sum) offsets — 32 metadata rows — broadcast back. Exact
    // integer cents throughout; the 80% test is cum·10 ≥ total·8 (no
    // division). Scale shape: the heavy table shuffles ONCE by range;
    // everything global is partition metadata.
    Q(
      "q216_pareto_cut",
      (s, d) => {
        val rev = events(s, d)
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        val sorted = rev
          .withColumn("neg", -col("cents"))
          .repartitionByRange(32, col("neg"), col("user_id"))
          .sortWithinPartitions(col("neg"), col("user_id"))
        val stamped = Caches.persisted(
          sorted
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
            .withColumn("loc", col("mid").bitwiseAND(lit((1L << 33) - 1)))
        )
        val wOff = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
        val offsets = stamped
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("psum"))
          .withColumn("cnt_off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
          .withColumn("sum_off", coalesce(sum(col("psum")).over(wOff), lit(0L)))
        val wLoc = Window
          .partitionBy(col("pid"))
          .orderBy(col("loc"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = stamped.agg(count(lit(1)).as("n"), sum(col("cents")).as("t")).head()
        val nUsers = tot.getAs[Long]("n")
        // no purchases: the oracle's aggregate over the empty filtered set
        // is one all-NULL row
        if (nUsers == 0L) {
          val nul = lit(null).cast("long")
          s.range(1)
            .select(nul.as("users_total"), nul.as("cut_k"), nul.as("user_share_bp"))
        } else {
          val total = tot.getAs[Long]("t")
          stamped
            .join(broadcast(offsets.select(col("pid"), col("cnt_off"), col("sum_off"))), Seq("pid"))
            .withColumn("rk", col("cnt_off") + col("loc") + 1)
            .withColumn("cum", col("sum_off") + sum(col("cents")).over(wLoc))
            .filter(col("cum") * 10 >= lit(total) * 8)
            .agg(min(col("rk")).as("cut_k"))
            .select(
              lit(nUsers).as("users_total"),
              col("cut_k"),
              expr(s"(cut_k * 10000L) div ${nUsers}L").as("user_share_bp")
            )
        }
      },
      Some("""WITH rev AS (
             |  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |r AS (SELECT cents,
             |        sum(cents) OVER (ORDER BY cents DESC, user_id
             |                         ROWS UNBOUNDED PRECEDING) AS cum,
             |        row_number() OVER (ORDER BY cents DESC, user_id) AS rk,
             |        count(*) OVER () AS n, sum(cents) OVER () AS t
             |      FROM rev)
             |SELECT CAST(max(n) AS BIGINT) AS users_total,
             |  CAST(min(rk) AS BIGINT) AS cut_k,
             |  CAST(min(rk) * 10000 // max(n) AS BIGINT) AS user_share_bp
             |FROM r WHERE cum * 10 >= t * 8""".stripMargin)
    ),

    // Incremental view maintenance — the lakehouse refresh pattern: a
    // materialized per-(day, type) count view is brought current by
    // folding in ONLY the delta (here the event_id % 10 == 0 slice plays
    // the newly-arrived batch; the rest is the stale base view). The
    // maintained result is base FULL OUTER delta with summed counts —
    // delta-sized work — and distributive aggregates (sum/count) make it
    // ALGEBRAICALLY equal to recomputing over base ∪ delta, which is
    // exactly what the oracle does: the green hash IS the IVM
    // equivalence proof. At 100 TB the base view is a stored table and
    // only the delta is scanned; negative deltas (retractions) fold in
    // the same way with count −1 rows.
    Q(
      "q217_ivm_counts",
      (s, d) => {
        val ev = events(s, d).select(
          expr("unix_micros(ts) div 86400000000L").as("day"),
          col("event_type"),
          col("event_id")
        )
        val baseView = ev
          .filter(col("event_id") % 10 =!= 0)
          .groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val deltaAgg = ev
          .filter(col("event_id") % 10 === 0)
          .groupBy(col("day"), col("event_type"))
          .agg(count(lit(1)).as("dcnt"))
        baseView
          .join(deltaAgg, Seq("day", "event_type"), "full_outer")
          .select(
            col("day"),
            col("event_type"),
            (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L))).as("cnt")
          )
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT epoch_us(ts) // 86400000000 AS day, event_type,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY day, event_type""".stripMargin)
    ),

    // Market-basket pair mining — parts bought together on one order
    // (the retail co-occurrence analysis; the relational sibling of
    // q94's text collocations). The self-join is keyed on l_orderkey, so
    // its fan-out is bounded by per-order line count squared (~7² — the
    // q148 fan-out audit measures exactly this), never corpus²; pair
    // counts aggregate with map-side combine and the top 10 comes from
    // TakeOrderedAndProject. part_a < part_b canonicalizes the pair.
    Q(
      "q218_market_basket",
      (s, d) => {
        val lp = lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
        lp.as("a")
          .join(lp.as("b"), Seq("l_orderkey"))
          .filter(col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
          .agg(count(lit(1)).as("orders_together"))
          .orderBy(col("orders_together").desc, col("part_a"), col("part_b"))
          .limit(10)
      },
      Some("""WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |  CAST(count(*) AS BIGINT) AS orders_together
             |FROM lp a JOIN lp b
             |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |GROUP BY 1, 2
             |ORDER BY orders_together DESC, part_a, part_b
             |LIMIT 10""".stripMargin)
    ),

    // Bloom-filter false-positive-rate audit — the sizing check behind
    // q86's bloom pre-join: build the filter over the urgent order keys
    // at 10 bits/key (theoretical fpp ≈ 1%), probe it with the EXACT
    // complement (non-urgent keys — disjoint by construction, so every
    // hit is a false positive), and assert the measured rate stays under
    // 3× the target. The q99/q212 sketch convention: the filter bytes
    // are engine-specific, so the cross-engine contract is the exact
    // member/probe counts plus the bound as a boolean the oracle asserts
    // TRUE. A mis-sized or mis-hashed bloom reads ~50–100% FPR and fails
    // loudly. Scale shape: one aggregate builds ~n·10 bits, the probe
    // pass is map-only over the complement; both sides are one scan.
    Q(
      "q219_bloom_fpr_audit",
      (s, d) => {
        import org.apache.spark.sql.GraftColumns
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.catalyst.expressions.Literal
        val ord = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        val members = ord.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
        val nMembers = members.count()
        // BloomFilterAggregate requires positive sizing; with no members
        // every probe is trivially clean — mirror the oracle's aggregate
        // (all-NULL row on fully empty input, 0-member row otherwise)
        if (nMembers == 0L) {
          if (ord.isEmpty) {
            val nul = lit(null).cast("long")
            s.range(1).select(nul.as("members"), nul.as("probes"), lit(true).as("fpr_ok"))
          } else {
            ord
              .filter(col("o_orderpriority") =!= "1-URGENT")
              .agg(count(lit(1)).as("probes"))
              .select(lit(0L).as("members"), col("probes"), lit(true).as("fpr_ok"))
          }
        } else {
          val bloomAgg = GraftColumns.lift(
            new BloomFilterAggregate(
              new XxHash64(Seq(GraftColumns.unlift(col("o_orderkey")))),
              Literal(nMembers),
              Literal(nMembers * 10L)
            ).toAggregateExpression()
          )
          val bloom = members.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
          val mightContain = GraftColumns.lift(
            BloomFilterMightContain(
              Literal(bloom),
              new XxHash64(Seq(GraftColumns.unlift(col("o_orderkey"))))
            )
          )
          ord
            .filter(col("o_orderpriority") =!= "1-URGENT")
            .select(mightContain.cast("long").as("fp"))
            .agg(count(lit(1)).as("probes"), sum(col("fp")).as("false_pos"))
            .select(
              lit(nMembers).as("members"),
              col("probes"),
              (col("false_pos") * 1000L <= col("probes") * 30L).as("fpr_ok")
            )
        }
      },
      Some("""SELECT
             |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS members,
             |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END)
             |    AS BIGINT) AS probes,
             |  TRUE AS fpr_ok
             |FROM orders""".stripMargin)
    ),

    // Bounded-domain EXACT distinct via bitmap aggregation: each user's
    // active days pack into 64-day int64 words — word index
    // floor(day/64), bit pmod(day, 64) — so the per-(user, word) distinct
    // count is `bit_count(bit_or(1 << bit))`: 8 bytes of aggregation
    // state whose merge is a single OR, map-side combinable where
    // count(DISTINCT day) drags a per-group hash set through the shuffle
    // (the roaring-bitmap idea specialized to words). Summing bit_counts
    // across a user's words gives the exact total for ANY window width —
    // no envelope require(), so a wider generated corpus degrades to more
    // words per user (calendar-bounded: ~6 words/year) instead of
    // aborting the registry run. The oracle computes the SAME histogram
    // with count(DISTINCT ...), so the green hash proves the bitmap path
    // exact, not approximate. Output: distribution of users by number of
    // distinct active days.
    Q(
      "q220_bitmap_distinct",
      (s, d) => {
        val ev = events(s, d).select(
          col("user_id"),
          expr("unix_micros(ts) div 86400000000L").as("day")
        )
        ev
          .groupBy(col("user_id"), expr("(day - pmod(day, 64)) div 64").as("w"))
          .agg(
            expr("CAST(bit_count(bit_or(shiftleft(1L, CAST(pmod(day, 64) AS INT)))) AS BIGINT)")
              .as("wc")
          )
          .groupBy(col("user_id"))
          .agg(sum(col("wc")).as("active_days"))
          .groupBy(col("active_days"))
          .agg(count(lit(1)).as("users"))
          .orderBy(col("active_days"))
      },
      Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
             |pu AS (SELECT user_id,
             |         CAST(count(DISTINCT day) AS BIGINT) AS active_days
             |       FROM ev GROUP BY 1)
             |SELECT active_days, CAST(count(*) AS BIGINT) AS users
             |FROM pu
             |GROUP BY active_days
             |ORDER BY active_days""".stripMargin)
    ),

    // Rolling 7-day active users from WINDOWED sketch unions — the
    // WAU/MAU dashboard architecture: each day is HLL-sketched ONCE (one
    // corpus pass), and every rolling window is a union of ≤7 KB-sized
    // daily sketches — sketch-on-sketch math over calendar metadata,
    // never a re-scan per window (a 30-day dashboard re-scanning the
    // fact table 30× is the anti-pattern this replaces). Exact rolling
    // distinct is recomputed as the audit side (q100's convention) and
    // the estimate must stay within 15%; the oracle recomputes the exact
    // series and asserts the bound TRUE. The day×day range join is
    // calendar-metadata-sized on the sketch side.
    Q(
      "q222_rolling_distinct",
      (s, d) => {
        val ud = Caches.persisted(
          events(s, d)
            .select(col("user_id"), expr("unix_micros(ts) div 86400000000L").as("day"))
            .distinct()
        )
        val days = ud.select(col("day")).distinct()
        val dailySk = ud.groupBy(col("day")).agg(expr("hll_sketch_agg(user_id)").as("sk"))
        val est = days
          .as("t")
          .join(
            dailySk.as("s"),
            col("s.day") >= col("t.day") - 6 && col("s.day") <= col("t.day")
          )
          .groupBy(col("t.day").as("day"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_wau"))
        val exact = days
          .as("t")
          .join(ud.as("u"), col("u.day") >= col("t.day") - 6 && col("u.day") <= col("t.day"))
          .groupBy(col("t.day").as("day"))
          .agg(countDistinct(col("u.user_id")).as("exact_wau"))
        exact
          .join(est, Seq("day"))
          .select(
            col("day"),
            col("exact_wau"),
            (abs(col("approx_wau") - col("exact_wau")).cast("double") / col("exact_wau") < 0.15)
              .as("within_bound")
          )
          .orderBy(col("day"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
             |           FROM events),
             |days AS (SELECT DISTINCT day FROM ud)
             |SELECT t.day,
             |  CAST(count(DISTINCT u.user_id) AS BIGINT) AS exact_wau,
             |  TRUE AS within_bound
             |FROM days t JOIN ud u ON u.day BETWEEN t.day - 6 AND t.day
             |GROUP BY t.day
             |ORDER BY t.day""".stripMargin)
    ),

    // SLA-bounded funnel conversion — q98 asks WHETHER a user converted,
    // q102 how long it took; this asks whether conversion happened
    // WITHIN the service-level window (1 h of the user's first click) —
    // the deadline cut a growth team actually tracks. Per first-click
    // day: clicking users, users with ANY purchase after the click, and
    // users purchasing inside the deadline, plus the rate in bp. Scale
    // shape: both sides pre-aggregate per user (first click) / filter to
    // purchases before ONE user-keyed equi-join with a time residual;
    // exact integer µs.
    Q(
      "q223_funnel_deadline",
      (s, d) => {
        val ev = events(s, d).select(
          col("user_id"),
          col("event_type"),
          expr("unix_micros(ts)").as("us")
        )
        val firstClick = ev
          .filter(col("event_type") === "click")
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("click_us"))
        val purchases = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("us"))
        val flags = firstClick
          .join(purchases, Seq("user_id"), "left")
          .groupBy(col("user_id"), col("click_us"))
          .agg(
            max(when(col("us") >= col("click_us"), 1L).otherwise(0L)).as("converted"),
            max(
              when(col("us") >= col("click_us") && col("us") <= col("click_us") + 3600000000L, 1L)
                .otherwise(0L)
            ).as("converted_1h")
          )
        flags
          .groupBy(expr("click_us div 86400000000L").as("day"))
          .agg(
            count(lit(1)).as("clickers"),
            sum(col("converted")).as("converted"),
            sum(col("converted_1h")).as("converted_1h")
          )
          .withColumn("sla_bp", expr("(converted_1h * 10000L) div clickers"))
          .orderBy(col("day"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |fc AS (SELECT user_id, min(us) AS click_us FROM ev
             |       WHERE event_type = 'click' GROUP BY 1),
             |pu AS (SELECT user_id, us FROM ev WHERE event_type = 'purchase'),
             |fl AS (
             |  SELECT fc.user_id, fc.click_us,
             |    max(CASE WHEN pu.us >= fc.click_us THEN 1 ELSE 0 END) AS converted,
             |    max(CASE WHEN pu.us >= fc.click_us
             |              AND pu.us <= fc.click_us + 3600000000 THEN 1 ELSE 0 END)
             |      AS converted_1h
             |  FROM fc LEFT JOIN pu ON pu.user_id = fc.user_id
             |  GROUP BY 1, 2)
             |SELECT click_us // 86400000000 AS day,
             |  CAST(count(*) AS BIGINT) AS clickers,
             |  CAST(sum(converted) AS BIGINT) AS converted,
             |  CAST(sum(converted_1h) AS BIGINT) AS converted_1h,
             |  CAST(sum(converted_1h) * 10000 // count(*) AS BIGINT) AS sla_bp
             |FROM fl
             |GROUP BY 1
             |ORDER BY day""".stripMargin)
    ),

    // Sequential path mining — the top event TRIGRAMS users actually walk
    // (view>click>purchase vs view>view>view), where q104's transition
    // matrix only sees single steps: three-step paths expose loops and
    // detours a first-order Markov model averages away. Per-user lead()
    // windows stamp each event with its two successors (keyed partition
    // sort, no global window), paths aggregate with map-side combine,
    // and the top 10 comes from TakeOrderedAndProject — the unbounded
    // path-type table is never globally sorted (the q126 discipline).
    Q(
      "q225_event_paths",
      (s, d) => {
        val ev = events(s, d).select(
          col("user_id"),
          col("event_type"),
          expr("unix_micros(ts)").as("us"),
          col("event_id")
        )
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        ev.withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e2").isNotNull && col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("path"))
          .limit(10)
          .withColumn(
            "rank",
            row_number().over(Window.orderBy(col("cnt").desc, col("path"))).cast("long")
          )
          .orderBy(col("rank"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
             |           FROM events),
             |tri AS (
             |  SELECT event_type || '>' || lead(event_type) OVER w
             |           || '>' || lead(event_type, 2) OVER w AS path
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |c AS (SELECT path, CAST(count(*) AS BIGINT) AS cnt FROM tri
             |      WHERE path IS NOT NULL GROUP BY 1)
             |SELECT path, cnt, CAST(rank AS BIGINT) AS rank FROM (
             |  SELECT path, cnt, row_number() OVER (ORDER BY cnt DESC, path) AS rank
             |  FROM c) t
             |WHERE rank <= 10
             |ORDER BY rank""".stripMargin)
    ),

    // Fulfillment-latency SLA profile — ship-delay (days from order to
    // line shipment) percentiles per order priority: does the URGENT
    // tier actually ship faster, and by how much at the tail? The gap is
    // exact integer DAYS (tz-free date subtraction on both engines), so
    // the q73 interpolation convention applies: integer-valued inputs
    // keep quantile_cont/percentile bit-comparable under round(…,4).
    // Scale shape: one orderkey equi-join (lineitem shuffles once),
    // per-priority sort only within each group's percentile aggregate.
    Q(
      "q263_ship_delay", // renumbered from q226 (id collided with DedupOps' q226_minhash_error; the qNNN namespace is the cross-artifact join key)
      (s, d) =>
        lineitem(s, d)
          .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_day"))
          .join(
            orders(s, d).select(
              col("o_orderkey").as("l_orderkey"),
              col("o_orderpriority"),
              to_date(col("o_orderdate")).as("order_day")
            ),
            "l_orderkey"
          )
          .select(col("o_orderpriority"), datediff(col("ship_day"), col("order_day")).as("gap_days"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("cnt"),
            min(col("gap_days")).cast("long").as("min_days"),
            round(expr("percentile(gap_days, 0.5d)"), 4).as("p50_days"),
            round(expr("percentile(gap_days, 0.9d)"), 4).as("p90_days"),
            max(col("gap_days")).cast("long").as("max_days")
          )
          .orderBy(col("o_orderpriority")),
      Some("""WITH g AS (
             |  SELECT o_orderpriority,
             |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
             |      AS gap_days
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
             |SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(min(gap_days) AS BIGINT) AS min_days,
             |  round(quantile_cont(gap_days, 0.5), 4) AS p50_days,
             |  round(quantile_cont(gap_days, 0.9), 4) AS p90_days,
             |  CAST(max(gap_days) AS BIGINT) AS max_days
             |FROM g
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)
    ),

    // Layout planner: BEFORE rewriting 100 TB into a sorted layout
    // (sinks/Sinks.scala rangeSorted / zOrder), measure what each
    // candidate sort key would actually buy the dominant predicate. The
    // simulation: under sort key k the table splits into 32 equal-row
    // files (rank·32/n — exactly what writing through repartitionByRange
    // on k produces); a file is SKIPPED when its parquet footer
    // [min, max] of the predicate column can't intersect the filter
    // range — the same min/max pruning the scan does for real
    // (E1/PlanSpec pushdown). Reported per layout: files touched (of
    // 32), rows inside touched files, and the scan fraction in basis
    // points — sorting by the predicate column itself should collapse
    // the scan to ~the selectivity, while unrelated keys leave all 32
    // files hot (each file's min/max spans the whole date range). Ranks
    // come from the q91/q135 two-pass range-partition machinery — NO
    // global window; everything after the per-file aggregate is 32-row
    // metadata. The workload predicate is a 90-day order-date slice
    // (~3.7% of the 1995-2001 axis).
    Q(
      "q232_layout_skipping",
      (s, d) => {
        val o = orders(s, d).select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice"),
          to_date(col("o_orderdate")).as("od")
        )
        // persisted: the row-count scalar is referenced twice per layout —
        // uncached, each reference is a fresh full-table aggregate
        val tot = Caches.persisted(o.agg(count(lit(1)).as("n")))
        val lo = java.sql.Date.valueOf("1998-01-01")
        val hi = java.sql.Date.valueOf("1998-03-31")
        val layouts = Seq(
          ("orderdate", col("od").cast("timestamp").cast("long")),
          ("custkey", col("o_custkey").cast("long")),
          ("totalprice", col("o_totalprice"))
        )
        // The three per-layout RANK passes are inherently separate (three
        // sort orders), but everything downstream of them is identical
        // machinery — so the arms are stacked with a layout tag right
        // after ranking and the join → per-file rollup → pruning filter →
        // per-layout rollup chain plans and compiles ONCE over the tagged
        // union, instead of three times + a 3-arm unionByName of finished
        // aggregates (the q236 fold, applied here in r17: this was the
        // suite's second-worst measured Janino charge). groupBy(layout)
        // mirrors the oracle's `GROUP BY layout` exactly — including the
        // edge the fold changed (ADVICE r17): a layout whose files are ALL
        // pruned now drops out of the output (GROUP BY semantics) where
        // the old per-arm global aggregate emitted a files_scanned=0 row;
        // oracle-consistent, and unreachable while the pruning window
        // keeps ≥1 file per layout, but a real shape change if the window
        // ever tightens to empty.
        layouts
          .map { case (name, key) =>
            QualityOps.globalRanks(
              o.select(col("o_orderkey").as("doc_id"), key.as("v")),
              "v",
              "rk"
            ).select(lit(name).as("layout"), col("doc_id"), col("rk"))
          }
          .reduce(_.unionByName(_))
          .join(o.select(col("o_orderkey").as("doc_id"), col("od")), Seq("doc_id"))
          .crossJoin(broadcast(tot))
          .select(col("layout"), expr("((rk - 1) * 32L) div n").as("file"), col("od"))
          .groupBy(col("layout"), col("file"))
          .agg(min(col("od")).as("min_d"), max(col("od")).as("max_d"), count(lit(1)).as("n_rows"))
          .filter(!(col("max_d") < lit(lo) || col("min_d") > lit(hi)))
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("files_scanned"), sum(col("n_rows")).as("rows_scanned"))
          .crossJoin(broadcast(tot))
          .select(
            col("layout"),
            col("files_scanned"),
            col("rows_scanned"),
            expr("(rows_scanned * 10000L) div n").as("scan_bp")
          )
          .orderBy(col("layout"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice,
             |         CAST(o_orderdate AS DATE) AS od,
             |         CAST(epoch(o_orderdate) AS BIGINT) AS od_key
             |  FROM orders),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
             |r AS (
             |  SELECT 'orderdate' AS layout, od,
             |    CAST(row_number() OVER (ORDER BY od_key, o_orderkey) AS BIGINT) AS rk
             |  FROM o
             |  UNION ALL
             |  SELECT 'custkey', od,
             |    CAST(row_number() OVER (ORDER BY o_custkey, o_orderkey) AS BIGINT)
             |  FROM o
             |  UNION ALL
             |  SELECT 'totalprice', od,
             |    CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT)
             |  FROM o),
             |f AS (SELECT layout, ((rk - 1) * 32) // n AS file, od FROM r CROSS JOIN n),
             |pf AS (SELECT layout, file, min(od) AS min_d, max(od) AS max_d,
             |         CAST(count(*) AS BIGINT) AS n_rows
             |       FROM f GROUP BY 1, 2),
             |sc AS (SELECT layout, CAST(count(*) AS BIGINT) AS files_scanned,
             |         CAST(sum(n_rows) AS BIGINT) AS rows_scanned
             |       FROM pf
             |       WHERE NOT (max_d < DATE '1998-01-01' OR min_d > DATE '1998-03-31')
             |       GROUP BY 1)
             |SELECT layout, files_scanned, rows_scanned,
             |  (rows_scanned * 10000) // n AS scan_bp
             |FROM sc CROSS JOIN n
             |ORDER BY layout""".stripMargin)
    ),

    // Z-order locality audit — q232's question for the TWO-dimensional
    // predicate that single-key sorting can't serve: `o_orderdate IN a
    // 15% slice AND o_custkey IN a 15% band`. Sorting by date prunes
    // the date dimension but every surviving file spans all customers
    // (and vice versa); the z-order curve (sinks/Sinks.scala zOrder)
    // interleaves the bits of both keys so files are axis-aligned
    // rectangles and BOTH predicates prune multiplicatively. The curve
    // value is pure integer algebra — each key normalized to 16 bits via
    // (v−min)·65535/(max−min), bits interleaved with div/%-by-powers-of-
    // two (identical semantics in both engines on non-negative ints, no
    // engine bit-op dialect) — and file assignment + min/max pruning are
    // exactly q232's machinery (two-pass ranks, 32-row footer metadata,
    // a file is read only when BOTH column ranges intersect the
    // predicate, as real parquet row-group pruning ANDs pushed filters).
    Q(
      "q235_zorder_locality",
      (s, d) => {
        val o = orders(s, d).select(
          col("o_orderkey"),
          col("o_custkey").cast("long").as("ck"),
          datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1992-01-01")))
            .cast("long")
            .as("dk")
        )
        // persisted for the same reason as q232's `tot`: the stats scalar
        // feeds the normalization pass, the file assignment AND the
        // predicate bands — five references, one aggregate
        val stats = Caches.buildScope("q235_stats")(Caches.persisted(
          o.agg(
            count(lit(1)).as("n"),
            min(col("dk")).as("d_min"),
            max(col("dk")).as("d_max"),
            min(col("ck")).as("c_min"),
            max(col("ck")).as("c_max")
          )
        ))
        // bit-interleave via div/%: bit i of x lands at position 2i, of y
        // at 2i+1; `divOp` abstracts Spark `div` vs DuckDB `//`
        def zTerms(x: String, y: String, divOp: String): String =
          (0 until 16)
            .map(i =>
              s"(($x $divOp ${1L << i}) % 2) * ${1L << (2 * i)}" +
                s" + (($y $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
            )
            .mkString(" + ")
        // persisted: three layouts each take a rank pass over this frame —
        // without the cache the scalar-stats aggregate and the 32-term
        // z-interleave projection would re-run per layout (measured 8.5 s
        // cold vs 1.2 s warm on the full-suite bench)
        val norm = Caches.buildScope("q235_znorm")(Caches.persisted(
          o
            .crossJoin(broadcast(stats))
            .select(
              col("o_orderkey"),
              col("dk"),
              col("ck"),
              expr("(dk - d_min) * 65535L div greatest(1L, d_max - d_min)").as("d16"),
              expr("(ck - c_min) * 65535L div greatest(1L, c_max - c_min)").as("c16")
            )
            .withColumn("zv", expr(zTerms("d16", "c16", "div")))
        ))
        val layouts = Seq(
          ("orderdate", "dk"),
          ("custkey", "ck"),
          ("zorder", "zv")
        )
        // predicate bands are DATA-RELATIVE (15% of each key axis) so the
        // selectivity — and therefore the layout comparison — is the same
        // at every scale factor
        val bands = Seq(
          "d_min + (d_max - d_min) * 60L div 100 AS dp_lo",
          "d_min + (d_max - d_min) * 75L div 100 AS dp_hi",
          "c_min + (c_max - c_min) * 15L div 100 AS cp_hi"
        )
        // same arm-stacking fold as q232 (r17): three rank passes (three
        // sort orders — irreducible), ONE tagged join → per-(layout, file)
        // rollup → rectangle-pruning filter → per-layout rollup chain,
        // planned and compiled once (this query carried the suite's worst
        // measured Janino charge after the q236 fold). groupBy(layout)
        // mirrors the oracle's `GROUP BY layout` — including the all-files-
        // pruned edge: an empty layout drops from the output under GROUP BY
        // where the pre-fold per-arm aggregate emitted a zero row (see the
        // q232 comment; oracle-consistent, unreachable at current bands).
        layouts
          .map { case (name, key) =>
            QualityOps.globalRanks(
              norm.select(col("o_orderkey").as("doc_id"), col(key).as("v")),
              "v",
              "rk"
            ).select(lit(name).as("layout"), col("doc_id"), col("rk"))
          }
          .reduce(_.unionByName(_))
          .join(
            norm.select(col("o_orderkey").as("doc_id"), col("dk"), col("ck")),
            Seq("doc_id")
          )
          .crossJoin(broadcast(stats.select(col("n"))))
          .select(col("layout"), expr("((rk - 1) * 32L) div n").as("file"), col("dk"), col("ck"))
          .groupBy(col("layout"), col("file"))
          .agg(
            min(col("dk")).as("d_lo"),
            max(col("dk")).as("d_hi"),
            min(col("ck")).as("c_lo"),
            max(col("ck")).as("c_hi"),
            count(lit(1)).as("n_rows")
          )
          .crossJoin(broadcast(stats.selectExpr("c_min" +: bands: _*)))
          .filter(
            !(col("d_hi") < col("dp_lo") || col("d_lo") > col("dp_hi")) &&
              !(col("c_hi") < col("c_min") || col("c_lo") > col("cp_hi"))
          )
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("files_scanned"), sum(col("n_rows")).as("rows_scanned"))
          .crossJoin(broadcast(stats.select(col("n"))))
          .select(
            col("layout"),
            col("files_scanned"),
            col("rows_scanned"),
            expr("(rows_scanned * 10000L) div n").as("scan_bp")
          )
          .orderBy(col("layout"))
      },
      Some {
        def zTerms(x: String, y: String): String =
          (0 until 16)
            .map(i =>
              s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)}" +
                s" + (($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
            )
            .mkString(" + ")
        s"""WITH o AS (
           |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
           |    CAST(CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS BIGINT) AS dk
           |  FROM orders),
           |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    CAST(min(dk) AS BIGINT) AS d_min, CAST(max(dk) AS BIGINT) AS d_max,
           |    CAST(min(ck) AS BIGINT) AS c_min, CAST(max(ck) AS BIGINT) AS c_max
           |  FROM o),
           |nz AS (SELECT o_orderkey, dk, ck,
           |    (dk - d_min) * 65535 // greatest(1, d_max - d_min) AS d16,
           |    (ck - c_min) * 65535 // greatest(1, c_max - c_min) AS c16
           |  FROM o CROSS JOIN st),
           |z AS (SELECT o_orderkey, dk, ck, ${zTerms("d16", "c16")} AS zv FROM nz),
           |r AS (
           |  SELECT 'orderdate' AS layout, dk, ck,
           |    CAST(row_number() OVER (ORDER BY dk, o_orderkey) AS BIGINT) AS rk FROM z
           |  UNION ALL
           |  SELECT 'custkey', dk, ck,
           |    CAST(row_number() OVER (ORDER BY ck, o_orderkey) AS BIGINT) FROM z
           |  UNION ALL
           |  SELECT 'zorder', dk, ck,
           |    CAST(row_number() OVER (ORDER BY zv, o_orderkey) AS BIGINT) FROM z),
           |f AS (SELECT layout, ((rk - 1) * 32) // n AS file, dk, ck
           |      FROM r CROSS JOIN st),
           |pf AS (SELECT layout, file,
           |    min(dk) AS d_lo, max(dk) AS d_hi,
           |    min(ck) AS c_lo, max(ck) AS c_hi,
           |    CAST(count(*) AS BIGINT) AS n_rows
           |  FROM f GROUP BY 1, 2),
           |bd AS (SELECT c_min,
           |    d_min + (d_max - d_min) * 60 // 100 AS dp_lo,
           |    d_min + (d_max - d_min) * 75 // 100 AS dp_hi,
           |    c_min + (c_max - c_min) * 15 // 100 AS cp_hi
           |  FROM st),
           |sc AS (SELECT layout, CAST(count(*) AS BIGINT) AS files_scanned,
           |    CAST(sum(n_rows) AS BIGINT) AS rows_scanned
           |  FROM pf CROSS JOIN bd
           |  WHERE NOT (d_hi < dp_lo OR d_lo > dp_hi)
           |    AND NOT (c_hi < c_min OR c_lo > cp_hi)
           |  GROUP BY 1)
           |SELECT layout, files_scanned, rows_scanned,
           |  (rows_scanned * 10000) // n AS scan_bp
           |FROM sc CROSS JOIN st
           |ORDER BY layout""".stripMargin
      }
    ),

    // Column-encoding planner: the third layout decision (after q232's
    // sort key and q235's z-order) a 100 TB rewrite has to make — which
    // parquet encoding each column should get UNDER THE CHOSEN SORT
    // ORDER. Two exact statistics drive it: the distinct ratio (a
    // dictionary pays off when the value universe is tiny) and the mean
    // RUN length in layout order (RLE pays off when equal values are
    // adjacent — which the shipdate sort manufactures for the sort key
    // itself and destroys for everything uncorrelated with it). Run
    // counting never sorts globally: the q91/q135 stamped range-partition
    // frame, per-partition lag comparisons (ONE window pass computes all
    // four columns' lags), and the 32 partition-boundary pairs recovered
    // from per-partition first/last metadata rows. The decision rule —
    // mean run ≥ 8 → RLE, else distinct ratio ≤ 1% → dictionary, else
    // plain — is the standard writer heuristic, stated in the output so
    // the recommendation is auditable.
    Q(
      "q236_encoding_planner",
      (s, d) => {
        val base = lineitem(s, d).select(
          datediff(to_date(col("l_shipdate")), lit(java.sql.Date.valueOf("1992-01-01")))
            .cast("long")
            .as("shipday"),
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_returnflag"),
          expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"),
          col("l_partkey")
        )
        val cols = Seq("shipday", "l_returnflag", "qty", "l_partkey")
        val stamped = Caches.buildScope("q236_stamped")(Caches.persisted(
          base
            .repartitionByRange(32, col("shipday"), col("l_orderkey"), col("l_linenumber"))
            .sortWithinPartitions(col("shipday"), col("l_orderkey"), col("l_linenumber"))
            .withColumn("mid", monotonically_increasing_id())
            .withColumn("pid", shiftright(col("mid"), 33))
        ))
        val wLag = Window.partitionBy(col("pid")).orderBy(col("mid"))
        val lagged = stamped.select(
          Seq(col("pid"), col("mid")) ++ cols.map(c => col(c)) ++
            cols.map(c => lag(col(c), 1).over(wLag).as(s"prev_$c")): _*
        )
        // ONE pass over the cached frame yields BOTH the within-partition
        // run-break counts AND the per-partition first/last metadata rows
        // (r17 warm trim: the previous shape ran the window pass for the
        // break sums and a SECOND full groupBy(pid) pass for the bounds —
        // the per-pid grouping the window already established covers both)
        val perPid = lagged
          .groupBy(col("pid"))
          .agg(
            sum((col(cols.head) =!= col(s"prev_${cols.head}")).cast("long"))
              .as(s"w_${cols.head}"),
            (cols.tail.map(c => sum((col(c) =!= col(s"prev_$c")).cast("long")).as(s"w_$c")) ++
              cols.map(c => min_by(col(c), col("mid")).as(s"first_$c")) ++
              cols.map(c => max_by(col(c), col("mid")).as(s"last_$c"))): _*
          )
        // stitch the 32 partition-boundary pairs and fold them into the
        // same tiny aggregate that totals the within-partition breaks —
        // runs = breaks + 1, identical algebra to the previous
        // within/boundary split, one linear chain instead of two subtrees
        val wPid = Window.orderBy(col("pid"))
        val stitched = perPid.select(
          (col("pid") +: cols.map(c => col(s"w_$c"))) ++
            cols.map(c => col(s"first_$c")) ++
            cols.map(c => lag(col(s"last_$c"), 1).over(wPid).as(s"prevlast_$c")): _*
        )
        def brk(c: String) =
          (sum(col(s"w_$c")) +
            sum(
              (col(s"prevlast_$c").isNotNull && col(s"first_$c") =!= col(s"prevlast_$c"))
                .cast("long")
            )).as(s"b_$c")
        val breaks = stitched.agg(brk(cols.head), cols.tail.map(brk): _*)
        // distinct counts read the CACHED stamped frame, not the raw scan:
        // same rows (repartition/sort reorder only), no second parquet
        // decode of lineitem (r17 warm trim — this was a full re-scan)
        val nd = stamped.agg(
          count(lit(1)).as("n"),
          cols.map(c => countDistinct(col(c)).as(s"nd_$c")): _*
        )
        val one = breaks.crossJoin(broadcast(nd))
        // ONE plan, not a 4-arm union: the union form compiled four
        // whole-stage codegen passes over the same three aggregates (and
        // re-planned each aggregate per arm — 11.8 s measured Janino time,
        // the worst in the suite). `one` is a single row; exploding an
        // array of per-column structs emits the same four rows from one
        // compiled stage, and the aggregates plan exactly once.
        one
          .select(
            explode(array(cols.map { c =>
              struct(
                lit(c).as("col_name"),
                col(s"nd_$c").as("n_distinct"),
                (col(s"b_$c") + 1L).as("runs"),
                expr(s"n div (b_$c + 1L)").as("avg_run_len"),
                expr(s"(nd_$c * 10000L) div n").as("distinct_bp"),
                expr(
                  s"""CASE WHEN n div (b_$c + 1L) >= 8L THEN 'rle'
                     |     WHEN nd_$c * 100L <= n THEN 'dict'
                     |     ELSE 'plain' END""".stripMargin
                ).as("encoding")
              )
            }: _*)).as("r")
          )
          .select(col("r.*"))
          .orderBy(col("col_name"))
      },
      Some("""WITH base AS (
             |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT)
             |      AS shipday,
             |    l_orderkey, l_linenumber, l_returnflag,
             |    CAST(floor(l_quantity) AS BIGINT) AS qty, l_partkey
             |  FROM lineitem),
             |lg AS (
             |  SELECT shipday, l_returnflag, qty, l_partkey,
             |    lag(shipday) OVER w AS p_shipday,
             |    lag(l_returnflag) OVER w AS p_returnflag,
             |    lag(qty) OVER w AS p_qty,
             |    lag(l_partkey) OVER w AS p_partkey
             |  FROM base
             |  WINDOW w AS (ORDER BY shipday, l_orderkey, l_linenumber)),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(DISTINCT shipday) AS BIGINT) AS nd_shipday,
             |    CAST(count(DISTINCT l_returnflag) AS BIGINT) AS nd_returnflag,
             |    CAST(count(DISTINCT qty) AS BIGINT) AS nd_qty,
             |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_partkey,
             |    1 + CAST(sum(CASE WHEN p_shipday IS NOT NULL
             |        AND shipday <> p_shipday THEN 1 ELSE 0 END) AS BIGINT)
             |      AS r_shipday,
             |    1 + CAST(sum(CASE WHEN p_returnflag IS NOT NULL
             |        AND l_returnflag <> p_returnflag THEN 1 ELSE 0 END) AS BIGINT)
             |      AS r_returnflag,
             |    1 + CAST(sum(CASE WHEN p_qty IS NOT NULL
             |        AND qty <> p_qty THEN 1 ELSE 0 END) AS BIGINT) AS r_qty,
             |    1 + CAST(sum(CASE WHEN p_partkey IS NOT NULL
             |        AND l_partkey <> p_partkey THEN 1 ELSE 0 END) AS BIGINT)
             |      AS r_partkey
             |  FROM lg),
             |stacked AS (
             |  SELECT 'shipday' AS col_name, nd_shipday AS n_distinct,
             |    r_shipday AS runs, n FROM agg
             |  UNION ALL
             |  SELECT 'l_returnflag', nd_returnflag, r_returnflag, n FROM agg
             |  UNION ALL
             |  SELECT 'qty', nd_qty, r_qty, n FROM agg
             |  UNION ALL
             |  SELECT 'l_partkey', nd_partkey, r_partkey, n FROM agg)
             |SELECT col_name, n_distinct, runs,
             |  n // runs AS avg_run_len,
             |  (n_distinct * 10000) // n AS distinct_bp,
             |  CASE WHEN n // runs >= 8 THEN 'rle'
             |       WHEN n_distinct * 100 <= n THEN 'dict'
             |       ELSE 'plain' END AS encoding
             |FROM stacked
             |ORDER BY col_name""".stripMargin)
    ),

    // Partial-aggregation effectiveness audit — the aggregation-strategy
    // planner beside q232/q235/q236's layout planners. Map-side combine
    // shrinks shuffle traffic only when input partitions actually
    // CONTAIN repeats of the group key: the map-side output is Σ over
    // partitions of the per-partition distinct-key count, and when that
    // is close to the input row count the combine pass costs hash-table
    // work for nothing (the case Spark's own
    // spark.sql.aggregate.partialaggregate.skip heuristic watches for).
    // Simulated ingest partitions are 32 contiguous orderkey ranges (the
    // arrival order a writer produces — NOT a hash scramble, which would
    // fake uniformity); per candidate key the audit reports global
    // groups, map-side output rows, the shuffle-reduction in basis
    // points, and the combine/skip verdict at the 50% rule. Expected
    // spread on TPC-H-ish data: returnflag (3 groups) combines ~to
    // nothing, ship-month combines well, partkey barely combines —
    // partial aggregation there just burns CPU. Each candidate is one
    // (part, key) pre-aggregate — map-side combinable by construction —
    // feeding a metadata-sized rollup.
    Q(
      "q237_partial_agg_audit",
      (s, d) => {
        val stats = lineitem(s, d).agg(max(col("l_orderkey")).as("mk"))
        val o = lineitem(s, d)
          .select(
            col("l_orderkey"),
            col("l_returnflag"),
            col("l_partkey"),
            trunc(to_date(col("l_shipdate")), "month").as("ship_month")
          )
          .crossJoin(broadcast(stats))
          .withColumn("part", expr("l_orderkey * 32L div (mk + 1L)"))
        // Arm-stacking fold (r18; the q232/q235/q236 playbook): the three
        // candidate keys used to run as three separately planned+compiled
        // scan → groupBy(part, k) → global-agg chains glued by unionByName
        // — three passes over lineitem and the suite's 4th-worst Janino
        // charge (942 ms measured at the r18 baseline). One pass now
        // explodes each row into (group_key, k-as-string) and the whole
        // chain plans/compiles ONCE, grouped by (group_key, part, k) then
        // group_key. Casting k to string is injective per key type (date
        // and bigint render uniquely; returnflag already a string), so
        // group counts, distinct counts and rows_in are unchanged —
        // oracle-verified at sf0.01 + sf0.1.
        val keys = Seq("l_returnflag", "ship_month", "l_partkey")
        o.select(
            col("part"),
            explode(array(keys.map(k =>
              struct(lit(k).as("group_key"), col(k).cast("string").as("k"))): _*)).as("e")
          )
          .select(col("part"), col("e.group_key").as("group_key"), col("e.k").as("k"))
          .groupBy(col("group_key"), col("part"), col("k"))
          .agg(count(lit(1)).as("rows_in"))
          .groupBy(col("group_key"))
          .agg(
            count(lit(1)).as("mapside_rows"),
            countDistinct(col("k")).as("n_groups"),
            sum(col("rows_in")).as("n")
          )
          .select(
            col("group_key"),
            col("n_groups"),
            col("mapside_rows"),
            expr("(mapside_rows * 10000L) div n").as("reduction_bp"),
            expr(
              "CASE WHEN mapside_rows * 2L <= n THEN 'combine' ELSE 'skip' END"
            ).as("verdict")
          )
          .orderBy(col("group_key"))
      },
      Some("""WITH mk AS (SELECT CAST(max(l_orderkey) AS BIGINT) AS mk FROM lineitem),
             |o AS (
             |  SELECT l_returnflag, l_partkey,
             |    CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE)
             |      AS ship_month,
             |    l_orderkey * 32 // (mk + 1) AS part
             |  FROM lineitem CROSS JOIN mk),
             |g1 AS (SELECT part, l_returnflag AS k, CAST(count(*) AS BIGINT)
             |         AS rows_in FROM o GROUP BY 1, 2),
             |g2 AS (SELECT part, ship_month AS k, CAST(count(*) AS BIGINT)
             |         AS rows_in FROM o GROUP BY 1, 2),
             |g3 AS (SELECT part, l_partkey AS k, CAST(count(*) AS BIGINT)
             |         AS rows_in FROM o GROUP BY 1, 2),
             |stacked AS (
             |  SELECT 'l_returnflag' AS group_key,
             |    CAST(count(DISTINCT k) AS BIGINT) AS n_groups,
             |    CAST(count(*) AS BIGINT) AS mapside_rows,
             |    CAST(sum(rows_in) AS BIGINT) AS n
             |  FROM g1
             |  UNION ALL
             |  SELECT 'ship_month', CAST(count(DISTINCT k) AS BIGINT),
             |    CAST(count(*) AS BIGINT), CAST(sum(rows_in) AS BIGINT) FROM g2
             |  UNION ALL
             |  SELECT 'l_partkey', CAST(count(DISTINCT k) AS BIGINT),
             |    CAST(count(*) AS BIGINT), CAST(sum(rows_in) AS BIGINT) FROM g3)
             |SELECT group_key, n_groups, mapside_rows,
             |  (mapside_rows * 10000) // n AS reduction_bp,
             |  CASE WHEN mapside_rows * 2 <= n THEN 'combine' ELSE 'skip' END
             |    AS verdict
             |FROM stacked
             |ORDER BY group_key""".stripMargin)
    ),

    // Join-strategy planner — the decision Spark's JoinSelection makes
    // from size ESTIMATES, recomputed here from exact byte statistics so
    // a 100 TB operator can audit (and pre-pin, via hints) what the
    // planner will pick per dimension table. The byte model is
    // UnsafeRow's: one 8-byte null word + an 8-byte slot per field +
    // the actual payload bytes of each VARCHAR. The verdict mirrors the
    // real RULE SHAPES at test-scale constants: build side ≤ a 1 MiB
    // broadcast threshold → broadcast; else ≤ threshold × 32 shuffle
    // partitions (Spark's canBuildLocalHashMap) AND 3× smaller than the
    // fact side (Spark's muchSmaller, whose ×3 IS the literal Spark
    // constant) → shuffle_hash; else sort_merge. The 1 MiB / ×32 stand
    // in for the production defaults (10 MiB autoBroadcastJoinThreshold,
    // ×200 shuffle partitions) so the verdicts SPREAD at test SF — the
    // q239 discipline: the ratio logic is scale-free, the constants are
    // the tuning knobs. One metadata row per dimension; the only joins
    // here are the 1-row fact-stats broadcast.
    Q(
      "q238_join_strategy_planner",
      (s, d) => {
        def bytesOf(fixed: Long, varchars: Seq[String]): Column =
          varchars.foldLeft(lit(fixed).cast("long")) { (acc, c) =>
            acc + coalesce(length(col(c)).cast("long"), lit(0L))
          }
        // Stack-then-aggregate (r18; the q237 playbook adapted to six
        // DIFFERENT source tables): the six dimension arms used to each
        // plan+compile their own two-phase global aggregate (3rd-worst
        // measured Janino at the r18 baseline, 1013 ms). The arms still
        // scan their own tables — unavoidable — but each is now a trivial
        // map-only (build_table, row_bytes) projection; ONE grouped
        // aggregate over the union computes every table's count and byte
        // sum in a single compiled chain. Per-table sums/counts are
        // algebraically identical (no table is empty at any SF, so the
        // GROUP BY emits the same six rows the per-arm global aggregates
        // did). Oracle-verified at sf0.01 + sf0.1.
        def tagged(name: String, df: DataFrame, varchars: Seq[String]): DataFrame = {
          val fixed = 8L + 8L * df.schema.size
          df.select(lit(name).as("build_table"), bytesOf(fixed, varchars).as("row_bytes"))
        }
        val dims = Seq(
          tagged("customer", customer(s, d), Seq("c_name", "c_mktsegment")),
          tagged("nation", nation(s, d), Seq("n_name")),
          tagged("orders", orders(s, d), Seq("o_orderstatus", "o_orderpriority")),
          tagged("part", part(s, d), Seq("p_name", "p_brand", "p_type")),
          tagged("region", region(s, d), Seq("r_name")),
          tagged("supplier", supplier(s, d), Seq("s_name"))
        ).reduce(_.unionByName(_))
          .groupBy(col("build_table"))
          .agg(count(lit(1)).as("n_rows"), sum(col("row_bytes")).as("est_bytes"))
        val fact = lineitem(s, d)
          .agg(sum(bytesOf(8L + 8L * 11L, Seq("l_returnflag", "l_linestatus"))).as("fact_bytes"))
        dims
          .crossJoin(broadcast(fact))
          .select(
            col("build_table"),
            col("n_rows"),
            col("est_bytes"),
            col("fact_bytes"),
            expr(
              s"""CASE WHEN est_bytes <= ${1L << 20} THEN 'broadcast'
                 |     WHEN est_bytes <= ${(1L << 20) * 32} AND est_bytes * 3L <= fact_bytes
                 |       THEN 'shuffle_hash'
                 |     ELSE 'sort_merge' END""".stripMargin
            ).as("verdict")
          )
          .orderBy(col("build_table"))
      },
      Some(s"""WITH s AS (
             |  SELECT 'region' AS build_table, CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(sum(24 + coalesce(length(r_name), 0)) AS BIGINT) AS est_bytes
             |  FROM region
             |  UNION ALL
             |  SELECT 'nation', CAST(count(*) AS BIGINT),
             |    CAST(sum(32 + coalesce(length(n_name), 0)) AS BIGINT) FROM nation
             |  UNION ALL
             |  SELECT 'supplier', CAST(count(*) AS BIGINT),
             |    CAST(sum(40 + coalesce(length(s_name), 0)) AS BIGINT) FROM supplier
             |  UNION ALL
             |  SELECT 'customer', CAST(count(*) AS BIGINT),
             |    CAST(sum(48 + coalesce(length(c_name), 0)
             |      + coalesce(length(c_mktsegment), 0)) AS BIGINT) FROM customer
             |  UNION ALL
             |  SELECT 'part', CAST(count(*) AS BIGINT),
             |    CAST(sum(56 + coalesce(length(p_name), 0) + coalesce(length(p_brand), 0)
             |      + coalesce(length(p_type), 0)) AS BIGINT) FROM part
             |  UNION ALL
             |  SELECT 'orders', CAST(count(*) AS BIGINT),
             |    CAST(sum(56 + coalesce(length(o_orderstatus), 0)
             |      + coalesce(length(o_orderpriority), 0)) AS BIGINT) FROM orders),
             |f AS (
             |  SELECT CAST(sum(96 + coalesce(length(l_returnflag), 0)
             |    + coalesce(length(l_linestatus), 0)) AS BIGINT) AS fact_bytes
             |  FROM lineitem)
             |SELECT build_table, n_rows, est_bytes, fact_bytes,
             |  CASE WHEN est_bytes <= ${1L << 20} THEN 'broadcast'
             |       WHEN est_bytes <= ${(1L << 20) * 32} AND est_bytes * 3 <= fact_bytes
             |         THEN 'shuffle_hash'
             |       ELSE 'sort_merge' END AS verdict
             |FROM s CROSS JOIN f
             |ORDER BY build_table""".stripMargin)
    ),

    // Partitioned-write file planner — the small-files audit a 100 TB
    // sink runs BEFORE `write.partitionBy(month)`: a naive partitioned
    // write emits one file per (ingest task × partition value) — the
    // classic small-files explosion — while the right file count is
    // ceil(partition_bytes / target). Ingest tasks are simulated as 32
    // contiguous orderkey ranges (q237's deterministic stand-in for
    // arrival order); bytes ride q238's UnsafeRow width model. Per
    // month: rows, exact bytes, the naive fan-out (distinct ingest
    // tasks that touch the month), the planned count at a 1 MiB target
    // (the production value is 128 MiB — the ratio logic is
    // scale-free), and the verdict. At any SF where months ≪ tasks the
    // verdict is 'compact' everywhere — precisely the lesson: ALWAYS
    // repartition by the partition column (or let AQE coalesce) before
    // a partitioned write. Bucketing.writePartitioned does exactly that
    // (BucketingSpec pins one file per partition value).
    Q(
      "q239_partition_file_planner",
      (s, d) => {
        val target = 1L << 20
        val mk = lineitem(s, d).agg(max(col("l_orderkey")).as("mk"))
        val rowBytes = lit(96L) +
          coalesce(length(col("l_returnflag")).cast("long"), lit(0L)) +
          coalesce(length(col("l_linestatus")).cast("long"), lit(0L))
        lineitem(s, d)
          .select(
            trunc(to_date(col("l_shipdate")), "month").as("month"),
            col("l_orderkey"),
            rowBytes.as("b")
          )
          .crossJoin(broadcast(mk))
          .withColumn("task", expr("l_orderkey * 32L div (mk + 1L)"))
          .groupBy(col("month"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("b")).as("est_bytes"),
            countDistinct(col("task")).as("naive_files")
          )
          .select(
            col("month"),
            col("n_rows"),
            col("est_bytes"),
            col("naive_files"),
            expr(s"(est_bytes + ${target - 1}L) div ${target}L").as("files_at_target"),
            expr(
              s"CASE WHEN naive_files > (est_bytes + ${target - 1}L) div ${target}L" +
                " THEN 'compact' ELSE 'ok' END"
            ).as("verdict")
          )
          .orderBy(col("month"))
      },
      Some {
        // interpolated from the SAME constant as the Spark side so a
        // target change can't leave the two engines (or the two Spark
        // expressions) disagreeing
        val target = 1L << 20
        s"""WITH mk AS (SELECT CAST(max(l_orderkey) AS BIGINT) AS mk FROM lineitem),
           |o AS (
           |  SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE)
           |      AS month,
           |    l_orderkey * 32 // (mk + 1) AS task,
           |    96 + coalesce(length(l_returnflag), 0)
           |      + coalesce(length(l_linestatus), 0) AS b
           |  FROM lineitem CROSS JOIN mk),
           |g AS (
           |  SELECT month, CAST(count(*) AS BIGINT) AS n_rows,
           |    CAST(sum(b) AS BIGINT) AS est_bytes,
           |    CAST(count(DISTINCT task) AS BIGINT) AS naive_files
           |  FROM o GROUP BY 1)
           |SELECT month, n_rows, est_bytes, naive_files,
           |  (est_bytes + ${target - 1}) // $target AS files_at_target,
           |  CASE WHEN naive_files > (est_bytes + ${target - 1}) // $target
           |    THEN 'compact' ELSE 'ok' END AS verdict
           |FROM g
           |ORDER BY month""".stripMargin
      }
    ),

    // Bucket-count planner — the number Bucketing.writeBucketed needs
    // picked for it: buckets = the next power of two above
    // ceil(table_bytes / target_file) (powers of two so a future 2×
    // split/merge re-buckets without a full shuffle), then a balance
    // audit AT that count for each candidate key: per-bucket row counts
    // under a cross-engine md5 bucket assignment, max/avg in basis
    // points, and a 'salt' verdict when one bucket exceeds 1.2× the
    // mean (the q87 salted-join escape hatch). next-pow2 is integer
    // string algebra — 2^len(bin(n−1)) — no libm. Two aggregation
    // passes over the fact table (one per candidate key), both
    // map-side combinable; everything after is bucket-count-sized
    // metadata. (1 MiB target at test scale; production 128 MiB — the
    // ratio logic is scale-free.)
    Q(
      "q240_bucket_count_planner",
      (s, d) => {
        val rowBytes = lit(96L) +
          coalesce(length(col("l_returnflag")).cast("long"), lit(0L)) +
          coalesce(length(col("l_linestatus")).cast("long"), lit(0L))
        val plan = lineitem(s, d)
          .agg(sum(rowBytes).as("total_bytes"))
          .select(
            col("total_bytes"),
            expr("(total_bytes + 1048575L) div 1048576L").as("need_files")
          )
          .select(
            col("total_bytes"),
            col("need_files"),
            expr(
              """CASE WHEN need_files <= 1L THEN CAST(1 AS BIGINT)
                |     ELSE shiftleft(CAST(1 AS BIGINT), length(bin(need_files - 1L)))
                |     END""".stripMargin
            ).as("buckets")
          )
        // Arm-stacking fold (r18; the q237 playbook): the two candidate-key
        // audits used to run as two separately planned+compiled scan →
        // md5-bucket → two-level-agg chains (2nd-worst measured Janino at
        // the r18 baseline, 1025 ms). One scan now explodes each row into
        // (bucket_key, key-as-string) and the chain compiles once; the md5
        // input is the same string cast the per-arm audit applied, so
        // bucket assignments — and every downstream count — are unchanged.
        // Oracle-verified at sf0.01 + sf0.1.
        val auditKeys = Seq("l_orderkey", "l_partkey")
        lineitem(s, d)
          .select(explode(array(auditKeys.map(k =>
            struct(lit(k).as("bucket_key"), col(k).cast("string").as("k"))): _*)).as("e"))
          .select(col("e.bucket_key").as("bucket_key"), col("e.k").as("k"))
          .crossJoin(broadcast(plan))
          .select(
            col("bucket_key"),
            expr("cast(conv(substring(md5(k), 1, 4), 16, 10) as bigint) % buckets").as("b"),
            col("buckets"),
            col("total_bytes"),
            col("need_files")
          )
          .groupBy(col("bucket_key"), col("b"), col("buckets"), col("total_bytes"), col("need_files"))
          .agg(count(lit(1)).as("rows_in"))
          .groupBy(col("bucket_key"), col("buckets"), col("total_bytes"), col("need_files"))
          .agg(
            count(lit(1)).as("nonempty_buckets"),
            max(col("rows_in")).as("max_bucket_rows"),
            sum(col("rows_in")).as("n")
          )
          .select(
            col("bucket_key"),
            col("total_bytes"),
            col("need_files"),
            col("buckets"),
            col("nonempty_buckets"),
            col("max_bucket_rows"),
            expr("n div buckets").as("avg_bucket_rows"),
            expr("(max_bucket_rows * 10000L) div greatest(1L, n div buckets)").as("skew_bp")
          )
          .withColumn(
            "verdict",
            expr("CASE WHEN skew_bp > 12000L THEN 'salt' ELSE 'ok' END")
          )
          .orderBy(col("bucket_key"))
      },
      Some {
        def hex4 = (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5(k), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
          )
          .mkString("(", " + ", ")")
        def side(key: String, cte: String) =
          s"""a_$cte AS (
             |  SELECT $hex4 % buckets AS b, buckets, total_bytes, need_files
             |  FROM (SELECT CAST($key AS VARCHAR) AS k FROM lineitem) CROSS JOIN pb),
             |g_$cte AS (
             |  SELECT b, buckets, total_bytes, need_files,
             |    CAST(count(*) AS BIGINT) AS rows_in
             |  FROM a_$cte GROUP BY 1, 2, 3, 4),
             |s_$cte AS (
             |  SELECT '$key' AS bucket_key, total_bytes, need_files, buckets,
             |    CAST(count(*) AS BIGINT) AS nonempty_buckets,
             |    CAST(max(rows_in) AS BIGINT) AS max_bucket_rows,
             |    CAST(sum(rows_in) AS BIGINT) // buckets AS avg_bucket_rows,
             |    (CAST(max(rows_in) AS BIGINT) * 10000)
             |      // greatest(1, CAST(sum(rows_in) AS BIGINT) // buckets) AS skew_bp
             |  FROM g_$cte GROUP BY 2, 3, 4)""".stripMargin
        s"""WITH st AS (
           |  SELECT CAST(sum(96 + coalesce(length(l_returnflag), 0)
           |    + coalesce(length(l_linestatus), 0)) AS BIGINT) AS total_bytes
           |  FROM lineitem),
           |pl AS (
           |  SELECT total_bytes, (total_bytes + 1048575) // 1048576 AS need_files
           |  FROM st),
           |pb AS (
           |  SELECT total_bytes, need_files,
           |    CASE WHEN need_files <= 1 THEN CAST(1 AS BIGINT)
           |         ELSE CAST(1 AS BIGINT) << length(bin(need_files - 1)) END AS buckets
           |  FROM pl),
           |${side("l_orderkey", "ok")},
           |${side("l_partkey", "pk")}
           |SELECT bucket_key, total_bytes, need_files, buckets, nonempty_buckets,
           |  max_bucket_rows, avg_bucket_rows, skew_bp,
           |  CASE WHEN skew_bp > 12000 THEN 'salt' ELSE 'ok' END AS verdict
           |FROM (SELECT * FROM s_ok UNION ALL SELECT * FROM s_pk)
           |ORDER BY bucket_key""".stripMargin
      }
    ),

    // Pure-SQL as-of join through the graft_asof_join TABLE function —
    // the q19/q180 point-in-time semantics reached with nothing but
    // spark.sql, proving the full SQL surface (plans/TableFunctions)
    // against the DuckDB window-rank oracle in the driver's gate. Per
    // user: clicks that had a prior view, summed view→click gap and
    // viewed value. The TVF delegates to the same planFor core as the
    // DataFrame API, so this also pins the native AsOfJoinExec (one
    // forward merge per partition, O(1) state) behind the SQL entry.
    Q(
      "q241_asof_sql_surface",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .createOrReplaceTempView("g241_clicks")
        ev.filter(col("event_type") === "view")
          .select(
            col("event_id").as("view_id"),
            col("user_id").as("v_user"),
            col("ts").as("vts"),
            col("value").as("view_value")
          )
          .createOrReplaceTempView("g241_views")
        s.sql(
          """SELECT user_id,
            |  count(*) AS clicks,
            |  sum((unix_micros(ts) - unix_micros(vts)) div 1000000L) AS gap_seconds,
            |  sum(CAST(round(view_value * 100) AS BIGINT)) AS viewed_cents
            |FROM graft_asof_join(TABLE(g241_clicks), TABLE(g241_views),
            |                     'user_id', 'v_user', 'ts', 'vts', 'view_id')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH c AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
             |v AS (
             |  SELECT event_id AS view_id, user_id AS v_user, ts AS vts,
             |    value AS view_value
             |  FROM events WHERE event_type = 'view'),
             |m AS (
             |  SELECT * FROM (
             |    SELECT c.user_id, c.ts, v.vts, v.view_value,
             |      row_number() OVER (PARTITION BY c.event_id
             |                         ORDER BY v.vts DESC, v.view_id DESC) AS rk
             |    FROM c JOIN v ON v.v_user = c.user_id AND v.vts <= c.ts) t
             |  WHERE rk = 1)
             |SELECT user_id,
             |  CAST(count(*) AS BIGINT) AS clicks,
             |  CAST(sum((epoch_us(ts) - epoch_us(vts)) // 1000000) AS BIGINT)
             |    AS gap_seconds,
             |  CAST(sum(CAST(round(view_value * 100) AS BIGINT)) AS BIGINT)
             |    AS viewed_cents
             |FROM m
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Pure-SQL interval join through the graft_interval_join TABLE
    // function — q202's session-membership invariant (every event in
    // exactly one 30-min-gap session, Σ n_events = |events|) with the
    // sessionization AND the join both written in spark.sql. The second
    // TVF carried through the oracle gate, beside q241's as-of.
    Q(
      "q242_interval_sql_surface",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .createOrReplaceTempView("g242_events")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g242_events),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS s_user, sid, min(us) AS s_start, max(us) AS s_end
            |FROM s3 GROUP BY 1, 2""".stripMargin
        ).createOrReplaceTempView("g242_sessions")
        s.sql(
          """SELECT s_user AS user_id, CAST(sid AS BIGINT) AS sid,
            |  count(*) AS n_events, CAST(min(s_start) AS BIGINT) AS s_start
            |FROM graft_interval_join(TABLE(g242_events), TABLE(g242_sessions),
            |                         'user_id', 's_user', 'us', 's_start', 's_end')
            |GROUP BY 1, 2
            |ORDER BY 1, 2""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |sess AS (
             |  SELECT user_id, sid, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY 1, 2)
             |SELECT sess.user_id, CAST(sess.sid AS BIGINT) AS sid,
             |  count(*) AS n_events, CAST(min(s_start) AS BIGINT) AS s_start
             |FROM e JOIN sess ON e.user_id = sess.user_id
             |  AND e.us >= sess.s_start AND e.us <= sess.s_end
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)
    ),

    // Interval SEMI join through the TVF's mode argument: per user, how
    // many events fall inside a LONG (≥ 10 min) session of that user —
    // the EXISTS-containment idiom ("keep points covered by a validity
    // window") on the native sweep-line exec's existence mode, which
    // emits each covered point once, left columns only, instead of
    // fanning out pairs and deduplicating. Oracle: DuckDB EXISTS.
    Q(
      "q243_long_session_members",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .createOrReplaceTempView("g243_events")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g243_events),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS s_user, min(us) AS s_start, max(us) AS s_end
            |FROM s3 GROUP BY user_id, sid
            |HAVING max(us) - min(us) >= 600000000""".stripMargin
        ).createOrReplaceTempView("g243_long_sessions")
        s.sql(
          """SELECT user_id, count(*) AS n_in
            |FROM graft_interval_join(TABLE(g243_events), TABLE(g243_long_sessions),
            |                         'user_id', 's_user', 'us', 's_start', 's_end',
            |                         'semi')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |longsess AS (
             |  SELECT user_id, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY user_id, sid
             |  HAVING max(us) - min(us) >= 600000000)
             |SELECT e.user_id, count(*) AS n_in
             |FROM e
             |WHERE EXISTS (SELECT 1 FROM longsess s
             |              WHERE s.user_id = e.user_id
             |                AND e.us BETWEEN s.s_start AND s.s_end)
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Interval ANTI join written as plain NOT EXISTS + BETWEEN SQL — the
    // purge idiom ("drop points inside any tombstone window"), and the
    // exact shape RangeJoinRewrite rewrites to the sweep-line exec's Anti
    // mode once both sides outgrow the broadcast threshold (at oracle
    // scale Spark's broadcast anti join serves it — same result, proven
    // equal by RangeJoinRewriteSpec's null-inclusive differentials).
    // Per user: events OUTSIDE every long session, i.e. the complement of
    // q243 within each user's event set.
    Q(
      "q244_unsessioned_purge",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .createOrReplaceTempView("g244_events")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g244_events),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS s_user, min(us) AS s_start, max(us) AS s_end
            |FROM s3 GROUP BY user_id, sid
            |HAVING max(us) - min(us) >= 600000000""".stripMargin
        ).createOrReplaceTempView("g244_long_sessions")
        s.sql(
          """SELECT e.user_id, count(*) AS n_out
            |FROM g244_events e
            |WHERE NOT EXISTS (SELECT 1 FROM g244_long_sessions s
            |                  WHERE s.s_user = e.user_id
            |                    AND e.us BETWEEN s.s_start AND s.s_end)
            |GROUP BY e.user_id
            |ORDER BY e.user_id""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |longsess AS (
             |  SELECT user_id, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY user_id, sid
             |  HAVING max(us) - min(us) >= 600000000)
             |SELECT e.user_id, count(*) AS n_out
             |FROM e
             |WHERE NOT EXISTS (SELECT 1 FROM longsess s
             |                  WHERE s.user_id = e.user_id
             |                    AND e.us BETWEEN s.s_start AND s.s_end)
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Interval OUTER join through the TVF's mode argument — the
    // enrichment twin of q243/q244: every event annotated with its long
    // session (null-extended when uncovered), rolled up per user to
    // total events, covered events, and the summed span of the matched
    // sessions. Long sessions of one user are disjoint by construction,
    // so each event matches at most one window and the aggregate is
    // deterministic. This is the same LEFT JOIN ... ON k = rk AND t
    // BETWEEN s AND e plan shape RangeJoinRewrite now rewrites to the
    // Outer mode once both sides outgrow the broadcast threshold
    // (equality pinned by RangeJoinRewriteSpec's null-inclusive
    // differentials); routing through the TVF runs the native exec's
    // Outer mode under the DuckDB oracle gate at every scale.
    Q(
      "q245_session_enrichment",
      (s, d) => {
        graft.GraftExtensions.register(s)
        events(s, d)
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
          .createOrReplaceTempView("g245_events")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g245_events),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS s_user, min(us) AS s_start, max(us) AS s_end
            |FROM s3 GROUP BY user_id, sid
            |HAVING max(us) - min(us) >= 600000000""".stripMargin
        ).createOrReplaceTempView("g245_long_sessions")
        s.sql(
          """SELECT user_id, count(*) AS n_events,
            |  count(s_start) AS n_covered,
            |  coalesce(sum(s_end - s_start), 0L) AS covered_span_us
            |FROM graft_interval_join(TABLE(g245_events), TABLE(g245_long_sessions),
            |                         'user_id', 's_user', 'us', 's_start', 's_end',
            |                         'outer')
            |GROUP BY user_id
            |ORDER BY user_id""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |longsess AS (
             |  SELECT user_id, min(us) AS s_start, max(us) AS s_end
             |  FROM s3 GROUP BY user_id, sid
             |  HAVING max(us) - min(us) >= 600000000)
             |SELECT e.user_id, count(*) AS n_events,
             |  count(s.s_start) AS n_covered,
             |  CAST(coalesce(sum(s.s_end - s.s_start), 0) AS BIGINT) AS covered_span_us
             |FROM e LEFT JOIN longsess s
             |  ON s.user_id = e.user_id AND e.us BETWEEN s.s_start AND s.s_end
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Interval FULL OUTER join through the TVF's 'full' mode — two-sided
    // reconciliation in ONE sweep: purchases attributed to a browse
    // window, ORPHAN purchases (no browsing nearby — the broken-funnel
    // signal), and IDLE browse windows (no purchase — abandonment), the
    // q97/q120 full-outer-reconcile pattern lifted from equi keys to
    // containment. Browse windows are view/click sessions (2 h gap)
    // padded ±1 h; consecutive sessions of one user are > 2 h apart, so
    // padded windows stay disjoint and every purchase matches ≤ 1 window
    // (counts deterministic). Spark's plan for this FULL JOIN shape is an
    // SMJ on the key alone with per-group range filtering — hot-key group
    // buffering on BOTH preserved sides; the sweep holds only active
    // windows and emits each orphan at its skip site.
    Q(
      "q248_attribution_reconcile",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
          .select(
            col("event_id"),
            col("user_id"),
            unix_micros(col("ts")).as("us"),
            col("event_type")
          )
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("us"))
          .createOrReplaceTempView("g248_purchases")
        ev.filter(col("event_type").isin("view", "click"))
          .createOrReplaceTempView("g248_browse")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g248_browse),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 7200000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS s_user, min(us) - 3600000000 AS s_start,
            |  max(us) + 3600000000 AS s_end
            |FROM s3 GROUP BY user_id, sid""".stripMargin
        ).createOrReplaceTempView("g248_windows")
        s.sql(
          """SELECT coalesce(user_id, s_user) AS uid,
            |  count(CASE WHEN event_id IS NOT NULL AND s_start IS NOT NULL
            |             THEN 1 END) AS n_attributed,
            |  count(CASE WHEN s_start IS NULL THEN 1 END) AS n_orphan_purchases,
            |  count(CASE WHEN event_id IS NULL THEN 1 END) AS n_idle_windows
            |FROM graft_interval_join(TABLE(g248_purchases), TABLE(g248_windows),
            |                         'user_id', 's_user', 'us', 's_start', 's_end',
            |                         'full')
            |GROUP BY 1
            |ORDER BY 1""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
             |b AS (SELECT * FROM e WHERE event_type IN ('view', 'click')),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM b),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 7200000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |w AS (
             |  SELECT user_id AS s_user, min(us) - 3600000000 AS s_start,
             |    max(us) + 3600000000 AS s_end
             |  FROM s3 GROUP BY user_id, sid),
             |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
             |SELECT coalesce(p.user_id, w.s_user) AS uid,
             |  count(CASE WHEN p.event_id IS NOT NULL AND w.s_start IS NOT NULL
             |             THEN 1 END) AS n_attributed,
             |  count(CASE WHEN w.s_start IS NULL THEN 1 END) AS n_orphan_purchases,
             |  count(CASE WHEN p.event_id IS NULL THEN 1 END) AS n_idle_windows
             |FROM p FULL JOIN w
             |  ON w.s_user = p.user_id AND p.us BETWEEN w.s_start AND w.s_end
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // q248's reconcile written as PLAIN SQL `FULL JOIN … ON k = rk AND t
    // BETWEEN s AND e` — no TVF: this is the shape RangeJoinRewrite now
    // rewrites to the FullOuter sweep even at oracle scale, because the
    // broadcast cost guard is bypassed for FULL OUTER (JoinSelection can
    // never broadcast it — without the rewrite even a tiny input lands on
    // the key-only SMJ buffering both preserved sides per key group).
    // Semantics: incident exposure — clicks during a user's ERROR-burst
    // windows (error sessions at 1 h gap, padded ±15 min; consecutive
    // bursts are > 1 h apart so padded windows stay disjoint and every
    // click matches ≤ 1 window), CLEAN clicks (no incident nearby), and
    // SILENT incidents (no clicks — the outage-that-nobody-clicked-through
    // signal), all classified in ONE pass.
    Q(
      "q249_incident_exposure",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
          .select(
            col("event_id"),
            col("user_id"),
            unix_micros(col("ts")).as("us"),
            col("event_type")
          )
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("us"))
          .createOrReplaceTempView("g249_clicks")
        ev.filter(col("event_type") === "error")
          .createOrReplaceTempView("g249_errors")
        s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g249_errors),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS w_user, min(us) - 900000000 AS w_start,
            |  max(us) + 900000000 AS w_end
            |FROM s3 GROUP BY user_id, sid""".stripMargin
        ).createOrReplaceTempView("g249_windows")
        s.sql(
          """SELECT coalesce(user_id, w_user) AS uid,
            |  count(CASE WHEN event_id IS NOT NULL AND w_start IS NOT NULL
            |             THEN 1 END) AS n_exposed_clicks,
            |  count(CASE WHEN w_start IS NULL THEN 1 END) AS n_clean_clicks,
            |  count(CASE WHEN event_id IS NULL THEN 1 END) AS n_silent_incidents
            |FROM g249_clicks FULL JOIN g249_windows
            |  ON user_id = w_user AND us BETWEEN w_start AND w_end
            |GROUP BY 1
            |ORDER BY 1""".stripMargin
        )
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
             |err AS (SELECT * FROM e WHERE event_type = 'error'),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM err),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |w AS (
             |  SELECT user_id AS w_user, min(us) - 900000000 AS w_start,
             |    max(us) + 900000000 AS w_end
             |  FROM s3 GROUP BY user_id, sid),
             |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click')
             |SELECT coalesce(c.user_id, w.w_user) AS uid,
             |  count(CASE WHEN c.event_id IS NOT NULL AND w.w_start IS NOT NULL
             |             THEN 1 END) AS n_exposed_clicks,
             |  count(CASE WHEN w.w_start IS NULL THEN 1 END) AS n_clean_clicks,
             |  count(CASE WHEN c.event_id IS NULL THEN 1 END) AS n_silent_incidents
             |FROM c FULL JOIN w
             |  ON w.w_user = c.user_id AND c.us BETWEEN w.w_start AND w.w_end
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    ),

    // Sessionization through Spark's NATIVE session_window AGGREGATION —
    // the scale- and streaming-capable path beside q243-q249's
    // window-function construction: one aggregate with mergeable session
    // state (no global per-key sort barrier), and the IDENTICAL call
    // works under `readStream` with a watermark (EventTimeSpec pins the
    // streaming shape). Semantics (Spark's, verified empirically on this
    // build): each event opens [t, t + gap) and sessions merge while the
    // next start is <= the current end — so events EXACTLY gap apart
    // merge, and a new session starts only when the inter-event gap is
    // STRICTLY greater than gap; a session ends at last_event + gap. The
    // DuckDB oracle replays exactly that rule with lag/cumsum: new_s
    // when us - prev_us > gap, s_end = max(us) + gap.
    Q(
      "q250_native_session_window",
      (s, d) => {
        val sessions = events(s, d)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            unix_micros(col("session_window.start")).as("s_start"),
            unix_micros(col("session_window.end")).as("s_end"),
            col("n_events")
          )
        sessions
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_sessions"),
            sum(col("s_end") - col("s_start")).as("total_session_us"),
            max(col("n_events")).as("max_session_events")
          )
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
             |  WHERE event_type IN ('view', 'click', 'purchase')),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             |    AS prev_us
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |w AS (
             |  SELECT user_id, min(us) AS s_start, max(us) + 1800000000 AS s_end,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM s3 GROUP BY user_id, sid)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(s_end - s_start) AS BIGINT) AS total_session_us,
             |  CAST(max(n_events) AS BIGINT) AS max_session_events
             |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // DYNAMIC-gap sessionization: session_window with a per-event gap
    // EXPRESSION (purchases hold a session open 1 h, errors 5 min,
    // browsing 15 min — engagement-weighted timeout, the e-commerce
    // idiom). Verified semantics (empirically, this build): each event
    // opens [t, t + gap(event)); sessions merge while the next start is
    // <= the RUNNING MAX of merged ends (exactly-at-end merges), so the
    // session end is max(t_i + gap_i). The DuckDB oracle replays that
    // with a running-max window over the previous rows' (us + gap):
    // new session when us STRICTLY exceeds it. Output adds the
    // converted-session count (sessions containing a purchase).
    Q(
      "q251_dynamic_gap_sessions",
      (s, d) => {
        val gap = when(col("event_type") === "purchase", lit("1 hour"))
          .when(col("event_type") === "error", lit("5 minutes"))
          .otherwise(lit("15 minutes"))
        val sessions = events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), gap))
          .agg(
            count(lit(1)).as("n_events"),
            max((col("event_type") === "purchase").cast("long")).as("has_purchase")
          )
          .select(
            col("user_id"),
            unix_micros(col("session_window.start")).as("s_start"),
            unix_micros(col("session_window.end")).as("s_end"),
            col("n_events"),
            col("has_purchase")
          )
        sessions
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_sessions"),
            sum(col("has_purchase")).as("n_purchase_sessions"),
            sum(col("s_end") - col("s_start")).as("total_session_us"),
            max(col("n_events")).as("max_session_events")
          )
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
             |    CASE WHEN event_type = 'purchase' THEN 3600000000
             |         WHEN event_type = 'error' THEN 300000000
             |         ELSE 900000000 END AS gap_us
             |  FROM events),
             |s1 AS (
             |  SELECT *, max(us + gap_us) OVER (
             |      PARTITION BY user_id ORDER BY us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |    AS prev_end
             |  FROM e),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_end IS NULL OR us > prev_end
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |w AS (
             |  SELECT user_id, min(us) AS s_start, max(us + gap_us) AS s_end,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS has_purchase
             |  FROM s3 GROUP BY user_id, sid)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(has_purchase) AS BIGINT) AS n_purchase_sessions,
             |  CAST(sum(s_end - s_start) AS BIGINT) AS total_session_us,
             |  CAST(max(n_events) AS BIGINT) AS max_session_events
             |FROM w GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // Join-mode DEMOTION carried through the oracle gate: the "write the
    // reconcile once, slice it later" pattern — a shared full-outer
    // click/incident frame (q249's) narrowed to the click-side report by
    // a null-intolerant filter. CustomJoinOptimization must demote the
    // FullOuter sweep to the point-OUTER mode (unmatched intervals can't
    // pass `event_id IS NOT NULL`) and then push the filter into the
    // left scan — RangeJoinRewriteSpec pins exactly that optimized plan
    // on real parquet. Semantically a LEFT JOIN, which is the oracle.
    Q(
      "q252_click_exposure_rate",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val ev = events(s, d)
          .select(
            col("event_id"),
            col("user_id"),
            unix_micros(col("ts")).as("us"),
            col("event_type")
          )
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("us"))
        ev.filter(col("event_type") === "error").createOrReplaceTempView("g252_errors")
        val windows = s.sql(
          """WITH s1 AS (
            |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
            |    AS prev_us
            |  FROM g252_errors),
            |s2 AS (
            |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
            |                 THEN 1L ELSE 0L END AS new_s
            |  FROM s1),
            |s3 AS (
            |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
            |                             ROWS UNBOUNDED PRECEDING) AS sid
            |  FROM s2)
            |SELECT user_id AS w_user, min(us) - 900000000 AS w_start,
            |  max(us) + 900000000 AS w_end
            |FROM s3 GROUP BY user_id, sid""".stripMargin
        )
        graft.plans.Interval
          .intervalFullOuterJoin(clicks, windows,
            Seq("user_id"), Seq("w_user"), "us", "w_start", "w_end")
          .filter(col("event_id").isNotNull) // demotes FullOuter -> Outer
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_clicks"),
            count(col("w_start")).as("n_exposed"),
            (count(col("w_start")) * 10000L / count(lit(1))).cast("long").as("exposed_bp")
          )
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
             |err AS (SELECT * FROM e WHERE event_type = 'error'),
             |s1 AS (
             |  SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
             |  FROM err),
             |s2 AS (
             |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000
             |                 THEN 1 ELSE 0 END AS new_s
             |  FROM s1),
             |s3 AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
             |                             ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s2),
             |w AS (
             |  SELECT user_id AS w_user, min(us) - 900000000 AS w_start,
             |    max(us) + 900000000 AS w_end
             |  FROM s3 GROUP BY user_id, sid),
             |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click')
             |SELECT c.user_id, CAST(count(*) AS BIGINT) AS n_clicks,
             |  CAST(count(w.w_start) AS BIGINT) AS n_exposed,
             |  CAST(count(w.w_start) * 10000 // count(*) AS BIGINT) AS exposed_bp
             |FROM c LEFT JOIN w
             |  ON w.w_user = c.user_id AND c.us BETWEEN w.w_start AND w.w_end
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)
    )
  )
}
