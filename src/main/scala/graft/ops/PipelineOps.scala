package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Broadway pipeline semantics re-expressed as deterministic relational
  * operators over the `events` stream table (SURVEY.md §2.2–§2.6, E4/E5/E7/
  * E9/E10). The streaming realization lives in `graft.core.Pipeline`; these
  * batch twins are the oracle-checkable contract for the same logic.
  *
  * Routing rule used throughout (the analog of `Message.put_batcher`,
  * reference lib/broadway/message.ex:90-96): `purchase` → "billing",
  * `error` → "dlq", everything else → "default". Failure rule (the analog of
  * `Message.failed/2`, lib/broadway/message.ex:157-170): event_type = 'error'.
  */
object PipelineOps {

  import Tables._

  /** The routing expression — one deterministic Column, shared by the batch
    * and streaming paths (columnar ⇒ stays inside whole-stage codegen).
    */
  def routeExpr = when(col("event_type") === "purchase", "billing")
    .when(col("event_type") === "error", "dlq")
    .otherwise("default")

  val routeSqlCase: String =
    """CASE WHEN event_type = 'purchase' THEN 'billing'
      |     WHEN event_type = 'error' THEN 'dlq'
      |     ELSE 'default' END""".stripMargin

  val queries: Seq[Q] = Seq(
    // E4: multi-sink routing (put_batcher) — per-route cardinality + payload.
    Q(
      "q60_route_split",
      (s, d) =>
        events(s, d)
          .withColumn("batcher", routeExpr)
          .groupBy(col("batcher"))
          .agg(
            count(lit(1)).as("cnt"),
            round(sum(col("value")), 4).as("sum_value")
          )
          .orderBy(col("batcher")),
      Some(s"""SELECT $routeSqlCase AS batcher,
              |  count(*) AS cnt, round(sum(value), 4) AS sum_value
              |FROM events
              |GROUP BY 1
              |ORDER BY batcher""".stripMargin)
    ),

    // E5: batch assembly — batches of size 100 per (batcher, batch_key),
    // the batch-count/size accounting of BatcherStage
    // (reference lib/broadway/topology/batcher_stage.ex:106-257,
    //  batch_size default 100: lib/broadway/options.ex:233-237).
    Q(
      "q61_batch_assembly",
      (s, d) =>
        events(s, d)
          .withColumn("batcher", routeExpr)
          .withColumn("batch_key", col("user_id") % 8)
          .groupBy(col("batcher"), col("batch_key"))
          .agg(count(lit(1)).as("messages"))
          .withColumn("full_batches", floor(col("messages") / 100))
          .withColumn("batches", ceil(col("messages") / lit(100.0)).cast("long"))
          .orderBy(col("batcher"), col("batch_key")),
      Some(s"""SELECT batcher, batch_key, messages,
              |  CAST(floor(messages / 100) AS BIGINT) AS full_batches,
              |  CAST(ceil(messages / 100.0) AS BIGINT) AS batches
              |FROM (
              |  SELECT $routeSqlCase AS batcher,
              |    user_id % 8 AS batch_key, count(*) AS messages
              |  FROM events GROUP BY 1, 2) t
              |ORDER BY batcher, batch_key""".stripMargin)
    ),

    // E7: partition-ordered processing (partition_by, reference
    // lib/broadway.ex:524-607): per-key event-time order must be stable —
    // first/last payload per key after ordered traversal.
    Q(
      "q62_ordered_per_key",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .filter(col("rn") === 1 || col("rn") === col("n"))
          .groupBy(col("user_id"))
          .agg(
            min(struct(col("rn"), col("event_type"))).getField("event_type").as("first_type"),
            max(struct(col("rn"), col("event_type"))).getField("event_type").as("last_type"),
            max(col("n")).as("n_events")
          )
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  min(CASE WHEN rn = 1 THEN event_type END) AS first_type,
             |  min(CASE WHEN rn = n THEN event_type END) AS last_type,
             |  max(n) AS n_events
             |FROM (
             |  SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n
             |  FROM events) t
             |WHERE rn = 1 OR rn = n
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // E9: ack ledger — successful/failed accounting per ack group (source
    // partition × day), the analog of Acknowledger.ack/3 grouping
    // (reference lib/broadway/acknowledger.ex:64-85).
    Q(
      "q63_ack_ledger",
      (s, d) =>
        events(s, d)
          .withColumn("ack_ref", col("event_id") % 4)
          .withColumn("failed", (col("event_type") === "error").cast("int"))
          .groupBy(col("ack_ref"))
          .agg(
            sum(lit(1) - col("failed")).as("successful"),
            sum(col("failed")).as("failed"),
            count(lit(1)).as("total")
          )
          .orderBy(col("ack_ref")),
      Some("""SELECT event_id % 4 AS ack_ref,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS BIGINT) AS successful,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
             |  count(*) AS total
             |FROM events
             |GROUP BY 1
             |ORDER BY ack_ref""".stripMargin)
    ),

    // E5: group-collect — the BatcherStage's collect-into-batch as a
    // relational aggregate (collect_list per key, deterministically sorted).
    // The list is serialized to a comma-joined string on both engines so the
    // result is a flat scalar column (sortable/hashable by any comparator).
    Q(
      "q66_group_collect",
      (s, d) =>
        events(s, d)
          .filter(col("user_id") < 20)
          .groupBy(col("user_id"))
          .agg(
            concat_ws(
              ",",
              transform(
                sort_array(collect_list(col("event_id"))),
                _.cast("string")
              )
            ).as("ids"),
            count(lit(1)).as("cnt")
          )
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  array_to_string(list_sort(list(event_id)), ',') AS ids,
             |  count(*) AS cnt
             |FROM events
             |WHERE user_id < 20
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // E10: dead-letter flow — failed messages with reason, never forwarded
    // (reference handle_failed, lib/broadway.ex:1031-1056; failed messages
    // skip later stages, lib/broadway/message.ex:160-166).
    Q(
      "q64_dead_letter",
      (s, d) =>
        events(s, d)
          .filter(col("event_type") === "error")
          .withColumn("reason", concat(lit("failed:"), col("event_type")))
          .select(col("event_id"), col("user_id"), col("ts"), col("reason"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             |  'failed:' || event_type AS reason
             |FROM events
             |WHERE event_type = 'error'
             |ORDER BY event_id""".stripMargin)
    ),

    // E2+E3: handle_message transform + failure split in one pass — the
    // status-column realization of Message.failed/2: main flow keeps ok
    // rows, transforms payload; count both flows per hour.
    Q(
      "q65_status_split",
      (s, d) =>
        events(s, d)
          .withColumn("ok", col("event_type") =!= "error")
          .withColumn("hour", date_trunc("hour", col("ts")))
          .groupBy(col("hour"))
          .agg(
            sum(col("ok").cast("long")).as("ok_cnt"),
            sum((!col("ok")).cast("long")).as("failed_cnt"),
            round(sum(when(col("ok"), col("value") * 2).otherwise(0.0)), 4).as("transformed_sum")
          )
          .orderBy(col("hour")),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             |  CAST(sum(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS ok_cnt,
             |  CAST(sum(CASE WHEN event_type <> 'error' THEN 0 ELSE 1 END) AS BIGINT) AS failed_cnt,
             |  round(sum(CASE WHEN event_type <> 'error' THEN value * 2 ELSE 0 END), 4) AS transformed_sum
             |FROM events
             |GROUP BY 1
             |ORDER BY hour""".stripMargin)
    )
  )
}
