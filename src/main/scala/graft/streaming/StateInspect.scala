package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline introspection over a streaming checkpoint's STATE — the ops
  * tool for the 100 TB deployment: when an interval/as-of join's state
  * grows past its budget, the question is always "which key?", and the
  * answer must come from the checkpoint directly (a probe query over the
  * stream re-pays the whole pipeline). Built on Spark's own state data
  * source (`statestore` / `state-metadata` formats) — reads the
  * checkpoint files, no query restart, no state mutation; safe on a LIVE
  * query's checkpoint (it reads a committed batch version).
  *
  * Workflow: [[operators]] to find the operator id and store names →
  * [[hotKeys]] for the per-key row ranking (the hot key BEFORE it aborts
  * the budget) → [[partitionProfile]] to see how state spreads across the
  * checkpoint-pinned shuffle width (the `statePartitions` knob's
  * footprint: a skewed profile says re-key or salt; a uniform-but-tall
  * one says widen at next deploy — the width itself is pinned by the
  * checkpoint).
  */
object StateInspect {

  /** The checkpoint's stateful operators: operatorId, operatorName, state
    * store names, min/max readable batch ids (Spark's `state-metadata`
    * source). Start here — every other reader needs the operatorId, and
    * a multi-stateful query (dedup → join → aggregation) has several.
    */
  def operators(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)

  /** Raw state rows of one operator's store at a committed batch
    * (default: the latest): `key` struct, `value` struct, `partition_id`.
    * For stream-stream join state pass `joinSide` ("left"/"right") and
    * Spark assembles the user-facing key/value view across the side's
    * paired internal stores; `storeName` addresses one internal store
    * directly when the raw layout is the question.
    */
  def stateRows(
      spark: SparkSession,
      checkpoint: String,
      operatorId: Int = 0,
      joinSide: Option[String] = None,
      storeName: Option[String] = None,
      batchId: Option[Long] = None
  ): DataFrame = {
    require(joinSide.isEmpty || storeName.isEmpty,
      "pass joinSide OR storeName, not both (Spark rejects the combination)")
    var r = spark.read.format("statestore").option("operatorId", operatorId.toString)
    joinSide.foreach(s => r = r.option("joinSide", s))
    storeName.foreach(s => r = r.option("storeName", s))
    batchId.foreach(b => r = r.option("batchId", b.toString))
    r.load(checkpoint)
  }

  /** Per-key state row counts, heaviest first — the skew finder. The key
    * struct is exploded into its fields for a readable report; state_rows
    * is the number of buffered state entries under that key (for a join
    * side: buffered rows awaiting matches/eviction). NOTE: join-state key
    * fields carry POSITIONAL names (`field0`, `field1`, …) in the order of
    * the join's key columns — Spark's internal key schema drops the user
    * names; match them back by position.
    */
  def hotKeys(
      spark: SparkSession,
      checkpoint: String,
      operatorId: Int = 0,
      joinSide: Option[String] = None,
      topK: Int = 20
  ): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    stateRows(spark, checkpoint, operatorId, joinSide)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("state_rows"))
      .orderBy(col("state_rows").desc)
      .limit(topK)
      .select(col("key.*"), col("state_rows"))
  }

  /** State rows per checkpoint-pinned shuffle partition — the footprint of
    * the `statePartitions` width the checkpoint froze. Uniform-but-tall →
    * widen at the next redeploy; spiky → a key problem ([[hotKeys]]),
    * which no width fixes.
    */
  def partitionProfile(
      spark: SparkSession,
      checkpoint: String,
      operatorId: Int = 0,
      joinSide: Option[String] = None
  ): DataFrame =
    stateRows(spark, checkpoint, operatorId, joinSide)
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("state_rows"))
      .orderBy(col("partition_id"))
}
