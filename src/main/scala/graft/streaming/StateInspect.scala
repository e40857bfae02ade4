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
    * directly when the raw layout is the question. For
    * `transformWithState` operators (e.g. [[KeyedBatcher.encoded]]'s
    * checkpoint) pass `stateVarName` — the processor's state variable
    * name ("open" for the encoded batcher); TWS stores are addressed by
    * variable, not store name.
    */
  def stateRows(
      spark: SparkSession,
      checkpoint: String,
      operatorId: Int = 0,
      joinSide: Option[String] = None,
      storeName: Option[String] = None,
      batchId: Option[Long] = None,
      stateVarName: Option[String] = None
  ): DataFrame = {
    require(joinSide.isEmpty || storeName.isEmpty,
      "pass joinSide OR storeName, not both (Spark rejects the combination)")
    var r = spark.read.format("statestore").option("operatorId", operatorId.toString)
    joinSide.foreach(s => r = r.option("joinSide", s))
    storeName.foreach(s => r = r.option("storeName", s))
    batchId.foreach(b => r = r.option("batchId", b.toString))
    stateVarName.foreach(s => r = r.option("stateVarName", s))
    r.load(checkpoint)
  }

  /** Per-key state footprint, heaviest first — the skew finder. Reports
    * BOTH axes per key and ranks on `rankBy`:
    *  - `state_rows`: buffered state entries under the key (for a join
    *    side: rows awaiting matches/eviction);
    *  - `state_bytes_est`: estimated value payload bytes (serialized-JSON
    *    octet length of each value row, summed) — a key buffering FEW but
    *    WIDE rows (a giant collect_list buffer, long strings) hides from
    *    the row count but not from this. JSON length is an estimate, not
    *    the provider's on-disk encoding, but it is monotone in the
    *    variable-width fields that actually cause value-size skew, which
    *    is all a ranking needs.
    * Default ranking is bytes (the budget that aborts a state store is
    * memory, not row count); pass `rankBy = "rows"` for the row view.
    * NOTE: join-state key fields carry POSITIONAL names (`field0`,
    * `field1`, …) in the order of the join's key columns — Spark's
    * internal key schema drops the user names; match them back by
    * position.
    */
  def hotKeys(
      spark: SparkSession,
      checkpoint: String,
      operatorId: Int = 0,
      joinSide: Option[String] = None,
      topK: Int = 20,
      rankBy: String = "bytes",
      stateVarName: Option[String] = None
  ): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(rankBy == "bytes" || rankBy == "rows",
      s"rankBy must be 'bytes' or 'rows', got '$rankBy'")
    val rank = if (rankBy == "bytes") "state_bytes_est" else "state_rows"
    val rows = stateRows(spark, checkpoint, operatorId, joinSide,
      stateVarName = stateVarName)
    // rebuild the value struct from its DECLARED fields before
    // serializing: join-state value rows physically carry an internal
    // trailing field (the matched flag) beyond the declared schema, and
    // to_json over the raw struct walks the row's arity into an
    // ArrayIndexOutOfBounds — the explicit field projection reads
    // exactly the declared ones
    val valueFields = rows.schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    val declared = struct(valueFields.map(f => col(s"value.`$f`")).toIndexedSeq: _*)
    rows
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("state_rows"),
        sum(octet_length(to_json(declared))).as("state_bytes_est"))
      .orderBy(col(rank).desc)
      .limit(topK)
      .select(col("key.*"), col("state_rows"), col("state_bytes_est"))
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
      joinSide: Option[String] = None,
      stateVarName: Option[String] = None
  ): DataFrame =
    stateRows(spark, checkpoint, operatorId, joinSide, stateVarName = stateVarName)
      .groupBy(col("partition_id"))
      .agg(count(lit(1)).as("state_rows"))
      .orderBy(col("partition_id"))
}
