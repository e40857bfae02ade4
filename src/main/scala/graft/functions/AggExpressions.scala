package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded top-k buffer: the k best (score, id) pairs under the ordering
  * (score DESC, id ASC), kept in a min-heap whose head is the current
  * WORST survivor so insertion is O(log k) and eviction O(log k).
  */
final class TopKBuffer(val k: Int) {
  // head = worst of the kept set: lowest score, then HIGHEST id (so the
  // id tiebreak evicts the larger id first, matching (score DESC, id ASC))
  val heap = new java.util.PriorityQueue[Array[Long]](
    math.max(k, 1),
    (a: Array[Long], b: Array[Long]) =>
      if (a(0) != b(0)) java.lang.Long.compare(a(0), b(0))
      else java.lang.Long.compare(b(1), a(1))
  )

  def add(score: Long, id: Long): Unit = {
    if (heap.size < k) heap.offer(Array(score, id))
    else {
      val worst = heap.peek()
      val better =
        score > worst(0) || (score == worst(0) && id < worst(1))
      if (better) { heap.poll(); heap.offer(Array(score, id)) }
    }
  }
}

/** Grouped top-k as a real Catalyst aggregate (TypedImperativeAggregate):
  * per group, the k largest (score, id) pairs ordered (score DESC,
  * id ASC), returned as array<struct<score,id>>.
  *
  * Why an aggregate and not a rank window: `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k` must shuffle EVERY row of the
  * group to one partition and sort it before discarding all but k — at
  * 100 TB the shuffle is the whole fact table. An aggregate top-k keeps a
  * k-element heap per group and participates in PARTIAL aggregation: each
  * map task reduces its slice to ≤k pairs per group, and only those
  * k-row partials shuffle (the same map-side-combine argument as sum —
  * verified by PlanSpec, which asserts two ObjectHashAggregate stages).
  * This is the aggregate-altitude counterpart of the per-query max_by
  * tricks (q27/q127) generalized to k > 1, and the first
  * TypedImperativeAggregate in the engine (SURVEY §4 reserves the
  * mechanism for exactly this kind of bounded-state aggregate; Spark's
  * own collect_list/percentile_approx use the same contract).
  *
  * Determinism: the (score DESC, id ASC) total order has no ties, so the
  * result is independent of partitioning and merge order.
  */
final case class GroupTopK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer]
    with BinaryLike[Expression]
    with ExpectsInputTypes {

  require(k > 0, s"graft_top_k requires k > 0, got $k")

  def score: Expression = left
  def id: Expression = right

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(StructField("score", LongType, nullable = false), StructField("id", LongType, nullable = false))
    ),
    containsNull = false
  )

  override def nullable: Boolean = false

  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val p = it.next(); buf.add(p(0), p(1)) }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    // eval must be READ-ONLY: Spark may evaluate a still-live buffer more
    // than once (e.g. a window aggregate evaluates after every input row
    // on the same running buffer), so draining the heap here would
    // truncate every frame after the first. Copy, then sort the copy.
    val arr = buf.heap.toArray(new Array[Array[Long]](buf.heap.size))
    java.util.Arrays.sort(
      arr,
      (a: Array[Long], b: Array[Long]) =>
        if (a(0) != b(0)) java.lang.Long.compare(b(0), a(0))
        else java.lang.Long.compare(a(1), b(1))
    )
    new GenericArrayData(arr.map(p => new GenericInternalRow(Array[Any](p(0), p(1)))))
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.heap.size)
    bb.putInt(buf.heap.size)
    val it = buf.heap.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GroupTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GroupTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native aggregate expressions. */
object AggFunctions {

  /** Top-k (score, id) pairs per group, ordered (score DESC, id ASC). */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumns.lift(
      GroupTopK(GraftColumns.unlift(score), GraftColumns.unlift(id), k).toAggregateExpression()
    )
}
