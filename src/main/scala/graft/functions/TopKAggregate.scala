package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k (score, id) aggregate — a TypedImperativeAggregate holding a
  * k-element min-heap per group.
  *
  * The Spark-native alternative for "top k per key" is
  * `row_number().over(Window.partitionBy(key).orderBy(score))` + filter,
  * which shuffles EVERY candidate row to its key's partition and sorts there:
  * at a billion candidates per query key, that is the skewed, unscalable part
  * of a kNN plan. This aggregate is algebraic in the heap: partial heaps of
  * size ≤ k are built map-side, so the shuffle carries at most
  * k × num_partitions rows per key, independent of candidate count.
  *
  * Ordering matches the window formulation exactly: score DESC, id ASC on
  * ties. Output: array<struct<id, rk, score>> ranked 1..k.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(score, id)
  // declared input types so a caller passing (float score, int id) gets an
  // analysis-time implicit cast instead of a runtime ClassCastException in
  // update()'s eval
  override def inputTypes = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedDesc
    val rows = new Array[Any](sorted.length)
    var r = 0
    while (r < sorted.length) {
      val (s, i) = sorted(r)
      rows(r) = InternalRow(i, (r + 1).toLong, s)
      r += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

object TopKByScore {
  val entryType: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("rk", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  import org.apache.spark.sql.graft.SqlShim.{column, expression}

  /** Column front door: `topK(score, id, k)` → array<struct<id,rk,score>>. */
  def topK(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k).toAggregateExpression())
}

/** k-bounded heap; head = current worst kept entry (lowest score, then
  * highest id — the first to evict). Mutable, non-thread-safe, per-group.
  */
final class TopKHeap(val k: Int) {
  // evict-first ordering: lowest score is max of the queue; ties evict the
  // larger id so the kept set prefers smaller ids (matches id ASC tie-break)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }
  private val q = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def offer(s: Double, i: Long): Unit =
    if (q.size < k) q.enqueue((s, i))
    else {
      val (ws, wi) = q.head
      if (s > ws || (s == ws && i < wi)) { q.dequeue(); q.enqueue((s, i)) }
    }

  def foreach(f: (Double, Long) => Unit): Unit = q.foreach { case (s, i) => f(s, i) }

  /** Entries ranked: score DESC, id ASC. */
  def sortedDesc: Array[(Double, Long)] =
    q.toArray.sortBy { case (s, i) => (-s, i) }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + q.size * 16)
    bb.putInt(q.size)
    q.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}
