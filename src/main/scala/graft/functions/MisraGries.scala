package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982) as a
  * TypedImperativeAggregate — the candidate phase of the two-pass EXACT
  * heavy-hitter pattern (q172).
  *
  * Contract: after summarizing a stream of n items with k counters, every
  * item's stored count undercounts its true frequency by at most n/(k+1),
  * so any item with true frequency  > n/(k+1) is guaranteed to be present.
  * Partial summaries merge with the same bound (Agarwal et al., "Mergeable
  * Summaries", PODS 2012: sum counts, then subtract the (k+1)-th largest
  * count and drop non-positive entries) — which is exactly what makes this
  * shape work as a map-side-combined Spark aggregate: each task summarizes
  * its partition into ≤ k counters, and the ≤ k-entry buffers merge on the
  * driver side of the exchange. The shuffle carries O(k) bytes per
  * partition, never the key universe.
  *
  * The aggregate's output is struct(total, keys): the number of items seen
  * and the surviving candidate keys. The EXACT pass then recounts only the
  * candidates (a broadcast semi-join keyed filter — map-side, so the second
  * shuffle carries only candidate keys) and applies the real threshold.
  * Because candidates ⊇ {items with freq > n/(k+1)}, filtering the exact
  * counts at any threshold ≥ n/(k+1) provably equals the plain
  * GROUP BY / HAVING answer — the q172 oracle states that plain SQL and
  * hash-equality is the proof.
  */
case class MisraGriesKeys(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with ImplicitCastInputTypes {

  require(k > 0, "capacity must be positive")

  override def prettyName: String = "misra_gries_keys"
  override def children: Seq[Expression] = Seq(key)
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesKeys.resultType

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = key.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MGSummary): Any = {
    val keys = buf.keysSorted.map(s => UTF8String.fromString(s): Any)
    InternalRow(buf.total, new GenericArrayData(keys))
  }

  override def serialize(buf: MGSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesKeys =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesKeys =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(key = cs(0))
}

object MisraGriesKeys {
  val resultType: StructType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("keys", ArrayType(StringType, containsNull = false), nullable = false)))

  import org.apache.spark.sql.graft.SqlShim.{column, expression}

  /** Column front door: `mgKeys(key, k)` → struct(total, keys). */
  def mgKeys(key: Column, k: Int): Column =
    column(MisraGriesKeys(expression(key), k).toAggregateExpression())
}

/** Mutable Misra–Gries buffer: at most k (key → count) counters plus the
  * total item count. Per-group, non-thread-safe.
  */
final class MGSummary(val k: Int) {
  private[graft] val counts = mutable.HashMap.empty[String, Long]
  private[graft] var total: Long = 0L

  def add(key: String): Unit = {
    total += 1
    counts.get(key) match {
      case Some(c) => counts.update(key, c + 1)
      case None =>
        if (counts.size < k) counts.update(key, 1L)
        else decrementAll()
    }
  }

  /** The classic MG step: a miss with a full table decrements every counter
    * (absorbing the new item against k incumbents) and drops zeros.
    */
  private def decrementAll(): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    counts.mapValuesInPlace((_, c) => c - 1)
    counts.foreach { case (key, c) => if (c <= 0) dead += key }
    dead.foreach(counts.remove)
  }

  /** Mergeable-summaries combine: sum counts pairwise; if more than k
    * survive, subtract the (k+1)-th largest count from every counter and
    * drop non-positives — the error stays ≤ n/(k+1) for the combined n.
    */
  def mergeIn(other: MGSummary): Unit = {
    total += other.total
    other.counts.foreach { case (key, c) =>
      counts.update(key, counts.getOrElse(key, 0L) + c)
    }
    if (counts.size > k) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace((_, c) => c - sub)
      counts.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(counts.remove)
    }
  }

  /** Candidate keys, sorted for deterministic output. */
  def keysSorted: Array[String] = {
    val a = counts.keys.toArray
    java.util.Arrays.sort(a, Ordering[String])
    a
  }

  def toBytes: Array[Byte] = {
    val entries = counts.toArray
    val payloads = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 8 + 4 + entries.indices.map(i => 4 + payloads(i).length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(total)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payloads(i).length)
      bb.put(payloads(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }
}

object MGSummary {
  def fromBytes(k: Int, bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MGSummary(k)
    s.total = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val raw = new Array[Byte](len)
      bb.get(raw)
      s.counts.update(new String(raw, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }
}
