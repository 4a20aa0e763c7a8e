package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate HEAVY HITTERS (frequent items) as a SpaceSaving /
  * Misra-Gries TypedImperativeAggregate over a string column.
  *
  * The exact formulation (`groupBy(term).count.orderBy(desc).limit(k)`)
  * shuffles the FULL distinct-term space — at 100 TB the vocabulary is
  * billions of keys and the shuffle is the job. This aggregate keeps a
  * bounded m-counter summary per partition, merges summaries map-side
  * (partial aggregation), and ships O(m) state per task instead: the
  * standard one-pass answer to "top terms of the corpus".
  *
  * Guarantees (classic SpaceSaving): every true count is bounded by
  * `est - err <= true <= est`, and any item with true frequency
  * > N/m is guaranteed present in the summary. Merge is union + count/err
  * sum + trim-to-m (the practical mergeable variant; the bound weakens to
  * the sum of per-summary errors, still tracked per item in `err`).
  *
  * Output: array<struct<term string, est bigint, err bigint>> sorted by
  * (est DESC, term ASC) — deterministic for a given summary content.
  */
case class HeavyHitters(
    term: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Summary] {

  import HeavyHitters.Summary

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("term", StringType).add("est", LongType).add("err", LongType),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): Summary = new Summary(m)

  override def update(buf: Summary, input: InternalRow): Summary = {
    val t = term.eval(input)
    if (t != null) buf.offer(t.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: Summary, other: Summary): Summary = {
    other.foreach { case (t, c, e) => buf.offer(t, c, e) }
    buf.trim()
    buf
  }

  override def eval(buf: Summary): Any = {
    buf.trim()
    new GenericArrayData(buf.sortedDesc().map { case (t, c, e) =>
      InternalRow(UTF8String.fromString(t), c, e)
    })
  }

  override def serialize(buf: Summary): Array[Byte] = {
    buf.trim()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c, e) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new Summary(m)
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.offer(new String(b, StandardCharsets.UTF_8), in.readLong(), in.readLong())
      j += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HeavyHitters =
    copy(term = cs(0))
}

object HeavyHitters {

  /** Bounded counter summary. Kept slightly loose between trims (up to 2m
    * entries) so bulk merges don't trim per item; `trim` restores the m
    * bound, folding evicted mass into the survivors' error the SpaceSaving
    * way (an evicted count becomes the floor for anything re-added later).
    */
  final class Summary(m: Int) {
    private val counts = mutable.HashMap.empty[String, (Long, Long)] // term -> (est, err)
    private var evictedFloor = 0L // max count ever trimmed away

    def size: Int = counts.size

    /** The eviction floor, for callers persisting a summary across batches
      * (streaming state): without it a term evicted in batch N and re-added
      * in batch N+1 would restart from 0, breaking the est-err bound.
      */
    def floor: Long = evictedFloor
    def raiseFloor(f: Long): Unit = if (f > evictedFloor) evictedFloor = f

    /** Reinstate a persisted (term, est, err) row verbatim — unlike `offer`,
      * no floor is folded in (the row's est already includes it).
      */
    def restore(t: String, c: Long, e: Long): Unit = {
      counts.update(t, (c, e))
      if (counts.size >= 2 * m) trim()
    }

    def offer(t: String, c: Long, e: Long): Unit = {
      counts.get(t) match {
        case Some((c0, e0)) => counts.update(t, (c0 + c, e0 + e))
        case None =>
          // SpaceSaving: a new item inherits the evicted floor as both
          // count base and error (it may have been seen before eviction).
          counts.update(t, (c + evictedFloor, e + evictedFloor))
          if (counts.size >= 2 * m) trim()
      }
    }

    def trim(): Unit = if (counts.size > m) {
      val keep = counts.toArray.sortBy { case (t, (c, _)) => (-c, t) }
      var j = m
      while (j < keep.length) {
        val c = keep(j)._2._1
        if (c > evictedFloor) evictedFloor = c
        counts.remove(keep(j)._1)
        j += 1
      }
    }

    def foreach(f: ((String, Long, Long)) => Unit): Unit =
      counts.foreach { case (t, (c, e)) => f((t, c, e)) }

    def sortedDesc(): Array[(String, Long, Long)] =
      counts.toArray
        .map { case (t, (c, e)) => (t, c, e) }
        .sortBy { case (t, c, _) => (-c, t) }
  }
}
