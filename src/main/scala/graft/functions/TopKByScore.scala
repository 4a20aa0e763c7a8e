package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a custom TypedImperativeAggregate.
  *
  * The stock formulation (`row_number() OVER (PARTITION BY key ORDER BY
  * score DESC) <= k`) shuffles and sorts EVERY row of every group. This
  * aggregate keeps a bounded k-element heap per group and participates in
  * partial aggregation, so each map task emits at most k rows per group and
  * the shuffle carries k·groups rows instead of all of them — the same
  * partial-vs-final structure Spark gives sum/count, applied to top-k.
  * At 100 TB this is the difference between shuffling the corpus and
  * shuffling a bounded digest.
  *
  * Ordering: score DESC, id ASC tiebreak (deterministic for unique ids).
  * Output: array<struct<score double, id bigint>> sorted in rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Heap] {

  import TopKByScore.Heap

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType), containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buf: Heap, input: InternalRow): Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    // NaN scores are unrankable and would poison the worst-tracking
    // (every comparison against NaN is false) — skip them, like a SQL
    // ORDER BY ... LIMIT over a filtered score would.
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Heap, other: Heap): Heap = { buf.absorb(other); buf }

  override def eval(buf: Heap): Any = {
    val arr = buf.sortedDesc()
    new GenericArrayData(arr.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new Heap(k)
    var j = 0
    while (j < n) { h.insert(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(score = cs(0), id = cs(1))
}

object TopKByScore {

  /** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
    * Flat primitive arrays + worst-tracking; k is small so linear worst
    * re-scan on eviction beats heap bookkeeping overhead.
    */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    var size: Int = 0
    private var worst = -1 // index of current worst entry when full

    @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)

    def insert(s: Double, i: Long): Unit = {
      if (size < k) {
        scores(size) = s; ids(size) = i; size += 1
        if (size == k) rescanWorst()
      } else if (better(s, i, scores(worst), ids(worst))) {
        scores(worst) = s; ids(worst) = i
        rescanWorst()
      }
    }

    private def rescanWorst(): Unit = {
      var w = 0
      var j = 1
      while (j < size) {
        if (better(scores(w), ids(w), scores(j), ids(j))) w = j
        j += 1
      }
      worst = w
    }

    def absorb(other: Heap): Unit = other.foreach { case (s, i) => insert(s, i) }

    def foreach(f: ((Double, Long)) => Unit): Unit = {
      var j = 0
      while (j < size) { f((scores(j), ids(j))); j += 1 }
    }

    def sortedDesc(): Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](size)
      var j = 0
      while (j < size) { out(j) = (scores(j), ids(j)); j += 1 }
      out.sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
    }
  }
}
