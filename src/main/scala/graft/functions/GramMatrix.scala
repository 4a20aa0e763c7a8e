package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact integer Gram/second-moment matrix as ONE TypedImperativeAggregate
  * pass — the scale-hard half of distributed PCA/covariance/whitening.
  *
  * Input: a quantized integer vector (array<long>, fixed `dim`). State per
  * aggregation buffer: the count, the per-dimension sums, and the
  * upper-triangle Σ qᵢ·qⱼ products — dim·(dim+3)/2 + 1 longs. Update is a
  * tight primitive loop per row (no per-row allocation beyond reading the
  * array); merge is elementwise addition, so the aggregate participates in
  * partial aggregation and the shuffle carries ONE buffer per map task —
  * never the corpus, never a posexplode fan-out of dim²/2 rows per vector
  * (the naive DataFrame formulation, which the oracle uses at sf0.01 and
  * which stops being funny at 100 TB).
  *
  * Exactness: all Longs, `Math.addExact`/`multiplyExact` so overflow fails
  * loudly (ANSI spirit) instead of wrapping — with |q| ≤ scale the bound
  * is n ≤ 2^63 / scale², e.g. ~9e12 rows at scale 1000. Null or
  * wrong-length vectors are skipped (counted rows are exactly the rows in
  * the matrix).
  *
  * Output: struct(n long, s array<long> [dim], g array<long>
  * [dim·(dim+1)/2, upper triangle row-major]).
  */
case class GramMatrix(
    vec: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramMatrix.Buf] {

  require(dim >= 1 && dim <= 4096, "dim bound keeps state <= ~64 MB")

  import GramMatrix.Buf

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType = new StructType()
    .add("n", LongType, nullable = false)
    .add("s", ArrayType(LongType, containsNull = false), nullable = false)
    .add("g", ArrayType(LongType, containsNull = false), nullable = false)
  override def prettyName: String = "gram_matrix"

  override def createAggregationBuffer(): Buf = new Buf(dim)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val a = vec.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) buf.add(arr)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = { buf.absorb(other); buf }

  override def eval(buf: Buf): Any = InternalRow(
    buf.n, new GenericArrayData(buf.s), new GenericArrayData(buf.g))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * (buf.s.length + buf.g.length))
    bb.putLong(buf.n)
    var i = 0
    while (i < buf.s.length) { bb.putLong(buf.s(i)); i += 1 }
    i = 0
    while (i < buf.g.length) { bb.putLong(buf.g(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buf(dim)
    b.n = bb.getLong
    var i = 0
    while (i < b.s.length) { b.s(i) = bb.getLong; i += 1 }
    i = 0
    while (i < b.g.length) { b.g(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): GramMatrix =
    copy(vec = cs(0))
}

object GramMatrix {

  /** Count + sums + upper-triangle products, flat primitive arrays. */
  final class Buf(dim: Int) {
    var n: Long = 0L
    val s = new Array[Long](dim)
    val g = new Array[Long](dim * (dim + 1) / 2)

    def add(arr: ArrayData): Unit = {
      n = Math.addExact(n, 1L)
      var i = 0
      var t = 0
      while (i < dim) {
        val qi = arr.getLong(i)
        s(i) = Math.addExact(s(i), qi)
        var j = i
        while (j < dim) {
          g(t) = Math.addExact(g(t), Math.multiplyExact(qi, arr.getLong(j)))
          j += 1; t += 1
        }
        i += 1
      }
    }

    def absorb(other: Buf): Unit = {
      n = Math.addExact(n, other.n)
      var i = 0
      while (i < s.length) { s(i) = Math.addExact(s(i), other.s(i)); i += 1 }
      i = 0
      while (i < g.length) { g(i) = Math.addExact(g(i), other.g(i)); i += 1 }
    }
  }
}
