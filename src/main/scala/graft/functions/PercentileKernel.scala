package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

object PercentileKernel {

  /** Replays `PercentileBase.getPercentiles`/`getPercentile` (Spark 4.1)
    * step for step over the primitive map:
    *   - entries sorted by value under the SQL double total order
    *     (`SQLOrderingUtil.compareDoubles`: NaN greatest; the ±0.0 tie the
    *     builtin leaves to map-iteration order is fixed here as −0.0 first,
    *     a strict refinement that can only differ in the SIGN of a zero
    *     result when both zero keys exist and land exactly on a cut);
    *   - cumulative counts; maxPosition = total − 1;
    *   - per fraction f: position = maxPosition.toDouble · f (the Long→
    *     Double widening the builtin performs), lower/higher = floor/ceil,
    *     lowerKey = first value with cum ≥ lower+1, same for higher;
    *     result = lowerKey when higher == lower or the two keys coincide,
    *     else (higher − position)·lowerKey + (position − lower)·higherKey —
    *     every step one correctly-rounded IEEE op, so equality with the
    *     builtin is exact (OpsSpec pins bitwise parity on the corpus plus
    *     adversarial duplicates/NaN/±0 groups).
    */
  def evalPercentiles(map: LongCountMap, percentages: Array[Double],
                      returnArray: Boolean): Any = {
    val n = map.nEntries
    if (n == 0) return null
    // extract occupied slots (raw double bits), sort under cmpBits (the
    // SQL double order with the deterministic −0.0-first tie refinement)
    val sortKeys = new Array[Long](n)
    val sortCounts = new Array[Long](n)
    var s = 0
    var o = 0
    val ks = map.keys
    val cs = map.counts
    val capN = cs.length
    while (s < capN) {
      if (cs(s) != 0L) {
        sortKeys(o) = ks(s)
        sortCounts(o) = cs(s)
        o += 1
      }
      s += 1
    }
    sortPairs(sortKeys, sortCounts, 0, n - 1)
    // cumulative counts in place
    var i = 0
    var cum = 0L
    while (i < n) {
      cum += sortCounts(i)
      sortCounts(i) = cum
      i += 1
    }
    val maxPosition = cum - 1L
    val out = new Array[Double](percentages.length)
    var p = 0
    while (p < percentages.length) {
      out(p) = percentileAt(sortKeys, sortCounts, n,
        maxPosition.toDouble * percentages(p))
      p += 1
    }
    if (returnArray) new GenericArrayData(out) else out(0)
  }

  private def percentileAt(keys: Array[Long], cums: Array[Long], n: Int,
                           position: Double): Double = {
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    val lowerIndex = firstAtLeast(cums, n, lower + 1L)
    val lowerKey = java.lang.Double.longBitsToDouble(keys(lowerIndex))
    if (higher == lower) return lowerKey
    val higherIndex = firstAtLeast(cums, n, higher + 1L)
    if (higherIndex == lowerIndex) return lowerKey
    val higherKey = java.lang.Double.longBitsToDouble(keys(higherIndex))
    (higher - position) * lowerKey + (position - lower) * higherKey
  }

  /** First index with cums(i) >= target; cums strictly increasing (counts
    * are positive), so this equals the builtin's
    * `ju.Arrays.binarySearch` + insertion-point correction.
    */
  private def firstAtLeast(cums: Array[Long], n: Int, target: Long): Int = {
    var lo = 0
    var hi = n - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cums(mid) >= target) hi = mid else lo = mid + 1
    }
    lo
  }

  /** `SQLOrderingUtil.compareDoubles` over raw double bits (NaN greatest,
    * x == y ⇒ equal), refined with a deterministic bit tie-break so the one
    * comparison the builtin leaves to map-iteration order (−0.0 vs +0.0,
    * which compare `==`) is fixed: −0.0 (bits = Long.MinValue) sorts first.
    * Distinct map keys are distinct bits, so the tie-break also makes the
    * sort total — no equal elements exist.
    */
  @inline private def cmpBits(a: Long, b: Long): Int = {
    val x = java.lang.Double.longBitsToDouble(a)
    val y = java.lang.Double.longBitsToDouble(b)
    if (x < y) -1
    else if (x > y) 1
    else if (x == y) java.lang.Long.compare(a, b)
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1
  }

  /** In-place quicksort of parallel long arrays by cmpBits on the key
    * column; insertion-sort leaves. Runs once per group at eval time.
    */
  private def sortPairs(keys: Array[Long], vals: Array[Long],
                        left: Int, right: Int): Unit = {
    var lo = left
    var hi = right
    while (hi - lo >= 16) {
      // median-of-three pivot
      val mid = (lo + hi) >>> 1
      val pivot = {
        val a = keys(lo); val b = keys(mid); val c = keys(hi)
        if (cmpBits(a, b) < 0) {
          if (cmpBits(b, c) < 0) b else if (cmpBits(a, c) < 0) c else a
        } else {
          if (cmpBits(a, c) < 0) a else if (cmpBits(b, c) < 0) c else b
        }
      }
      var i = lo
      var j = hi
      while (i <= j) {
        while (cmpBits(keys(i), pivot) < 0) i += 1
        while (cmpBits(keys(j), pivot) > 0) j -= 1
        if (i <= j) {
          val tk = keys(i); keys(i) = keys(j); keys(j) = tk
          val tv = vals(i); vals(i) = vals(j); vals(j) = tv
          i += 1; j -= 1
        }
      }
      // recurse on the smaller side, loop on the larger
      if (j - lo < hi - i) { sortPairs(keys, vals, lo, j); lo = i }
      else { sortPairs(keys, vals, i, hi); hi = j }
    }
    // insertion sort for the remainder
    var i = lo + 1
    while (i <= hi) {
      val k = keys(i); val v = vals(i)
      var j = i - 1
      while (j >= lo && cmpBits(keys(j), k) > 0) {
        keys(j + 1) = keys(j); vals(j + 1) = vals(j); j -= 1
      }
      keys(j + 1) = k; vals(j + 1) = v
      i += 1
    }
  }

}

/** EXACT interpolated percentile over a DOUBLE column — bit-identical to
  * Spark's builtin `percentile(col, f)` (PercentileBase), re-implemented as
  * a TypedImperativeAggregate over a primitive double-bits→count map.
  *
  * WHY (guide §5, memory/allocation): the builtin buffers a boxed
  * `OpenHashMap[AnyRef, Long]` — one boxed Double per input row plus
  * boxed-tuple churn on every rehash and a row-projection per entry on
  * partial serialization. At catalog group sizes that allocation was the
  * single biggest per-task GC source left after r11 (q111 1.1–1.5 s
  * task-GC/pass; family q41/q77/q111/q200/q220/q232/q236). This clone keeps
  * the exact getPercentile semantics (same key identity, same ordering,
  * same interpolation dag — see [[PercentileKernel.evalPercentiles]]) with
  * zero per-row allocation and flat-long buffer serialization.
  *
  * Operator placement is unchanged: like the builtin (also a
  * TypedImperativeAggregate), it runs in ObjectHashAggregateExec with
  * map-side partial aggregation — the plan shape is identical, only the
  * per-row/per-merge work changes. DOUBLE children only (callers cast);
  * decimal-typed call sites keep the builtin, whose key space a double cast
  * would collapse.
  */
case class ExactPercentileDouble(
    child: Expression,
    percentages: Seq[Double],
    returnArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongCountMap] with UnaryLike[Expression] {

  require(percentages.nonEmpty && percentages.forall(f => f >= 0.0 && f <= 1.0),
    s"percentages must be in [0, 1], got $percentages")

  // strict DOUBLE (no implicit coercion): decimal call sites must cast
  // explicitly, where the injectivity argument is documented
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exact_percentile takes a DOUBLE child, got ${child.dataType} — cast first")
    }

  private val percArray = percentages.toArray

  override def prettyName: String = "exact_percentile"
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false) else DoubleType

  override def createAggregationBuffer(): LongCountMap = new LongCountMap()

  override def update(buffer: LongCountMap, input: InternalRow): LongCountMap = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 1L)
    }
    buffer
  }

  override def merge(buffer: LongCountMap, other: LongCountMap): LongCountMap = {
    buffer.mergeInto(other)
    buffer
  }

  override def eval(buffer: LongCountMap): Any =
    PercentileKernel.evalPercentiles(buffer, percArray, returnArray)

  override def serialize(buffer: LongCountMap): Array[Byte] =
    buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): LongCountMap =
    LongCountMap.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactPercentileDouble =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): ExactPercentileDouble =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): ExactPercentileDouble =
    copy(child = newChild)
}
