package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) codes for multi-dimensional
  * sort keys.
  *
  * Why this matters at 100 TB: file-level min/max statistics (and partition
  * pruning) only skip data the layout actually clusters. Sorting by one
  * column clusters that column perfectly and scatters every other; writing
  * in Z-order interleaves the bits of several key columns so EVERY keyed
  * predicate maps to a bounded number of code ranges — multi-dimensional
  * data skipping from one sort. The code is a pure narrow integer
  * expression; the sort it feeds is the range-partitioned write the lake
  * already pays (`Compact`/`repartitionByRange`), so Z-ordering costs a
  * sort key, not a new shuffle.
  *
  * Implementation: each dimension is first rank-normalized by the caller or
  * truncated to `bits` low bits here (values must be non-negative); bits
  * interleave x₀y₀x₁y₁… with x in the even positions. Everything is
  * fixed-shift long arithmetic — codegen-friendly, and replayable in ANSI
  * SQL for the oracle.
  */
object Layout {

  /** Morton interleave of two non-negative columns' low `bits` bits.
    * Monotone in each dimension over equal other-coordinates; bounded by
    * 2^(2·bits). bits ≤ 31.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    (0 until bits).map { j =>
      val xbit = shiftright(x.cast("long"), j).bitwiseAND(lit(1L))
      val ybit = shiftright(y.cast("long"), j).bitwiseAND(lit(1L))
      xbit * lit(1L << (2 * j)) + ybit * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** The matching ANSI SQL text for [[zorder2]] (oracle replay). */
  def zorder2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"((($x >> $j) & 1) * ${1L << (2 * j)} + (($y >> $j) & 1) * ${1L << (2 * j + 1)})"
    }.mkString(" + ")

  /** N-column Morton interleave: bit j of column i lands at position
    * j·n + i (round-robin), so [[zorder2]] is exactly `zorderN(Seq(x, y),
    * bits)`. Total code width n·bits must fit a long (≤ 62). Real lakes
    * z-order 2–4 columns; more dims dilute every dimension's locality —
    * past ~4, range-partition on the dominant filter column instead.
    */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 62, s"n*bits must be <= 62, got ${n * bits}")
    (for (j <- 0 until bits; i <- 0 until n) yield {
      shiftright(cols(i).cast("long"), j).bitwiseAND(lit(1L)) *
        lit(1L << (j * n + i))
    }).reduce(_ + _)
  }

  /** Z-clustered parquet write: range-partition by the Morton code into
    * `numFiles` tasks and sort within each, so every output file holds a
    * contiguous code range and its min/max footer stats are tight in BOTH
    * dimensions. This is the write whose cost the code claims to ride on —
    * one range exchange + local sort, the same bill as any sorted write.
    */
  def clusteredWrite(df: DataFrame, x: Column, y: Column, outDir: String,
                     numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zorder2(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
