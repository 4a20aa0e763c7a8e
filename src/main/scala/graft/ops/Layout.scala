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

  /** EXACT ntile(n) over a global sort order WITHOUT the single-task
    * global sort: range-partition on the sort keys (parallel sample +
    * exchange), rank within each range partition, then lift local ranks
    * to global ones by adding the preceding partitions' row counts — a
    * P-row aggregate broadcast back as a literal map. The chunk id then
    * follows from the global rank by ntile's arithmetic (first N mod n
    * tiles take one extra row), so the result is bit-identical to
    * `ntile(n).over(Window.orderBy(keys))` while every stage stays
    * parallel. Requires the sort keys to be a total order (ties would
    * make range-boundary placement ambiguous).
    *
    * This is the 100 TB shape for layout chunking (q98): the old global
    * ntile funneled the corpus through one task; here the only
    * non-parallel step is the P-row count collect.
    */
  def exactNtileByRange(df: DataFrame, sortCols: Seq[Column], n: Int,
                        chunkName: String = "chunk",
                        partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be >= 1, got $n")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = Caches.track(
      df.repartitionByRange(p, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    // one row per range partition — tiny
    val cnts = ranged.groupBy(col("__pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = cnts.values.sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until p).map { pid =>
        val o = pid -> acc; acc += cnts.getOrElse(pid, 0L); o
      }.toMap
    }
    val base = total / n
    val rem = total % n
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val rank = row_number().over(w).cast("long") +
      coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L))
    val cut = rem * (base + 1) // rows 1..cut sit in the base+1-sized tiles
    val chunk =
      when(rank <= cut, (rank - 1) / (base + 1) + 1)
        .otherwise(lit(rem) + (rank - cut - 1) / greatest(lit(base), lit(1L)) + 1)
    ranged.withColumn(chunkName, chunk.cast("int")).drop("__pid")
  }
}
