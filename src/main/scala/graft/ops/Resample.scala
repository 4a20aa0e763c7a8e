package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series RESAMPLING to a fixed grid with gap-fill and forward-fill —
  * the densification pass before any rolling-window feature or chart: bucket
  * events to the grid, generate the complete grid between the corpus bounds
  * (`sequence` + explode), left-join the per-bucket aggregates onto it, and
  * forward-fill measure gaps with the last seen value.
  *
  * Scale shape (100 TB of events): the only event-sized operation is the
  * per-bucket aggregate (one partial-agg hash shuffle). Everything after
  * runs on the GRID, whose cardinality is time-range/step — ~526k rows for
  * a year at 1 min — independent of event volume. The forward-fill itself
  * is the [[Layout.exactNtileByRange]] two-pass shape rather than a global
  * `Window.orderBy` (r11): range-partition the grid, fill locally per
  * partition, then lift each partition's fill with the last non-null value
  * carried out of all PRECEDING partitions — a P-row collect broadcast
  * back as a literal map. Bit-identical to the single-task fill (the fill
  * composes across partition boundaries), but a decade-at-1-minute grid
  * (~5 M buckets) no longer single-threads. The grid join is an AQE
  * broadcast for the same reason.
  */
object Resample {

  /** Resample `events` (ts timestamp, value double) onto a `stepUs` grid.
    * Output: bucket_us, n (0 on gaps), sum_value (null on gaps),
    * filled_sum (forward-filled, null only before the first real bucket).
    */
  def resampleFill(events: DataFrame, stepUs: Long): DataFrame = {
    val perBucket = events
      .select((expr(s"unix_micros(ts) div $stepUs") * stepUs).as("bucket_us"),
        col("value"))
      .groupBy(col("bucket_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val grid = perBucket
      .agg(min(col("bucket_us")).as("lo"), max(col("bucket_us")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(stepUs))).as("bucket_us"))
    val joined = grid.join(perBucket, Seq("bucket_us"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val spark = events.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged = Caches.track(
      joined.repartitionByRange(p, col("bucket_us"))
        .withColumn("__pid", spark_partition_id()))
    // last non-null sum per range partition (max struct keys on the unique
    // bucket_us) — one row per partition, tiny
    val lastNn = ranged
      .groupBy(col("__pid"))
      .agg(max(when(col("sum_value").isNotNull,
        struct(col("bucket_us"), col("sum_value")))).as("l"))
      .collect()
      .flatMap(r => Option(r.getStruct(1))
        .map(s => r.getInt(0) -> s.getDouble(1)))
      .toMap
    // carry into partition pid = the latest non-null value of any EARLIER
    // range partition (range partitions are bucket-ordered)
    val carry: Map[Int, Double] = {
      var running: Option[Double] = None
      (0 until p).flatMap { pid =>
        val o = running.map(pid -> _)
        lastNn.get(pid).foreach(v => running = Some(v))
        o
      }.toMap
    }
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("bucket_us"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged
      .withColumn("filled_sum",
        coalesce(last(col("sum_value"), ignoreNulls = true).over(wLocal),
          if (carry.isEmpty) lit(null).cast("double")
          else element_at(typedLit(carry), col("__pid"))))
      .drop("__pid")
  }
}
