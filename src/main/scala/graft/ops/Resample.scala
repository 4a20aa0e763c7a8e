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
  * a year at 1 min — independent of event volume. That is why the
  * forward-fill window may be a single global sort: it sorts the grid, not
  * the events (a year of minutes is one executor's work). The grid join is
  * an AQE broadcast for the same reason.
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
    grid.join(perBucket, Seq("bucket_us"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled_sum",
        last(col("sum_value"), ignoreNulls = true).over(
          Window.orderBy(col("bucket_us"))
            .rowsBetween(Window.unboundedPreceding, 0)))
  }
}
