package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loads the driver-generated parquet corpus (see /root/repo/TESTDATA.md).
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * tables they need through here, so filter/column pushdown reaches the
  * parquet scan untouched.
  *
  * `events.ts` is written as TIMESTAMP(NANOS), which Spark 4 refuses to map
  * to TimestampType; we read nanos as long (legacy conf) and truncate to
  * micros — exactly what DuckDB's reader does, so oracle comparisons agree.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
