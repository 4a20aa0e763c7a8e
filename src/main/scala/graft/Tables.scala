package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet corpus (see /root/repo/TESTDATA.md).
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * tables they need through here, so filter/column pushdown reaches the
  * parquet scan untouched.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
