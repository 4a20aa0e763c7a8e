package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: emulates the driver's t1 check (entry rows > 0) and prints a
  * named query's result/plan when given args: [queryName [sfDir]].
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.isEmpty) {
      val df = SparkEntry.entry(spark)
      df.show(20, truncate = false)
      println(s"entry rows = ${df.count()}")
    } else {
      val name = args(0)
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      df.show(20, truncate = false)
      println(s"$name rows = ${df.count()}")
    }
    spark.stop()
  }
}
