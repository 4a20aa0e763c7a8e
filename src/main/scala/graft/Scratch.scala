package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the engine). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // cost of per-call schema inference in Tables.apply
    time("first read (cold)")(Tables(spark, d, "lineitem").schema)
    time("100 re-reads (inference each)") {
      (1 to 100).foreach(_ => Tables(spark, d, "lineitem").schema)
    }
    val sch = Tables(spark, d, "lineitem").schema
    time("100 re-reads with explicit schema") {
      (1 to 100).foreach(_ =>
        spark.read.schema(sch).parquet(s"$d/lineitem.parquet").schema)
    }
    // and the planning-side effect: count on a schema-given frame
    time("5 noop counts inferred") {
      (1 to 5).foreach(_ => Tables(spark, d, "lineitem").select(col("l_orderkey"))
        .write.format("noop").mode("overwrite").save())
    }
    time("5 noop counts explicit") {
      (1 to 5).foreach(_ => spark.read.schema(sch).parquet(s"$d/lineitem.parquet")
        .select(col("l_orderkey")).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
