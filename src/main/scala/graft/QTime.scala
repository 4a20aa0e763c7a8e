package graft
import org.apache.spark.sql.SparkSession
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val q = Queries.all.find(_.name == name).get
      def once(): Double = {
        val t0 = System.nanoTime()
        q.build(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $name ${once()}%.2f then ${once()}%.2f s")
    }
    spark.stop()
  }
}
