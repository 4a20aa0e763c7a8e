package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (overwrite freely). Currently: dumps the q120
  * pageRank INNER dag (the public op materializes in-op, so PlanDump only
  * sees the final checkpoint) via the package-private pageRankLoop —
  * plans/r12/q120_pagerank_inner_after.txt.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val o = Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        col("l_suppkey").cast("long").as("sk"))
      .distinct()
    val e = pairs.select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionByName(pairs.select((col("sk") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
    val (r, cleanup) = graft.ops.Graph.pageRankLoop(e, iters = 3,
      edgesDistinct = true)
    val txt = r.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("plans/r12/q120_pagerank_inner_after.txt"),
      txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote plans/r12/q120_pagerank_inner_after.txt (${txt.length} chars)")
    cleanup()
    spark.stop()
  }
}
