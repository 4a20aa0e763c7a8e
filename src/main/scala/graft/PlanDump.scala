package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: writes `explain("formatted")` for named
  * catalog queries to `<outDir>/<query>_<suffix>.txt` so plan-shape claims
  * in OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query[,query...]|all>
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32) — same session shape as Bench so the
  *      dumped plans are the ones the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <names|all>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    val names: Seq[String] =
      if (args(2) == "all") Queries.all.map(_.name)
      else args(2).split(",").toSeq.filter(_.nonEmpty)
    names.foreach { n =>
      val q = Queries.all.find(_.name == n)
        .getOrElse(sys.error(s"unknown query: $n"))
      // plans only — iterative ops (graph loops) materialize intermediates
      // while BUILDING the frame, so this runs real jobs for those; the
      // final frame's plan is still the bench-relevant shape
      val df = q.build(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
      graft.ops.Caches.drainAll(spark)
    }
    spark.stop()
  }
}
