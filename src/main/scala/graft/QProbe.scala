package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round probe: splits a query's wall time into
  *   build  — Q.build(...) (includes any eager driver loops: counts,
  *            collects, checkpoint materializations, kmeans iterations)
  *   plan   — forcing queryExecution.executedPlan (analysis + optimization)
  *   exec   — the noop-sink write (the part Bench times on top of build)
  * and reports per-rep numbers plus the SQL-execution job/stage counts, so
  * "driver-latency-bound vs work-bound" is measurable per query.
  *
  * Usage: runMain graft.QProbe <query[,query...]> [reps]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same session shape as Bench.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QProbe <names> [reps]")
    val names = args(0).split(",").toSeq.filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 3
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

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def sec(ns: Long): Double = ns / 1e9
    names.foreach { n =>
      val q = Queries.all.find(_.name == n).getOrElse(sys.error(s"unknown: $n"))
      for (r <- 1 to reps) {
        graft.ops.Caches.drainAll(spark)
        System.gc()
        val j0 = jobs.get(); val s0 = stages.get()
        val t0 = System.nanoTime()
        val df = q.build(spark, sfDir)
        val t1 = System.nanoTime()
        val jBuild = jobs.get() - j0
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[qprobe] $n rep$r build=${sec(t1 - t0)}%.3f (jobs=$jBuild) " +
          f"plan=${sec(t2 - t1)}%.3f exec=${sec(t3 - t2)}%.3f " +
          f"total=${sec(t3 - t0)}%.3f jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
      }
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
