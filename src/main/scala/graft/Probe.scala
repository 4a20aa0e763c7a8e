package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only job-latency probe (guide §1/§7): runs the named queries once
  * (after one warm pass) and prints every Spark job's wall time, stage/task
  * counts, and the DRIVER GAP since the previous job ended — the number the
  * bench annex cannot show. A query whose wall is dominated by gaps or by
  * many small sequential jobs is latency-bound (driver planning, eager
  * materializations, collect-loops), not work-bound; that distinction picks
  * the optimization (§1.2 step 1: fewer passes/barriers) better than any
  * task metric. Not part of the driver contract; Bench is unchanged.
  *
  * Usage: SPARK_GRAFT_PROBE=q122,q128 sbt "runMain graft.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.get("SPARK_GRAFT_PROBE")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(args.toSeq)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, desc: String, t0: Long, var t1: Long = 0L,
                       var nStages: Int = 0, var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, J(e.jobId, desc, e.time,
          nStages = e.stageInfos.size,
          nTasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
    }

    val all = Queries.all.filter(q => names.exists(q.name.startsWith))
    require(all.nonEmpty, s"no queries match $names")
    for (q <- all) {
      // warm pass: JIT + codegen cache + parquet footers
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.ops.Caches.drainAll(spark)
      System.gc()
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - w0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain
      println(f"== ${q.name}: wall=$wall%.3f s, jobs=${order.size}")
      var prevEnd = 0L
      import scala.jdk.CollectionConverters._
      var busySum = 0.0; var gapSum = 0.0
      for (id <- order.asScala.toSeq.sorted) {
        val j = jobs.get(id)
        if (j.t1 == 0L) j.t1 = j.t0 // event not yet drained: show dur 0
        val dur = (j.t1 - j.t0) / 1e3
        val gap = if (prevEnd == 0) 0.0 else (j.t0 - prevEnd) / 1e3
        busySum += dur; if (prevEnd != 0) gapSum += math.max(gap, 0)
        prevEnd = j.t1
        println(f"  job $id%3d dur=$dur%7.3f s gap=$gap%7.3f s " +
          f"stages=${j.nStages}%2d tasks=${j.nTasks}%4d ${j.desc.take(70)}")
      }
      println(f"  -- jobs busy=$busySum%.3f s, inter-job gaps=$gapSum%.3f s")
      graft.ops.Caches.drainAll(spark)
      System.gc()
    }
    spark.stop()
  }
}
