package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps

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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = "/root/testdata/sf0.001"
    val docs = Tables(spark, sf, "documents")

    // realized BPE batch sizes on real text: job counts at batch 1 vs 64
    def jobs(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }
    val nm = 100
    val j64 = jobs {
      val t = TextOps.learnBpe(docs, col("text"), numMerges = nm, batchMerges = 64).collect()
      println(s"batched merges: ${t.length}")
    }
    val j1 = jobs {
      val t = TextOps.learnBpe(docs, col("text"), numMerges = nm, batchMerges = 1).collect()
      println(s"sequential merges: ${t.length}")
    }
    println(s"JOBS batched=$j64 sequential=$j1 ratio=${j1.toDouble / j64}")

    // driver path: equality on real text + wall time at vocab-scale merges
    val drv = time("learnBpeDriver nm=100 sf0.001") {
      TextOps.learnBpeDriver(docs, col("text"), numMerges = nm).collect()
    }
    val dst = TextOps.learnBpe(docs, col("text"), numMerges = nm).collect()
    println(s"DRIVER==DISTRIBUTED: ${drv.toSeq == dst.toSeq} (${drv.length} merges)")
    val docs01 = Tables(spark, "/root/testdata/sf0.01", "documents")
    time("learnBpeDriver nm=2000 sf0.01") {
      val t = TextOps.learnBpeDriver(docs01, col("text"), numMerges = 2000).collect()
      println(s"driver merges at sf0.01: ${t.length}")
    }
    spark.stop()
  }
}
