package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway round-8 profiling main (dev tooling, not part of the engine):
  * decomposes q120_pagerank's wall time (graph build vs per-iteration
  * marginal cost vs result materialization) and samples q114 in isolation
  * to separate query cost from bench-neighborhood noise.
  */
object ProfileR8 {
  def time(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROF $label $s%.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def graph() = {
      val o = Tables(spark, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val l = Tables(spark, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          col("l_suppkey").cast("long").as("sk"))
        .distinct()
      pairs.select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionByName(pairs.select((col("sk") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
    }

    if (args.isEmpty || args.contains("q120")) {
      // warm
      graft.ops.Graph.pageRankInt(graph(), iters = 1).count()
      graft.ops.Caches.drainAll(spark)
      time("q120 graph-build (edges distinct+union, count)") { graph().count(); () }
      for (it <- Seq(1, 2, 3); rep <- 1 to 2) {
        graft.ops.Caches.drainAll(spark)
        time(s"q120 pageRankInt iters=$it rep$rep") {
          graft.ops.Graph.pageRankInt(graph(), iters = it).count(); ()
        }
      }
      graft.ops.Caches.drainAll(spark)
      time("q120 full query (orderBy+limit+noop)") {
        Queries.all.find(_.name == "q120_pagerank").get.build(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      println("=== one-iteration executed plan ===")
      val (r1, cleanup) = graft.ops.Graph.pageRankLoop(graph(), iters = 1)
      r1.count()
      println(r1.queryExecution.executedPlan.toString.take(8000))
      cleanup()
    }

    if (args.contains("q122")) {
      val cust = Tables(spark, d, "customer").select(col("c_custkey"), col("c_name"))
      // warm
      graft.ops.FuzzyJoin.editDistancePairs(cust, "c_custkey", "c_name", maxDist = 1).count()
      graft.ops.Caches.drainAll(spark)
      for (rep <- 1 to 2) {
        time(s"q122 stage1 editDistancePairs rep$rep") {
          graft.ops.FuzzyJoin.editDistancePairs(cust, "c_custkey", "c_name", maxDist = 1)
            .count(); ()
        }
        graft.ops.Caches.drainAll(spark)
      }
      val pairs = graft.ops.FuzzyJoin
        .editDistancePairs(cust, "c_custkey", "c_name", maxDist = 1)
        .select(col("id_a").as("a_id"), col("id_b").as("b_id"))
        .persist()
      println(s"PROF q122 pair count ${pairs.count()}")
      for (rep <- 1 to 2) {
        time(s"q122 stage2 connectedComponents (pairs cached) rep$rep") {
          graft.ops.Components.connectedComponents(pairs).count(); ()
        }
        graft.ops.Caches.drainAll(spark); pairs.persist(); pairs.count()
      }
      graft.ops.Caches.drainAll(spark)
      for (rep <- 1 to 2) {
        time(s"q122 full rep$rep") {
          Queries.all.find(_.name == "q122_entity_resolution").get.build(spark, d)
            .write.format("noop").mode("overwrite").save()
        }
        graft.ops.Caches.drainAll(spark)
      }
    }

    if (args.isEmpty || args.contains("q114")) {
      val q = Queries.all.find(_.name == "q114_boilerplate_strip").get
      for (rep <- 1 to 6) {
        graft.ops.Caches.drainAll(spark)
        System.gc()
        time(s"q114 isolated rep$rep") {
          q.build(spark, d).write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
