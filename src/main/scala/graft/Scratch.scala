package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Throwaway profiling main (overwrite freely). Currently: prints the q156
  * LPA inner dag (the loop materializes in-op, so PlanDump only sees the
  * final checkpoint sort) in both the r11 form and the r12 fused form —
  * plans/r12/q156_label_propagation_inner_{before,after}.txt.
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

    val cust = Tables(spark, sfDir, "customer")
    val pairs = graft.ops.FuzzyJoin
      .editDistancePairs(cust.select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", maxDist = 1)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val seeds = cust
      .where(graft.ops.Mix.hashGate(col("c_custkey")) < 300)
      .select(col("c_custkey").as("node"), col("c_nationkey").as("label"))
    val s = seeds
      .select(col("node").cast("long").as("node"),
        col("label").cast("long").as("seed_label"))
      .groupBy(col("node"))
      .agg(min(col("seed_label")).as("seed_label"))
    val sym = pairs
      .select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .unionByName(pairs
        .select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"plans/r12/$name"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/r12/$name (${txt.length} chars)")
    }

    // ---- r11 form: unpartitioned edge cache, two-step vote/argmax ----
    locally {
      val e = sym.persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node")).distinct()
      val base = nodes.join(s, Seq("node"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
      var lab = base.select(col("node"), col("seed_label").as("label"))
      for (_ <- 1 to 2) {
        val votes = lab.where(col("label").isNotNull)
          .join(e, lab("node") === e("src"))
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("c"))
        val win = votes.groupBy(col("node"))
          .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).as("prop"))
        lab = base.join(win, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("seed_label"), col("prop")).as("label"))
      }
      dump("q156_label_propagation_inner_before.txt", lab)
      e.unpersist(blocking = true)
      base.unpersist(blocking = true)
    }

    // ---- r12 form: src-partitioned edge cache, fused majority vote ----
    locally {
      val e = sym.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node")).distinct()
      val base = nodes.join(s, Seq("node"), "left")
        .persist(StorageLevel.MEMORY_AND_DISK)
      var lab = base.select(col("node"), col("seed_label").as("label"))
      for (_ <- 1 to 2) {
        val voters = lab.where(col("label").isNotNull).hint("shuffle_hash")
        val win = voters
          .join(e, voters("node") === e("src"))
          .groupBy(col("dst").as("node"))
          .agg(graft.functions.gfn.majority_label(col("label")).as("prop"))
        lab = base.join(win.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("seed_label"), col("prop")).as("label"))
      }
      dump("q156_label_propagation_inner_after.txt", lab)
      e.unpersist(blocking = true)
      base.unpersist(blocking = true)
    }
    spark.stop()
  }
}
