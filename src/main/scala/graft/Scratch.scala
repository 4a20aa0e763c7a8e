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
    def docsSpread = Tables(spark, d, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q179 stage ladder ----
    val docs = docsSpread
    val ref = docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("pair_id"), col("text").as("ref"))
    val cand = docs.where(col("doc_id") % 2 === 1)
      .select((col("doc_id") - 1).as("pair_id"), col("text").as("cand"))
    val pairs = ref.join(cand, "pair_id")
    time("q179 pairing join only")(noop(pairs))

    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(trim(c)), "\\s+"), w => length(w) > 0)
    val base = pairs.select(col("pair_id").cast("long").as("pair_id"),
      toks(col("cand")).as("ct"), toks(col("ref")).as("rt"))
    time("q179 tokenize")(noop(base))

    def grams(tc: org.apache.spark.sql.Column, n: Int) =
      if (n == 1) tc
      else when(size(tc) >= n,
        transform(sequence(lit(1), size(tc) - (n - 1)),
          i => array_join(slice(tc, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    val ex = (1 to 2).map { n =>
      base.select(col("pair_id"), lit(n).as("n"),
        explode(concat(
          transform(grams(col("ct"), n),
            g => struct(g.as("g"), lit(1L).as("c"), lit(0L).as("r"))),
          transform(grams(col("rt"), n),
            g => struct(g.as("g"), lit(0L).as("c"), lit(1L).as("r"))))).as("x"))
    }.reduce(_ unionByName _)
    time("q179 gram explode only")(noop(ex))
    println(s"q179 exploded rows = ${time("q179 explode count")(ex.count())}")
    val counts = ex.groupBy(col("pair_id"), col("n"), col("x.g"))
      .agg(sum(col("x.c")).as("cc"), sum(col("x.r")).as("rc"))
    time("q179 per-gram counts")(noop(counts))
    val perN = counts.groupBy(col("pair_id"), col("n"))
      .agg(sum(least(col("cc"), col("rc"))).as("m"))
    time("q179 per-pair reduce")(noop(perN))
    time("q179 full")(noop(Queries.all.find(_.name == "q179_bleu_eval").get
      .build(spark, d)))
    // hashed-gram variant of the count stage
    val counts2 = ex.groupBy(col("pair_id"), col("n"), xxhash64(col("x.g")).as("g"))
      .agg(sum(col("x.c")).as("cc"), sum(col("x.r")).as("rc"))
      .groupBy(col("pair_id"), col("n"))
      .agg(sum(least(col("cc"), col("rc"))).as("m"))
    time("q179 hashed-gram counts+reduce")(noop(counts2))

    // ---- q184 stage ladder ----
    val toksF = docsSpread.select(col("doc_id").cast("long").as("id"),
      graft.ops.TextOps.tokens(lower(col("text"))).as("tk"))
    val perDoc = toksF.select(col("id"),
      size(filter(col("tk"), w => length(w) > 0)).cast("long").as("ntok"))
    time("q184 perDoc")(noop(perDoc))
    val firsts = toksF
      .select(col("id"), explode(col("tk")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col("term")).agg(min(col("id")).as("first_id"))
      .groupBy(col("first_id")).agg(count(lit(1)).as("new_terms"))
    time("q184 firsts histogram")(noop(firsts))
    time("q184 full")(noop(Queries.all.find(_.name == "q184_heaps_fit").get
      .build(spark, d)))
    spark.stop()
  }
}
