package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

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
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    time("warm count")(docs.count())
    val text = docs.repartition(32, col("doc_id"))
    val staged = Dedup.shingled(text)
    time("staged pass")(staged.select(max(size(col("hashes")))).collect())
    val b = Dedup.lshBands(staged)
    time("bands->buckets pairs")(
      Dedup.pairsFromBuckets(b, Seq("band", "band_key")).count())
    time("full neardup")(Dedup.minhashNearDups(docs).count())
    time("full neardup2")(Dedup.minhashNearDups(docs).count())
    spark.stop()
  }
}
