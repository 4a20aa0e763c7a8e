package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

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

    val sf = "/root/testdata/sf0.01"
    val docs = Tables(spark, sf, "documents")
    val emb = Tables(spark, sf, "embeddings")

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairSet(Dedup.exactNearDups(docs, 0.5))
    val mh = pairSet(Dedup.minhashNearDups(docs, 0.5))
    val sh = pairSet(Dedup.simhashNearDups(docs, 3))
    println(s"RECALL exact=${exact.size} minhash=${mh.size} (recall ${mh.intersect(exact).size.toDouble / exact.size}) " +
      s"precision=${mh.subsetOf(exact)}")
    println(s"RECALL simhash=${sh.size} vs exact: overlap ${sh.intersect(exact).size}")

    // cosine near-dup recall vs brute force (threshold 0.4 like q35)
    val vecsA = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val vecsB = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val brute = vecsA.crossJoin(vecsB).filter(col("a_id") < col("b_id"))
      .withColumn("cs", Similarity.cosine(col("a_emb"), col("b_emb")))
      .filter(col("cs") >= 0.4)
    val bruteSet = pairSet(brute)
    val lsh = pairSet(Similarity.cosineNearDups(emb, 0.4, nBits = 4))
    println(s"RECALL cosine exact=${bruteSet.size} lsh=${lsh.size} " +
      s"recall=${lsh.intersect(bruteSet).size.toDouble / bruteSet.size}")

    // ANN recall@10 vs brute force, several query ids
    val qids = Seq(0L, 7L, 123L, 250L, 444L)
    val annR = qids.map { q =>
      val b = Similarity.topKCosine(emb, q, 10).collect().map(_.getLong(0)).toSet
      val a = Similarity.annTopK(emb, q, 10).collect().map(_.getLong(0)).toSet
      val i = Similarity.ivfTopK(emb, q, 10).collect().map(_.getLong(0)).toSet
      (q, a.intersect(b).size, i.intersect(b).size)
    }
    annR.foreach { case (q, al, iv) => println(s"RECALL@10 q=$q lsh=$al ivf=$iv") }
    spark.stop()
  }
}
