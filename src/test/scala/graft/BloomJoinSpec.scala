package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.BloomJoin

/** Bloom-pruned join: no false negatives ever, row-exact composition, a
  * bounded filter frame, and pruning that actually bites on selective dims.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keys(ids: Long*) = ids.toDF("k")
  private lazy val probe = (0L until 10000L).map(i => (i, i % 97)).toDF("id", "pk")

  test("prune never drops a true match (no false negatives)") {
    val build = keys(3L, 11L, 42L)
    val bloom = BloomJoin.build(build, col("k"))
    val kept = BloomJoin.prune(probe, col("pk"), bloom)
      .select("pk").distinct().as[Long].collect().toSet
    assert(Set(3L, 11L, 42L).subsetOf(kept))
  }

  test("join composition is row-for-row the plain inner join") {
    val build = keys(0L, 5L, 96L, 1000L) // 1000 matches nothing in probe
    val got = BloomJoin.join(probe, col("pk"), build, col("k"))
      .select("id", "pk", "k").orderBy("id").collect().toSeq
    val want = probe.join(build, col("pk") === col("k"))
      .select("id", "pk", "k").orderBy("id").collect().toSeq
    assert(got == want)
  }

  test("filter frame is one row of bounded words; selective build prunes hard") {
    val build = keys(7L)
    val bloom = BloomJoin.build(build, col("k"), numBits = 1 << 12)
    val rows = bloom.collect()
    assert(rows.length == 1)
    val words = rows(0).getMap[Int, Long](0)
    assert(words.size <= (1 << 12) / 64) // never exceeds numBits/64 entries
    assert(words.size >= 1 && words.size <= 3) // k=3 probes of one key
    val kept = BloomJoin.prune(probe, col("pk"), bloom,
      numBits = 1 << 12).count()
    // 1 of 97 key values truly matches (~103 rows); FPs can only add a few
    // more key values at 4096 bits / 3 probes
    assert(kept >= 103 && kept <= 1000, s"kept=$kept")
  }

  test("null probe keys and string keys behave like the plain join") {
    val probeN = Seq((1L, Some(3L)), (2L, None), (3L, Some(99L)))
      .toDF("id", "pk")
    val build = keys(3L, 99L)
    val got = BloomJoin.join(probeN, col("pk"), build, col("k"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L)) // the null row matches nothing, like SQL equality
    val sProbe = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "s")
    val sBuild = Seq("beta", "delta").toDF("bk")
    val sGot = BloomJoin.join(sProbe, col("s"), sBuild, col("bk"))
      .select("id").as[Long].collect().toSeq
    assert(sGot == Seq(2L))
  }

  test("property: no false negatives over random key sets (3 seeds)") {
    for (seed <- Seq(11, 222, 3333)) {
      val rnd = new java.util.Random(seed)
      val buildKeys = Set.fill(200)(rnd.nextLong() % 100000L)
      val probeKeys = Seq.fill(2000)(rnd.nextLong() % 100000L)
      val build = buildKeys.toSeq.toDF("k")
      val probeDf = probeKeys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "pk")
      val bloom = BloomJoin.build(build, col("k"))
      val kept = BloomJoin.prune(probeDf, col("pk"), bloom)
        .select("pk").as[Long].collect().toSet
      val trueMatches = probeKeys.toSet.intersect(buildKeys)
      assert(trueMatches.subsetOf(kept),
        s"seed=$seed lost ${trueMatches.diff(kept)}")
    }
  }

  test("empty build side prunes everything") {
    val bloom = BloomJoin.build(keys(), col("k"))
    assert(BloomJoin.prune(probe, col("pk"), bloom).count() == 0)
  }

  test("probe side stays shuffle-free through the prune") {
    // materialize the filter first so the plan under test is pure probe-side
    // (the build's own aggregation legitimately shuffles its tiny frame)
    val built = BloomJoin.build(keys(1L), col("k"))
    val bloom = spark.createDataFrame(
      java.util.Arrays.asList(built.collect(): _*), built.schema)
    val plan = BloomJoin.prune(probe, col("pk"), bloom)
      .queryExecution.executedPlan.toString
    // the only join is the 1-row broadcast of the filter words; the probe
    // relation itself is never exchanged
    assert(plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
