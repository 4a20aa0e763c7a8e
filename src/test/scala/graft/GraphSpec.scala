package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Integer PageRank: bit-parity with a plain-Scala replay of the exact
  * procedure, ranking sanity on known topologies, and equi-join plan shape.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Single-threaded replay of pageRankInt's exact integer procedure. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        unit: Long = 1000000000L): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val nodes = deg.keySet
    val base = unit * 15 / 100
    var r: Map[Long, Long] = nodes.map(_ -> unit).toMap
    for (_ <- 1 to iters) {
      val inflow = e.filter(p => r.contains(p._1))
        .groupBy(_._2)
        .map { case (dst, in) =>
          dst -> in.map { case (src, _) => r(src) * 85 / 100 / deg(src) }.sum
        }
      r = nodes.map(n => n -> (base + inflow.getOrElse(n, 0L))).toMap
    }
    r
  }

  // a hub-and-spoke with a side chain: 0 <-> {1,2,3}, 3 <-> 4 <-> 5
  private val g: Seq[(Long, Long)] =
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("pageRankInt matches the plain-Scala integer replay bit-for-bit") {
    val want = reference(g, iters = 5)
    val got = Graph.pageRankInt(g.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("the hub outranks the spokes; total mass never exceeds the start") {
    val r = Graph.pageRankInt(g.toDF("src", "dst"), iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(r(0L) > r(1L) && r(0L) > r(2L))
    assert(r(3L) > r(4L)) // bridge node beats chain tail
    assert(r.values.sum <= 6L * 1000000000L) // remainders only ever drop mass
  }

  test("isolated duplicate edges collapse: parallel edges don't double mass") {
    val dup = g ++ g // every edge twice
    val a = Graph.pageRankInt(g.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRankInt(dup.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("edgesDistinct vouching: same bits as the collapsing path on distinct input") {
    val a = Graph.pageRankInt(g.distinct.toDF("src", "dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRankInt(g.distinct.toDF("src", "dst"), iters = 5,
        edgesDistinct = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("checkpointing keeps plan depth bounded at 30+ iterations, same bits") {
    // 32 iterations with checkpointEvery=10: the final INTERNAL plan holds
    // at most ~2 un-truncated iteration layers; without checkpointing it
    // would hold all 32. The audit runs on the pre-materialization loop
    // frame (the public surface always returns a depth-1 LogicalRDD, which
    // would make this pin vacuous). Values on the public surface must be
    // identical to the driver-side reference (a checkpoint materializes,
    // it does not recompute).
    val (ckptPlan, c1) = Graph.pageRankLoop(g.toDF("src", "dst"), iters = 32)
    val depth = ckptPlan.queryExecution.optimizedPlan.collect { case p => p }.size
    c1()
    val (noCkptPlan, c2) = Graph.pageRankLoop(g.toDF("src", "dst"), iters = 32,
      checkpointEvery = Int.MaxValue)
    val noCkptDepth = noCkptPlan.queryExecution.optimizedPlan.collect { case p => p }.size
    c2()
    assert(depth < noCkptDepth / 3,
      s"checkpointed plan has $depth nodes vs $noCkptDepth uncheckpointed")
    val want = reference(g, iters = 32)
    val ckpt = Graph.pageRankInt(g.toDF("src", "dst"), iters = 32)
    assert(ckpt.as[(Long, Long)].collect().toMap == want)
  }

  test("plan is equi-join shaped: no cartesian or nested-loop join") {
    val plan = Graph.pageRankInt(g.toDF("src", "dst"), iters = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  /** Seeded replay: start mass and per-round base only on the seed set. */
  private def referencePers(edges: Seq[(Long, Long)], seeds: Set[Long],
                            iters: Int,
                            unit: Long = 1000000000L): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val nodes = deg.keySet
    val base = unit * 15 / 100
    var r: Map[Long, Long] = nodes.map(n => n -> (if (seeds(n)) unit else 0L)).toMap
    for (_ <- 1 to iters) {
      val inflow = e.filter(p => r.contains(p._1))
        .groupBy(_._2)
        .map { case (dst, in) =>
          dst -> in.map { case (src, _) => r(src) * 85 / 100 / deg(src) }.sum
        }
      r = nodes.map(n =>
        n -> ((if (seeds(n)) base else 0L) + inflow.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("personalized pagerank matches the seeded replay; mass stays near the seed") {
    val seeds = Set(0L)
    val want = referencePers(g, seeds, iters = 5)
    val got = Graph.personalizedPageRankInt(g.toDF("src", "dst"),
        seeds.toSeq.toDF("node"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // locality: the seed and its neighbors outrank the far chain tail
    assert(got(0L) > got(5L) && got(1L) > got(5L))
    // all-nodes seed set degenerates to the plain op, bit-for-bit
    val allSeeds = g.flatMap(p => Seq(p._1, p._2)).distinct.toDF("node")
    val pers = Graph.personalizedPageRankInt(g.toDF("src", "dst"), allSeeds,
        iters = 4).as[(Long, Long)].collect().toMap
    val plain = Graph.pageRankInt(g.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(pers == plain)
  }

  test("label propagation: clamped seeds, majority vote, smallest-label ties, null for unreached") {
    // two cliques bridged by a chain, plus an isolated pair:
    //   clique A: 1-2-3 (seed 1 -> label 10); clique B: 5-6-7 (seed 5 -> 20)
    //   bridge: 3-4, 4-5; isolated: 8-9 (no seed -> stays null)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (5L, 6L), (6L, 7L), (5L, 7L),
      (3L, 4L), (4L, 5L), (8L, 9L)).toDF("a", "b")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("node", "label")
    def run(r: Int) = Graph.labelPropagation(edges, seeds, rounds = r)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    val r1 = run(1)
    assert(r1(2L).contains(10L) && r1(3L).contains(10L), s"clique A labeled: $r1")
    assert(r1(6L).contains(20L) && r1(7L).contains(20L))
    assert(r1(4L).contains(20L), s"bridge sees only seed 5 at round 1: ${r1(4L)}")
    assert(r1(8L).isEmpty && r1(9L).isEmpty)
    val r2 = run(2)
    // round 2: node 4 sees labeled 3 (10) and labeled 5 (20) — one vote
    // each, tie breaks to the SMALLEST label
    assert(r2(4L).contains(10L), s"tie must break to 10: ${r2(4L)}")
    // seeds stay clamped even with opposing neighbors
    assert(r2(1L).contains(10L) && r2(5L).contains(20L))
    assert(r2(8L).isEmpty && r2(9L).isEmpty, "isolated pair never labeled")
    // edgesDistinct vouching (the input above IS one row per a<b pair):
    // bit-identical rows with the dedup exchange skipped
    val vouched = Graph.labelPropagation(edges, seeds, rounds = 2,
        edgesDistinct = true)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(vouched == r2, "edgesDistinct vouching changed the result")
  }

  test("label propagation: 25 rounds runs through the checkpoint path and holds the fixpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (5L, 6L), (6L, 7L), (5L, 7L),
      (3L, 4L), (4L, 5L), (8L, 9L)).toDF("a", "b")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("node", "label")
    def run(r: Int) = Graph.labelPropagation(edges, seeds, rounds = r)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    // the fixture stabilizes by round 3; 25 rounds (two checkpoints at 10
    // and 20) must return the identical labeling, not a recomputed variant
    assert(run(25) == run(3))
  }

  test("label propagation dedups seeds: duplicate and conflicting rows collapse to min label") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    // node 1 seeded twice identically, node 3 with CONFLICTING labels —
    // both must collapse to one row per node (min label) instead of
    // fanning out through every round's joins
    val seeds = Seq((1L, 10L), (1L, 10L), (3L, 30L), (3L, 20L))
      .toDF("node", "label")
    val out = Graph.labelPropagation(edges, seeds, rounds = 2).collect()
    assert(out.length == out.map(_.getLong(0)).distinct.length,
      s"one row per node expected: ${out.mkString(",")}")
    val m = out.map(x => x.getLong(0) ->
      (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(m(1L).contains(10L) && m(3L).contains(20L), s"clamped minima: $m")
    // clean run on the deduped seed set agrees exactly
    val clean = Graph.labelPropagation(edges,
        Seq((1L, 10L), (3L, 20L)).toDF("node", "label"), rounds = 2)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(m == clean)
  }
}
