package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics on edge frames — the companion to
  * [[Components]] (which answers "which rows are the same thing"); PageRank
  * answers "which nodes matter", the canonical-record picker for entity
  * resolution and the influence score for curation weighting (e.g. rank
  * domains in a link graph before sampling by domain quality).
  *
  * INTEGER formulation (same design rule as [[Cluster]]): rank mass is
  * carried in integer units. Each node starts with `unit` units; one
  * iteration sends each node's damped mass `(r * dampNum) div dampDen`,
  * split `div outDegree` per out-edge (both floor divisions on non-negative
  * longs — truncation == floor == DuckDB's `//`), and every node restarts
  * from the teleport base `unit * (dampDen - dampNum) / dampDen`. Rounding
  * remainders are simply dropped — mass is NOT renormalized — which is fine
  * because the result is defined BY this exact procedure: every engine
  * replaying it gets identical bits (q120's oracle replays it in SQL).
  * With `unit = 1e9` the drop per node per iteration is < outDeg units =
  * relative error ~1e-9·outDeg — far below any ranking-relevant difference.
  *
  * Scale shape: per iteration, one equi-join of ranks with the static
  * out-degree frame (both hash-partitioned on the node key — AQE keeps
  * them co-partitioned after the first exchange), one fan-out equi-join
  * onto edges partitioned by `src`, and one `groupBy(dst)` whose partial
  * aggregation combines contributions map-side. Edges and degrees are
  * computed once, persisted across iterations, and RELEASED before return —
  * the result is materialized in-op (the loop is inherently eager), so no
  * corpus-sized cache outlives the call. Lineage is truncated with a
  * [[Caches.checkpoint]] every `checkpointEvery` iterations (default 10),
  * exactly as [[Components]] does per round — without it the plan grows one
  * join-agg layer per iteration and analysis/codegen time eventually
  * dominates (and a lost executor would replay the whole chain). Each
  * checkpoint releases its predecessor, so in-flight cache is one
  * node-sized frame regardless of iteration count. GraphSpec pins bounded
  * plan depth at 30+ iterations.
  *
  * ANSI-overflow dial: intermediate products are bounded by
  * `totalMass * dampNum` ~ `nNodes * unit * 100`; keep `nNodes * unit`
  * under ~9e16 (e.g. drop `unit` to 1e6 beyond ~1e10 nodes).
  */
object Graph {

  /** PageRank in integer units over a directed edge list `(src, dst)`.
    * Returns `(node, rank_units)` for every node that appears as a source
    * (callers wanting sink-only nodes should symmetrize the edge list, as
    * q120 does — that also removes dangling-mass concerns). Duplicate edges
    * are collapsed first unless the caller vouches with
    * `edgesDistinct = true` — the collapse is a full corpus-sized shuffle,
    * and inputs built from a `distinct()` projection (q120: the two
    * parity-disjoint directions of one distinct pair set) are already
    * duplicate-free; skipping the redundant exchange is a real win at any
    * scale (GraphSpec pins flag-on == flag-off on such input).
    */
  def pageRankInt(edges: DataFrame, iters: Int, unit: Long = 1000000000L,
                  dampNum: Int = 85, dampDen: Int = 100,
                  checkpointEvery: Int = 10,
                  edgesDistinct: Boolean = false): DataFrame = {
    val (r, cleanup) = pageRankLoop(edges, iters, unit, dampNum, dampDen,
      checkpointEvery, edgesDistinct)
    val out = Caches.checkpoint(r)
    cleanup()
    Caches.trackRdd(out.rdd)
    out.df
  }

  /** PERSONALIZED PageRank (topic-sensitive PageRank, Haveliwala 2002):
    * identical integer procedure, but BOTH the start mass and the per-round
    * teleport base land only on `seeds` (a one-column `node` frame) — rank
    * becomes "importance as seen from the seed set", the
    * relevance-to-a-slice curation weight (e.g. rank suppliers by
    * importance to one nation's customers, domains by importance to a
    * topic's seed pages). Seeds without out-edges are dropped with the
    * same nodes-from-degrees rule as the plain op. Exactness, scale shape,
    * checkpointing and cache lifecycle are all inherited; the only new
    * cost is one node-sized seed-flag frame persisted across iterations
    * (q155's oracle replays all three rounds seed-for-seed).
    */
  def personalizedPageRankInt(edges: DataFrame, seeds: DataFrame, iters: Int,
                              unit: Long = 1000000000L,
                              dampNum: Int = 85, dampDen: Int = 100,
                              checkpointEvery: Int = 10,
                              edgesDistinct: Boolean = false): DataFrame = {
    val (r, cleanup) = pageRankLoop(edges, iters, unit, dampNum, dampDen,
      checkpointEvery, edgesDistinct, seeds = Some(seeds))
    // materialize the (node-sized) result, then release the edge/degree
    // caches — they must not outlive the call into a long-lived session.
    // The result's own blocks are registered for the session owner's drain.
    val out = Caches.checkpoint(r)
    cleanup()
    Caches.trackRdd(out.rdd)
    out.df
  }

  /** SEMI-SUPERVISED LABEL PROPAGATION (the clamped variant of Raghavan
    * et al. 2007's LPA): seed nodes carry fixed labels; each round every
    * node adopts the MAJORITY label among its labeled neighbors (ties to
    * the smallest label — the deterministic argmax), seeds stay clamped.
    * The "spread sparse human labels through the similarity graph" step:
    * quality ratings through near-dup clusters, nation/domain labels
    * through an entity graph. Unreached nodes keep a null label.
    *
    * Exactness: counts are integers and the argmax is a lexicographic
    * `max(struct(count, −label))` — the oracle (q156) unrolls the rounds
    * and replays every vote. Scale shape per round: one equi-join of the
    * label frame onto src-partitioned edges, one partial-combined
    * groupBy(dst, label) vote count, one argmax aggregate — the PageRank
    * iteration's cost model with labels in place of mass. Edges are
    * symmetrized, deduped, and persisted once; released before return.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
                       rounds: Int, checkpointEvery: Int = 10,
                       edgesDistinct: Boolean = false): DataFrame = {
    require(rounds >= 1 && checkpointEvery >= 1)
    // r12 round shape (guide §2.4/§3.1 — co-locate once, iterate with ONE
    // fundamental shuffle per round): edges are cached pre-partitioned on
    // SRC; the label frame stays hash-partitioned on node through every
    // round (it descends from the node set, which is read off the cached
    // edge partitioning), so the per-round vote join is co-partitioned —
    // a shuffled-hash join that builds on the node-sized side and streams
    // the edges with no exchange and no sort. The vote count and argmax
    // are FUSED into one majority_label aggregate (see MajorityKernel):
    // partial label→count maps combine map-side, and the single exchange
    // per round is the post-combine fan-in on dst — the same cost model
    // as a PageRank iteration. The old dag (measured, r12 probe/plan)
    // paid per round: a SortMergeJoin of the label frame, TWO aggregate
    // exchanges, and a SORT aggregate for the struct-argmax — a
    // 23-job AQE ladder at sf0.1 whose wall was stage cadence, not work.
    //
    // `edgesDistinct = true` vouches the input is one row per unordered
    // pair (a < b distinct — every catalog pair producer), so the two
    // symmetrized directions are disjoint and globally distinct already:
    // the dedup below would be a redundant corpus-sized exchange (the
    // pageRankInt vouching flag, r11; GraphSpec pins flag-on == flag-off).
    val sym = edges
      .select(col("a").cast("long").as("src"), col("b").cast("long").as("dst"))
      .unionByName(edges
        .select(col("b").cast("long").as("src"), col("a").cast("long").as("dst")))
    val e = (if (edgesDistinct) sym else sym.distinct())
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the src node set (== the dst node set — the graph is symmetrized);
    // reading it off SRC reuses the cached partitioning (no exchange) and
    // leaves `nodes` — and everything derived from it — hash-partitioned
    // on node, co-partitioned with the edge cache for every round's join
    val nodes = e.select(col("src").as("node")).distinct()
    // one row per seed node, deterministically: duplicate seed rows (or
    // two rows labeling one node differently) would fan out through every
    // round's left joins and duplicate output rows — collapse to the
    // SMALLEST label per node, matching the vote-tie rule below and the
    // seed .distinct() in pageRankLoop's personalized path.
    val s = seeds
      .select(col("node").cast("long").as("node"),
        col("label").cast("long").as("seed_label"))
      .groupBy(col("node"))
      .agg(min(col("seed_label")).as("seed_label"))
    // LOOP-INVARIANT: every round rebuilds its label frame as
    // nodes ⟕ seeds ⟕ win — the (node, seed_label) half never changes, so
    // it is computed and persisted ONCE instead of re-running the node
    // distinct and the seed aggregate per round (the unrolled 2-round plan
    // evaluated each 3×). Node-sized, released with the edge cache below.
    val base = nodes.join(s, Seq("node"), "left")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lab = base
      .select(col("node"), col("seed_label").as("label"))
    var ck: Option[Caches.Checkpointed] = None
    for (i <- 1 to rounds) {
      // majority label among labeled neighbors, ties to the smallest —
      // one fused aggregate (== the count + max(struct(c, −label)) pair,
      // GraphSpec parity pin). The shuffle_hash hints pin the exchange-
      // free co-partitioned joins: build on the node-sized label frame,
      // stream the edge cache (a sort-merge join would re-sort the
      // corpus side every round; broadcast would collect a node-sized
      // frame — wrong at scale).
      val voters = lab.where(col("label").isNotNull).hint("shuffle_hash")
      val win = voters
        .join(e, voters("node") === e("src"))
        .groupBy(col("dst").as("node"))
        .agg(graft.functions.gfn.majority_label(col("label")).as("prop"))
      lab = base
        .join(win.hint("shuffle_hash"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("seed_label"), col("prop")).as("label"))
      // same bounded-plan-depth rule as pageRankLoop: label values are
      // identical (a checkpoint materializes, never recomputes), the
      // superseded round's blocks are dropped immediately
      if (i % checkpointEvery == 0 && i < rounds) {
        val next = Caches.checkpoint(lab)
        ck.foreach(_.release())
        ck = Some(next)
        lab = next.df
      }
    }
    val out = Caches.checkpoint(lab)
    ck.foreach(_.release())
    e.unpersist(blocking = false)
    base.unpersist(blocking = false)
    Caches.trackRdd(out.rdd)
    out.df
  }

  /** The iterative core, UN-materialized: returns the lazy rank frame plus
    * a cleanup that releases the loop's persisted edge/degree/checkpoint
    * blocks. Package-private so GraphSpec can audit the pre-materialization
    * plan depth (the public surface always returns a depth-1 LogicalRDD,
    * which would make the checkpoint pin vacuous).
    */
  private[graft] def pageRankLoop(edges: DataFrame, iters: Int,
                  unit: Long = 1000000000L,
                  dampNum: Int = 85, dampDen: Int = 100,
                  checkpointEvery: Int = 10,
                  edgesDistinct: Boolean = false,
                  seeds: Option[DataFrame] = None): (DataFrame, () => Unit) = {
    require(iters >= 1 && unit >= 1 && dampNum >= 0 && dampDen >= dampNum &&
      checkpointEvery >= 1)
    val base = unit * (dampDen - dampNum) / dampDen

    val projected = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    // persist the edge list PRE-PARTITIONED on src: every iteration joins
    // shares onto e by src, and the degree count groups by src — one
    // up-front exchange, reused by all `iters` iterations AND the degree
    // aggregate (the cached InMemoryRelation keeps its HashPartitioning).
    // The 1000-executor story: co-locate once, iterate shuffle-free on
    // the corpus-sized side.
    val e = (if (edgesDistinct) projected else projected.distinct())
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = deg.select(col("src").as("node"))
    // personalized: a node-sized (node, start, base) frame with mass only
    // on seeds; the None path keeps the original literal columns (and
    // bit-identical plans — GraphSpec's parity pins stay meaningful)
    val nb: Option[DataFrame] = seeds.map { s =>
      nodes.join(
          s.select(col("node").cast("long").as("node")).distinct()
            .withColumn("is_seed", lit(true)),
          Seq("node"), "left")
        .select(col("node"),
          when(col("is_seed"), lit(unit)).otherwise(lit(0L)).as("start"),
          when(col("is_seed"), lit(base)).otherwise(lit(0L)).as("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

    var r = nb.map(_.select(col("node"), col("start").as("r")))
      .getOrElse(nodes.select(col("node"), lit(unit).as("r")))
    var ck: Option[Caches.Checkpointed] = None
    for (i <- 1 to iters) {
      // r12 (the q156 lesson): every node-sized frame in the loop is
      // hash-partitioned on the node key (it descends from deg, read off
      // the src-partitioned edge cache), so all three per-iteration joins
      // are co-partitioned — the SHUFFLE_HASH hints pin them to
      // exchange-free, sort-free shuffled-hash joins building on the
      // node-sized side (AQE used to broadcast deg/share/contrib, one
      // broadcast-materialization job each per iteration; a sort-merge
      // fallback would re-sort per iteration). The groupBy(dst) fan-in
      // stays the iteration's ONE fundamental shuffle.
      val contrib = r
        .join(deg.hint("shuffle_hash"), r("node") === deg("src"))
        .select(col("src"), expr(s"r * $dampNum div $dampDen div deg").as("share"))
        .hint("shuffle_hash")
        .join(e, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("inflow"))
      r = nb match {
        case Some(f) => f.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), (col("b") + coalesce(col("inflow"), lit(0L))).as("r"))
        case None => nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
          .select(col("node"), (lit(base) + coalesce(col("inflow"), lit(0L))).as("r"))
      }
      // truncate lineage: rank values are identical (checkpoint is a
      // materialization, not a recomputation), plan depth stays bounded;
      // the superseded round's blocks are dropped immediately
      if (i % checkpointEvery == 0 && i < iters) {
        val next = Caches.checkpoint(r)
        ck.foreach(_.release())
        ck = Some(next)
        r = next.df
      }
    }
    val result = r.select(col("node"), col("r").as("rank_units"))
    val cleanup: () => Unit = { () =>
      ck.foreach(_.release())
      e.unpersist(blocking = false)
      deg.unpersist(blocking = false)
      nb.foreach(_.unpersist(blocking = false))
      ()
    }
    (result, cleanup)
  }
}
