package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * near-duplicate PAIRS (q44/q25/q34) into actionable dedup CLUSTERS: each
  * document gets the minimum doc_id of its component as `cluster_id`, and
  * keeping exactly the `doc_id == cluster_id` rows dedups the corpus with
  * one representative per duplicate group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log n) rounds on any graph, vs. graph-diameter rounds for naive label
  * propagation (a duplicate CHAIN a–b–c–…–z, common when boilerplate drifts
  * gradually, has diameter = chain length).
  *
  * Scale design (100 TB / billions of edges):
  *   - Each round is groupBy-min + a co-partitioned equi-join + distinct —
  *     shuffle volume linear in |E|, and the min aggregate combines map-side,
  *     so a hot node (a star center with millions of members) reduces to one
  *     row per map partition before the shuffle.
  *   - NO collect_list: the naive formulation gathers Γ(u) per node, which
  *     OOMs on the mega-component every dirty corpus has. Here neighborhoods
  *     are never materialized — the per-node minimum joins back against the
  *     edge list, and AQE's skew-join splits the star center's join side.
  *   - A [[Caches.checkpoint]] per round truncates lineage — iterative
  *     DataFrame plans otherwise grow exponentially and re-execute prior
  *     rounds — and releases the superseded round's blocks immediately, so
  *     in-flight cache is one edge frame regardless of round count (the old
  *     `localCheckpoint` pinned EVERY round's blocks until context death).
  *   - Convergence is detected structurally (the edge set IS a star forest —
  *     see [[isStarForest]]): exact, one limit-1 action per round, and no
  *     compare-with-previous extra round. `maxIter` bounds the loop
  *     regardless.
  */
object Components {

  /** (id, cluster_id) for every node of `edges` — cluster_id is the smallest
    * id in the node's connected component. Input columns `a_id`/`b_id`;
    * self-loops ignored; direction ignored.
    *
    * Auto-dispatch (the `learnBpeAuto` pattern, r11): one
    * `limit(budget+1)` collect of the deduped edges both decides the
    * dispatch and feeds a local union-find when they fit the driver budget
    * — identical output (min-id roots are order-free), zero scheduled
    * rounds, and no separate count job. Rationale: each distributed round costs two
    * sequential JOBS (checkpoint + convergence probe) and near-dup edge
    * sets are usually tiny relative to the corpus, so the O(log n)-round
    * loop was measured job-LATENCY-bound, not work-bound (q128: 3.6 s
    * wall, 2.0 s total task CPU on 32 threads). Above the budget — the
    * mega-component corpora the scaladoc's 100 TB notes are about — the
    * distributed star contraction runs unchanged; `driverEdgeLimit = 0`
    * forces it (specs pin both paths against each other).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          driverEdgeLimit: Long = 4000000L,
                          edgesDistinct: Boolean = false): DataFrame = {
    // Materialize the input ONCE: both the node inventory and the contraction
    // read it, and upstream `edges` is typically an expensive near-dup join
    // that must not be re-executed per consumer. The blocks feed the lazy
    // result, so they are registered for the session owner's drain.
    val e0 = Caches.checkpoint(edges)
    Caches.trackRdd(e0.rdd)
    val nodes = e0.df
      .select(explode(array(col("a_id"), col("b_id"))).as("id")).distinct()
    // `edgesDistinct = true` is the caller's vouch that the (a_id, b_id)
    // pairs are one-row-per-unordered-pair already (every catalog producer
    // — exactNearDups, editDistancePairs, pairsFromAssignment — emits
    // a_id < b_id distinct), making the normalization a no-op and the
    // dedup a redundant corpus-sized exchange (the pageRankInt flag, r11).
    // Both contraction paths tolerate duplicates (union-find trivially;
    // large/small-star's mins are dup-invariant) — the dedup exists to
    // shrink the first rounds / keep the driver budget honest, so only a
    // vouched caller may skip it. With the vouch, the driver dispatch
    // below is one NARROW limited collect off the cached edges: no
    // shuffle at all before the labeling join.
    val normalized = e0.df.filter(col("a_id") =!= col("b_id"))
      .select(greatest(col("a_id"), col("b_id")).as("u"),
        least(col("a_id"), col("b_id")).as("v"))
    val clean = if (edgesDistinct) normalized else normalized.distinct()
    // driver path additionally requires integral ids (the collect decodes
    // longs); non-integral id schemes keep the type-generic contraction
    val integralIds = clean.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
      f.dataType == org.apache.spark.sql.types.IntegerType)
    // ONE bounded collect decides the dispatch AND feeds the union-find:
    // the r11 first cut ran clean.count() and then collect() — two full
    // executions of the dedup shuffle back to back. limit(budget+1) keeps
    // driver memory bounded; when the limit truncates (rows > budget) the
    // collected subset is discarded and the distributed contraction runs.
    val stars = {
      val rows =
        if (driverEdgeLimit > 0 && integralIds &&
            driverEdgeLimit < Int.MaxValue - 1)
          clean.select(col("u").cast("long"), col("v").cast("long"))
            .limit(driverEdgeLimit.toInt + 1).collect()
        else null
      if (rows != null && rows.length <= driverEdgeLimit)
        driverUnionFind(edges.sparkSession, rows)
      else starContraction(clean, maxIter)
    }
    // At the fixpoint every non-root points straight at its component's
    // minimum; roots don't appear as `u` at all, so they label themselves.
    nodes
      .join(stars.select(col("u").as("id"), col("v").as("cluster_id")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Local union-find over the bounded, deduped edge rows the dispatcher
    * already collected: parent pointers with path compression, unions
    * attach the LARGER root under the smaller, so every root is its
    * component's minimum and the output is value-identical to the
    * distributed fixpoint — one (u → component min) row per non-root node,
    * roots omitted (the caller's coalesce labels them with themselves).
    * Order-free: min-root unions commute, so the limit's row order is
    * irrelevant. Driver memory: the edge array + a parent map over touched
    * nodes, bounded by `driverEdgeLimit` (4M edges ≈ ~200 MB transient).
    */
  private def driverUnionFind(spark: SparkSession,
                              rows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import spark.implicits._
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp); x = p; p = gp
      }
      x
    }
    rows.foreach { r =>
        val ra = find(r.getLong(0)); val rb = find(r.getLong(1))
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.toSeq
      .map(x => (x, find(x)))
      .filter { case (x, root) => x != root }
      .toDF("u", "v")
  }

  /** Alternate large-star / small-star until the edge set is stable.
    * Invariant maintained: edges point from the larger endpoint `u` to the
    * smaller `v` (v < u), de-duplicated.
    */
  private def starContraction(edges0: DataFrame, maxIter: Int): DataFrame = {
    var ck = Caches.checkpoint(edges0)
    var star = isStarForest(ck.df)
    var i = 0
    while (!star && i < maxIter) {
      val next = Caches.checkpoint(smallStar(largeStar(ck.df)))
      ck.release()
      ck = next
      star = isStarForest(ck.df)
      i += 1
    }
    require(star, s"connectedComponents did not converge in $maxIter rounds")
    // the fixpoint feeds the caller's lazy labeling join — drain-owned
    Caches.trackRdd(ck.rdd)
    ck.df
  }

  /** The alternating contraction's fixpoint is EXACTLY a star forest rooted
    * at component minima (Kiveris et al., Thm 5.1) — so convergence is
    * detected structurally on the round that produces it, one round earlier
    * than compare-with-previous, and with no signature-collision caveat:
    * converged ⇔ every child u has a single distinct parent AND no parent
    * also appears as a child (a chain a→b→c has unique parents but b on
    * both sides). Probes are limit-1 and short-circuited: the cheap
    * multi-parent check fires on nearly every non-final round, so the
    * costlier semi-join probe runs ~once per contraction.
    */
  private def isStarForest(e: DataFrame): Boolean = {
    val multiParent = e.groupBy(col("u"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .filter(col("mn") =!= col("mx")).limit(1)
    if (!multiParent.isEmpty) return false
    e.select(col("v").as("u")).distinct()
      .join(e.select(col("u")), Seq("u"), "left_semi")
      .limit(1).isEmpty
  }

  /** Large-star: every neighbor v > u re-points at m = min(Γ(u) ∪ {u}).
    * Neighborhoods enter symmetrically (both directions); the per-u minimum
    * is a map-side-combining aggregate joined back on the grouping key.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val nbrs = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mn"))
    // No distinct here: duplicate edges cannot change any downstream min,
    // and smallStar's terminal distinct dedups — one shuffle saved per round.
    nbrs.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
  }

  /** Small-star: all strictly-smaller neighbors of u (after largeStar that is
    * all of them) re-point at m = min(Γ⁻(u)), and u itself points at m.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("mn"))
    e.join(mins, "u")
      .filter(col("v") =!= col("mn"))
      .select(col("v").as("u"), col("mn").as("v"))
      .unionByName(mins.select(col("u"), col("mn").as("v")))
      .distinct()
  }

}
