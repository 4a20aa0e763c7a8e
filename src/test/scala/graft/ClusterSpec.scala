package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Cluster

/** Integer-lattice k-means: exact parity with a plain-Scala reference
  * Lloyd implementation, monotone inertia, the empty-cluster rule, the
  * assign-only probe face, and the narrow-assignment plan shape.
  */
class ClusterSpec extends AnyFunSuite {
  private implicit lazy val spark: org.apache.spark.sql.SparkSession =
    SparkTestSession.spark
  import spark.implicits._

  private lazy val emb =
    Tables(spark, "/root/testdata/sf0.001", "embeddings")

  /** Plain single-threaded Lloyd on the same lattice: quantize, k smallest
    * ids seed, argmin with low-cluster ties, floor-div update, empty
    * cluster keeps its centroid. The distributed result must match this
    * EXACTLY — that is the whole point of the integer formulation.
    */
  private def reference(vecs: Seq[(Long, Array[Double])], k: Int, iters: Int,
                        scale: Int): (Map[Long, (Int, Long)], Array[Array[Long]]) = {
    val q = vecs.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.round(x * scale) + scale)
    }
    var cent = q.take(k).map(_._2.map(identity)).toArray
    def near(x: Array[Long]): (Int, Long) = {
      var bj = 0; var bd = Long.MaxValue
      cent.indices.foreach { j =>
        var d = 0L
        x.indices.foreach { i => val t = x(i) - cent(j)(i); d += t * t }
        if (d < bd) { bd = d; bj = j }
      }
      (bj, bd)
    }
    for (_ <- 1 to iters) {
      val byCl = q.groupBy { case (_, x) => near(x)._1 }
      cent = cent.zipWithIndex.map { case (old, j) =>
        byCl.get(j) match {
          case None => old.clone()
          case Some(members) =>
            val n = members.size
            old.indices.map(i => members.map(_._2(i)).sum / n).toArray
        }
      }
    }
    (q.map { case (id, x) => id -> near(x) }.toMap, cent)
  }

  private lazy val vecs: Seq[(Long, Array[Double])] =
    emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq

  test("kmeans matches the plain-Scala reference bit-for-bit (k=4, 3 iters)") {
    val (want, _) = reference(vecs, k = 4, iters = 3, scale = 1000)
    val got = Cluster.kmeansLattice(emb, "vec_id", "embedding", k = 4, iters = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.length == vecs.length)
    got.foreach { case (id, cl, d2) =>
      assert(want(id) == ((cl.toInt, d2)), s"vec $id")
    }
  }

  test("inertia is non-increasing across iterations") {
    val inertias = (0 to 3).map { it =>
      Cluster.kmeansLattice(emb, "vec_id", "embedding", k = 4, iters = it)
        .agg(sum(col("dist2"))).as[Long].head()
    }
    inertias.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    assert(inertias.last < inertias.head) // it actually moved
  }

  test("a cluster that loses all members keeps its centroid; ties go low") {
    // seeds are ids 0 and 1, both at the origin; the far point is
    // equidistant-from-neither trap: after one update both centroids would
    // collapse identically, and cluster 1 empties (ties assign to 0).
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)),
      (2L, Array(0.0, 0.0)), (3L, Array(0.1, 0.1))).toDF("vec_id", "embedding")
    val out = Cluster.kmeansLattice(pts, "vec_id", "embedding",
      k = 2, iters = 2, scale = 10)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // everything lands in cluster 0 (ties to the lower id), cluster 1 kept
    // its (identical) centroid so nothing crashed or drifted
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_._1 == 0L))
    val (want, _) = reference(
      Seq((0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)),
        (2L, Array(0.0, 0.0)), (3L, Array(0.1, 0.1))), 2, 2, 10)
    out.foreach { case (id, (cl, d2)) => assert(want(id) == ((cl.toInt, d2))) }
  }

  test("assign() with trained centroids reproduces the final assignment") {
    val cent = Cluster.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 2)
    val probe = Cluster.assign(emb, "vec_id", "embedding", cent)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val full = Cluster.kmeansLattice(emb, "vec_id", "embedding", k = 4, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(probe == full)
  }

  test("semantic dedup emits exactly the co-clustered brute-force pairs") {
    val got = Cluster.semanticDupPairs(emb, "vec_id", "embedding",
        k = 4, iters = 2, thrNum = 3, thrDen = 10)
      .select("a_id", "b_id", "dot")
      .as[(Long, Long, Long)].collect().toSet
    // brute-force truth on the same integer predicate, restricted to pairs
    // the clustering co-locates — within clusters the op must be EXACT
    val (asg, _) = reference(vecs, k = 4, iters = 2, scale = 1000)
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.round(x * 1000)))
    }.sortBy(_._1)
    val want = (for {
      (ia, va) <- q; (ib, vb) <- q if ia < ib
      if asg(ia)._1 == asg(ib)._1
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      na2 = va.map(x => x * x).sum
      nb2 = vb.map(x => x * x).sum
      if dot > 0 && 100 * dot * dot >= 9 * na2 * nb2
    } yield (ia, ib, dot)).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("auto-k semantic dedup with one giant cluster equals global brute force") {
    // targetClusterSize >= n forces k=1: every pair is co-clustered, so the
    // result must be the GLOBAL exact pair set — the recall anchor that
    // pins what smaller clusters trade away.
    val got = Cluster.semanticDupPairsAuto(emb, "vec_id", "embedding",
        iters = 2, targetClusterSize = 1000000, thrNum = 3, thrDen = 10)
      .select("a_id", "b_id", "dot")
      .as[(Long, Long, Long)].collect().toSet
    val q = vecs.map { case (id, v) => (id, v.map(x => math.round(x * 1000))) }
    val want = (for {
      (ia, va) <- q; (ib, vb) <- q if ia < ib
      dot = va.zip(vb).map { case (x, y) => x * y }.sum
      if dot > 0 && 100 * dot * dot >=
        9 * va.map(x => x * x).sum * vb.map(x => x * x).sum
    } yield (ia, ib, dot)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("semantic keepers: one prototype per entity, the centroid-closest one") {
    val out = Cluster.semanticDedupKeepers(emb, "vec_id", "embedding",
        k = 4, iters = 2, thrNum = 3, thrDen = 10)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.length == 500) // every vector accounted for
    val byEnt = out.groupBy(_._2)
    byEnt.foreach { case (ent, members) =>
      val keepers = members.filter(_._4 == 1)
      assert(keepers.length == 1, s"entity $ent")
      // the keeper is the lexicographic (dist2, id) minimum of its group
      assert(keepers.head._1 == members.map(m => (m._3, m._1)).min._2)
      // the entity label is the smallest member id (Components contract)
      assert(ent == members.map(_._1).min)
    }
    // dups exist on this corpus, so keepers < rows; and every non-keeper
    // shares its entity with its keeper by construction
    assert(byEnt.size < 500 && byEnt.size == out.count(_._4 == 1))
  }

  test("pruned two-level assignment: exact at full probe, high recall pruned") {
    // k=32 clusters so the super-structure is meaningful
    val cent = Cluster.kmeansCentroids(emb, "vec_id", "embedding", k = 32, iters = 2)
    val idx = Cluster.buildPrunedIndex(cent, nSuper = 6)
    assert(idx.superOf.length == 32 && idx.superOf.forall(s => s >= 0 && s < 6))
    val exact = Cluster.assign(emb, "vec_id", "embedding", cent)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // full probe scans every group -> identical bits to the flat kernel
    val full = Cluster.assignPruned(emb, "vec_id", "embedding", idx, nProbe = 6)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(full == exact)
    // pruned to 2 of 6 supers: large recall, and dist2 never improves on
    // exact (pruning can only miss the true centroid, not beat it)
    val pruned = Cluster.assignPruned(emb, "vec_id", "embedding", idx, nProbe = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val agree = pruned.zip(exact).count { case (p, e) => p._2 == e._2 }
    assert(agree >= (0.7 * exact.size).toInt, s"recall ${agree}/${exact.size}")
    pruned.zip(exact).foreach { case (p, e) => assert(p._3 >= e._3) }
    // plan stays narrow
    val plan = Cluster.assignPruned(emb, "vec_id", "embedding", idx, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.toLowerCase.contains("join"))
  }

  test("assignment pass is narrow: no join, no exchange in the probe plan") {
    val cent = Cluster.kmeansCentroids(emb, "vec_id", "embedding", k = 4, iters = 1)
    val plan = Cluster.assign(emb, "vec_id", "embedding", cent)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert(!plan.contains("Exchange"))
  }

  test("k-center greedy selection matches a plain-Scala replay pick-for-pick") {
    val vecs = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
    // plain replay: same lattice, same seed (smallest id), same argmax with
    // smallest-id tie rule, dist2 = min over selected at selection time
    val q = vecs.map { case (id, v) => id -> v.map(x => math.round(x * 1000) + 1000) }
    val seed = q.minBy(_._1)
    var centers = Vector(seed._2)
    var expect = Vector((1L, seed._1, 0L))
    for (r <- 2 to 6) {
      def md(x: Array[Long]): Long = centers.map { c =>
        var d = 0L; x.indices.foreach { i => val t = x(i) - c(i); d += t * t }; d
      }.min
      val (pid, pd) = q.map { case (id, x) => (id, md(x)) }
        .minBy { case (id, d) => (-d, id) }
      centers :+= q.find(_._1 == pid).get._2
      expect :+= ((r.toLong, pid, pd))
    }
    val got = Cluster.kCenterSelect(emb, "vec_id", "embedding", k = 6)
      .orderBy(col("sel_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // coverage radii never increase along the greedy order
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b }, radii)
    // diversity: selected points are pairwise farther apart than the final
    // coverage radius (the Gonzalez 2-approximation's structural property)
    val byId = q.toMap
    val sel = got.map(t => byId(t._2))
    val rK = radii.last
    for (i <- sel.indices; j <- sel.indices if i < j) {
      var d = 0L
      sel(i).indices.foreach { t => val x = sel(i)(t) - sel(j)(t); d += x * x }
      assert(d >= rK, s"pair ($i,$j) closer than r_k: $d < $rK")
    }
  }

  test("kCenterSelect stops early when k exceeds the distinct points — no duplicate ids") {
    import spark.implicits._
    // 3 distinct lattice points among 5 rows (2 exact duplicates)
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(0.0f, 1.0f)),
      (5L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Cluster.kCenterSelect(emb, "vec_id", "embedding", k = 5)
      .orderBy(col("sel_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 3, s"3 distinct points -> 3 picks, got ${got.toSeq}")
    assert(got.map(_._2).distinct.length == 3, s"no duplicate ids: ${got.toSeq}")
    assert(got.forall { case (rank, _, d2) => rank == 1L || d2 > 0L },
      s"every non-seed pick strictly diverse: ${got.toSeq}")
  }
}
