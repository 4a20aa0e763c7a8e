package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gfn

/** Distributed exact linear algebra over embedding columns — the
  * covariance/PCA family. The design split every such op shares: the
  * CORPUS-sized step is one mergeable aggregate (the [[graft.functions
  * .GramMatrix]] pass — count, sums, upper-triangle products in a single
  * buffer per map task), and everything AFTER it runs on a dim²-sized
  * table that fits anywhere. Whitening, PCA, covariance audits all differ
  * only in that second, tiny stage.
  */
object LinAlg {

  /** Quantize a float vector onto the integer lattice with the
    * SQL-replayable rounding `floor(x·scale + 0.5)` — written identically
    * in the oracle so no round-half convention can diverge. |q| ≤ scale
    * for inputs in [−1, 1].
    */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, x =>
      floor(x.cast("double") * scale + lit(0.5)).cast("long"))

  /** EXACT EMBEDDING COVARIANCE MATRIX — one row per (i ≤ j) dimension
    * pair with the exact integer second moments and the covariance in
    * lattice units²:
    *
    *   cov_ij = s_ij/n − (s_i/n)·(s_j/n)
    *
    * (three divisions, one multiply, one subtract — a fixed IEEE dag of
    * exact Longs, cross-engine bitwise). The feature-redundancy /
    * anisotropy audit, and the input to PCA/whitening: at 100 TB the
    * corpus pays ONE GramMatrix aggregate (state = dim·(dim+3)/2 longs
    * per task, merged pairwise), and the (i, j) table this emits is
    * dim²-sized — the eigen-solve on it is a driver triviality, which is
    * exactly why the matrix, not the factorization, is the distributed
    * op. The oracle replays the sums with a dim²-fan-out unnest join —
    * fine at sf0.01, and the reason THIS op exists instead of that plan.
    *
    * Overflow bound (loud, not silent — Math.addExact): n ≤ 2^63/scale².
    */
  def embedCovariance(emb: DataFrame, vecCol: String, dim: Int,
                      scale: Int = 1000): DataFrame =
    covarianceFromMoments(secondMoments(emb, vecCol, dim, scale))

  /** The covariance's MERGEABLE STATE: one row per (i ≤ j) pair with the
    * exact integer moments (n, s_ij, s_i, s_j). Integer sums merge across
    * any partition of the corpus — [[mergeMoments]] == a one-shot pass
    * over the concatenation — which is what the streaming drift monitor
    * ([[graft.streaming.EmbedDriftJob]]) folds per trigger.
    */
  def secondMoments(emb: DataFrame, vecCol: String, dim: Int,
                    scale: Int = 1000): DataFrame = {
    require(dim >= 1 && scale >= 1)
    val one = emb
      .select(gfn.gram_matrix(quantize(col(vecCol), scale), dim).as("m"))
    one.select(col("m.n").as("n"), explode(trianglePairs(dim)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"), col("n"),
        col("p.s_ij").as("s_ij"), col("p.s_i").as("s_i"), col("p.s_j").as("s_j"))
  }

  /** Fold a new batch's moments into existing state (both the
    * [[secondMoments]] schema). Exact by integer-sum mergeability.
    */
  def mergeMoments(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("s_ij")).as("s_ij"),
        sum(col("s_i")).as("s_i"), sum(col("s_j")).as("s_j"))

  /** The covariance dag over a moments table — dim²-sized work. Appends
    * `cov`, passing through any extra key columns (e.g. [[groupedMoments]]'
    * `grp`).
    */
  def covarianceFromMoments(m: DataFrame): DataFrame =
    m.withColumn("cov",
      col("s_ij").cast("double") / col("n").cast("double") -
        (col("s_i").cast("double") / col("n").cast("double")) *
          (col("s_j").cast("double") / col("n").cast("double")))

  /** Per-GROUP second moments — [[secondMoments]] with a group key: one
    * GramMatrix buffer per (task × group) in the partial aggregate, G·dim²
    * rows out. The class-conditional / per-source covariance input.
    */
  def groupedMoments(emb: DataFrame, group: Column, vecCol: String, dim: Int,
                     scale: Int = 1000): DataFrame = {
    require(dim >= 1 && scale >= 1)
    val one = emb
      .groupBy(group.cast("string").as("grp"))
      .agg(gfn.gram_matrix(quantize(col(vecCol), scale), dim).as("m"))
    one.select(col("grp"), col("m.n").as("n"),
        explode(trianglePairs(dim)).as("p"))
      .select(col("grp"), col("p.i").as("i"), col("p.j").as("j"), col("n"),
        col("p.s_ij").as("s_ij"), col("p.s_i").as("s_i"), col("p.s_j").as("s_j"))
  }

  /** dim²-sized literal explode of a GramMatrix struct column `m`:
    * recovers the (i, j) pair table from the flat row-major upper-triangle
    * layout, where offset(i) = i·(2·dim − i + 1)/2 (rows 0..i−1 contribute
    * dim − r entries each) and element_at is 1-based.
    */
  private def trianglePairs(dim: Int): Column =
    flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(i.as("i"), j.as("j"),
          element_at(col("m.g"),
            (i * (lit(2) * dim - i + 1) / 2 + (j - i) + 1).cast("int")).as("s_ij"),
          element_at(col("m.s"), (i + 1).cast("int")).as("s_i"),
          element_at(col("m.s"), (j + 1).cast("int")).as("s_j")))))

  /** PAIRWISE COVARIANCE DISTANCE — Frobenius distance between every two
    * groups' covariance matrices: ‖C_a − C_b‖_F with the off-diagonal
    * cells counted twice (they appear twice in the full symmetric
    * matrix). The distribution-shift audit at the second-moment level —
    * "does source/class a's embedding geometry match b's" — feeding
    * homoscedasticity checks, per-class whitening decisions, and
    * encoder-regression comparisons; the covariance-space sibling of the
    * q153 centroid-affinity (mean-level) audit.
    *
    * Determinism: each Δ² term is a fixed IEEE dag over the exact-Long
    * moments; the per-pair sum is a (i, j)-ORDERED sequential fold
    * (G²·dim²-sized work on tiny G), and the final sqrt is one
    * correctly-rounded op — the oracle replays the identical dag.
    *
    * Scale shape: the corpus pays the ONE grouped Gram pass; everything
    * pairwise runs on the G·dim² cell table.
    */
  def covarianceDistance(emb: DataFrame, group: Column, vecCol: String,
                         dim: Int, scale: Int = 1000): DataFrame = {
    val cells = covarianceFromMoments(
        groupedMoments(emb, group, vecCol, dim, scale))
      .select(col("grp"), col("i"), col("j"), col("cov"))
    val a = cells.select(col("grp").as("grp_a"), col("i"), col("j"),
      col("cov").as("ca"))
    val b = cells.select(col("grp").as("grp_b"), col("i"), col("j"),
      col("cov").as("cb"))
    a.join(b, Seq("i", "j")).where(col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("i"), col("j"),
        ((col("ca") - col("cb")) * (col("ca") - col("cb")) *
          when(col("i") === col("j"), lit(1.0)).otherwise(lit(2.0))).as("t"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(expr("aggregate(sort_array(collect_list(struct(i, j, t))), " +
        "cast(0.0 as double), (a, x) -> a + x.t)").as("d2"))
      .select(col("grp_a"), col("grp_b"), col("d2"),
        sqrt(col("d2")).as("frobenius"))
  }

  /** SPECTRAL SUMMARY — total variance (the covariance trace, an
    * i-ORDERED fold over the diagonal) next to [[topDirection]]'s
    * Rayleigh top-eigenvalue estimate, and their ratio: the
    * explained-variance share of the dominant axis. The one-number
    * anisotropy audit ("is this embedding space collapsing onto a line")
    * that decides whether whitening is worth running. Same cost as
    * [[topDirection]]: one Gram pass + driver arithmetic. Returns one
    * row `(n, trace, eigenvalue, explained_ratio)`.
    */
  def spectralSummary(emb: DataFrame, vecCol: String, dim: Int,
                      scale: Int = 1000, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 100)
    val (n, c) = covMatrix(emb, vecCol, dim, scale)
    var trace = 0.0
    var d = 0
    while (d < dim) { trace += c(d)(d); d += 1 } // fixed i order
    val (_, lambda) = powerIterate(c, dim, iters)
    val spark = emb.sparkSession
    import spark.implicits._
    Seq((n, trace, lambda, lambda / trace))
      .toDF("n", "trace", "eigenvalue", "explained_ratio")
  }

  /** Project a vector column onto a fixed direction with a REPLAYABLE
    * left-to-right fold: proj = Σᵢ xᵢ·dᵢ evaluated as
    * `aggregate(zip_with(x, d, *), 0.0, +)` — element order fixed by the
    * arrays, so DuckDB's `list_reduce(list(xᵢ·dᵢ ORDER BY i))` executes
    * the identical IEEE dag. Narrow, codegen-friendly, no shuffle — the
    * per-row half of PCA once [[topDirection]] has done the corpus half.
    */
  def projectOnto(vec: Column, dir: Array[Double]): Column = {
    val d = array(dir.map(lit(_)): _*)
    aggregate(
      zip_with(transform(vec, x => x.cast("double")), d, (x, w) => x * w),
      lit(0.0), (acc, t) => acc + t)
  }

  /** TOP PRINCIPAL DIRECTION by fixed-iteration POWER METHOD over
    * [[embedCovariance]]'s matrix — the dominant-eigenvector step of PCA
    * (anisotropy direction, first whitening axis). The corpus work is the
    * ONE Gram pass; the matrix is then collected (dim² doubles — a
    * bounded, documented collect like the k-means centroid fold) and the
    * iteration runs driver-side in a FIXED, replayable order:
    *
    *   v ← C·v (per row: left-to-right fold over j), then v ← v / v_m
    *   where m = argmax |v_i| (smallest i on ties) — max-abs
    *   normalization needs no sqrt and pins sign and scale (v_m = 1).
    *
    * Every step is a fixed IEEE dag, so the oracle unrolls the same
    * iterations with ordered list_reduce folds and matches bitwise.
    * Convergence is the standard |λ₁/λ₂| geometric rate — `iters` is the
    * dial; the residual test in OpsSpec pins the eigen-property at a
    * realistic count. Returns (i, v) — the direction with v_m = 1 — plus
    * the Rayleigh-quotient estimate λ̂ = (C·v)_m of the top eigenvalue in
    * the `eigenvalue` column (same value every row).
    */
  def topDirection(emb: DataFrame, vecCol: String, dim: Int,
                   scale: Int = 1000, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 100)
    val (_, c) = covMatrix(emb, vecCol, dim, scale)
    val (v, lambda) = powerIterate(c, dim, iters)
    val spark = emb.sparkSession
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i, x, lambda) }
      .toSeq.toDF("i", "v", "eigenvalue")
  }

  /** Bounded dim² collect of the covariance matrix (mirrored to full
    * symmetric form) plus the row count — the driver-side entry the
    * iteration ops share.
    */
  private def covMatrix(emb: DataFrame, vecCol: String, dim: Int,
                        scale: Int): (Long, Array[Array[Double]]) = {
    val rows = embedCovariance(emb, vecCol, dim, scale).collect()
    val n = if (rows.isEmpty) 0L else rows(0).getLong(2)
    val c = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(6))
      c(i)(j) = v; c(j)(i) = v
    }
    (n, c)
  }

  /** LINEAR EMBEDDING ALIGNMENT (least-squares probe): fit W minimizing
    * ‖XW − Y‖² over paired vector columns and report the per-output-dim
    * residual — the standard cross-encoder audit ("how much of encoder
    * B's space is a linear function of encoder A's", Conneau et al. 2018's
    * linear-mapping baseline; also the probe behind embedding-drift
    * attribution and cross-model distillation checks). r² per output dim
    * reads directly as "linearly explained fraction"; uniform high r²
    * means a rotation/rescale relates the spaces, low r² dims localize
    * genuinely new information.
    *
    * Distributed work is ONE GramMatrix aggregate over the CONCATENATED
    * quantized pair [x ∥ y] (state = (dx+dy)(dx+dy+3)/2 longs, merged
    * pairwise): its blocks are exactly XᵀX, XᵀY, YᵀY — all the normal
    * equations need. The solve ((XᵀX + λI)W = XᵀY, Gaussian elimination
    * with partial pivoting, fixed pivot order) and the residual algebra
    *   sse_j = (YᵀY)_jj − 2·w_jᵀ(XᵀY)_j + w_jᵀ(XᵀX)w_j
    * are dim³ DRIVER arithmetic on exact integer moments — the same
    * "matrix is distributed, factorization is a driver triviality"
    * contract as [[embedCovariance]]. Uncentered (fit an offset by
    * appending a constant feature upstream if wanted); sse reported in
    * ORIGINAL units (lattice / scale²). Rows-only (no SQL engine inverts
    * a matrix); OpsSpec pins exact recovery of a planted linear map and a
    * plain-Scala replay. Output: (out_dim, n, sse, rms, r2).
    */
  def linearAlign(pairs: DataFrame, xCol: String, yCol: String,
                  dx: Int, dy: Int, scale: Int = 1000,
                  ridge: Double = 0.0): DataFrame = {
    require(dx >= 1 && dy >= 1 && dx + dy <= 512, "dx+dy <= 512")
    val d = dx + dy
    val m = pairs
      .select(gfn.gram_matrix(
        concat(quantize(col(xCol), scale), quantize(col(yCol), scale)), d)
        .as("m"))
      .select(col("m.n"), col("m.g")).collect()(0)
    val n = m.getLong(0)
    val g = m.getSeq[Long](1).toArray
    // mirror the flat upper triangle (offset(i) = i·(2d−i+1)/2) to full
    val full = Array.ofDim[Double](d, d)
    var i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) { full(i)(j) = g(idx).toDouble; full(j)(i) = full(i)(j)
        j += 1; idx += 1 }
      i += 1
    }
    val a = Array.tabulate(dx, dx)((r, c) =>
      full(r)(c) + (if (r == c) ridge else 0.0)) // XᵀX + λI
    val b = Array.tabulate(dx, dy)((r, c) => full(r)(dx + c)) // XᵀY
    // Gaussian elimination with partial pivoting, all dy RHS at once —
    // fixed pivot scan order, deterministic
    val aug = Array.tabulate(dx)(r => a(r) ++ b(r))
    var c0 = 0
    while (c0 < dx) {
      var p = c0
      var r = c0 + 1
      while (r < dx) { if (math.abs(aug(r)(c0)) > math.abs(aug(p)(c0))) p = r
        r += 1 }
      val t = aug(c0); aug(c0) = aug(p); aug(p) = t
      val piv = aug(c0)(c0)
      require(math.abs(piv) > 1e-12, s"singular normal matrix at col $c0 " +
        "(degenerate X; add ridge)")
      r = 0
      while (r < dx) {
        if (r != c0 && aug(r)(c0) != 0.0) {
          val f = aug(r)(c0) / piv
          var c = c0
          while (c < dx + dy) { aug(r)(c) -= f * aug(c0)(c); c += 1 }
        }
        r += 1
      }
      c0 += 1
    }
    val w = Array.tabulate(dx, dy)((r, c) => aug(r)(dx + c) / aug(r)(r))
    val s2 = scale.toDouble * scale.toDouble
    val spark = pairs.sparkSession
    import spark.implicits._
    (0 until dy).map { j =>
      val yty = full(dx + j)(dx + j)
      var xtyw = 0.0
      var wxxw = 0.0
      var r = 0
      while (r < dx) {
        xtyw += w(r)(j) * b(r)(j)
        var c = 0
        var acc = 0.0
        // residual uses the UN-ridged XᵀX — ridge only stabilizes the solve
        while (c < dx) { acc += full(c)(r) * w(c)(j); c += 1 }
        wxxw += w(r)(j) * acc
        r += 1
      }
      val sse = math.max(0.0, (yty - 2.0 * xtyw + wxxw) / s2)
      val rms = if (n > 0) math.sqrt(sse / n) else 0.0
      val r2 = if (yty > 0) 1.0 - (yty - 2.0 * xtyw + wxxw) / yty else 1.0
      (j, n, sse, rms, r2)
    }.toDF("out_dim", "n", "sse", "rms", "r2")
  }

  /** Fixed-order power iteration: left-to-right matvec folds, max-abs
    * normalization with the smallest-index tie rule. Returns (direction
    * with v_m = 1, Rayleigh top-eigenvalue estimate).
    */
  private def powerIterate(c: Array[Array[Double]], dim: Int,
                           iters: Int): (Array[Double], Double) = {
    var v = Array.fill(dim)(1.0)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += c(i)(j) * v(j); j += 1 } // fixed j order
        acc
      }
      var m = 0
      var i = 1
      while (i < dim) { if (math.abs(w(i)) > math.abs(w(m))) m = i; i += 1 }
      lambda = w(m)
      v = w.map(_ / w(m))
    }
    (v, lambda)
  }
}
