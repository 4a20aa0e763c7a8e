package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust statistics + distribution audits over numeric columns — the
  * data-quality screens a pipeline runs on metrics/prices/scores BEFORE
  * trusting them for mixing or filtering decisions.
  */
object Robust {

  /** GROUPED EXACT PERCENTILES BY ORDER STATISTICS — bit-identical to
    * Spark's `percentile(value, f)` (PercentileBase.getPercentile,
    * replayed operation-for-operation from the 4.1 bytecode:
    * position = (n−1).toDouble · f; lower/higher = floor/ceil(position);
    * lowerKey = min x with cum > lower; result = lowerKey when
    * higher == lower or higherKey == lowerKey, else
    * (higher − position)·lowerKey + (position − lower)·higherKey — every
    * step a fixed IEEE double op, so equality is exact; OpsSpec pins
    * bitwise parity on lineitem + adversarial groups).
    *
    * When to use WHICH (measured both ways, r11): the builtin buffers a
    * value→count map per partition and merges the maps per group in the
    * final aggregate; this helper flows the same counts as (grp, x, c)
    * ROWS — one partial-combined aggregate, a per-group running sum over
    * the distinct-value spine, a per-group argmin. At catalog scale the
    * builtin WINS (r11 A/B across q41/q77/q111/q200/q220/q232/q236: the
    * helper's extra exchange + window stages cost ~0.3–1.7 s/query while
    * the map merges stay sub-second), so every catalog face keeps the
    * builtin. The helper is the HUGE-GROUP escape: a group whose distinct
    * values don't fit one aggregation buffer OOMs the builtin's merge,
    * while the spine sort here spills gracefully — swap it in (bitwise
    * identical) when groups are corpus-sized, alongside the documented
    * `percentile_approx` sketch route.
    *
    * Null values carry no rank (the builtin's null-skip); a group whose
    * values are all null is absent from the output (the builtin would
    * return null — callers here always join the result back anyway).
    * Returns (grp, p_<i> double for each requested fraction, in order).
    */
  def groupedExactPercentiles(df: DataFrame, group: Column, value: Column,
                              fracs: Seq[Double],
                              withStats: Boolean = false): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(f => f >= 0.0 && f <= 1.0))
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(group.as("grp"), value.cast("double").as("x"))
      .where(col("x").isNotNull)
      .groupBy(col("grp"), col("x")).agg(count(lit(1)).as("c"))
    // distinct x per (grp, x) row, so the default RANGE frame equals ROWS
    val wRun = Window.partitionBy(col("grp")).orderBy(col("x"))
    val wG = Window.partitionBy(col("grp"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(wRun))
      .withColumn("n", sum(col("c")).over(wG))
    val cols = fracs.zipWithIndex.flatMap { case (f, i) =>
      val pos = lit(f) * (col("n") - 1).cast("double")
      Seq(
        min(when(col("cum") > floor(pos), col("x"))).as(s"lk_$i"),
        min(when(col("cum") > ceil(pos), col("x"))).as(s"hk_$i"),
        // pos/lower/higher are group constants; carry them out via max
        max(pos).as(s"pos_$i"))
    } ++ (if (withStats)
      Seq(max(col("n")).as("n"), min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
    else Nil)
    val agg = cum.groupBy(col("grp")).agg(cols.head, cols.tail: _*)
    val out = fracs.indices.map { i =>
      val pos = col(s"pos_$i")
      val lower = floor(pos)
      val higher = ceil(pos)
      val lk = col(s"lk_$i")
      val hk = col(s"hk_$i")
      when(higher === lower, lk)
        .when(hk === lk, lk)
        .otherwise((higher - pos) * lk + (pos - lower) * hk)
        .as(s"p_$i")
    } ++ (if (withStats) Seq(col("n"), col("min_x"), col("max_x")) else Nil)
    agg.select(col("grp") +: out: _*)
  }

  /** MEDIAN/MAD OUTLIER DETECTION (Hampel filter, the robust alternative
    * to mean±kσ — one wild value cannot drag the threshold the way it
    * drags a standard deviation): per group, the exact median, the median
    * absolute deviation, and every row whose
    * `|x − median| / (1.4826·MAD)` exceeds `k` (1.4826 makes MAD a
    * consistent σ estimate under normality; k=3.5 is the classic Hampel
    * cut). Rows in groups with MAD = 0 (over half the group identical)
    * are never flagged — documented, matches the estimator's breakdown.
    *
    * Exactness: `percentile(_, 0.5)` is Spark's EXACT interpolated
    * percentile and DuckDB's `quantile_cont` uses the same
    * `lo + (hi − lo)·frac` dag, so the oracle replays bit-identically.
    *
    * Scale shape: two grouped EXACT percentiles (each buffers its group's
    * values — right while groups are few and fit an executor; the 100 TB
    * escape for huge groups is `percentile_approx`, same plan shape) +
    * two broadcast joins of the tiny per-group stats back onto the rows;
    * the row-side frame is never shuffled beyond its scan partitioning.
    */
  def madOutliers(df: DataFrame, group: Column, id: Column, value: Column,
                  k: Double = 3.5): DataFrame = {
    val base = df.select(group.as("grp"), id.as("id"),
      value.cast("double").as("x"))
    // r12: primitive-buffer exact percentile (bit-identical to the builtin,
    // OpsSpec pin) — the builtin's boxed value map was the family's
    // dominant task-GC source (guide §5)
    val med = base.groupBy(col("grp"))
      .agg(graft.functions.gfn.exact_percentile(col("x"), 0.5).as("med"))
    val dev = base.join(broadcast(med), Seq("grp"))
      .withColumn("absdev", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("grp"))
      .agg(graft.functions.gfn.exact_percentile(col("absdev"), 0.5).as("mad"))
    dev.join(broadcast(mad), Seq("grp"))
      .withColumn("robust_z",
        when(col("mad") > 0.0,
          col("absdev") / (lit(1.4826) * col("mad"))))
      .where(col("robust_z") > k)
      .select(col("grp"), col("id"), col("x"), col("med"), col("mad"),
        col("robust_z"))
  }

  /** PER-GROUP QUANTILE REPORT: exact interpolated percentiles at the
    * requested probabilities, long format (one row per (group, q)) with
    * the group's count/min/max alongside — the distribution snapshot a
    * datacard or drift check reads. Same exact-percentile parity as
    * [[madOutliers]] (both engines share the lo + (hi−lo)·f dag; the
    * multiplication commutes bitwise).
    *
    * Scale shape: ONE grouped exact percentile (buffers each group's
    * values — `percentile_approx` is the huge-group escape, same plan)
    * + a bounded posexplode of the ≤|qs| result array.
    */
  def quantileReport(df: DataFrame, group: Column, value: Column,
                     qs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      : DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad $qs")
    df.select(group.as("grp"), value.cast("double").as("x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_x"),
        max(col("x")).as("max_x"),
        // r12: primitive-buffer exact percentile, bit-identical (q236)
        graft.functions.gfn.exact_percentiles(col("x"), qs).as("ps"))
      .select(col("grp"), col("n"), col("min_x"), col("max_x"),
        posexplode(col("ps")).as(Seq("i", "p")))
      .select(col("grp"),
        element_at(typedLit(qs), col("i") + 1).as("q"),
        col("p"), col("n"), col("min_x"), col("max_x"))
  }

  /** Benford first-digit expectations log10(1 + 1/d), d = 1..9, rounded
    * to 6 dp so the Spark and SQL faces share LITERAL constants (no
    * engine-log10 in the compared dag).
    */
  val benfordExpected: Seq[Double] = Seq(
    0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757)

  /** χ² INDEPENDENCE AUDIT over two categorical columns — "is my quality
    * flag correlated with my source?" is the question every mixing
    * decision should ask before trusting a per-slice filter rate. Emits
    * the FULL contingency grid (distinct(a) × distinct(b), zero cells
    * materialized — a zero cell still contributes its expectation to χ²),
    * each cell's observed count, expected count (row·col/N marginals) and
    * contribution, plus the table-level χ², degrees of freedom and
    * Cramér's V.
    *
    * Exactness: counts exact; expected/contribution are fixed IEEE dags;
    * the χ² total is a LEFT FOLD over (a, b)-ordered cells (the q221
    * lesson — engine-order-proof), and V = sqrt of that one double.
    *
    * Scale shape: one partial-combined groupBy on (a, b); the grid is
    * |A|·|B| cells — categorical by assumption (an id column here is a
    * usage error, same contract as any contingency test). Marginals ride
    * tiny windows over the grid.
    */
  def independenceAudit(df: DataFrame, a: Column, b: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(a.cast("string").as("a"), b.cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val grid = counts.select(col("a")).distinct()
      .crossJoin(counts.select(col("b")).distinct())
      .join(counts, Seq("a", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    // globals (N, |A|, |B|, χ²) ride 1-row aggregates + broadcast
    // cross-joins, NOT unpartitioned windows — the grid is tiny, but the
    // catalog-wide no-unpartitioned-Window plan audit holds by
    // construction this way
    val wa = Window.partitionBy(col("a"))
    val wb = Window.partitionBy(col("b"))
    val glob = grid.agg(
      sum(col("n")).as("grand_total"),
      countDistinct(col("a")).as("n_a"),
      countDistinct(col("b")).as("n_b"))
    val cells = grid
      .withColumn("row_total", sum(col("n")).over(wa))
      .withColumn("col_total", sum(col("n")).over(wb))
      .crossJoin(broadcast(glob))
      .withColumn("expected",
        col("row_total").cast("double") * col("col_total").cast("double")
          / col("grand_total").cast("double"))
      .withColumn("contrib",
        when(col("expected") > 0.0, {
          val d = col("n").cast("double") - col("expected")
          d * d / col("expected")
        }).otherwise(lit(0.0)))
    val chi = cells.agg(
      aggregate(
        array_sort(collect_list(struct(col("a"), col("b"), col("contrib")))),
        lit(0.0), (acc, x) => acc + x.getField("contrib")).as("chi2"))
    cells
      .crossJoin(broadcast(chi))
      .withColumn("dof", (col("n_a") - 1) * (col("n_b") - 1))
      .withColumn("cramers_v",
        when(col("grand_total") > 0 && least(col("n_a"), col("n_b")) > 1,
          sqrt(col("chi2") / (col("grand_total").cast("double")
            * (least(col("n_a"), col("n_b")) - 1).cast("double")))))
      .select(col("a"), col("b"), col("n"), col("row_total"),
        col("col_total"), col("grand_total"), col("expected"),
        col("contrib"), col("chi2"), col("dof"), col("cramers_v"))
  }

  /** BENFORD FIRST-DIGIT AUDIT: the classic fabricated-/truncated-data
    * screen — natural multiplicative quantities (prices, populations,
    * counts) put ~30.1% of first significant digits at 1; uniform or
    * hand-typed data does not. Per group: each digit's count, observed
    * fraction, the Benford expectation, and the group's χ² statistic
    * (Σ (n_d − e_d·N)² / (e_d·N) over OBSERVED digits — an absent digit
    * contributes no term; with 9 cells and real N they are all present).
    *
    * The first significant digit is extracted from the value's STRING
    * form (first [1-9] char) — exact and engine-agnostic, no log10
    * round-trip; pass a decimal/integer column (double→string notation
    * differs across engines).
    *
    * Scale shape: one partial-combined groupBy on (group, digit) — ≤9
    * rows per group out of the shuffle — then per-group windows over ≤9
    * rows. The χ² and fractions are fixed FP dags over exact longs.
    */
  def benfordAudit(df: DataFrame, group: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val digit = regexp_extract(value.cast("string"), "[1-9]", 0)
    val counts = df
      .select(group.as("grp"), digit.as("d"))
      .where(col("d") =!= "")
      .groupBy(col("grp"), col("d").cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("grp"))
    counts
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("obs_frac",
        col("n").cast("double") / col("total").cast("double"))
      .withColumn("exp_frac",
        element_at(typedLit(benfordExpected), col("digit")))
      .withColumn("chi2_term", {
        val e = col("exp_frac") * col("total").cast("double")
        (col("n").cast("double") - e) * (col("n").cast("double") - e) / e
      })
      // FP addition is order-sensitive and a window SUM's partition order
      // is engine-dependent (and double→decimal casts round differently
      // across engines: Spark via the shortest string repr, others via the
      // binary value) — so the χ² is a LEFT FOLD of the ≤9 terms in digit
      // order: bit-identical terms + fixed order = bit-identical sum
      .withColumn("chi2",
        aggregate(
          array_sort(
            collect_list(struct(col("digit"), col("chi2_term"))).over(w)),
          lit(0.0), (a, x) => a + x.getField("chi2_term")))
      .drop("chi2_term")
  }
}
