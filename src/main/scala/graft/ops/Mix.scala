package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data mixing for training-corpus assembly: per-stratum downsampling to hit
  * a target mixture, and token-budget shard packing for the sampled output.
  *
  * Sampling is a DETERMINISTIC hash gate, not `rand()`/`sampleBy`:
  *   keep ⇔ (Knuth-multiplicative hash of the id, folded to 31 bits) mod
  *          1000 < rate·1000.
  * Properties that matter at 100 TB: reproducible across runs, engines and
  * task retries (rand() is none of these); a pure narrow filter evaluated at
  * the scan (no shuffle, no state); and the same id always resolves the same
  * way, so incremental re-runs over a growing corpus never flip earlier
  * decisions. The 31-bit fold keeps `h·2654435761` under 2^62 — ANSI-safe.
  */
object Mix {

  private val M31 = 2147483648L // 2^31
  private val Knuth = 2654435761L

  /** Uniform pseudo-random bucket in [0, buckets) from a numeric id. */
  def hashGate(id: Column, buckets: Int = 1000): Column =
    pmod(pmod(id, lit(M31)) * lit(Knuth), lit(M31)) % buckets

  /** EXACT-COUNT STRATIFIED QUOTAS — Hamilton / largest-remainder
    * apportionment: split a document budget `n` across strata
    * PROPORTIONALLY to their sizes such that the integer quotas sum to
    * EXACTLY `n` (rate-based gates like [[stratifiedSample]] only hit a
    * budget in expectation). Per stratum s with count c_s and corpus
    * total T:
    *
    *   base_s = ⌊n·c_s / T⌋,  then the n − Σ base_s leftover seats go to
    *   the strata with the largest remainders n·c_s − base_s·T
    *   (ties: stratum asc — total order, engine-replayable).
    *
    * All arithmetic exact in longs (n·c_s needs n·c_s < 2^63 — at corpus
    * scale promote the product to DECIMAL(38,0), same dag). With n ≤ T
    * the apportionment itself never exceeds a stratum size (a zero-
    * remainder stratum never draws a bonus seat); for n > T the quota is
    * CAPPED at c_s in-plan, so Σ quota = min(n, T) — you can't keep more
    * rows than exist.
    *
    * Scale shape: one per-stratum count shuffle to a G-row frame, then
    * G-row windows — the corpus pays one pass.
    */
  def quotaApportion(df: DataFrame, stratum: Column, n: Long): DataFrame = {
    require(n >= 0, s"budget must be non-negative, got $n")
    val counts = df.groupBy(stratum.cast("string").as("stratum"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")).as("t"))
    // floor division via the pmod identity: (p − p mod t) is exactly
    // divisible by t, so the IEEE quotient is the exact integer (Spark's
    // `/` on longs is TRUE division to double — not a floor div)
    val prod = lit(n) * col("c")
    val based = counts.crossJoin(broadcast(tot))
      .withColumn("base",
        ((prod - pmod(prod, col("t"))) / col("t")).cast("long"))
      .withColumn("rem", pmod(prod, col("t")))
    // leftover + remainder ranks ride a 1-row aggregate and a sorted-array
    // explode over the G-row frame, NOT unpartitioned windows (the
    // catalog-wide plan audit bans those even on bounded frames)
    val glob = based.agg((lit(n) - sum(col("base"))).as("leftover"))
    val rankTbl = based
      .agg(sort_array(collect_list(struct((-col("rem")).as("nrem"),
        col("stratum").as("stratum")))).as("a"))
      .select(explode(transform(col("a"), (x, i) =>
        struct(x.getField("stratum").as("stratum"),
          (i + 1).cast("long").as("bonus_rank")))).as("r"))
      .select(col("r.stratum").as("stratum"),
        col("r.bonus_rank").as("bonus_rank"))
    based
      .join(broadcast(rankTbl), Seq("stratum"))
      .crossJoin(broadcast(glob))
      .withColumn("quota",
        // least() caps the n > T case (base ≥ c there); a no-op for
        // n ≤ T, where the apportionment never exceeds a stratum size
        least(col("base") + (col("bonus_rank") <= col("leftover"))
          .cast("long"), col("c")))
      .select(col("stratum"), col("c"), col("base"), col("rem"),
        col("quota"))
  }

  /** Apply [[quotaApportion]]: keep, per stratum, exactly its quota of
    * rows — membership by hash-order rank ([[hashGate]] bucket, then id;
    * deterministic, quasi-random, and stable under corpus growth within
    * a bucket's resolution). Returns every row with its rank and verdict
    * so the cut line is auditable. One per-stratum window (the
    * [[budgetSelect]] shape).
    */
  def quotaSelect(df: DataFrame, stratum: Column, id: Column,
                  n: Long): DataFrame = {
    val quotas = quotaApportion(df, stratum, n)
      .select(col("stratum"), col("quota"))
    val base = df.select(stratum.cast("string").as("stratum"),
      id.cast("long").as("id"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(hashGate(col("id")), col("id"))
    base
      .withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("stratum"))
      .withColumn("kept", (col("rank") <= col("quota")).cast("int"))
  }

  /** Keep each row iff its id-hash bucket falls under its stratum's rate.
    * Unlisted strata use `defaultRate`. Rates are in [0, 1] with 1/1000
    * resolution (the gate granularity).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val threshold = rates.foldLeft(lit((defaultRate * 1000).toInt)) {
      case (acc, (k, r)) => when(stratum === k, lit((r * 1000).toInt)).otherwise(acc)
    }
    df.filter(hashGate(id) < threshold)
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis A-ES): each row draws key = ln(u)/w from the same integer
    * hash arithmetic as [[hashGate]] (u ∈ (0,1] at full 31-bit resolution)
    * and the top-k keys per stratum ARE a without-replacement sample with
    * inclusion probability proportional to `weight` — the
    * sample-by-quality / sample-by-length primitive of corpus mixing.
    * Reproducible across runs, engines, and task retries like the uniform
    * gate (no rand()); ln bit-agrees cross-engine, so the oracle can replay
    * the identical keys. One window shuffle per stratum; weights must be
    * strictly positive (rows with weight <= 0 are dropped).
    */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
                     weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (pmod(pmod(id, lit(M31)) * lit(Knuth), lit(M31)) + 1).cast("double") /
      lit(2147483649.0) // (0, 1]
    val key = log(u) / weight.cast("double") // <= 0; larger = more likely kept
    val w = Window.partitionBy(stratum).orderBy(key.desc, id)
    df.filter(weight.cast("double") > 0)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** CROSS-SOURCE QUANTILE NORMALIZATION (score equating): per-source
    * quality scores are not comparable (each classifier/heuristic has its
    * own scale per domain), so a single global threshold over- or
    * under-prunes whole sources. This maps every row to
    *   pct      — its within-source percentile (percent_rank, id tiebreak)
    *   equated  — the POOLED score distribution's value at that percentile,
    *              linearly interpolated on a fixed (nGrid+1)-point exact
    *              percentile grid of the pooled scores
    * so "equated > t" cuts every source at the same pooled quantile — the
    * standard rank-equating recipe.
    *
    * Scale shape: one partitioned (per-source) window for percent_rank +
    * ONE exact-percentile aggregate reduced to a single (nGrid+1)-element
    * broadcast row; the interpolation is narrow fixed-dag double math. At
    * 100 TB swap `percentile` for `approx_percentile` (same plan shape,
    * the q115 GK contract); the grid stays a 1-row broadcast either way.
    */
  def quantileNormalize(df: DataFrame, stratum: Column, id: Column,
                        score: Column, nGrid: Int = 20): DataFrame = {
    require(nGrid >= 1 && nGrid <= 1000, s"nGrid must be in 1..1000, got $nGrid")
    val base = df.select(stratum.cast("string").as("stratum"),
      id.cast("long").as("id"), score.cast("double").as("score"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("score"), col("id"))
    val ranked = base.withColumn("pct", percent_rank().over(w))
    val ps = (0 to nGrid).map(_.toDouble / nGrid)
    // r12: primitive-buffer exact percentile — same doubles in (the SQL
    // literal path round-trips to identical fracs), bit-identical grid out
    val grid = base.agg(
      graft.functions.gfn.exact_percentiles(col("score"), ps).as("grid"))
    // bucket = floor(pct * nGrid) clamped; linear interpolation inside it.
    // percent_rank is exactly 1.0 at the top row, so clamp keeps the index
    // in range and the interpolation degenerates to the last grid point.
    val b = least(floor(col("pct") * nGrid).cast("int"), lit(nGrid - 1))
    val lo = element_at(col("grid"), b + 1)
    val hi = element_at(col("grid"), b + 2)
    val frac = col("pct") * nGrid - b.cast("double")
    ranked.join(broadcast(grid))
      .select(col("stratum"), col("id"), col("score"), col("pct"),
        (lo + (hi - lo) * frac).as("equated"))
  }

  /** TOKEN-BUDGET PREFIX SELECTION: within each stratum, rows are ranked
    * by `value` (descending, id tiebreak) and kept while the running
    * token total stays within `budget` — the "best docs first until the
    * budget is spent" curation cut. A row is kept iff the running sum
    * INCLUDING it is <= budget; the first row that crosses the budget is
    * dropped, and so is everything ranked after it (a PREFIX cut, the
    * variant a window sum can express and a SQL oracle can replay —
    * density-greedy "skip the oversized doc, keep fitting smaller ones"
    * needs kept-only running state, which is sequential per stratum by
    * definition). Every row is returned with its rank-order running
    * total and the keep verdict, so the caller can audit the cut line.
    *
    * Scale shape: one per-stratum window (hash shuffle on the stratum
    * key); O(1) running state per row. Like packShards, the unit of
    * sequence is the stratum — at 100 TB budget per (source, shard).
    */
  def budgetSelect(df: DataFrame, stratum: Column, id: Column,
                   tokens: Column, value: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = df.select(stratum.cast("string").as("stratum"),
      id.cast("long").as("id"), tokens.cast("long").as("toks"),
      value.cast("double").as("value"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("value").desc, col("id"))
    // greedy-fit needs the running sum of KEPT rows only, which a plain
    // window sum can't express; the prefix-cut approximation (cum <=
    // budget on ALL rows) is the SQL-replayable contract here, and the
    // doc that first crosses the budget is excluded like everything
    // after it in rank order within its stratum.
    base
      .withColumn("cum_tokens",
        sum(col("toks")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("kept", (col("cum_tokens") <= budget).cast("boolean"))
  }

  /** TEMPERATURE-SCALED SOURCE MIXING WEIGHTS (the α = 1/2 point of the
    * p^α exponentiated-sampling family — the √-temperature upsampling of
    * multilingual pretraining, mBERT / XLM-R style): head sources are
    * down-weighted, tail sources up-weighted, by
    *
    *   w_i = √n_i / Σ_j √n_j,   p_i = n_i / N
    *
    * with `expected_tokens_i = w_i · budget` the per-source draw of a
    * token budget. α is FIXED at 1/2 because `sqrt` is an IEEE
    * correctly-rounded operation — with the source-ORDERED denominator
    * fold every output is a fixed double dag, bitwise cross-engine;
    * arbitrary α needs libm `pow`, whose last-ulp behavior differs across
    * engines (the zipfFit lesson).
    *
    * Scale shape: ONE per-source partial-agg shuffle to a G-row frame
    * (G = #sources), a single-row ordered fold, and a broadcast join back
    * — the corpus pays exactly one pass regardless of G or budget.
    */
  def temperatureWeights(df: DataFrame, source: Column, tokens: Column,
                         budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val bySrc = df.groupBy(source.cast("string").as("source"))
      .agg(sum(tokens.cast("long")).as("n_tokens"))
    val folded = bySrc.agg(
      sum(col("n_tokens")).as("total"),
      aggregate(
        array_sort(collect_list(struct(col("source"), col("n_tokens")))),
        lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_tokens").cast("double")))
        .as("denom"))
    bySrc.join(broadcast(folded))
      .select(col("source"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total").cast("double")).as("p"),
        (sqrt(col("n_tokens").cast("double")) / col("denom")).as("w"),
        (sqrt(col("n_tokens").cast("double")) / col("denom")
          * lit(budget.toDouble)).as("expected_tokens"))
  }

  /** DETERMINISTIC EPOCH SHUFFLE: the reproducible global training order
    * — each (row, epoch) draws a pseudorandom position from a
    * per-epoch-decorrelated Knuth stream (the fimSplit stream recipe), so
    * the order is a PURE FUNCTION of (id, epoch): retry-stable,
    * partitioning-invariant, and resumable mid-epoch from a (shard, ord)
    * bookmark — the properties `orderBy(rand())` loses the moment a task
    * retries. Every epoch is a different permutation (stream multiplier
    * 2·epoch+3 differs per epoch).
    *
    * Scale shape: NO global sort and no window — the order is
    * materialized as (shard, ord) SORT KEYS; the writer buckets by shard
    * and sorts within each (the q98 layout story), so the only exchange
    * is the nShards-way write partitioning. Ties on ord (hash collisions)
    * break by doc_id downstream.
    */
  def epochShuffle(df: DataFrame, id: Column, epochs: Int,
                   nShards: Int): DataFrame = {
    require(epochs >= 1 && epochs <= 100, s"epochs in 1..100, got $epochs")
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    df.select(id.cast("long").as("doc_id"))
      .withColumn("epoch",
        explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("h",
        pmod(pmod(pmod(col("doc_id"), lit(M31)) * (col("epoch") * 2 + 3)
          + col("epoch"), lit(M31)) * lit(Knuth), lit(M31)))
      .select(col("epoch"), col("doc_id"),
        pmod(col("h"), lit(nShards.toLong)).as("shard"),
        col("h").as("ord"))
  }

  /** CURRICULUM STAGING: assign each row to one of `nStages` difficulty
    * stages by EXACT pooled percentile cutoffs (stage 0 = easiest
    * quarter, ...) — the data-side half of curriculum learning: step t of
    * training unlocks stages 0..f(t), and this table is the deterministic
    * membership those unlocks read. stage = #{cutoffs < difficulty}
    * (strict, so boundary rows fall in the lower stage).
    *
    * Determinism: the cutoffs come from Spark's exact `percentile` whose
    * interpolation dag the q189 oracle replays bitwise over order
    * statistics; the comparison is then exact double equality territory —
    * value-exact cross-engine.
    *
    * Scale shape: ONE percentile aggregate reduced to a 1-row broadcast
    * + a narrow comparison pass — one corpus pass total; swap in
    * `approx_percentile` at 100 TB (the q115 GK contract).
    */
  def curriculumStages(df: DataFrame, id: Column, difficulty: Column,
                       nStages: Int = 4): DataFrame = {
    require(nStages >= 2 && nStages <= 100, s"nStages in 2..100, got $nStages")
    val base = df.select(id.cast("long").as("id"),
      difficulty.cast("double").as("difficulty"))
    val ps = (1 until nStages).map(_.toDouble / nStages)
    // r12: primitive-buffer exact percentile, bit-identical (q200)
    val cuts = base.agg(
      graft.functions.gfn.exact_percentiles(col("difficulty"), ps).as("cuts"))
    base.join(broadcast(cuts))
      .select(col("id"), col("difficulty"),
        aggregate(col("cuts"), lit(0L),
          (acc, c) => acc + when(col("difficulty") > c, 1L).otherwise(0L))
          .as("stage"))
  }

  /** FILTER YIELD CURVE: for each candidate quality threshold, how many
    * docs and tokens survive "score >= t" — the quality-vs-quantity
    * Pareto table every threshold decision is read off (pick t where the
    * token yield still covers the training budget). Cutoffs are the
    * caller's explicit grid (data-derived grids: feed `percentile`
    * output).
    *
    * Scale shape: one narrow bucket assignment (index of the largest
    * cutoff <= score — a fixed dag over the literal grid), ONE
    * partial-agg shuffle to a (grid+1)-row frame, then
    * suffix-sums by window over that G-sized frame — the corpus is read
    * once and never re-scanned per threshold (the naive grid × corpus
    * crossJoin is what this avoids).
    */
  def yieldCurve(df: DataFrame, score: Column, tokens: Column,
                 cutoffs: Seq[Double]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs.size <= 1000, "1..1000 cutoffs")
    require(cutoffs == cutoffs.sorted && cutoffs.distinct == cutoffs,
      "cutoffs must be strictly increasing")
    val base = df.select(score.cast("double").as("score"),
      tokens.cast("long").as("toks"))
    // bucket i = #{cutoffs <= score}: 0 = below the lowest cutoff
    val bucket = aggregate(typedLit(cutoffs), lit(0L),
      (acc, c) => acc + when(col("score") >= c, 1L).otherwise(0L))
    val perBucket = base
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    // complete bucket spine 0..G (empty buckets = 0), then suffix sums:
    // survivors of cutoff i are exactly the rows in buckets >= i. The
    // unpartitioned window runs over the (G+1)-row aggregated frame, not
    // the corpus (the q107 marginals pattern).
    val grid = df.sparkSession.createDataFrame(
      cutoffs.zipWithIndex.map { case (c, i) => (i + 1L, c) })
      .toDF("bucket", "cutoff")
    val spine = df.sparkSession.createDataFrame(
      (0L to cutoffs.size.toLong).map(Tuple1(_))).toDF("bucket")
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(perBucket, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
      .withColumn("n_docs_kept", sum(col("n_docs")).over(w))
      .withColumn("n_tokens_kept", sum(col("n_tokens")).over(w))
      .join(grid, Seq("bucket"))
      .select(col("cutoff"), col("n_docs_kept"), col("n_tokens_kept"))
  }

  /** LEAKAGE-SAFE train/val/test split: the split is a deterministic hash
    * gate on a numeric GROUP id (the min doc_id of a content group, a
    * near-dup cluster_id from Components, a domain id) — never the row id —
    * so duplicate or near-duplicate content can never straddle splits and
    * leak eval data into training. `cuts` are ascending per-mille upper
    * bounds (e.g. train 800 / val 900 / test 1000). Purely narrow once the
    * group id exists, and as reproducible as the id derivation (the same
    * Knuth gate as [[stratifiedSample]] — no rand(), retry-stable).
    */
  def leakageSafeSplit(df: DataFrame, groupId: Column,
                       cuts: Seq[(String, Int)] =
                         Seq("train" -> 800, "val" -> 900, "test" -> 1000)): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 1000 &&
      cuts.map(_._2) == cuts.map(_._2).sorted,
      s"cuts must be ascending per-mille bounds ending at 1000, got $cuts")
    val gate = hashGate(groupId)
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, cut), acc) => when(gate < cut, name).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** TEMPORAL LEAKAGE VALIDATOR — the complement of [[leakageSafeSplit]]
    * for TIME-ordered data: a random split of per-entity event streams
    * lets the model train on an entity's FUTURE and be evaluated on its
    * past. Per entity: train/test counts, the latest train and earliest
    * test event times, the overlap in microseconds, and the violation
    * flag (`test_min_us ≤ train_max_us`). Run it before trusting any
    * time-series eval; the fix is a per-entity (or global) time cut.
    * Exact longs end-to-end.
    *
    * Scale shape: ONE partial-combined groupBy on the entity key
    * (conditional min/max aggregates — no join, no window); entities
    * present on only one side report null on the other and never flag.
    */
  def temporalLeakage(df: DataFrame, entity: Column, ts: Column,
                      isTrain: Column): DataFrame =
    df.select(entity.as("entity"), unix_micros(ts).as("us"),
        isTrain.cast("boolean").as("tr"))
      .groupBy(col("entity"))
      .agg(
        sum(col("tr").cast("long")).as("n_train"),
        sum((!col("tr")).cast("long")).as("n_test"),
        max(when(col("tr"), col("us"))).as("train_max_us"),
        min(when(!col("tr"), col("us"))).as("test_min_us"))
      .withColumn("overlap_us",
        when(col("train_max_us").isNotNull && col("test_min_us").isNotNull
            && col("test_min_us") <= col("train_max_us"),
          col("train_max_us") - col("test_min_us")))
      .withColumn("leaks", col("overlap_us").isNotNull.cast("int"))

  /** Sequential token-budget packing: within each stratum, docs (in `order`)
    * are laid onto a continuous token tape and the tape is cut every
    * `budget` tokens; a doc belongs to the shard where it STARTS —
    * shard_id = floor(preceding-docs' token sum / budget). Shards hold
    * ~budget tokens (±1 doc of overshoot), ids are dense from 0, and a doc
    * larger than the whole budget still lands in exactly one shard. One
    * window per stratum = one hash shuffle; the running sum is O(1) state
    * per row.
    */
  def packShards(df: DataFrame, stratum: Column, order: Column,
                 tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(stratum).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard_id",
      floor((sum(tokens).over(w) - tokens) / lit(budget)))
  }

  /** EPOCH / REPEAT-FACTOR SCHEDULE (the data-recipe table of LLaMA-style
    * pretraining and DoReMi-style mixture work): given a per-document
    * token count and a total token `budget`, how many EPOCHS of each
    * stratum (source/domain) to run so the realized mixture tracks the
    * temperature-scaled weights without repeating any stratum more than
    * `maxEpochs` times (the repeated-data degradation cap, Muennighoff
    * et al. 2023). Procedure:
    *   1. `w_s = sqrt(p_s)/Σ sqrt(p)` — the q92 T=0.5 temperature recipe
    *      (sqrt is correctly rounded in both engines; Σ through
    *      DECIMAL(28,12) so it is order-independent);
    *   2. raw allocation `epochs0_s = budget·w_s / n_s`;
    *   3. strata over `maxEpochs` cap there; their surplus budget
    *      redistributes over the UNCAPPED strata proportional to w, one
    *      waterfall round, re-clamped (a stratum pushed over the cap by
    *      redistribution caps too; the residual shows up as
    *      `budget − Σ alloc_tokens` — callers wanting a full waterfall
    *      iterate this G-row op).
    * Output per stratum: (stratum, n_tokens, w, epochs, alloc_tokens) —
    * `alloc_tokens = n_s·epochs_s` is the realized per-stratum budget.
    *
    * All-capped edge: when every stratum caps, the uncapped weight mass
    * is 0 and redistribution is skipped (no 0-division NaN).
    *
    * Scale shape: one partial-agg shuffle to G stratum rows; everything
    * after is G-row arithmetic with two single-row broadcasts — the same
    * cost at any corpus size. Every FP step is an identical dag in the
    * DuckDB oracle (exact integer inputs, one sqrt, DECIMAL sums, fixed
    * double expression order), so the schedule is bit-reproducible.
    */
  def epochSchedule(docs: DataFrame, stratum: Column, tokens: Column,
                    budget: Long, maxEpochs: Double = 4.0): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(maxEpochs > 0, "epoch cap must be positive")
    val cnt = docs.groupBy(stratum.as("stratum"))
      .agg(sum(tokens).as("n_tokens"))
    val tot = cnt.agg(sum(col("n_tokens")).as("n_total"))
    val p = col("n_tokens").cast("double") / col("n_total").cast("double")
    val scaled = cnt.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_tokens"),
        sqrt(p).cast(DecimalType2812).as("sq"))
    val z = scaled.agg(sum(col("sq")).as("z"))
    val e0 = scaled.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_tokens"),
        (col("sq").cast("double") / col("z").cast("double")).as("w"))
      .withColumn("epochs0",
        lit(budget.toDouble) * col("w") / col("n_tokens").cast("double"))
      .withColumn("capped", col("epochs0") > lit(maxEpochs))
    // one row: surplus budget above the cap + uncapped weight mass
    val pool = e0.agg(
      sum(when(col("capped"),
          (lit(budget.toDouble) * col("w") -
            col("n_tokens").cast("double") * lit(maxEpochs))
            .cast(DecimalType2812))
        .otherwise(lit(0).cast(DecimalType2812))).as("surplus"),
      sum(when(!col("capped"), col("w").cast(DecimalType2812))
        .otherwise(lit(0).cast(DecimalType2812))).as("zu"))
    e0.crossJoin(broadcast(pool))
      .select(col("stratum"), col("n_tokens"), col("w"),
        when(col("capped") || col("zu") === lit(0), least(col("epochs0"), lit(maxEpochs)))
          .otherwise(least(lit(maxEpochs),
            col("epochs0") +
              col("surplus").cast("double") * col("w") /
                (col("zu").cast("double") * col("n_tokens").cast("double"))))
          .as("epochs"))
      .withColumn("alloc_tokens", col("epochs") * col("n_tokens").cast("double"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw doc by
    * how target-like its hashed-token-bucket distribution is. Both
    * distributions are Laplace-smoothed multinomials over `buckets` hashed
    * unigram features; a doc's log-weight is
    *   Σ_b c_b · (ln p_target(b) − ln p_raw(b)),
    * where c_b is the doc's count in bucket b. Downstream selection is a
    * weighted gate over `log_weight` (e.g. [[weightedSample]] /
    * top-fraction), kept out of this op so the weights stay reusable.
    *
    * Exactness recipe: each ln is snapped to DECIMAL(18,12) and scaled to
    * an INTEGER `lr12` (units of 1e-12 nats); all downstream math — the
    * c_b·lr12 products and their per-doc sum — is Long arithmetic, so the
    * result is bit-deterministic and an oracle replays it exactly.
    * |lr12| < 2^45 and c_b·lr12 sums stay far under 2^63 (ANSI-safe).
    *
    * Scale shape: ONE tokenize+count pass over the corpus (the groupBy
    * (id, bucket) shuffle is the only corpus-sized exchange — partial
    * aggregation collapses each map task to its distinct doc-buckets);
    * the two distributions are `buckets`-row aggregates off the persisted
    * count frame; scoring is a BROADCAST join of that tiny distribution
    * table back onto the counts. Nothing scales worse than the token scan.
    *
    * `bucketOf` maps a token to its bucket; default is xxhash64 mod
    * `buckets` (production). The catalog query passes a cross-engine
    * polynomial so DuckDB can replay it.
    */
  def importanceWeights(df: DataFrame, text: Column, id: Column,
                        isTarget: Column, buckets: Int = 64,
                        bucketOf: Option[Column => Column] = None)
                       : DataFrame = {
    require(buckets > 0)
    val bucket: Column => Column =
      bucketOf.getOrElse(w => pmod(xxhash64(w), lit(buckets.toLong)))
    def ln12(x: Column): Column =
      (log(x).cast(DecimalType1812) * lit(1000000000000L).cast(Decimal130))
        .cast("long")
    val toks = df
      .select(id.as("id"), isTarget.cast("boolean").as("tgt"),
        explode(split(lower(trim(text)), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .select(col("id"), col("tgt"), bucket(col("w")).as("b"))
    // feeds the raw distribution, the target distribution, the totals AND
    // the scoring join: persist or the corpus tokenizes four times
    // (Caches-tracked: feeds the lazy result, released by the session owner)
    val perDoc = Caches.track(toks.groupBy(col("id"), col("tgt"), col("b"))
      .agg(count(lit(1)).as("c")))
    val raw = perDoc.groupBy(col("b")).agg(sum(col("c")).as("rc"))
    val tgt = perDoc.where(col("tgt")).groupBy(col("b"))
      .agg(sum(col("c")).as("tc"))
    val tot = perDoc.agg(sum(col("c")).as("rtot"),
      sum(when(col("tgt"), col("c")).otherwise(lit(0L))).as("ttot"))
    val dist = raw.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("tc"))
      .crossJoin(broadcast(tot)) // single-row totals frame
      .select(col("b"),
        (ln12((col("tc") + 1).cast("double") / (col("ttot") + buckets)) -
         ln12((col("rc") + 1).cast("double") / (col("rtot") + buckets)))
          .as("lr12"))
    perDoc.join(broadcast(dist), "b")
      .groupBy(col("id"))
      .agg(sum(col("c") * col("lr12")).as("logw12"))
      .select(col("id"), col("logw12"),
        (col("logw12").cast("double") / lit(1e12)).as("log_weight"))
  }

  /** DOREMI DOMAIN-REWEIGHTING STEP (Xie et al. 2023, "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining"): one
    * exponentiated-gradient update of the domain mixture from per-domain
    * EXCESS LOSS, smoothed toward uniform —
    *
    *   λ_s = max(0, (L_s − L_ref) / L_ref)      (relative excess; L_s is
    *         the domain's mean per-doc loss, L_ref the corpus mean — the
    *         caller can substitute a real reference-model loss by passing
    *         any exact-integer `loss` column, the preferencePairs
    *         contract)
    *   α̃_s ∝ exp(η·λ_s)
    *   α_s = (1 − ε)·α̃_s + ε/G                 (uniform smoothing)
    *
    * Determinism: L_s, L_ref are single divisions of exact Long sums;
    * exp(η·λ) is truncated through DECIMAL(28,12) BEFORE the normalizer
    * sums it (decimal sums are exact and order-independent, so Z needs no
    * ordered fold), and the final α is a fixed IEEE dag — the oracle
    * replays every step.
    *
    * Scale shape: ONE partial-combined groupBy to G domain rows, a G-row
    * aggregate for (Z, G), and two single-row broadcasts — corpus cost
    * is the one aggregate at any size, the DoReMi point: the expensive
    * proxy/reference losses are inputs, the reweighting itself is free.
    */
  def doremiWeights(df: DataFrame, stratum: Column, loss: Column,
                    eta: Double = 1.0, epsMille: Int = 100): DataFrame =
    doremiFromCells(lossCells(df, stratum, loss), eta, epsMille)

  /** The mixture's MERGEABLE STATE: one row per stratum with exact Long
    * (n_docs, sl) sums — cells merge across any partition of the corpus
    * or stream ([[mergeLossCells]] == a one-shot pass over the
    * concatenation), which is what the streaming mixture monitor
    * ([[graft.streaming.MixtureMonitorJob]]) folds per trigger.
    */
  def lossCells(df: DataFrame, stratum: Column, loss: Column): DataFrame =
    df.select(stratum.as("stratum"), loss.cast("long").as("l"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(col("l")).as("sl"))

  def mergeLossCells(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch).groupBy(col("stratum"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sl")).as("sl"))

  /** [[doremiWeights]]' assembly half over a prebuilt cell table. */
  def doremiFromCells(perS: DataFrame, eta: Double = 1.0,
                      epsMille: Int = 100): DataFrame = {
    require(eta > 0, s"eta must be positive, got $eta")
    require(epsMille >= 0 && epsMille <= 1000,
      s"epsMille must be in [0, 1000], got $epsMille")
    val Dec2812 = org.apache.spark.sql.types.DecimalType(28, 12)
    val tot = perS.agg(sum(col("n_docs")).as("n_all"), sum(col("sl")).as("sl_all"))
    val withE = perS.crossJoin(broadcast(tot))
      .withColumn("avg_loss", col("sl").cast("double") / col("n_docs").cast("double"))
      .withColumn("ref_loss", col("sl_all").cast("double") / col("n_all").cast("double"))
      .withColumn("excess",
        greatest(lit(0.0), (col("avg_loss") - col("ref_loss")) / col("ref_loss")))
      .withColumn("e", exp(lit(eta) * col("excess")).cast(Dec2812))
    val z = withE.agg(sum(col("e")).as("z"), count(lit(1)).as("g"))
    withE.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_docs"), col("avg_loss"), col("ref_loss"),
        col("excess"),
        (lit(1.0 - epsMille / 1000.0) *
          (col("e").cast("double") / col("z").cast("double")) +
          lit(epsMille / 1000.0) / col("g").cast("double")).as("alpha"))
  }

  /** PREFERENCE-PAIR CONSTRUCTION (the DPO/RLHF data-assembly step): given
    * candidate rows scored by an exact integer `reward`, emit per group
    * (the "prompt") the best-of-n CHOSEN candidate and the worst REJECTED
    * one, keeping only groups whose reward gap is decisive (`gap >=
    * minGap`) — the (prompt, chosen, rejected) table a preference loss
    * trains on. Ties break to the smallest candidate id on both sides, so
    * the pair is deterministic under any row order.
    *
    * The reward is an exact integer BY CONTRACT (quantize FP rewards at the
    * call site, the q26 recipe): argmax/argmin over doubles would make the
    * chosen row depend on accumulation order. Groups with fewer than two
    * candidates, or where chosen == rejected (all rewards equal), drop —
    * a preference pair needs two distinct corners.
    *
    * Scale shape: ONE partial-combined groupBy over the candidate table —
    * the struct min/max aggregates carry two (reward, id) pairs per group
    * per task, so the shuffle moves G·2 tuples, never candidate rows. No
    * window, no sort, no driver state.
    */
  def preferencePairs(cands: DataFrame, group: Column, candId: Column,
                      reward: Column, minGap: Long = 1L): DataFrame = {
    require(minGap >= 0, "minGap must be non-negative")
    cands
      .select(group.as("grp"), candId.cast("long").as("cid"),
        reward.cast("long").as("r"))
      // an unscoreable candidate (null reward, e.g. null text upstream)
      // must not become a corner: struct min/max over a null field would
      // give it an engine-defined rank instead of dropping it
      .where(col("r").isNotNull)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_cands"),
        max(struct(col("r"), (-col("cid")).as("nid"))).as("ch"),
        min(struct(col("r"), col("cid"))).as("rj"))
      .where(col("n_cands") >= 2)
      .select(col("grp"), col("n_cands"),
        (-col("ch.nid")).as("chosen_id"), col("ch.r").as("chosen_reward"),
        col("rj.cid").as("rejected_id"), col("rj.r").as("rejected_reward"))
      .withColumn("gap", col("chosen_reward") - col("rejected_reward"))
      .where(col("gap") >= minGap && col("chosen_id") =!= col("rejected_id"))
  }

  private val DecimalType1812 = org.apache.spark.sql.types.DecimalType(18, 12)
  private val Decimal130 = org.apache.spark.sql.types.DecimalType(13, 0)
  private val DecimalType2812 = org.apache.spark.sql.types.DecimalType(28, 12)
}
