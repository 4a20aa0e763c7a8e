package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for hot-key joins and diagnostics.
  *
  * AQE's skew-join handles sort-merge skew at runtime by splitting oversized
  * partitions, but it cannot help when (a) the skewed side feeds a
  * shuffle-hash join, (b) the skew is in a grouping rather than a join, or
  * (c) a single key's rows must still land on one task downstream. The
  * classic remedy is salting: widen the hot side's key with a salt in
  * [0, factor), replicate the other side across all salts, join on
  * (key, salt). Row count and content are identical to the plain join —
  * only the partitioning changes: a key holding N rows spreads across
  * `factor` tasks instead of pinning one.
  *
  * Cost model (why this is not the default): the replicated side is
  * `factor`× larger in the shuffle. Use it when hot keys are known or
  * measured (see [[skewReport]]) and the replicated side is the small one —
  * exactly the "one user = billions of rows" sessionize/join case called
  * out in SCALE.md.
  */
object Skew {

  /** Equi-join `big ⋈ dim` on `keys`, salting the big side `factor` ways.
    * `dim` is replicated `factor`× via a literal salt-array explode (narrow,
    * no shuffle of the original rows beyond the join's own exchange).
    * Result == `big.join(dim, keys, "inner")` row-for-row.
    */
  /** Salt in [0, factor): row-id hash, so all rows of one hot key spread
    * uniformly (rand() would too, but is unstable under task retries in a
    * way that complicates debugging; the id is at least stable per run).
    */
  private[graft] def saltColumn(keys: Seq[String], factor: Int): Column =
    pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(factor))

  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 factor: Int = 16): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val salted = big.withColumn("__salt", saltColumn(keys, factor))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }

  /** PARTIAL salting — the production form: only rows whose key appears in
    * `hotKeys` (typically [[skewReport]]'s output, filtered to shares worth
    * the trade) pay the salt; the long tail joins plain. The `factor`×
    * replication cost then applies to `dim ⋉ hotKeys` — a handful of rows —
    * instead of the whole dim, which is what makes salting affordable when
    * the dim itself is large. `hotKeys` is bounded (top-k) so its
    * semi/anti-join gates broadcast. Row-exact vs the plain join.
    */
  def saltedJoinHotKeys(big: DataFrame, dim: DataFrame, keys: Seq[String],
                        hotKeys: DataFrame, factor: Int = 16): DataFrame = {
    require(factor > 0, s"salt factor must be positive, got $factor")
    val hk = broadcast(hotKeys.select(keys.map(col): _*).distinct())
    val hot = saltedJoin(
      big.join(hk, keys, "left_semi"),
      dim.join(hk, keys, "left_semi"), keys, factor)
    hot.unionByName(big.join(hk, keys, "left_anti").join(dim, keys, "inner"))
  }

  /** Per-key row counts of the heaviest `topK` keys plus the share of all
    * rows they hold — the measurement that decides whether salting (or a
    * bucket cap) is warranted.
    *
    * One query, no driver-side `count()`: the total comes from a second
    * aggregate over the same per-key frame (ReuseExchange dedupes the
    * groupBy shuffle, so source reads once and both sides see one snapshot)
    * joined in as a broadcast single row. Top-k is TakeOrdered (k rows per
    * partition move, no global sort); an empty input yields an empty report
    * rather than NaN shares, and every key present counts ≥ 1 row so the
    * division is never by zero.
    */
  def skewReport(df: DataFrame, keys: Seq[String], topK: Int = 20): DataFrame = {
    val byKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows"))
    val top = byKey.orderBy((col("n_rows").desc +: keys.map(col)): _*).limit(topK)
    val total = byKey.agg(sum(col("n_rows")).as("__total"))
    top.crossJoin(broadcast(total))
      .withColumn("share", col("n_rows").cast("double") / col("__total").cast("double"))
      .drop("__total")
      .orderBy((col("n_rows").desc +: keys.map(col)): _*)
  }
}
