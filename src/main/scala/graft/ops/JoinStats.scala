package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-join cardinality and skew estimation — the planning query a
  * pipeline runs BEFORE committing to an expensive equi-join: the exact
  * output size Σ_k c_a(k)·c_b(k) from the two key histograms, the skew
  * profile (which keys dominate), and the decision inputs (largest key's
  * share ⇒ salt or not; distinct-key counts ⇒ broadcast or not). At
  * 100 TB this costs two partial-agg count shuffles over KEYS — orders of
  * magnitude cheaper than discovering the blow-up by running the join.
  */
object JoinStats {

  /** Per-key contribution table: (key, c_a, c_b, pairs = c_a·c_b), only
    * keys present on BOTH sides (others contribute 0 to an inner join).
    */
  def keyContributions(a: DataFrame, b: DataFrame, key: Column): DataFrame =
    a.select(key.as("key")).groupBy(col("key"))
      .agg(count(lit(1)).as("c_a"))
      .join(b.select(key.as("key")).groupBy(col("key"))
        .agg(count(lit(1)).as("c_b")), Seq("key"))
      .withColumn("pairs", col("c_a") * col("c_b"))

  /** One-row join forecast: exact inner-join output size, matching-key
    * count, the max single-key contribution and its share of the total
    * (the salting signal), plus both sides' distinct key counts (the
    * broadcast signal). Top-k hot keys via [[hotKeys]].
    */
  def joinForecast(a: DataFrame, b: DataFrame, key: Column): DataFrame = {
    val contrib = keyContributions(a, b, key)
    contrib.agg(
        sum(col("pairs")).as("est_rows"),
        count(lit(1)).as("n_matching_keys"),
        max(col("pairs")).as("max_key_pairs"),
        sum(col("c_a")).as("a_matched_rows"),
        sum(col("c_b")).as("b_matched_rows"))
      .withColumn("max_key_share",
        when(col("est_rows") > 0,
          col("max_key_pairs").cast("double") / col("est_rows").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** The k heaviest keys by pair contribution (pairs DESC, key ASC tie
    * rule) — the explicit salt/replicate list for a skew-aware join.
    * TakeOrdered top-k, never a global sort.
    */
  def hotKeys(a: DataFrame, b: DataFrame, key: Column, k: Int = 10): DataFrame =
    keyContributions(a, b, key)
      .orderBy(col("pairs").desc, col("key"))
      .limit(k)
}
