package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic dataset profiling — the "what is actually in this table" pass
  * that precedes any schema-level curation decision.
  */
object Profile {

  /** The profile's MERGEABLE STATE: one row per (column, value) with an
    * exact Long count — cells merge across any partition of the corpus
    * or stream ([[mergeProfileCells]] == a one-shot pass over the
    * concatenation), which is what [[graft.streaming.ProfileMonitorJob]]
    * folds per trigger. Values travel in STRING form (cast once at the
    * scan); a null cell row carries the column's null count.
    */
  def profileCells(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val entries = array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*)
    df.select(explode(entries).as("e"))
      .select(col("e.column").as("column"), col("e.v").as("v"))
      .groupBy(col("column"), col("v"))
      .agg(count(lit(1)).as("m"))
  }

  /** Merge two cell tables (exact count addition — order-free). */
  def mergeProfileCells(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy(col("column"), col("v"))
      .agg(sum(col("m")).as("m"))

  /** Assemble the per-column summary from a cell table: row count, null
    * count and fraction, distinct non-null value count, and the most
    * frequent non-null value with its frequency and share (ties break by
    * max string, deterministic).
    */
  def profileFromCells(cells: DataFrame): DataFrame =
    cells
      .groupBy(col("column"))
      .agg(
        sum(col("m")).as("n_rows"),
        sum(when(col("v").isNotNull, col("m")).otherwise(lit(0L)))
          .as("n_nonnull"),
        count(col("v")).as("n_distinct"),
        max(when(col("v").isNotNull, struct(col("m"), col("v")))).as("top"))
      .select(col("column"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"),
        col("top.v").as("top_value"), col("top.m").as("top_freq"))
      .withColumn("null_frac",
        col("n_null").cast("double") / col("n_rows").cast("double"))
      .withColumn("top_frac",
        col("top_freq").cast("double") / col("n_rows").cast("double"))

  /** COLUMN PROFILE: for each named column — row count, null count and
    * fraction, distinct non-null value count, and the most frequent
    * non-null value with its frequency and share (ties break by max
    * string, deterministic). The standard data-quality audit: a column
    * that is 40% null, or whose top value holds 95% of rows, changes
    * every downstream filter/join decision.
    *
    * Scale shape: ONE scan — each row explodes to |cols| (column, value)
    * entries — then one partial-combined groupBy on (column, value)
    * (map-side combine collapses repeats before the shuffle) and a tiny
    * per-column agg. No per-column pass over the table; no driver loop.
    * A near-unique column (a key) makes the first aggregate carry ~|rows|
    * groups for that column — the same cost any COUNT(DISTINCT) pays;
    * the huge-table escape is approx_count_distinct + a sampled mode,
    * same plan shape.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileFromCells(profileCells(df, cols))
}
