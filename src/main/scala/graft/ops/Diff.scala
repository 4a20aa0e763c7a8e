package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset-versioning audit between two materialized
  * states of the same keyed table (yesterday's curated corpus vs today's,
  * pre- vs post-migration, replica vs source): which keys were added,
  * removed, or changed, and WHICH columns changed. The read-side
  * complement of MERGE/upsert (q103): MERGE applies a delta, this
  * RECOVERS the delta (and is how an applied MERGE is verified).
  *
  * Scale shape: ONE full-outer equi-join on the key — both sides shuffle
  * on their natural key (co-located under AQE; bucketed tables skip the
  * exchange entirely), everything else narrow per joined row. Column
  * comparisons are null-safe (`<=>`), so NULL→value and value→NULL count
  * as changes while NULL→NULL does not.
  */
object Diff {

  /** Per-key diff detail: (key, status ∈ added|removed|changed|unchanged,
    * n_changed, changed_cols as a comma-joined ordered list — string, not
    * array, so gates can sort it). `cols` is the compare set; columns
    * outside it are ignored (audit metadata, load timestamps).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyName: String,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one compare column")
    val al = a.select(col(keyName).as("key") +:
      cols.map(c => col(c).as(s"a_$c")): _*)
    val bl = b.select(col(keyName).as("key") +:
      cols.map(c => col(c).as(s"b_$c")): _*)
    val joined = al.withColumn("in_a", lit(1))
      .join(bl.withColumn("in_b", lit(1)), Seq("key"), "full_outer")
    val changedFlags = cols.map { c =>
      (!(col(s"a_$c") <=> col(s"b_$c"))).as(s"chg_$c")
    }
    val flagged = joined.select(
      (col("key") +: col("in_a") +: col("in_b") +: changedFlags): _*)
    val nChanged = cols.map(c => col(s"chg_$c").cast("long")).reduce(_ + _)
    flagged.select(
      col("key"),
      when(col("in_a").isNull, lit("added"))
        .when(col("in_b").isNull, lit("removed"))
        .when(nChanged > 0, lit("changed"))
        .otherwise(lit("unchanged")).as("status"),
      when(col("in_a").isNotNull && col("in_b").isNotNull, nChanged)
        .otherwise(lit(0L)).as("n_changed"),
      when(col("in_a").isNotNull && col("in_b").isNotNull,
        concat_ws(",", cols.map(c =>
          when(col(s"chg_$c"), lit(c))): _*))
        .otherwise(lit("")).as("changed_cols"))
  }

  /** Bounded rollup of a [[snapshotDiff]] detail frame: one row per
    * status with key counts, plus the per-column change totals as a
    * deterministic "col=count" comma list (columns in compare order,
    * zero-change columns included — fixed width, fixed order).
    */
  def snapshotDiffSummary(a: DataFrame, b: DataFrame, keyName: String,
                          cols: Seq[String]): DataFrame = {
    val d = snapshotDiff(a, b, keyName, cols)
      .withColumn("chgs", split(col("changed_cols"), ","))
    d.groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_changed")).as("n_cell_changes"),
        concat_ws(",", cols.map(c => concat(lit(s"$c="),
          sum(when(array_contains(col("chgs"), c), 1L).otherwise(0L)))): _*)
          .as("per_col"))
  }
}
