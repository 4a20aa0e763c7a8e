package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation metrics over scored corpora — the feedback loop of
  * every learned quality/toxicity/language filter in a curation pipeline:
  * score a sample, join the labels, measure, THEN decide the threshold.
  */
object Eval {

  /** Exact ROC AUC via the Mann–Whitney U statistic, ties handled by the
    * standard 1/2 credit — computed entirely in integers: with the score
    * histogram `(score, pos, neg)` sorted ascending and `nb` = negatives
    * strictly below, `U2 = Σ pos·(2·nb + neg)` counts 2·(pos above neg) +
    * (pos tied with neg), so `AUC = U2 / (2·n_pos·n_neg)` — emitted as the
    * one FP division of two exact longs (cross-engine stable). Requires an
    * integer score column (quantize upstream if needed; AUC only reads the
    * order, so any order-preserving quantization is AUC-lossless up to tie
    * granularity).
    *
    * Scale shape: the corpus-sized step is the `groupBy(score)` partial
    * aggregate — one shuffle DOWN to the score histogram. The prefix sum
    * then runs over the HISTOGRAM frame (rows = distinct scores: the score
    * resolution, e.g. ≤ a few thousand for any bucketed quality score —
    * NOT the corpus), which is why its unpartitioned window is safe and
    * carries a catalog allowlist justification. Overflow dial: longs hold
    * `2·n_pos·n_neg` up to corpora of ~3e9 rows; beyond that route U2
    * through DECIMAL(38,0).
    *
    * Returns one row: `(u2, n_pos, n_neg, auc)`.
    */
  /** The full ROC curve as exact integer confusion counts, one row per
    * distinct score: thresholding at `score >= s` gives
    * `(threshold, tp, fp, fn, tn)` — TPR/FPR are one division away, and
    * picking the operating threshold is a filter on this frame. Same scale
    * shape as [[aucExact]]: corpus → score histogram in one partial-agg
    * shuffle, then prefix sums over distinct scores only (the allowlisted
    * tiny-frame window).
    */
  def rocPoints(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val d = df.select(scoreCol.cast("long").as("score"),
      labelCol.cast("long").as("lab"))
    val g = d.groupBy(col("score"))
      .agg(sum(col("lab")).as("pos"), sum(lit(1L) - col("lab")).as("neg"))
    // cumulative from the TOP of the score order = counts at `score >= s`
    val above = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.select(col("score").as("threshold"),
        sum(col("pos")).over(above).as("tp"),
        sum(col("neg")).over(above).as("fp"),
        (sum(col("pos")).over(total) - sum(col("pos")).over(above)).as("fn"),
        (sum(col("neg")).over(total) - sum(col("neg")).over(above)).as("tn"))
      .orderBy(col("threshold"))
  }

  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val d = df.select(scoreCol.cast("long").as("score"),
      labelCol.cast("long").as("lab"))
    val g = d.groupBy(col("score"))
      .agg(sum(col("lab")).as("pos"), sum(lit(1L) - col("lab")).as("neg"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("nb", coalesce(sum(col("neg")).over(w), lit(0L)))
      .agg(
        sum(col("pos") * (lit(2L) * col("nb") + col("neg"))).as("u2"),
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"))
      .select(col("u2"), col("n_pos"), col("n_neg"),
        (col("u2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }
}
