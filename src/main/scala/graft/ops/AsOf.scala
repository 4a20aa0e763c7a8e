package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the latest right row with
  * rightTs ≤ leftTs for the same key. The training-pipeline workhorse for
  * aligning events to the most recent snapshot/label.
  *
  * Spark has no native as-of join; the preference ladder (compose built-ins
  * before custom plans) lands on the union+ordered-window formulation:
  * tag both sides, union, and take `last(right_struct, ignoreNulls)` over a
  * key-partitioned window ordered by (ts, side) — right rows sort before
  * left rows at equal ts, so the match is inclusive.
  *
  * Scale: ONE shuffle (hash by key for the window), no range-join row
  * explosion, no broadcast requirement on either side; state per row is one
  * struct. A sort-merge range join would shuffle the same data and then
  * still sort — this is the minimal plan for "latest prior per key".
  * Tie semantics: among multiple right rows with identical (key, ts), the
  * window ordering tiebreaks on the right-value struct itself, so the
  * winner is deterministic under any partitioning — joinPrior picks the
  * greatest `rightVals` struct, joinNext the least.
  */
object AsOf {

  /** Left as-of join. Output: all left columns + right value columns (from
    * `rightVals`) of the matched row, null when no prior right row exists.
    */
  def joinPrior(left: DataFrame, right: DataFrame,
                leftKey: String, rightKey: String,
                leftTs: String, rightTs: String,
                rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1)) // left sorts after right at equal ts
      .withColumn("_rv", lit(null).cast(right.select(rightVals.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f))))
    val r = right
      .select((Seq(col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(rightVals.map(col): _*).as("_rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select((Seq("_k", "_ts", "_side", "_rv").map(col) ++
      leftCols.map(col)): _*).unionByName(r)

    // _rv as the final sort key: right rows with identical (key, ts) would
    // otherwise surface an arbitrary copy to last() depending on shuffle
    // order. Structs order field-by-field; left rows' null _rv sorts first,
    // which cannot displace any right row within the frame.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = unioned.withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select(leftCols.map(col) ++
      rightVals.map(v => col("_m").getField(v).as(s"asof_$v")): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * rightTs ≥ leftTs for the same key (e.g. "next error after each
    * purchase"). Same union+window shape as [[joinPrior]], mirrored: left
    * sorts before right at equal ts and the frame looks forward, so an
    * equal-ts right row matches (inclusive).
    */
  def joinNext(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0)) // left sorts before right at equal ts
      .withColumn("_rv", lit(null).cast(right.select(rightVals.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f))))
    val r = right
      .select((Seq(col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(1).as("_side"),
        struct(rightVals.map(col): _*).as("_rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select((Seq("_k", "_ts", "_side", "_rv").map(col) ++
      leftCols.map(col)): _*).unionByName(r)

    // deterministic tiebreak among equal-(key, ts) right rows — see joinPrior
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_rv"))
      .rowsBetween(0, Window.unboundedFollowing)
    val matched = unioned.withColumn("_m", first(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    matched.select(leftCols.map(col) ++
      rightVals.map(v => col("_m").getField(v).as(s"asof_$v")): _*)
  }
}
