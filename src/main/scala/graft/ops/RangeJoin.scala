package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe INTERVAL (range) JOIN: points ⋈ intervals on
  * `start <= point <= end`.
  *
  * Spark has no native range-join strategy — a raw theta-join on BETWEEN
  * plans as BroadcastNestedLoopJoin (or a cartesian product), which is
  * O(|P|·|I|) and the classic 100 TB cliff. The standard fix, used here:
  * discretize the time axis into fixed bins, replicate each interval into
  * every bin it overlaps (`sequence` over bin ids), tag each point with its
  * single bin, equi-join on the bin id, and re-check the exact predicate.
  *
  * Properties:
  *   - The equi-join shuffles hash(bin) — sort-merge/shuffled-hash, AQE
  *     skew-split applies; never a nested loop (asserted in OpsSpec).
  *   - No duplicates: a point lives in exactly one bin and an interval
  *     appears at most once per bin, so each qualifying (point, interval)
  *     pair meets exactly once — no distinct needed.
  *   - Replication factor = interval_len/binUs + 1; pick binUs ≈ the
  *     typical interval length (factor ≤ 2) unless intervals are wildly
  *     mixed-length, in which case split by length class first.
  */
object RangeJoin {

  /** Join `points` (with bigint column `pointCol`) to `intervals` (bigint
    * `startCol`/`endCol`, inclusive ends). `keys` are equi-join columns
    * present in BOTH frames (e.g. user_id for per-entity attribution) —
    * they join alongside the bin id, which also spreads a hot time bin
    * across the key space. Caller guarantees the remaining column names are
    * disjoint across the two frames.
    */
  def binnedIntervalJoin(points: DataFrame, pointCol: String,
                         intervals: DataFrame, startCol: String, endCol: String,
                         binUs: Long, keys: Seq[String] = Nil): DataFrame = {
    val p = points.withColumn("__bin", expr(s"$pointCol div $binUs"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binUs"), expr(s"$endCol div $binUs"))))
    p.join(iv, "__bin" +: keys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
