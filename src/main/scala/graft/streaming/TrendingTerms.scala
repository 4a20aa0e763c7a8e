package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.HeavyHitters

/** Streaming TRENDING TERMS: the SpaceSaving heavy-hitters summary as
  * per-key streaming state — each micro-batch folds its terms into the
  * keyed m-counter summary and emits that key's refreshed top-k, giving a
  * continuously-updated "top terms per source" with O(m) state per key.
  *
  * This is the streaming face of the batch `heavy_hitters` aggregate
  * (q66): same summary semantics, same error contract (est - err <= true
  * <= est) ACROSS batches, state bounded regardless of how many distinct
  * terms flow through — the property that makes it runnable forever. State
  * is the summary's (term, est, err) rows plus its eviction floor
  * (tuple-encodable, so Spark's state store needs no custom serializer);
  * persisting the floor is what keeps the bound honest when a term evicted
  * in batch N re-enters in batch N+1.
  */
object TrendingTerms {

  case class TopTerm(source: String, term: String, est: Long, err: Long)

  def trending(stream: DataFrame, m: Int, k: Int)
              (implicit spark: SparkSession): Dataset[TopTerm] = {
    import spark.implicits._
    stream.select(col("source"), col("term")).as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, List[(String, Long, Long)]), TopTerm](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(String, String)],
         state: GroupState[(Long, List[(String, Long, Long)])]) =>
          val (floor, stored) = state.getOption.getOrElse((0L, Nil))
          val summary = new HeavyHitters.Summary(m)
          stored.foreach { case (t, c, e) => summary.restore(t, c, e) }
          summary.raiseFloor(floor) // after restore: stored ests already include it
          rows.foreach { case (_, term) => summary.offer(term, 1L, 0L) }
          summary.trim()
          val rowsOut = scala.collection.mutable.ListBuffer.empty[(String, Long, Long)]
          summary.foreach(rowsOut += _)
          state.update((summary.floor, rowsOut.toList))
          summary.sortedDesc().iterator.take(k).map { case (t, c, e) =>
            TopTerm(source, t, c, e)
          }
      }
  }
}
