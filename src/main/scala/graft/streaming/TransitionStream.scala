package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of q106's event-transition mining: emit (from_type,
  * to_type) for every consecutive pair of a user's events as they arrive,
  * carrying ONE record of state per user — the last event seen. The batch
  * lead() needs the whole history shuffled; here the "window" is the state
  * store, so the per-batch cost is the batch's own rows and state is O(1)
  * per active user, reclaimed by an event-time timeout after an hour idle.
  *
  * Ordering contract: within a micro-batch rows sort by (event time, id);
  * ACROSS batches correctness relies on replay order, as with any
  * last-value state (a late event older than the stored state would emit
  * the transition out of order — the watermark bounds how late that can
  * be). The parity test replays in order and checks batch == stream.
  */
object TransitionStream {

  case class LastEv(us: Long, id: Long, tpe: String)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  def transitions(events: DataFrame)(implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "1 hour")
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
         state: GroupState[LastEv]) =>
          if (state.hasTimedOut) { // idle user: drop the one state record
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toSeq.sortBy(r => (r._3, r._2))
            var last = state.getOption
            val out = Seq.newBuilder[Transition]
            for ((_, id, us, tpe, _) <- ordered) {
              last.foreach(l => out += Transition(user, l.tpe, tpe))
              last = Some(LastEv(us, id, tpe))
            }
            last.foreach { l =>
              state.update(l)
              state.setTimeoutTimestamp(l.us / 1000 + 3600000L) // +1 h
            }
            out.result().iterator
          }
      }
  }
}
