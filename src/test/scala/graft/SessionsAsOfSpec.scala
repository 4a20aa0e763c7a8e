package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Sessions}

/** Sessionization (batch, session_window, flatMapGroupsWithState) and the
  * as-of join composition.
  */
class SessionsAsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("batch sessionize splits on the 30-minute gap") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, ts("2026-08-12T00:00:00Z")),
      (1L, 2L, ts("2026-08-12T00:10:00Z")), // same session
      (1L, 3L, ts("2026-08-12T01:00:00Z")), // 50 min gap → new session
      (2L, 4L, ts("2026-08-12T00:00:00Z"))).toDF("user_id", "event_id", "ts")
    val s = Sessions.sessionize(events).orderBy("user_id", "sess_id").collect()
    assert(s.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("as-of join picks the latest prior right row per key, null when none") {
    import spark.implicits._
    val left = Seq((10L, 100L, ts("2026-08-12T02:00:00Z")),
      (11L, 100L, ts("2026-08-12T04:00:00Z")),
      (12L, 200L, ts("2026-08-12T01:00:00Z"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts("2026-08-12T01:30:00Z"), "a"),
      (100L, ts("2026-08-12T03:00:00Z"), "b"),
      (200L, ts("2026-08-12T05:00:00Z"), "late")).toDF("r_user", "r_ts", "tag")
    val j = AsOf.joinPrior(left, right, "user_id", "r_user", "ts", "r_ts",
      Seq("r_ts", "tag")).orderBy("event_id").collect()
    assert(j.map(_.getAs[String]("asof_tag")).toSeq == Seq("a", "b", null))
  }

  test("as-of match is inclusive at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts("2026-08-12T02:00:00Z"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2026-08-12T02:00:00Z"), "same")).toDF("r_user", "r_ts", "tag")
    val j = AsOf.joinPrior(left, right, "user_id", "r_user", "ts", "r_ts", Seq("tag"))
    assert(j.collect().head.getAs[String]("asof_tag") == "same")
  }

  test("forward as-of picks the earliest following row, inclusive, null when none") {
    import spark.implicits._
    val left = Seq((10L, 100L, ts("2026-08-12T02:00:00Z")),
      (11L, 100L, ts("2026-08-12T03:00:00Z")), // equal-ts right must match
      (12L, 100L, ts("2026-08-12T06:00:00Z")), // nothing after -> null
      (13L, 200L, ts("2026-08-12T01:00:00Z"))).toDF("event_id", "user_id", "ts")
    val right = Seq((100L, ts("2026-08-12T02:30:00Z"), "a"),
      (100L, ts("2026-08-12T03:00:00Z"), "b"),
      (200L, ts("2026-08-12T00:30:00Z"), "early")).toDF("r_user", "r_ts", "tag")
    val j = AsOf.joinNext(left, right, "user_id", "r_user", "ts", "r_ts", Seq("tag"))
      .orderBy("event_id").collect()
    assert(j.map(_.getAs[String]("asof_tag")).toSeq == Seq("a", "b", null, null))
  }

  test("streaming session_window aggregation emits merged sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    mem.addData((1L, ts("2026-08-12T00:00:00Z")), (1L, ts("2026-08-12T00:05:00Z")),
      (1L, ts("2026-08-12T09:00:00Z")))
    val out = Sessions.streamingSessionWindow(
      mem.toDF().toDF("user_id", "ts"))
    val q = out.writeStream.format("memory").queryName("sess_sw")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // watermark passed the first session (9:00 − 1h > 0:35) → it is emitted
    val rows = spark.table("sess_sw").collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_events") == 2)
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    mem.addData((1L, ts("2026-08-12T00:00:00Z")), (1L, ts("2026-08-12T00:05:00Z")),
      (1L, ts("2026-08-12T09:00:00Z")), (2L, ts("2026-08-12T09:00:00Z")))
    val out = Sessions.sessionizeStream(mem.toDF().toDF("user_id", "ts"))
    val q = out.writeStream.format("memory").queryName("sess_fmgws")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("sess_fmgws").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    // user 1's first session (2 events) closed by the 9:00 event's gap
    assert(rows.contains((1L, 2L)))
  }
}
