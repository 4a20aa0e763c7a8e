package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.LogStreamJob

/** O1/O15: micro-batch streaming wrapper — checkpointed foreachBatch over a
  * memory source standing in for the Kinesis connector (SURVEY.md §7.1.6).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming pipeline writes routed partitions and resumes from checkpoint " +
       "without reprocessing (exactly-once upgrade of O15)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val cfg = PipelineConfig()
    val mem = MemoryStream[Array[Byte]]
    val records = mem.toDF().withColumnRenamed("value", "data")

    mem.addData(
      """{"log_type":"app","log_id":"1","time":"2026-08-12T01:00:00Z"}""".getBytes("UTF-8"),
      """{"log_id":"2","time":"2026-08-12T01:00:00Z"}""".getBytes("UTF-8"))
    val q1 = LogStreamJob.start(records, cfg, s"$tmp/out", s"$tmp/cp")
    q1.awaitTermination(60000)

    def countLines(): Long = {
      val d = new java.io.File(s"$tmp/out/${cfg.pathPrefix}")
      if (!d.exists()) 0L
      else spark.read.text(d.toString).count()
    }
    assert(countLines() == 2) // one valid (app), one failed (unknown)
    assert(new java.io.File(
      s"$tmp/out/${cfg.pathPrefix}/log_type=app/month=2026-08/day=12").exists())
    assert(new java.io.File(
      s"$tmp/out/${cfg.pathPrefix}/log_type=unknown/month=2026-08/day=12").exists())

    // second AvailableNow run from the same checkpoint: only new data lands
    mem.addData(
      """{"log_type":"app","log_id":"3","time":"2026-08-13T01:00:00Z"}""".getBytes("UTF-8"))
    val q2 = LogStreamJob.start(records, cfg, s"$tmp/out", s"$tmp/cp")
    q2.awaitTermination(60000)
    assert(countLines() == 3)
  }
}
