package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.pipeline.LogPipeline

/** SQL extension surface + the log_id dedup extension. */
class ExtensionsSpec extends AnyFunSuite {

  test("custom expressions are callable from spark.sql via GraftExtensions") {
    // the shared test session is built withExtensions(new GraftExtensions)
    val spark = SparkTestSession.spark
    val r = spark.sql(
      """SELECT lenient_ts('2026-08-12 09:15:30', 'Asia/Tokyo') AS t1,
                lenient_ts('Wed, 12 Aug 2026 09:15:30 +0900') AS t2,
                cast(try_gunzip(cast('plain' AS BINARY)) AS STRING) AS s""").collect().head
    assert(r.getTimestamp(0).toInstant.toString == "2026-08-12T00:15:30Z")
    assert(r.getTimestamp(1).toInstant.toString == "2026-08-12T00:15:30Z")
    assert(r.getString(2) == "plain")
    val n = spark.sql(
      "SELECT kpl_deaggregate(cast('x' AS BINARY)) AS payload").count()
    assert(n == 1)
  }

  test("batch log_id dedup keeps one record per (route, id), passes id-less through") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val inputs = Seq(
      """{"log_type":"app","log_id":"dup","time":"2026-08-12T00:00:00Z","n":1}""",
      """{"log_type":"app","log_id":"dup","time":"2026-08-12T00:00:01Z","n":2}""",
      """{"log_type":"web","log_id":"dup","time":"2026-08-12T00:00:00Z"}""",
      """{"log_type":"app","time":"2026-08-12T00:00:00Z"}""",
      """{"log_type":"app","time":"2026-08-12T00:00:00Z"}""")
    val parsed = LogPipeline.parse(inputs.toDF("payload"), PipelineConfig())
    val deduped = LogPipeline.dedupeById(parsed)
    assert(deduped.count() == 4) // app/dup collapses; web/dup stays; 2 id-less stay
    assert(deduped.filter($"log_id" === "dup").count() == 2)
  }

  test("batch dedup is deterministic: same winner under any partitioning") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 50 keys × 4 duplicate payload renderings each; the winner must be the
    // lexicographically-least full row, independent of physical layout.
    val inputs = (0 until 50).flatMap { k =>
      Seq("d", "b", "c", "a").map { tag =>
        s"""{"log_type":"app","log_id":"id$k","time":"2026-08-12T00:00:0${k % 10}Z","tag":"$tag"}"""
      }
    }
    def winners(partitions: Int): Map[String, String] = {
      val parsed = LogPipeline.parse(
        inputs.toDF("payload").repartition(partitions), PipelineConfig())
      LogPipeline.dedupeById(parsed)
        .select($"log_id", $"raw").as[(String, String)].collect().toMap
    }
    val w1 = winners(1)
    assert(w1.size == 50)
    // every winner is the 'a'-tagged rendering (least raw string per key)
    assert(w1.values.forall(_.contains(""""tag":"a"""")))
    assert(winners(7) == w1 && winners(32) == w1)
  }
}
