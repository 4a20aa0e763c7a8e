package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.functions.{GzipUtil, Kpl}
import graft.pipeline.LogPipeline

/** Golden tests for the parity pipeline, driven by FIXTURES.md F1–F7 and the
  * documented semantics at /root/reference/README.md:8-15.
  */
class LogPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = PipelineConfig()

  private def decodeAll(payloads: Seq[Array[Byte]]): Seq[String] =
    LogPipeline.decode(payloads.toDF("data"))
      .select("payload").as[String].collect().toSeq

  private def parseOne(json: String, c: PipelineConfig = cfg) =
    LogPipeline.parse(Seq(json).toDF("payload"), c)
      .select("raw", "log_type", "log_id", "valid", "kept", "route", "month", "day")
      .collect().head

  // ---- decode stage (O2–O5) ----

  test("plain JSON record passes decode unchanged") {
    val p = """{"log_type":"app","log_id":"1","time":"2026-08-12T00:00:00Z"}"""
    assert(decodeAll(Seq(p.getBytes("UTF-8"))) == Seq(p))
  }

  test("gzipped payload is inflated (F5)") {
    val p = """{"log_type":"app","log_id":"1","time":"2026-08-12T00:00:00Z"}"""
    assert(decodeAll(Seq(GzipUtil.gzip(p.getBytes("UTF-8")))) == Seq(p))
  }

  test("KPL aggregate fans out to all user records (F6)") {
    val ps = Seq("""{"a":1}""", """{"b":2}""", """{"c":3}""")
    val agg = Kpl.aggregate(ps.map(_.getBytes("UTF-8")))
    assert(decodeAll(Seq(agg)) == ps)
  }

  test("CWL DATA_MESSAGE explodes logEvents messages; CONTROL_MESSAGE drops (F4)") {
    val data =
      """{"messageType":"DATA_MESSAGE","owner":"1","logGroup":"/g","logStream":"s",
        |"logEvents":[{"id":"1","timestamp":1,"message":"{\"log_type\":\"app\",\"log_id\":\"cw-1\",\"time\":\"2026-08-12T12:00:00Z\"}"},
        |{"id":"2","timestamp":2,"message":"{\"log_type\":\"app\",\"log_id\":\"cw-2\",\"time\":\"2026-08-12T12:00:01Z\"}"}]}"""
        .stripMargin.replace("\n", "")
    val control = """{"messageType":"CONTROL_MESSAGE","logEvents":[]}"""
    val out = decodeAll(Seq(data.getBytes("UTF-8"), control.getBytes("UTF-8")))
    assert(out.size == 2)
    assert(out.forall(_.contains("cw-")))
  }

  test("gzipped CWL envelope decodes end-to-end (README.md:10 arrival form)") {
    val data =
      """{"messageType":"DATA_MESSAGE","logEvents":[{"id":"1","timestamp":1,"message":"m1"}]}"""
    assert(decodeAll(Seq(GzipUtil.gzip(data.getBytes("UTF-8")))) == Seq("m1"))
  }

  // ---- parse stage (O6–O12), fixtures F2/F3 ----

  test("valid record routes to its type and date partition (F2)") {
    val r = parseOne(
      """{"log_type": "app", "log_id": "7c9a2f1e-0001", "time": "2026-08-12T09:15:30.123456+09:00",
        | "level": "INFO", "user": {"id": 42}}""".stripMargin.replace("\n", ""))
    assert(r.getAs[String]("log_type") == "app")
    assert(r.getAs[Boolean]("valid"))
    assert(r.getAs[Boolean]("kept"))
    assert(r.getAs[String]("route") == "app")
    assert(r.getAs[String]("month") == "2026-08")
    assert(r.getAs[String]("day") == "12") // 09:15+09:00 = 00:15Z, same day in UTC
  }

  test("raw passthrough is byte-exact (key order / spacing preserved)") {
    val weird = """{"time":"2026-08-12T00:00:00Z",  "log_id":"x","log_type":"app","n":1.50}"""
    assert(parseOne(weird).getAs[String]("raw") == weird)
  }

  test("partition path renders in the configured timezone (SURVEY §7.3.4)") {
    // 23:30Z on the 11th = 08:30+09:00 on the 12th in Tokyo
    val json = """{"log_type":"app","log_id":"x","time":"2026-08-11T23:30:00Z"}"""
    val utc = parseOne(json)
    assert(utc.getAs[String]("day") == "11")
    val tokyo = parseOne(json, cfg.copy(timezone = "Asia/Tokyo"))
    assert(tokyo.getAs[String]("month") == "2026-08" && tokyo.getAs[String]("day") == "12")
  }

  test("non-JSON is silently dropped (F3 row 1)") {
    val r = parseOne("not json at all {{{")
    assert(!r.getAs[Boolean]("kept"))
  }

  test("JSON array (valid JSON, not an object) goes to the failed route (F3 row 2)") {
    val r = parseOne("[1,2,3]")
    assert(r.getAs[Boolean]("kept") && !r.getAs[Boolean]("valid"))
    assert(r.getAs[String]("route") == "unknown")
  }

  test("missing each required field routes to unknown (F3 rows 3-5)") {
    val missing = Seq(
      """{"log_id":"x1","time":"2026-08-12T00:00:00Z","m":"hi"}""", // no log_type
      """{"log_type":"app","log_id":"x2","m":"hi"}""", // no time
      """{"log_type":"app","time":"2026-08-12T00:00:00Z","m":"hi"}""") // no log_id
    for (json <- missing) {
      val r = parseOne(json)
      assert(r.getAs[Boolean]("kept") && !r.getAs[Boolean]("valid"), json)
      assert(r.getAs[String]("route") == "unknown", json)
    }
  }

  test("unparseable time routes to unknown (F3 row 6)") {
    val r = parseOne("""{"log_type":"app","log_id":"x3","time":"not-a-time"}""")
    assert(r.getAs[Boolean]("kept") && !r.getAs[Boolean]("valid"))
    assert(r.getAs[String]("route") == "unknown")
  }

  test("valid record with parseable time routes under its own date even when type is missing") {
    val r = parseOne("""{"log_id":"x1","time":"2026-03-05T10:00:00Z"}""")
    assert(r.getAs[String]("route") == "unknown")
    assert(r.getAs[String]("month") == "2026-03" && r.getAs[String]("day") == "05")
  }

  test("whitelist miss is skipped entirely, not routed to unknown (F3 row 7)") {
    val c = cfg.copy(whitelist = Seq("app", "nginx"))
    val r = parseOne("""{"log_type":"debug","log_id":"x4","time":"2026-08-12T00:00:00Z"}""", c)
    assert(!r.getAs[Boolean]("kept"))
  }

  test("whitelisted type is kept; typeless records bypass the whitelist (→ unknown)") {
    val c = cfg.copy(whitelist = Seq("app"))
    assert(parseOne("""{"log_type":"app","log_id":"1","time":"2026-08-12T00:00:00Z"}""", c)
      .getAs[Boolean]("kept"))
    val noType = parseOne("""{"log_id":"1","time":"2026-08-12T00:00:00Z"}""", c)
    assert(noType.getAs[Boolean]("kept") && noType.getAs[String]("route") == "unknown")
  }

  test("empty whitelist env means process all — the documented intent, not the " +
       "reference's {\"\"} set (lambda/main.py:32-36 dead branch; F3 row 8)") {
    val c = PipelineConfig.fromEnv(Map("LOG_TYPE_WHITELIST" -> ""))
    assert(c.whitelist.isEmpty)
    assert(parseOne("""{"log_type":"anything","log_id":"1","time":"2026-08-12T00:00:00Z"}""", c)
      .getAs[Boolean]("kept"))
  }

  // ---- write stage (O11/O13/O14), contract F7 ----

  test("end-to-end write: partition layout, gzip content, byte-exact lines, " +
       "valid/failed disjoint-cover (F7)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val inputs = Seq(
      """{"log_type":"app","log_id":"1","time":"2026-08-12T01:00:00Z","m":"a"}""",
      """{"log_type":"app","log_id":"2","time":"2026-08-12T02:00:00Z","m":"b"}""",
      """{"log_type":"nginx","log_id":"3","time":"2026-08-13T00:00:00Z","m":"c"}""",
      """{"log_id":"4","time":"2026-08-12T00:00:00Z","m":"no-type"}""",
      """not json {{{""")
    LogPipeline.run(inputs.map(_.getBytes("UTF-8")).toDF("data"), cfg, tmp)

    val root = new java.io.File(s"$tmp/${cfg.pathPrefix}")
    def files(sub: String) = {
      val d = new java.io.File(root, sub)
      Option(d.listFiles()).getOrElse(Array.empty).filter(_.getName.endsWith(".gz"))
    }
    val app12 = files("log_type=app/month=2026-08/day=12")
    val nginx13 = files("log_type=nginx/month=2026-08/day=13")
    val unknown12 = files("log_type=unknown/month=2026-08/day=12")
    assert(app12.nonEmpty && nginx13.nonEmpty && unknown12.nonEmpty)

    def readGz(fs: Array[java.io.File]): Seq[String] = fs.flatMap { f =>
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
      val s = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      in.close(); s
    }.toSeq

    assert(readGz(app12).toSet == inputs.filter(_.contains("\"app\"")).toSet) // byte-exact
    assert(readGz(nginx13) == Seq(inputs(2)))
    assert(readGz(unknown12) == Seq(inputs(3))) // failed route, own event date
    // non-JSON appears nowhere; valid ∪ failed = kept payloads
    val all = readGz(app12 ++ nginx13 ++ unknown12)
    assert(all.size == 4 && !all.exists(_.startsWith("not json")))
  }

  test("compaction rewrites many small batch outputs into few files, byte-exact") {
    import graft.ops.Compact
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val mk = (i: Int) =>
      s"""{"log_type":"app","log_id":"$i","time":"2026-08-12T0$i:00:00Z","m":"v$i"}"""
    // three separate micro-batch writes → ≥3 files under the same prefix
    for (batch <- 0 until 3)
      LogPipeline.run(Seq(mk(batch)).map(_.getBytes("UTF-8")).toDF("data"), cfg, tmp)
    val srcDir = new java.io.File(s"$tmp/${cfg.pathPrefix}/log_type=app/month=2026-08/day=12")
    assert(srcDir.listFiles().count(_.getName.endsWith(".gz")) >= 3)

    Compact.run(spark, s"$tmp/${cfg.pathPrefix}", s"$tmp/compacted")
    val dstDir = new java.io.File(s"$tmp/compacted/log_type=app/month=2026-08/day=12")
    assert(dstDir.listFiles().count(_.getName.endsWith(".gz")) == 1)
    val lines = spark.read.text(s"$tmp/compacted")
      .select("value").as[String].collect().toSet
    assert(lines == (0 until 3).map(mk).toSet)
  }

  test("property: every kept record lands in exactly one route (seeded corpus)") {
    val rnd = new java.util.Random(99)
    val inputs = (1 to 300).map { i =>
      rnd.nextInt(5) match {
        case 0 => s"""{"log_type":"t${rnd.nextInt(3)}","log_id":"$i","time":"2026-0${1 + rnd.nextInt(8)}-1${rnd.nextInt(9)}T0${rnd.nextInt(9)}:00:00Z"}"""
        case 1 => s"""{"log_id":"$i","time":"2026-01-01T00:00:00Z"}"""
        case 2 => s"""{"log_type":"t0","log_id":"$i"}"""
        case 3 => s"""garbage $i"""
        case 4 => s"""{"log_type":"t1","log_id":"$i","time":"${rnd.nextInt(100)}bad"}"""
      }
    }
    val parsed = LogPipeline.parse(inputs.toDF("payload"), cfg).cache()
    val total = parsed.count()
    val kept = parsed.filter(col("kept")).count()
    val validN = parsed.filter(col("kept") && col("valid")).count()
    val failedN = parsed.filter(col("kept") && !col("valid")).count()
    val dropped = parsed.filter(!col("kept")).count()
    assert(total == 300)
    assert(validN + failedN == kept && kept + dropped == total)
    // each kept record has exactly one route value and a well-formed partition
    assert(parsed.filter(col("kept") && col("route").isNull).count() == 0)
    assert(parsed.filter(col("kept") &&
      !col("month").rlike("^\\d{4}-\\d{2}$")).count() == 0)
    parsed.unpersist()
  }
}
