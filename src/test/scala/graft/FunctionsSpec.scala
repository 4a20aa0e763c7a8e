package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GzipUtil, Kpl, LenientTs, TextKernel}

/** Unit tests for the custom-operation helpers (O3/O4/O9 kernels). */
class FunctionsSpec extends AnyFunSuite {

  // ---- O4 gzip ----

  test("gzip roundtrip inflates back to the original bytes") {
    val payload = """{"log_type":"app","log_id":"1","time":"2026-08-12T00:00:00Z"}"""
      .getBytes("UTF-8")
    val gz = GzipUtil.gzip(payload)
    assert(GzipUtil.isGzip(gz))
    assert(GzipUtil.maybeGunzip(gz).toSeq == payload.toSeq)
  }

  test("non-gzip bytes pass through unchanged") {
    val b = "plain".getBytes("UTF-8")
    assert(GzipUtil.maybeGunzip(b) eq b)
  }

  test("corrupt gzip stream yields null (record dropped, not crashed)") {
    val corrupt = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4)
    assert(GzipUtil.maybeGunzip(corrupt) == null)
  }

  // ---- O3 KPL ----

  test("KPL aggregate of 3 payloads deaggregates to all 3 (fixture F6)") {
    val payloads = Seq("a", "bb", "ccc").map(_.getBytes("UTF-8"))
    val agg = Kpl.aggregate(payloads)
    assert(Kpl.isAggregate(agg))
    assert(Kpl.deaggregate(agg).map(new String(_, "UTF-8")) == Seq("a", "bb", "ccc"))
  }

  test("non-KPL record deaggregates to itself") {
    val b = """{"x":1}""".getBytes("UTF-8")
    assert(Kpl.deaggregate(b).map(_.toSeq) == Seq(b.toSeq))
  }

  test("KPL magic with corrupt digest passes through as-is (not dropped)") {
    val agg = Kpl.aggregate(Seq("p".getBytes("UTF-8")))
    agg(agg.length - 1) = (agg(agg.length - 1) ^ 0x55).toByte
    assert(Kpl.deaggregate(agg).map(_.toSeq) == Seq(agg.toSeq))
  }

  test("KPL magic with corrupt protobuf body (digest fixed up) passes through") {
    val agg = Kpl.aggregate(Seq("p".getBytes("UTF-8")))
    // mangle the body, then recompute the md5 so only the protobuf is bad
    val body = java.util.Arrays.copyOfRange(agg, 4, agg.length - 16)
    body(0) = 0x7f.toByte // wire type 7 = invalid
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(body)
    val bad = new java.io.ByteArrayOutputStream()
    bad.write(agg, 0, 4); bad.write(body); bad.write(md5)
    val b = bad.toByteArray
    assert(Kpl.deaggregate(b).map(_.toSeq) == Seq(b.toSeq))
  }

  // ---- O9 lenient timestamp (conformance core per FIXTURES.md F2) ----

  private def micros(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli * 1000L

  test("parses every documented format variant") {
    val cases = Seq(
      "2026-08-12T00:15:30Z" -> "2026-08-12T00:15:30Z",
      "2026-08-12T00:15:30.123Z" -> "2026-08-12T00:15:30.123Z",
      "2026-08-12T00:15:30.123456+00:00" -> "2026-08-12T00:15:30.123456Z",
      "2026-08-12T09:15:30.123456+09:00" -> "2026-08-12T00:15:30.123456Z",
      "2026-08-12 09:15:30" -> "2026-08-12T09:15:30Z",
      "2026-08-12 09:15:30.250" -> "2026-08-12T09:15:30.250Z",
      "Wed, 12 Aug 2026 09:15:30 +0900" -> "2026-08-12T00:15:30Z",
      "2026-08-12" -> "2026-08-12T00:00:00Z")
    for ((in, want) <- cases) {
      val got = LenientTs.parseMicros(in, "UTC")
      assert(got != null, s"failed to parse: $in")
      val wantUs = java.time.Instant.parse(want)
      assert(got.longValue ==
        wantUs.getEpochSecond * 1000000L + wantUs.getNano / 1000, s"wrong value for: $in")
    }
  }

  test("zone-less formats are read in the configured zone") {
    val got = LenientTs.parseMicros("2026-08-12 09:15:30", "Asia/Tokyo")
    val want = java.time.Instant.parse("2026-08-12T00:15:30Z")
    assert(got.longValue == want.getEpochSecond * 1000000L)
  }

  test("epoch seconds and millis") {
    assert(LenientTs.parseMicros("1755000000", "UTC").longValue == 1755000000L * 1000000L)
    assert(LenientTs.parseMicros("1755000000123", "UTC").longValue == 1755000000123L * 1000L)
  }

  test("garbage yields null") {
    for (bad <- Seq("not-a-time", "", "  ", "12345", "2026-13-45T99:99:99Z"))
      assert(LenientTs.parseMicros(bad, "UTC") == null, s"should not parse: $bad")
  }

  test("property: ISO formats round-trip through format+parse (500 seeded samples)") {
    val rnd = new java.util.Random(4242)
    for (_ <- 1 to 500) {
      val sec = math.abs(rnd.nextLong()) % 4102444800L // 1970..2100
      val frac = rnd.nextInt(1000000)
      val i = java.time.Instant.ofEpochSecond(sec, frac * 1000L)
      val s = java.time.format.DateTimeFormatter.ISO_INSTANT.format(i)
      val got = LenientTs.parseMicros(s, "UTC")
      assert(got != null && got.longValue == sec * 1000000L + frac, s"roundtrip failed: $s")
    }
  }

  // ---- text normalization kernel ----

  private def norm(s: String): String =
    TextKernel.normalize(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("normalize: NFC composes decomposed sequences") {
    assert(norm("cafe\u0301") == "caf\u00e9")   // e + combining acute -> e-acute
    assert(norm("A\u030a") == "\u00c5")         // A + ring -> Angstrom A
  }

  test("normalize: strips non-whitespace control chars") {
    assert(norm("a\u0000b") == "ab")             // NUL stripped, no space introduced
    assert(norm("a\u0007\u001b\u007fb") == "ab") // BEL/ESC/DEL stripped
    assert(norm("a\tb\nc") == "a b c")           // ws controls collapse to single space
    assert(norm("a \u0000 b") == "a b")          // ctl inside a ws run doesn't double it
  }

  test("normalize: collapses ASCII whitespace runs and trims; keeps unicode spaces") {
    assert(norm("  a \r\n\t  b  ") == "a b")
    assert(norm("a\u00a0b") == "a\u00a0b")       // NBSP not in the ASCII ws class
    assert(norm("\u2009a\u2009") == "\u2009a\u2009") // thin space preserved (engine-portable)
  }

  test("normalize: empty / all-whitespace / all-control inputs -> empty") {
    assert(norm("") == "")
    assert(norm(" \t\r\n ") == "")
    assert(norm("\u0000\u0007\u001f") == "")
  }

  test("normalize: surrogate pairs pass through untouched") {
    val s = "x \ud83d\ude00  y" // emoji between whitespace runs
    assert(norm(s) == "x \ud83d\ude00 y")
  }

  test("property: every dispatch branch round-trips (RFC1123 / SQL / date / epoch)") {
    val rnd = new java.util.Random(2468)
    val utc = java.time.ZoneOffset.UTC
    for (_ <- 1 to 500) {
      val sec = math.abs(rnd.nextLong()) % 4102444800L
      val i = java.time.Instant.ofEpochSecond(sec)
      val zdt = i.atZone(utc)
      // RFC 1123 (letter-first branch)
      val rfc = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
        .withLocale(java.util.Locale.US).format(zdt)
      assert(LenientTs.parseMicros(rfc, "UTC").longValue == sec * 1000000L, rfc)
      // SQL form, zone-less (space-at-10 branch), read in configured zone
      val sql = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss", java.util.Locale.US).format(zdt)
      assert(LenientTs.parseMicros(sql, "UTC").longValue == sec * 1000000L, sql)
      // bare date (length-10 branch) = midnight in zone
      val day = zdt.toLocalDate
      assert(LenientTs.parseMicros(day.toString, "UTC").longValue ==
        day.atStartOfDay(utc).toEpochSecond * 1000000L, day.toString)
      // epoch seconds and millis (digit branch; only 10/13-digit strings parse)
      if (sec.toString.length == 10)
        assert(LenientTs.parseMicros(sec.toString, "UTC").longValue == sec * 1000000L)
      val ms = sec * 1000L + rnd.nextInt(1000)
      if (ms.toString.length == 13)
        assert(LenientTs.parseMicros(ms.toString, "UTC").longValue == ms * 1000L)
    }
  }

  // ---- PII redaction kernel ----
  // Expected strings below were cross-checked against DuckDB's RE2
  // regexp_replace/regexp_extract_all on the identical patterns — this pin
  // is what makes the q52 oracle trustworthy.

  private def redact(s: String): String =
    TextKernel.redactPii(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
  private def npii(s: String): Int =
    TextKernel.piiCount(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  test("pii: email forms, including dotted/plus locals and multi-label domains") {
    assert(redact("contact a.b-c_d%e+f@sub.example.co.uk now") == "contact <EMAIL> now")
    assert(redact("a@b.co") == "<EMAIL>")
    assert(redact("double  email a@b.com c@d.org") == "double  email <EMAIL> <EMAIL>")
    assert(npii("double  email a@b.com c@d.org") == 2)
  }

  test("pii: IPv4 literals — greedy octets, no range check, leftover tail kept") {
    assert(redact("ip 10.0.0.1 and 999.999.999.999 and 1.2.3.4.5")
      == "ip <IP> and <IP> and <IP>.5")
    assert(npii("ip 10.0.0.1 and 999.999.999.999 and 1.2.3.4.5") == 3)
    assert(redact("v1.2.3 release notes") == "v1.2.3 release notes") // version strings survive
  }

  test("pii: numeric-domain address redacts as IP, not email") {
    assert(redact("user@10.0.0.1 login") == "user@<IP> login")
    assert(npii("user@10.0.0.1 login") == 1)
  }

  test("pii: phone shapes with -, ., space separators and 3-or-4 middle group") {
    assert(redact("call 555-010-1234 or 555 0101 1234 or 555.123.4567")
      == "call <PHONE> or <PHONE> or <PHONE>")
    assert(npii("call 555-010-1234 or 555 0101 1234 or 555.123.4567") == 3)
    assert(redact("x 123-4567-8901 y") == "x <PHONE> y")
  }

  test("pii: clean text untouched, zero count") {
    assert(redact("no pii here 12345") == "no pii here 12345")
    assert(npii("no pii here 12345") == 0)
  }

  // ---- Aho–Corasick multi-pattern counts ----

  private def acCounts(pats: Seq[String], text: String): Seq[Long] =
    graft.functions.AhoCorasick.compile(pats.toArray).counts(text).toSeq

  /** Brute-force truth: occurrences = start positions where the pattern
    * matches (overlapping included) — the oracle-SQL semantics.
    */
  private def bruteCounts(pats: Seq[String], text: String): Seq[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  test("aho-corasick counts all overlapping occurrences of every pattern at once") {
    // "aa" in "aaaa" -> 3 (overlapping); "aaa" -> 2; shared prefixes
    assert(acCounts(Seq("aa", "aaa"), "aaaa") == Seq(3L, 2L))
    // pattern inside another pattern: both fire from one walk
    assert(acCounts(Seq("table hash", "hash"), "x table hash y hash")
      == Seq(1L, 2L))
    // fail-link transitions: "ab" then "ba" interleaved
    assert(acCounts(Seq("ab", "ba", "aba"), "ababa") == Seq(2L, 2L, 2L))
    // no match, empty text
    assert(acCounts(Seq("zz"), "abc") == Seq(0L))
    assert(acCounts(Seq("zz"), "") == Seq(0L))
  }

  test("aho-corasick matches a brute-force every-start-position replay on random text") {
    val rnd = new scala.util.Random(42)
    val pats = Seq("ab", "bba", "aab", "abab", "b", "cab")
    (1 to 50).foreach { _ =>
      val t = (1 to rnd.nextInt(60)).map(_ => "abc" (rnd.nextInt(3))).mkString
      assert(acCounts(pats, t) == bruteCounts(pats, t), s"text=$t")
    }
  }

  test("luhn scan: validated cards count, near-misses and wrong lengths do not") {
    import graft.functions.TextKernel
    def n(s: String) = TextKernel.luhnCount(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // classic test numbers (valid Luhn): Visa 4111..., Amex 15-digit
    assert(n("pay with 4111111111111111 now") == 1L)
    assert(n("378282246310005 and 4111111111111111") == 2L)
    // check-digit off by one → invalid
    assert(n("4111111111111112") == 0L)
    // 12 digits (too short) and 20 digits (too long, maximal-run rule)
    assert(n("411111111111") == 0L)
    assert(n("41111111111111110000") == 0L)
    // separators break the run: each side too short
    assert(n("4111-1111-1111-1111") == 0L)
    assert(n("") == 0L && n("no digits at all") == 0L)
    // Luhn replay on random runs: every valid count matches a direct check
    val rnd = new scala.util.Random(9)
    (1 to 100).foreach { _ =>
      val len = 13 + rnd.nextInt(7)
      val digits = Seq.fill(len)(rnd.nextInt(10))
      val expectValid = {
        val s = digits.reverse.zipWithIndex.map { case (d, k) =>
          if (k % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
        }.sum
        s % 10 == 0
      }
      assert(n(digits.mkString) == (if (expectValid) 1L else 0L),
        s"digits ${digits.mkString}")
    }
  }

  test("aho-corasick automaton survives java serialization (codegen reference path)") {
    val auto = graft.functions.AhoCorasick.compile(Array("ab", "ba"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(auto)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.functions.AcAutomaton]
    assert(back.counts("ababa").toSeq == Seq(2L, 2L))
  }
}
