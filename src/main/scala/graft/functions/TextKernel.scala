package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for text normalization (called from codegen'd NormalizeText).
  *
  * Pipeline, in an order chosen so an engine-independent regex formulation
  * produces byte-identical output (the q51 oracle re-derives it in DuckDB):
  *   1. Unicode NFC normalization (java.text.Normalizer; DuckDB:
  *      nfc_normalize) — canonical composition, stable across Unicode
  *      versions for assigned codepoints;
  *   2. strip non-whitespace control chars [\x00-\x08\x0B\x0E-\x1F\x7F]
  *      (everything ISO-control except \t \n \f \r, which are whitespace);
  *   3. collapse runs of [\t\n\f\r ] to a single space (RE2's \s class —
  *      deliberately ASCII-only so both engines agree);
  *   4. trim leading/trailing spaces.
  *
  * One pass over the NFC string; no lowercasing (Unicode case folding is
  * locale- and engine-dependent — callers lower() explicitly if wanted).
  */
object TextKernel {

  def normalize(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(n.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
      val isCtl = c <= 0x08 || c == 0x0B || (c >= 0x0E && c <= 0x1F) || c == 0x7F
      if (isWs) pendingSpace = started // leading whitespace never emits
      else if (!isCtl) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing pendingSpace never emitted
  }

  /** Accent/diacritic stripping: NFD-decompose, drop combining marks
    * (general category Mn), NFC-recompose. The Unicode-canonical route —
    * 'á' → 'a', 'ü' → 'u'; base letters without decompositions ('ø',
    * 'ß') pass through unchanged, matching utf8proc-based engines'
    * `strip_accents`.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (java.lang.Character.getType(cp) !=
          java.lang.Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += java.lang.Character.charCount(cp)
    }
    UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
      java.text.Normalizer.Form.NFC))
  }

  // ---- PII redaction ----
  // Patterns are deliberately RE2-safe (no backrefs, no lookaround) so a
  // DuckDB regexp_replace oracle is byte-identical. Applied in a fixed
  // order (email → IPv4 → phone); placeholders contain no digits, so a
  // replacement can never manufacture a later match.
  private val EmailRe =
    java.util.regex.Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val Ipv4Re =
    java.util.regex.Pattern.compile("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")
  private val PhoneRe =
    java.util.regex.Pattern.compile("\\b\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}\\b")

  /** Replace emails, IPv4 literals, and phone-shaped numbers with typed
    * placeholders. Sequential passes; order documented above.
    */
  def redactPii(s: UTF8String): UTF8String = {
    var t = s.toString
    t = EmailRe.matcher(t).replaceAll("<EMAIL>")
    t = Ipv4Re.matcher(t).replaceAll("<IP>")
    t = PhoneRe.matcher(t).replaceAll("<PHONE>")
    UTF8String.fromString(t)
  }

  /** Number of PII matches `redactPii` would replace — counted on the same
    * sequentially-redacted intermediates so overlapping patterns (an IPv4
    * inside an email's domain) are attributed exactly once, matching the
    * redaction itself.
    */
  def piiCount(s: UTF8String): Int = {
    var t = s.toString
    var n = 0
    var m = EmailRe.matcher(t)
    while (m.find()) n += 1
    t = EmailRe.matcher(t).replaceAll("<EMAIL>")
    m = Ipv4Re.matcher(t)
    while (m.find()) n += 1
    t = Ipv4Re.matcher(t).replaceAll("<IP>")
    m = PhoneRe.matcher(t)
    while (m.find()) n += 1
    n
  }

  /** Token-sequence LCS length (the ROUGE-L core): classic two-row DP over
    * the first `cap` tokens of each side — O(min(n,cap)·min(m,cap)) time,
    * O(cap) space per row, one tight JVM loop callable from generated
    * code. The cap is the operator's scale contract: per-row cost is
    * bounded no matter how long a document is (standard ROUGE usage is
    * summary-length sides anyway). UTF8String equality is byte equality —
    * no copying, no decoding.
    */
  /** Token-level Levenshtein distance (insert/delete/substitute, unit
    * costs), both sides truncated at `cap` — the WER numerator. Two-row
    * DP: O(cap^2) time, O(cap) space, same bounded contract as lcsLen.
    */
  def editDist(a: ArrayData, b: ArrayData, cap: Int): Long = {
    val n = math.min(a.numElements(), cap)
    val m = math.min(b.numElements(), cap)
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val bt = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bt(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      cur(0) = i + 1
      j = 0
      while (j < m) {
        val sub = prev(j) + (if (ai.equals(bt(j))) 0 else 1)
        val del = prev(j + 1) + 1
        val ins = cur(j) + 1
        cur(j + 1) = math.min(sub, math.min(del, ins))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }

  def lcsLen(a: ArrayData, b: ArrayData, cap: Int): Long = {
    val n = math.min(a.numElements(), cap)
    val m = math.min(b.numElements(), cap)
    if (n == 0 || m == 0) return 0L
    val bt = new Array[UTF8String](m)
    var j = 0
    while (j < m) { bt(j) = b.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      j = 0
      while (j < m) {
        cur(j + 1) =
          if (ai.equals(bt(j))) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }

  /** Count maximal ASCII-digit runs of length 13..19 that pass the Luhn
    * checksum (ISO/IEC 7812) — the payment-card detector the PII regexes
    * can't express: a 16-digit run is only a live card number when its
    * check digit validates, and counting only validated runs cuts the
    * false-positive rate on ids/timestamps by 10×. One pass, O(|text|);
    * runs longer than 19 digits are NOT cards (and not sub-scanned — the
    * maximal-run contract the SQL oracle replays with a split on
    * non-digits).
    */
  def luhnCount(s: UTF8String): Long = {
    val str = s.toString
    var count = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && str.charAt(j) >= '0' && str.charAt(j) <= '9') j += 1
        val len = j - i
        if (len >= 13 && len <= 19) {
          var sum = 0
          var k = 0
          while (k < len) {
            val d = str.charAt(j - 1 - k) - '0' // k-th digit from the right
            sum += (if (k % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
                    else d)
            k += 1
          }
          if (sum % 10 == 0) count += 1L
        }
        i = j
      } else i += 1
    }
    count
  }

  /** Per-order clipped char n-gram statistics between two strings — the
    * chrF core (Popović 2015), computed ROW-LOCALLY: for n = 1..min(maxN,
    * max(|a|,|b|)) return struct(m, ct, rt) where ct/rt are the two sides'
    * gram counts and m = Σ_g min(count_a(g), count_b(g)) is the clipped
    * match. Orders beyond both lengths are absent (the caller's
    * either-side-has-grams contract); both-empty input returns an empty
    * array. Codepoint-based (Spark substr / DuckDB substr semantics) so
    * the SQL oracle replays value-exact. One HashMap of the ref side per
    * order — O(maxN·len) time, O(distinct grams) space; this kernel is
    * what lets chrF run with ZERO shuffle (both sides live on one row).
    */
  def clippedGrams(a: UTF8String, b: UTF8String, maxN: Int): ArrayData = {
    val cs = a.toString.codePoints().toArray
    val rs = b.toString.codePoints().toArray
    val lc = cs.length
    val lr = rs.length
    val nOrders = math.min(maxN, math.max(lc, lr))
    val rows = new Array[Any](nOrders)
    var n = 1
    while (n <= nOrders) {
      val ct = math.max(0, lc - n + 1)
      val rt = math.max(0, lr - n + 1)
      val counts = new java.util.HashMap[String, Integer](rt * 2 + 4)
      var j = 0
      while (j < rt) {
        val g = new String(rs, j, n)
        val c = counts.get(g)
        counts.put(g, if (c == null) 1 else c + 1)
        j += 1
      }
      var m = 0L
      var i2 = 0
      while (i2 < ct) {
        val g = new String(cs, i2, n)
        val c = counts.get(g)
        if (c != null && c > 0) { m += 1L; counts.put(g, c - 1) }
        i2 += 1
      }
      rows(n - 1) = org.apache.spark.sql.catalyst.InternalRow(m, ct.toLong, rt.toLong)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}
