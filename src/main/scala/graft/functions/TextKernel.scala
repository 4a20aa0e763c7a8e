package graft.functions

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
}
