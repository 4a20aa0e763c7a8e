package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern matching (Aho & Corasick 1975) — the
  * blocklist-scan primitive. One automaton walk over a document counts
  * occurrences of EVERY pattern simultaneously (overlapping occurrences
  * included: an occurrence = an end position where the pattern matches),
  * replacing the k-regex-pass formulation whose cost is
  * O(k · |text|). At 100 TB the automaton is compiled once on the driver
  * (size = total pattern chars), shipped to executors as a codegen
  * reference object, and the scan stays narrow inside whole-stage
  * codegen — per-document cost O(|text| + hits), independent of k.
  *
  * The compiled form is immutable and Serializable: goto maps per node,
  * BFS-computed failure links, and per-node AGGREGATED end lists
  * (own pattern ids ++ ends(fail(node)), flattened at compile time so the
  * match loop never chases the fail chain for output).
  */
final class AcAutomaton(val patterns: Array[String],
                        gotoMaps: Array[mutable.HashMap[Char, Int]],
                        fail: Array[Int],
                        ends: Array[Array[Int]]) extends Serializable {

  def nPatterns: Int = patterns.length

  /** Per-pattern occurrence counts (all end positions, overlapping
    * included) of every pattern in `text`.
    */
  def counts(text: String): Array[Long] = {
    val out = new Array[Long](patterns.length)
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      var s = state
      var next = -1
      while (next < 0) {
        gotoMaps(s).get(ch) match {
          case Some(t) => next = t
          case None =>
            if (s == 0) next = 0 else s = fail(s)
        }
      }
      state = next
      val e = ends(state)
      var j = 0
      while (j < e.length) { out(e(j)) += 1L; j += 1 }
      i += 1
    }
    out
  }
}

object AhoCorasick {

  /** Compile `patterns` (must be non-empty strings, distinct) into an
    * immutable automaton. Compile cost O(total pattern chars · alphabet
    * lookups) — driver-side, once.
    */
  def compile(patterns: Array[String]): AcAutomaton = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
    require(patterns.distinct.length == patterns.length,
      "patterns must be distinct")
    val gotoMaps = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    val ownEnds = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    // trie
    var p = 0
    while (p < patterns.length) {
      var node = 0
      val pat = patterns(p)
      var i = 0
      while (i < pat.length) {
        val ch = pat.charAt(i)
        node = gotoMaps(node).getOrElseUpdate(ch, {
          gotoMaps += mutable.HashMap.empty[Char, Int]
          ownEnds += mutable.ArrayBuffer.empty[Int]
          gotoMaps.length - 1
        })
        i += 1
      }
      ownEnds(node) += p
      p += 1
    }
    // BFS failure links + aggregated end lists
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val ends = new Array[Array[Int]](n)
    ends(0) = ownEnds(0).toArray
    val queue = mutable.Queue.empty[Int]
    for ((_, child) <- gotoMaps(0)) {
      fail(child) = 0
      ends(child) = ownEnds(child).toArray
      queue.enqueue(child)
    }
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      for ((ch, child) <- gotoMaps(node)) {
        var f = fail(node)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        // goto(f)(ch) is strictly shallower than child, so no self-loop risk
        fail(child) = gotoMaps(f).getOrElse(ch, 0)
        ends(child) = (ownEnds(child) ++ ends(fail(child))).toArray
        queue.enqueue(child)
      }
    }
    new AcAutomaton(patterns, gotoMaps.toArray, fail, ends)
  }
}

/** Static entry points the generated code calls (mirrors MinHashKernel). */
object AcKernel {
  def counts(text: org.apache.spark.unsafe.types.UTF8String,
             auto: AcAutomaton): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      auto.counts(text.toString))
}
