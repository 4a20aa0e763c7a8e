package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static JVM kernels for byte-pair-encoding vocabulary induction and
  * application (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the standard word-level BPE formulation:
  * words split to character symbols plus a terminal `</w>` marker, merges
  * learned greedily on the weighted word vocabulary).
  *
  * Called from the codegen'd expressions in GraftExpressions (same contract
  * as MinHashKernel/VecKernel: one tight loop per row, no boxing on the hot
  * path beyond the output array).
  */
object BpeKernel {

  val EndMarker = "</w>"
  private val endMarkerU = UTF8String.fromString(EndMarker)

  /** word → initial symbol array: one symbol per Unicode code point, plus
    * the terminal `</w>` symbol (so merges can distinguish word-final
    * contexts — "est" mid-word vs "est</w>" word-final).
    */
  def initSymbols(word: UTF8String): ArrayData = {
    val s = word.toString
    val out = new Array[AnyRef](s.codePointCount(0, s.length) + 1)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val len = Character.charCount(cp)
      out(k) = UTF8String.fromString(s.substring(i, i + len))
      i += len
      k += 1
    }
    out(k) = endMarkerU
    new GenericArrayData(out)
  }

  /** Merge every non-overlapping adjacent (a, b) occurrence left-to-right
    * into the single symbol a+b — one training-iteration step.
    */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      if (i + 1 < n && s.equals(a) && syms.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(a, b))
        i += 2
      } else {
        out.add(s)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Apply a BATCH of merges in rank order — one pass per pair over a
    * primitive array, no ArrayData round-trip between pairs. Semantically
    * identical to applying the pairs one [[mergePair]] at a time in the
    * given order (TextOps.learnBpe's acceptance rule proves that order
    * equals the sequential argmax order).
    */
  def mergeBatch(syms: ArrayData, flat: Array[UTF8String]): ArrayData = {
    var n = syms.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = syms.getUTF8String(i); i += 1 }
    var p = 0
    while (p + 1 < flat.length) {
      val a = flat(p)
      val b = flat(p + 1)
      val out = new Array[UTF8String](n)
      var k = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && cur(i).equals(a) && cur(i + 1).equals(b)) {
          out(k) = UTF8String.concat(a, b)
          i += 2
        } else {
          out(k) = cur(i)
          i += 1
        }
        k += 1
      }
      cur = out
      n = k
      p += 2
    }
    val res = new Array[AnyRef](n)
    i = 0
    while (i < n) { res(i) = cur(i); i += 1 }
    new GenericArrayData(res)
  }

  /** Rank lookup for [[encode]]: merges flattened [l0, r0, l1, r1, ...] in
    * learned order → map "l<NUL>r" -> rank (separator is the escaped
    * "\u0000" char: it cannot occur inside a UTF8String symbol). Built once per expression
    * (reference object), shared by every row.
    */
  def buildRanks(merges: Array[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i + 1 < merges.length) {
      m.put(merges(i) + "\u0000" + merges(i + 1), Integer.valueOf(i / 2))
      i += 2
    }
    m
  }

  /** Tokenizer-side encode: starting from [[initSymbols]] of a word, apply
    * the LOWEST-rank applicable merge (all its occurrences, left-to-right)
    * until none applies — the standard BPE encode loop. Terminates: each
    * application shrinks the symbol array.
    */
  def encode(word: UTF8String, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    var syms = {
      val init = initSymbols(word)
      val arr = new Array[UTF8String](init.numElements())
      var i = 0
      while (i < arr.length) { arr(i) = init.getUTF8String(i); i += 1 }
      arr
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.get(syms(i).toString + "\u0000" + syms(i + 1).toString)
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val a = syms(bestAt)
        val b = syms(bestAt + 1)
        val out = new java.util.ArrayList[UTF8String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j).equals(a) && syms(j + 1).equals(b)) {
            out.add(UTF8String.concat(a, b))
            j += 2
          } else {
            out.add(syms(j))
            j += 1
          }
        }
        syms = out.toArray(new Array[UTF8String](out.size()))
      }
    }
    new GenericArrayData(syms.asInstanceOf[Array[AnyRef]])
  }
}
