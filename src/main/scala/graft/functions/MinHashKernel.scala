package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the native minhash expressions — tight loops over
  * primitive arrays, callable from generated code.
  */
object MinHashKernel {

  /** splitmix64 finalizer — fast, well-mixed 64-bit hash step. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def tokenHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0x2545f4914f6cdd1dL
    var i = from
    while (i < until) {
      // ASCII lowercase fold inline (tokenizer contract: lower + whitespace)
      val b = bytes(i)
      val lb = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      h = mix(h ^ (lb & 0xffL))
      i += 1
    }
    h
  }

  /** Distinct hashed w-token shingles of a text, folded to 31 bits (so the
    * downstream affine permutations can't overflow) or kept at 64 bits
    * (`fold31 = false`, for set-exact counting). Tokenization matches
    * split(lower(trim(text)), "\\s+"): runs of whitespace delimit tokens.
    * No shingle strings are ever materialized — token hashes are combined
    * positionally.
    */
  def shingleHashes(text: UTF8String, w: Int): ArrayData =
    shingleHashes(text, w, fold31 = true)

  def shingleHashes(text: UTF8String, w: Int, fold31: Boolean): ArrayData = {
    val bytes = text.getBytes
    // collect token hashes
    var tokens = new Array[Long](16)
    var nTok = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(bytes(i))) i += 1
        if (nTok == tokens.length) tokens = java.util.Arrays.copyOf(tokens, nTok * 2)
        tokens(nTok) = tokenHash(bytes, start, i)
        nTok += 1
      }
    }
    if (nTok == 0) return new GenericArrayData(Array.empty[Long])
    val nWin = math.max(nTok - w + 1, 1)
    val out = new Array[Long](nWin)
    var j = 0
    while (j < nWin) {
      var h = 0L
      var d = 0
      while (d < w && j + d < nTok) { h = mix(h ^ tokens(j + d)); d += 1 }
      // 31-bit fold keeps the minhash affine map under 2^62 (ANSI mode);
      // the unfolded 64-bit form serves set-exact counting joins, where
      // collision mass must be certifiably negligible (~|S|²/2^64 per doc)
      out(j) = if (fold31) h & 0x7fffffffL else h
      j += 1
    }
    // distinct via sort + unique (shingle sets, not bags)
    java.util.Arrays.sort(out)
    var uniq = 1
    var p = 1
    while (p < nWin) {
      if (out(p) != out(p - 1)) { out(uniq) = out(p); uniq += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\t' || b == '\r' || b == '\f' || b == 0x0b

  /** Exact w-token-shingle Jaccard between two texts — the native form of
    * the Column composition
    * `size(intersect(shingles(a), shingles(b))) / size(union(...))` where
    * shingles = distinct concat_ws(" ", w-windows of split(lower(trim(t)),
    * "\\s+")). String sets (not hashes), so the result is bit-identical to
    * the interpreted-HOF formulation and the DuckDB list-ops oracle; the
    * win is one JVM pass per pair instead of per-element interpreted eval.
    * UTF8String.trim/toLowerCase are exactly Spark's trim()/lower().
    */
  def ngramJaccard(a: UTF8String, b: UTF8String, w: Int): Double = {
    val sa = shingleStringSet(a, w)
    val sb = shingleStringSet(b, w)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
    val union = sa.size() + sb.size() - inter
    if (union == 0) Double.NaN else inter.toDouble / union
  }

  private def shingleStringSet(text: UTF8String, w: Int): java.util.HashSet[String] = {
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    val n = toks.length
    val nWin = math.max(n - w, 0) + 1
    val set = new java.util.HashSet[String](nWin * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nWin) {
      sb.setLength(0)
      var d = 0
      while (d < w && i + d < n) {
        if (d > 0) sb.append(' ')
        sb.append(toks(i + d))
        d += 1
      }
      set.add(sb.toString)
      i += 1
    }
    set
  }

  /** k-permutation MinHash signature over a 31-bit hash array:
    * sig_j = min over h of (a_j·h + b_j) mod P, P = 2^61 − 1.
    */
  def signature(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % 2305843009213693951L
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
