package graft.functions

import java.nio.ByteBuffer

/** Primitive open-addressed long→count multiset — the shared aggregation
  * buffer for [[ExactPercentileDouble]] (keys = `doubleToLongBits` of the
  * value) and [[MajorityLabelLong]] (keys = label values). Occupancy is
  * `counts(slot) != 0` (counts are always ≥ 1), so a key of 0 needs no
  * sentinel slot. Linear probing on a mixed hash; grows at 50% load. No
  * boxing anywhere on the per-row path — the boxed-map equivalents
  * (OpenHashMap[AnyRef, Long] in the builtin percentile, a count+argmax
  * aggregate pair in the old LPA dag) were measured r11/r12 task-GC
  * sources (guide §5).
  */
final class LongCountMap(initialCapacity: Int = 16) {
  private var cap = {
    var c = 4
    while (c < initialCapacity) c <<= 1
    c
  }
  private var mask = cap - 1
  var keys = new Array[Long](cap)
  var counts = new Array[Long](cap)
  var nEntries = 0

  // finalizer-style bit mix (xxhash64 avalanche) — table index spread for
  // near-adjacent key patterns (double bits, dense label ids)
  @inline private def mix(k: Long): Long = {
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def add(key: Long, c: Long): Unit = {
    var slot = (mix(key) & mask).toInt
    while (counts(slot) != 0L && keys(slot) != key) slot = (slot + 1) & mask
    if (counts(slot) == 0L) {
      keys(slot) = key
      counts(slot) = c
      nEntries += 1
      if (nEntries * 2 > cap) grow()
    } else counts(slot) += c
  }

  private def grow(): Unit = {
    val oldKeys = keys
    val oldCounts = counts
    val oldCap = cap
    cap <<= 1
    mask = cap - 1
    keys = new Array[Long](cap)
    counts = new Array[Long](cap)
    var s = 0
    while (s < oldCap) {
      if (oldCounts(s) != 0L) {
        val key = oldKeys(s)
        var slot = (mix(key) & mask).toInt
        while (counts(slot) != 0L) slot = (slot + 1) & mask
        keys(slot) = key
        counts(slot) = oldCounts(s)
      }
      s += 1
    }
  }

  def mergeInto(other: LongCountMap): Unit = {
    var s = 0
    val oc = other.counts
    val ok = other.keys
    val n = oc.length
    while (s < n) {
      if (oc(s) != 0L) add(ok(s), oc(s))
      s += 1
    }
  }

  def capacity: Int = cap

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * nEntries)
    bb.putInt(nEntries)
    var s = 0
    val n = counts.length
    while (s < n) {
      if (counts(s) != 0L) { bb.putLong(keys(s)); bb.putLong(counts(s)) }
      s += 1
    }
    bb.array()
  }
}

object LongCountMap {
  def deserialize(bytes: Array[Byte]): LongCountMap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val map = new LongCountMap(math.max(16, n * 2))
    var i = 0
    while (i < n) {
      map.add(bb.getLong(), bb.getLong())
      i += 1
    }
    map
  }
}
