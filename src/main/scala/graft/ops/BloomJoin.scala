package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned join: build a bounded bit-array over the build side's
  * join keys, broadcast it as ONE row, and drop probe rows that definitely
  * have no match BEFORE the probe side ever shuffles.
  *
  * Why this matters at 100 TB: in a fact⋈filtered-dim join the shuffle of the
  * fact side is the dominant cost, and most fact rows may not survive the
  * join at all. A semi-join pre-filter would itself shuffle the fact side —
  * paying the cost it tries to avoid. The Bloom filter is different in kind:
  * the dim side collapses to `numBits/64` longs (a few KiB, independent of
  * dim cardinality), travels to every probe task as one broadcast row, and
  * the membership test is a handful of codegen'd integer expressions — the
  * probe side stays NARROW. Rows that pass (true matches + a tunable
  * false-positive fraction) continue into the real join, which removes the
  * false positives, so the composition is EXACTLY the plain join.
  *
  * Everything is DataFrame-native — the filter is built by a distributed
  * aggregation (explode k probes → groupBy word → bit_or), never a driver
  * collect, so the build side can be arbitrarily large. `numBits` is a hard
  * cap on memory (default 2^16 bits = 8 KiB); size it ≥ ~10 bits/key for a
  * ~1% FP rate with the default 3 probes.
  *
  * Semantics of the k probe positions mirror standard partitioned Bloom
  * filters (one xxhash64 per seed); reference behavior this accelerates:
  * the validate-against-whitelist path of lambda/main.py:47-52 at scale.
  */
object BloomJoin {

  // column-shift variants of shiftleft/shiftright (the Scala helpers only
  // accept literal shift amounts)
  private def shl(c: Column, n: Column): Column = call_function("shiftleft", c, n)
  private def shr(c: Column, n: Column): Column = call_function("shiftright", c, n)

  /** Bit positions probed for `key` — one 64-bit hash per seed, folded onto
    * [0, numBits). (word index, bit-in-word) pairs as columns.
    */
  private def probes(key: Column, numBits: Int, numHashes: Int): Seq[(Column, Column)] =
    (0 until numHashes).map { j =>
      val pos = pmod(xxhash64(key, lit(j)), lit(numBits.toLong))
      (shiftright(pos, 6).cast("int"), pos.bitwiseAND(lit(63L)).cast("int"))
    }

  /** The filter itself: ONE row holding map<word_idx → 64-bit word> with a
    * bit set for every probe position of every build key. Absent words mean
    * all-zero (definitely absent). Built distributed: the only single-task
    * step assembles ≤ numBits/64 (word, mask) rows into the map — bounded by
    * construction, not by data.
    */
  def build(keys: DataFrame, key: Column, numBits: Int = 1 << 16,
            numHashes: Int = 3): DataFrame = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numHashes >= 1 && numHashes <= 8, s"numHashes in [1,8], got $numHashes")
    val wordBit = array(probes(key, numBits, numHashes).map {
      case (w, b) => struct(w.as("word"), b.as("bit"))
    }: _*)
    keys.select(explode(wordBit).as("wb"))
      .groupBy(col("wb.word").as("word"))
      .agg(bit_or(shl(lit(1L), col("wb.bit"))).as("mask"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask"))))
        .as("bloom_words"))
  }

  /** Keep only probe rows whose key MIGHT be in the filter (no false
    * negatives). `bloom` is the one-row frame from [[build]]; it is
    * broadcast, so the probe side stays narrow — no shuffle, no state.
    */
  def prune(probe: DataFrame, key: Column, bloom: DataFrame,
            numBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    val hit = probes(key, numBits, numHashes).map { case (w, b) =>
      shr(coalesce(element_at(col("bloom_words"), w), lit(0L)), b)
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
    probe.crossJoin(broadcast(bloom)).filter(hit).drop("bloom_words")
  }

  /** The full composition: prune `probe` with a filter built from `buildDf`,
    * then run the real inner join (which removes false positives) — row-for-
    * row identical to `probe.join(buildDf, probeKey === buildKey)`.
    */
  def join(probe: DataFrame, probeKey: Column, buildDf: DataFrame,
           buildKey: Column, numBits: Int = 1 << 16,
           numHashes: Int = 3): DataFrame = {
    val bloom = build(buildDf, buildKey, numBits, numHashes)
    prune(probe, probeKey, bloom, numBits, numHashes)
      .join(buildDf, probeKey === buildKey)
  }
}
