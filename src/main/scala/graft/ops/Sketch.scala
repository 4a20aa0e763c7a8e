package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) — the mergeable
  * fixed-size frequency summary, completing the sketch family next to
  * SpaceSaving (heavy hitters, q66), HLL (distinct, q97) and GK (quantiles,
  * q115). Unlike SpaceSaving, a CMS is ORDER-INDEPENDENT: its state is pure
  * counter sums, so the same (depth × width) table comes out of any
  * partitioning / merge order — which is what makes it exactly replayable
  * by a SQL oracle, and what makes the "sketch" nothing more exotic than a
  * grouped count over hashed cells.
  *
  * Representation: the sketch IS a DataFrame of (j, b, c) cells — row j in
  * [0, depth), bucket b in [0, width), c = Σ counts of items hashing to
  * (j, b). Merging two sketches is `union → groupBy(j,b) → sum` ([[cmMerge]]);
  * a point estimate is min over j of the item's cells ([[cmEstimate]]),
  * an overestimate by at most εN with probability 1−δ for width=⌈e/ε⌉,
  * depth=⌈ln 1/δ⌉.
  *
  * Plan shape at 100 TB: building is ONE hash aggregate — each item emits
  * its `depth` cells through a narrow posexplode, and map-side partial
  * combine collapses them to ≤ depth·width rows PER PARTITION before the
  * shuffle (the sketch's whole point: the exchange is bounded by sketch
  * size × partitions, never by data). Estimation joins the query keys
  * against the counter table — broadcast-sized by construction.
  */
object Sketch {

  /** The default production hash family: xxhash64 seeded by the row index,
    * folded into [0, width). Codegen'd, 64-bit mixing.
    */
  private def xxBucket(item: Column, j: Int, width: Int): Column =
    pmod(xxhash64(lit(j), item), lit(width.toLong))

  /** Per-item cell array [(0,h0),(1,h1),…] under `bucketOf` (row index →
    * bucket expression), posexploded to (j, b) rows.
    */
  private def cells(item: Column, depth: Int, width: Int,
                    bucketOf: Option[(Column, Int) => Column]): Column = {
    val f = bucketOf.getOrElse((w: Column, j: Int) => xxBucket(w, j, width))
    array((0 until depth).map(j => f(item, j).cast("long")): _*)
  }

  /** Build the sketch: (j, b, c) counter cells. `bucketOf(item, j)` lets a
    * caller supply a SQL-replayable family (the catalog's position-weighted
    * codepoint polynomial, the q132/q139 recipe); default is xxhash64.
    */
  def countMin(items: DataFrame, item: Column, depth: Int = 4,
               width: Int = 256,
               bucketOf: Option[(Column, Int) => Column] = None): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch dims $depth x $width")
    items.select(posexplode(cells(item, depth, width, bucketOf)).as(Seq("j", "b")))
      .groupBy(col("j"), col("b")).agg(count(lit(1)).as("c"))
  }

  /** Merge two sketches built with the same dims/family: cell-wise sum. */
  def cmMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("j"), col("b")).agg(sum(col("c")).as("c"))

  /** Point estimates for `keys` (a frame with `key` distinct): min over the
    * depth rows of the key's counters. Missing cells count 0 (an item never
    * inserted estimates 0). The classic guarantee: estimate ≥ true count,
    * and ≤ true + εN w.p. 1−δ.
    */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
                 depth: Int = 4, width: Int = 256,
                 bucketOf: Option[(Column, Int) => Column] = None): DataFrame =
    keys.select(key.as("w"),
        posexplode(cells(col("w"), depth, width, bucketOf)).as(Seq("j", "b")))
      .join(sketch, Seq("j", "b"), "left")
      .groupBy(col("w"))
      .agg(min(coalesce(col("c"), lit(0L))).as("c_est"))
}
