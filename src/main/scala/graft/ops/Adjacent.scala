package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-order adjacency WITHOUT a global single-task window — the generic
  * recipe behind sequence-gap audits and any "compare each row to its
  * successor in total order" question at scale.
  *
  * `lead(x) over (order by x)` with no partitioning funnels the whole
  * dataset through one task. But adjacency only needs LOCAL order plus the
  * partition boundaries: range-partition by the id (contiguous, disjoint
  * ranges per partition — Spark's RangePartitioner guarantee), take the
  * per-partition lead (partitioned window: parallel, streaming), and stitch
  * the seams from the per-partition (min, max) summary — a frame with ONE
  * ROW PER PARTITION, bounded by cluster fan-out (thousands), not by data.
  * The seam frame is paired via the same collect-sort-zip used by q105's
  * 30-row rank (single-row aggregate → array_sort → adjacent zip), so no
  * unpartitioned Window exists anywhere in the plan — every adjacent pair
  * in global order is produced exactly once (in-partition pairs by the
  * window, cross-partition pairs by the seam zip).
  *
  * Output: (id, next_id) for every consecutive pair in ascending order of
  * `idCol`. Deterministic for a given input regardless of partitioning —
  * the pair set is a property of the id set alone.
  */
object Adjacent {

  def globalAdjacent(df: DataFrame, idCol: String): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val parted = df.select(col(idCol).cast("long").as("id"))
      .repartitionByRange(n, col("id"))
      .withColumn("pid", spark_partition_id())
    val within = parted
      .withColumn("next_id",
        lead(col("id"), 1).over(Window.partitionBy(col("pid")).orderBy(col("id"))))
      .where(col("next_id").isNotNull)
      .select(col("id"), col("next_id"))
    // seams: one (lo, hi) row per partition; empty partitions simply don't
    // produce a row, and the sort-zip pairs each hi with the NEXT present
    // partition's lo — ranges are disjoint, so ascending lo order is the
    // partition order
    val seams = parted.groupBy(col("pid"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .agg(array_sort(collect_list(struct(col("lo"), col("hi")))).as("bs"))
      .select(explode(expr(
        // get() (not [..]) tolerates the one-past-the-end probe of the last
        // element and the empty-frame case with null instead of an ANSI error
        "transform(sequence(0, greatest(size(bs) - 2, 0)), " +
          "i -> struct(get(bs, i).hi AS id, get(bs, i + 1).lo AS next_id))")).as("s"))
      .select(col("s.id"), col("s.next_id"))
      .where(col("id").isNotNull && col("next_id").isNotNull)
    within.unionByName(seams)
  }
}
