package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** Lineage-truncating materialization with a RELEASE handle — what
  * `Dataset.localCheckpoint` should have been. `Dataset.localCheckpoint`
  * pins its blocks in the block manager until the SparkContext dies (there
  * is no public API to free them), so every iterative op that checkpoints
  * per round leaks one frame per round into a long-lived session. This
  * bridge materializes the frame into a persisted, HARD-CUT
  * `RDD[InternalRow]` and rebuilds a `LogicalRDD`-rooted DataFrame over
  * it: same plan-depth truncation, but the caller holds the RDD and can
  * `unpersist` it the moment the next round's frame is materialized.
  *
  * The cut (`RDD.localCheckpoint` on the materialized RDD) is REQUIRED,
  * not an optimization: without it every round's RDD keeps its parent
  * chain, and a loop chaining hundreds of rounds overflows task
  * serialization (measured: StackOverflowError at ~640 chained BPE
  * batches in the round-8 scale probe; the engine's other loops converge
  * in <= ~30 rounds and merely accumulated memory). The price is that
  * `unpersist` is FINAL — a cut RDD has no lineage to recompute from, so
  * a released frame must never be consumed again. Loop rounds satisfy
  * this by construction (round N dies when round N+1 is stored); escaping
  * results are consumed exactly once before the session owner's drain.
  * Failure mode on a real cluster matches `localCheckpoint` (an executor
  * loss fails the job and the retry recomputes from source); a pipeline
  * needing executor-loss tolerance for a checkpoint should write a
  * parquet round-trip instead. Lives under `org.apache.spark.sql` because
  * `internalCreateDataFrame` is `private[sql]` (same pattern as
  * [[ColumnBridge]]).
  */
object DatasetBridge {

  /** Materialize `df` eagerly into `level` storage, cut its lineage, and
    * return the truncated frame plus the backing RDD (whose `unpersist`
    * is the frame's FINAL release — see object doc). The UnsafeRow copy
    * is required: the physical plan reuses row buffers within a
    * partition, and persisted rows must own their bytes.
    */
  def materialize(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, RDD[InternalRow]) = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    rdd.localCheckpoint()
    rdd.count()
    (classic.sparkSession.internalCreateDataFrame(rdd, classic.schema), rdd)
  }
}
