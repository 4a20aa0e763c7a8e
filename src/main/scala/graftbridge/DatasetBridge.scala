package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** Lineage-truncating materialization with a RELEASE handle — what
  * `Dataset.localCheckpoint` should have been. `localCheckpoint` pins its
  * blocks in the block manager until the SparkContext dies (there is no
  * public API to free them), so every iterative op that checkpoints per
  * round leaks one frame per round into a long-lived session. This bridge
  * materializes the frame into an explicitly persisted `RDD[InternalRow]`
  * and rebuilds a `LogicalRDD`-rooted DataFrame over it: same plan-depth
  * truncation, but the caller holds the RDD and can `unpersist` it the
  * moment the next round's frame is materialized.
  *
  * Also strictly SAFER than `localCheckpoint` on a real cluster: a
  * localCheckpoint'd block lost to executor death fails the job (lineage is
  * gone), while this RDD keeps its lineage and recomputes the lost
  * partition. Lives under `org.apache.spark.sql` because
  * `internalCreateDataFrame` is `private[sql]` (same pattern as
  * [[ColumnBridge]]).
  */
object DatasetBridge {

  /** Materialize `df` eagerly into `level` storage and return a
    * lineage-truncated frame over the stored rows plus the backing RDD.
    * The UnsafeRow copy is required: the physical plan reuses row buffers
    * within a partition, and persisted rows must own their bytes.
    */
  def materialize(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, RDD[InternalRow]) = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rdd = classic.queryExecution.toRdd.map(_.copy()).persist(level)
    rdd.count()
    (classic.sparkSession.internalCreateDataFrame(rdd, classic.schema), rdd)
  }
}
