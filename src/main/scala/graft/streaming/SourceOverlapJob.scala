package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** Streaming face of the cross-source overlap sketch
  * ([[graft.ops.Dedup.sourceOverlapSketch]]): per-source minhash-union
  * signature cells are folded incrementally as documents arrive, and every
  * micro-batch emits the refreshed pairwise Jaccard estimate matrix.
  *
  * Why this composes exactly: the sketch state is (src, j, min-hash-v) and
  * elementwise min is associative/commutative, so folding per-batch cells
  * into the running state yields BIT-IDENTICAL state to a one-shot build
  * over the concatenated corpus (StreamingSpec pins stream == batch). This
  * is the textbook mergeable-summary contract — the same reason the batch
  * op can partial-aggregate per map task.
  *
  * Cost model at scale: each trigger pays one narrow signature pass over
  * its own increment plus a G×k-cell merge — the corpus is never rescanned
  * and the state never grows past G×k cells regardless of ingest volume.
  * (Contrast with the EXACT overlap matrix, whose distinct gram sets are
  * corpus-sized: that one is the nightly batch job; this one guards the
  * ingest window between rebuilds, like IncrementalDedupJob for dedup.)
  *
  * Input schema: (source, text). Output per trigger:
  * (src_a, src_b, jaccard_est).
  */
object SourceOverlapJob {

  def start(docs: DataFrame,
            outSink: DataFrame => Unit,
            checkpointDir: String,
            w: Int = 3,
            k: Int = 64,
            initialCells: Option[DataFrame] = None,
            trigger: Trigger = Trigger.AvailableNow())
           (implicit spark: SparkSession): StreamingQuery = {
    // foreachBatch triggers run sequentially, so plain refs are race-free
    val cpRef =
      new java.util.concurrent.atomic.AtomicReference[graft.ops.Caches.Checkpointed](null)
    @volatile var init = initialCells // consumed by the first trigger
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchCells = Dedup.sourceSignatureCells(
          batch, col("source"), col("text"), w, k)
        val base = Option(cpRef.get()).map(_.df).orElse(init)
        val merged = base
          .map(st => Dedup.mergeSignatureCells(st, batchCells))
          .getOrElse(batchCells)
        // materialize the G×k-cell state eagerly and cut it from the
        // batch's lineage: a foreachBatch frame is only valid inside its
        // own trigger, and the state must outlive it. Round N's blocks are
        // released the moment round N+1 is stored (the Caches loop
        // contract), so in-flight cache stays ONE G×k table deep.
        val next = graft.ops.Caches.checkpoint(merged)
        val prev = cpRef.getAndSet(next)
        if (prev != null) prev.release()
        init = None
        outSink(Dedup.overlapFromCells(next.df, k))
        ()
      }
      .start()
  }
}
