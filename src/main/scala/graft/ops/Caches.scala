package graft.ops

import java.lang.ref.WeakReference
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Cache-lifecycle discipline for the ops layer.
  *
  * The problem: many ops persist an intermediate that feeds the LAZY frame
  * they return (e.g. `Dedup.minhashNearDups` stages the per-doc hash frame
  * for three consumers inside the returned plan). The op cannot unpersist
  * before returning — the caller has not consumed the result yet — so a
  * bare `persist()` leaks into any long-lived session: a streaming job, a
  * notebook, or a bench JVM running 132 queries drags an ever-growing
  * MEMORY_AND_DISK cache through unified memory, evicting execution memory.
  *
  * The contract here: ops route such persists through [[track]], and the
  * session owner calls [[release]] (or the belt-and-braces [[drainAll]])
  * once the returned frame has been consumed. One-shot jobs may never call
  * either — the JVM exit is their drain — but harnesses (`Bench`, `Verify`)
  * and long-lived services drain between units of work.
  *
  * [[checkpoint]] is the second half of the story: iterative ops
  * (connected components, PageRank, BPE) used `Dataset.localCheckpoint`,
  * which pins blocks until the context dies with NO release API — a leak
  * per round. [[Checkpointed]] wraps a lineage-truncated materialization
  * with an explicit `release()`, so loops free round N the moment round
  * N+1 is stored, bounding in-flight cache to one round regardless of
  * iteration count.
  */
object Caches {

  /** A lineage-CUT, eagerly-stored frame plus its release handle.
    * `release()` drops the stored blocks and is FINAL: the cut removed the
    * backing RDD's lineage (required — see `DatasetBridge`: chained
    * recompute-capable rounds overflow task serialization past a few
    * hundred iterations), so a released frame must never be consumed
    * again. Loop rounds satisfy this by construction (round N is released
    * when round N+1 is stored); escaping results are consumed exactly once
    * before the session owner's drain. A violated contract fails loudly
    * ("checkpoint block not found"), never silently wrong.
    */
  final case class Checkpointed(df: DataFrame, rdd: RDD[_]) {
    def release(): Unit = rdd.unpersist(blocking = false)
  }

  // Weak refs: a tracked frame the caller dropped gets GC'd (its blocks die
  // with the ContextCleaner) — the registry must not keep dead plans alive.
  private val trackedDs = new ConcurrentLinkedQueue[WeakReference[Dataset[_]]]()
  private val trackedRdd = new ConcurrentLinkedQueue[WeakReference[RDD[_]]]()

  /** Persist `ds` and register it for a later [[release]]. Used by ops whose
    * persisted intermediate feeds the lazy frame they return.
    */
  def track[T](ds: Dataset[T],
               level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    trackedDs.add(new WeakReference(ds))
    ds
  }

  /** Register an already-persisted RDD (e.g. a [[Checkpointed]] backing a
    * returned frame) for a later [[release]].
    */
  def trackRdd[T](rdd: RDD[T]): RDD[T] = {
    trackedRdd.add(new WeakReference(rdd))
    rdd
  }

  /** Unpersist every tracked frame/RDD (non-blocking) and empty the
    * registry. Returns how many live entries were released. Tracked
    * DATASET caches stay valid afterward (lineage intact — consumers
    * recompute); tracked checkpoint RDDs are final (see [[Checkpointed]]),
    * so the owner calls this at unit-of-work boundaries where no released
    * frame has a live consumer — exactly what `Bench`/`Verify` do between
    * queries.
    */
  def release(): Int = {
    var n = 0
    var d = trackedDs.poll()
    while (d != null) {
      val ds = d.get
      if (ds != null) { ds.unpersist(blocking = false); n += 1 }
      d = trackedDs.poll()
    }
    var r = trackedRdd.poll()
    while (r != null) {
      val rdd = r.get
      if (rdd != null) { rdd.unpersist(blocking = false); n += 1 }
      r = trackedRdd.poll()
    }
    n
  }

  /** [[release]] plus a sweep of everything the registry could not see:
    * Dataset caches that bypassed [[track]] (index builders hand those to
    * the caller) and persisted RDDs (checkpoint blocks). After this the
    * session's block-manager cache is empty. Harness-grade hygiene —
    * `Bench`/`Verify` call it between queries so sample N never pays for
    * the caches of samples 1..N-1.
    */
  def drainAll(spark: SparkSession): Unit = {
    release()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Eager lineage-truncated materialization with an explicit release —
    * the controllable `localCheckpoint` (see [[Checkpointed]]).
    */
  def checkpoint(df: DataFrame,
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Checkpointed = {
    val (fresh, rdd) = org.apache.spark.sql.graftbridge.DatasetBridge.materialize(df, level)
    Checkpointed(fresh, rdd)
  }
}
