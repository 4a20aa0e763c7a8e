package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming CONTENT-FILTER MONITOR: the blocklist scan (q185's
  * Aho–Corasick kernel) as a continuously-updated per-pattern counter
  * table — total occurrences and distinct docs hit, per blocklist
  * pattern, across every micro-batch so far. The ops dashboard face of
  * content filtering: a pattern surging between batches is exactly the
  * signal a crawl-intake pipeline alerts on.
  *
  * Design: the kernel is a NARROW codegen'd projection (one automaton
  * walk per doc, shipped once as a codegen reference), so each batch pays
  * O(batch bytes); the cross-batch state is a BUILT-IN streaming
  * aggregation keyed by pattern_id — state size is |patterns| rows
  * regardless of throughput, and Spark's aggregation state store gives
  * exactly-once totals under checkpoint/replay (no custom state to get
  * retry-wrong, unlike count-merging by hand — the EvalMonitorJob batch-id
  * lesson applies only to driver-side folds, which this avoids).
  *
  * Batch parity: on any static frame, `counts(df, pats)` equals
  * `TextOps.blocklistHits(df, id, text, pats)` aggregated per pattern —
  * pinned by `StreamingSpec`.
  */
object BlocklistMonitorJob {

  /** (pattern_id, pattern, total_hits, n_docs_hit) — streaming or batch. */
  def counts(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val pats = patterns.toIndexedSeq
    docs
      .select(graft.functions.gfn.multi_pattern_counts(
        lower(col("text")), pats).as("counts"))
      .select(posexplode(col("counts")).as(Seq("pattern_id", "n_hits")))
      .where(col("n_hits") > 0)
      .groupBy(col("pattern_id").cast("long").as("pattern_id"))
      .agg(sum(col("n_hits")).as("total_hits"),
        count(lit(1)).as("n_docs_hit"))
      .withColumn("pattern",
        element_at(typedLit(pats), col("pattern_id").cast("int") + 1))
      .select(col("pattern_id"), col("pattern"), col("total_hits"),
        col("n_docs_hit"))
  }
}
