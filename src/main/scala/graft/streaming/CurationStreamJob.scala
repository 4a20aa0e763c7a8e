package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Streaming counterpart of the batch curation pipeline (q46): a document
  * stream is quality-gated and content-deduped on the fly, so corpus
  * curation can run as ingestion rather than as a nightly batch.
  *
  * - Gates (token count, punctuation ratio, repetition, language ID) are
  *   pure codegen'd column expressions — stateless, so they add no
  *   streaming state and run identically in batch and stream.
  * - Content dedup is `dropDuplicatesWithinWatermark` on the normalized
  *   fingerprint: exact-duplicate payloads arriving within the watermark
  *   horizon collapse to the first-seen row. State is bounded by the
  *   horizon (keys older than the watermark are evicted), which is the
  *   correct 100 TB posture — unbounded-history dedup belongs to the batch
  *   path (`Dedup.exactGroups`), streaming dedup guards the ingest window
  *   where replays and producer retries actually occur.
  *
  * Input schema: (doc_id, ts: timestamp, text). Output adds the gate
  * columns so downstream sinks can partition or audit on them.
  */
object CurationStreamJob {

  def curate(docs: DataFrame,
             watermarkDelay: String = "1 hour",
             minTokens: Int = 20,
             maxPunctRatio: Double = 0.2,
             maxRepetition: Double = 0.6,
             lang: String = "en"): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("punct_ratio",
        when(length(col("text")) > 0,
          TextOps.punctCount(col("text")).cast("double") / length(col("text"))))
      .withColumn("repetition",
        lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
      .withColumn("lang_pred", TextOps.langPred(col("text")))
      .filter(col("lang_pred") === lang && col("n_tokens") >= minTokens &&
        col("punct_ratio") < maxPunctRatio && col("repetition") < maxRepetition)
      .drop("fp")
  }
}
