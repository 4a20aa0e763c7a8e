package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word n-grams
  * with an evaluation/benchmark set, so training data can be scrubbed of
  * test-set leakage before a model ever sees it.
  *
  * Shape at 100 TB: the eval side is always tiny relative to the corpus
  * (benchmarks are thousands of docs, the corpus is billions), so its
  * distinct gram set broadcasts and the whole check is a scan-bound
  * broadcast semi-join — the corpus is read once, no corpus-sized shuffle
  * exists anywhere. Grams travel as 64-bit hashes (`shingle_hashes64`, the
  * q44 kernel), never as strings: equality on the hash equals equality on
  * the gram up to ~|grams|²/2^64 collision mass, and an n-gram string is
  * ~10× the bytes of its hash.
  */
object Decontam {

  /** Distinct hashed w-grams of an eval set — the (small) probe side. */
  def evalGrams(evalDocs: DataFrame, w: Int = 5): DataFrame = evalDocs
    .select(explode(graft.functions.gfn.shingle_hashes64(col("text"), w)).as("g"))
    .distinct()

  /** (doc_id, n_hits) for every corpus doc sharing ≥1 distinct w-gram with
    * the eval set. n_hits counts the doc's distinct overlapping grams — the
    * usual decontamination score thresholded downstream (any-hit = drop is
    * the conservative policy; a hit *fraction* can be derived by joining
    * back the doc's gram count).
    */
  def overlaps(corpus: DataFrame, evalDocs: DataFrame, w: Int = 5): DataFrame =
    corpus
      .select(col("doc_id"),
        explode(graft.functions.gfn.shingle_hashes64(col("text"), w)).as("g"))
      .join(evalGrams(evalDocs, w), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))

  /** SEMANTIC DECONTAMINATION (embedding-space screen): every (corpus,
    * eval) vector pair whose similarity clears `threshold` — the screen
    * that catches paraphrased/translated eval leakage n-gram overlap
    * ([[overlaps]]) is blind to; running both is the standard recipe.
    * Similarity is the integer-quantized dot (the q26/q81 recipe) against
    * an integer threshold, so the pair set is exact and the DuckDB oracle
    * replays it value-exact — no ANN recall caveat on the catalog face.
    *
    * Scale shape: the eval side is small by construction (benchmarks) —
    * it BROADCASTS, and the corpus pays one narrow scoring pass with the
    * threshold filter applied before anything leaves the scan: no
    * corpus-sized shuffle at all, output bounded by actual hits. A
    * corpus-sized "eval" side is the near-dup problem — use
    * [[Similarity.marginMineAnn]]'s legs or `cosineNearDupsAuto` instead.
    */
  def semanticOverlaps(corpus: DataFrame, evalEmb: DataFrame,
                       threshold: Long): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(evalEmb.select(col("vec_id").as("eval_id"),
        col("embedding").as("e_emb"))))
      .select(col("vec_id"), col("eval_id"),
        graft.ops.Similarity.quantizedDot(col("embedding"), col("e_emb"))
          .as("dot"))
      .where(col("dot") >= threshold)

  /** PER-BENCHMARK CONTAMINATION REPORT — [[overlaps]] resolved to WHICH
    * eval doc: (doc_id, eval_id, n_hits, eval_grams, overlap_frac), one row
    * per (corpus doc, eval doc) sharing ≥1 distinct w-gram, where
    * `overlap_frac = n_hits / eval_grams` is the fraction of the eval doc's
    * distinct grams present in the corpus doc — the number contamination
    * sections of model reports quote per benchmark, and the evidence row a
    * scrub decision can be audited against (any-hit drop keeps the
    * conservative policy; frac-thresholded drop is the usual relaxation).
    *
    * Scale shape: identical to [[overlaps]] — the eval side stays tiny and
    * broadcasts (now carrying eval_id alongside each gram hash); the
    * corpus is read once with no corpus-sized shuffle; the (doc, eval)
    * aggregate is bounded by actual hits, and per-eval gram counts ride
    * the same broadcast.
    */
  def overlapReport(corpus: DataFrame, evalDocs: DataFrame,
                    w: Int = 5): DataFrame = {
    // shingle_hashes64 emits DISTINCT hashes per doc, so (eval_id, g) is
    // already unique — no cross-doc distinct needed (unlike evalGrams,
    // which merges all eval docs into one probe set)
    val ev = evalDocs.select(col("doc_id").as("eval_id"),
      explode(graft.functions.gfn.shingle_hashes64(col("text"), w)).as("g"))
    val evCounts = ev.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("eval_grams"))
    corpus
      .select(col("doc_id"),
        explode(graft.functions.gfn.shingle_hashes64(col("text"), w)).as("g"))
      .join(broadcast(ev), "g")
      .groupBy(col("doc_id"), col("eval_id")).agg(count(lit(1)).as("n_hits"))
      .join(broadcast(evCounts), "eval_id")
      .withColumn("overlap_frac",
        col("n_hits").cast("double") / col("eval_grams").cast("double"))
      .select(col("doc_id"), col("eval_id"), col("n_hits"),
        col("eval_grams"), col("overlap_frac"))
  }
}
