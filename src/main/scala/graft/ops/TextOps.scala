package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table. All pure `org.apache.spark.sql.functions` column
  * expressions — codegen'd, no UDFs, fully pushdown/prune-friendly; each is
  * also expressible in ANSI SQL so the DuckDB oracle can check it 1:1.
  */
object TextOps {

  /** Whitespace tokenization (the oracle uses regexp_split_to_array). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count — whitespace tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token-count estimate: letter runs, single digits, and single
    * punctuation marks each count as one token (a GPT-style pre-tokenizer
    * proxy). Count of regex matches — SQL-expressible in both engines.
    */
  val BpeishPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0))).cast("long")

  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("long")

  def spaceCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", ""))).cast("long")

  /** TOTAL MATCHED CHARACTER LENGTH of `word` in `text` (occurrences ×
    * word length) via the length-difference trick — identical semantics in
    * Spark and DuckDB (`replace` replaces all). NOT an occurrence count:
    * [[langScore]] wants matched-length weighting (longer markers carry
    * more evidence); divide by `word.length` if you need a count.
    */
  def matchedLen(text: Column, word: String): Column =
    (length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(word), "")))
      .cast("long")

  /** Distributed BPE vocabulary induction (Sennrich et al. 2016) — the
    * missing first step of the tokenize → encode → pack chain: LEARN the
    * subword merge table from the corpus (q105 encodes against a word
    * vocab; this induces the subword units a real tokenizer ships).
    *
    * Scale shape: the corpus is touched ONCE (token explode + groupBy into
    * the weighted word-vocabulary frame — the classic BPE reduction: merge
    * statistics depend only on (distinct word, count)). Every training
    * iteration then runs on the VOCAB frame, whose cardinality is distinct
    * words, not corpus tokens — at 100 TB that is millions vs trillions.
    * Per iteration: adjacent-pair explode (native init/merge kernels, ~2
    * small rows per symbol), one partial-aggregated pair count, and a
    * 1-row TakeOrdered argmax — the only driver traffic (numMerges single
    * rows; the same bounded train-step collect contract as
    * `Similarity.ivfCentroids`). `localCheckpoint` per round truncates
    * lineage exactly as `Components` does.
    *
    * Determinism: counts are exact longs; the argmax tiebreaks on
    * (count DESC, left, right); merges apply left-to-right non-overlapping
    * — byte-identical merge tables on every run and partitioning.
    *
    * Output: (rank, left, right, pair_count), rank 1..numMerges (fewer if
    * the corpus exhausts below `minPairCount`).
    */
  def learnBpe(docs: DataFrame, text: Column, numMerges: Int,
               minPairCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    val adjacentPairs = expr(
      "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i + 1] AS r))")
    var vocab = docs
      .select(explode(split(lower(trim(text)), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(graft.functions.gfn.bpe_init_symbols(col("word")).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = vocab
        // fully-merged words (one symbol) carry no pairs; without the guard
        // sequence(0, -1) runs DESCENDING under ANSI and indexes out of range
        .where(size(col("syms")) >= 2)
        .select(col("cnt"), explode(adjacentPairs).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r")).limit(1)
        .collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) exhausted = true
      else {
        val (l, r, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((merges.length + 1L, l, r, pc))
        vocab = vocab
          .withColumn("syms", graft.functions.gfn.bpe_merge_pair(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Tokenize `text` into subword units with a learned merge table (the
    * output pairs of [[learnBpe]], tiny by construction — they ride into
    * codegen as a reference object). Lowercased whitespace pre-tokenization
    * mirrors [[learnBpe]]; each word ends in the `</w>` marker symbol.
    */
  def bpeEncodeTokens(text: Column, merges: Seq[(String, String)]): Column = {
    val flat = merges.iterator.flatMap { case (l, r) => Iterator(l, r) }.toArray
    flatten(transform(
      filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0),
      w => graft.functions.gfn.bpe_encode(w, flat)))
  }

  /** n-gram-heuristic language ID: stopword-evidence scores per language,
    * argmax with a deterministic tiebreak (en > es > de > fr). The score for
    * a language is the total matched length of its marker words.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " das "),
    "fr" -> Seq(" le ", " et ", " les "))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(w => matchedLen(text, w))
      .reduce(_ + _)

  def langPred(text: Column): Column = {
    val s = langMarkers.map { case (l, _) => l -> langScore(text, l) }.toMap
    when(s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("de") && s("es") >= s("fr"), "es")
      .when(s("de") >= s("fr"), "de")
      .otherwise("fr")
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Stable across engines (md5 hex lowercase in both).
    */
  def fingerprint(text: Column): Column =
    md5(to_binary(lower(regexp_replace(trim(text), "\\s+", " ")), lit("utf-8")))

  /** TF-IDF top-k terms per document — the classic corpus-statistics join:
    *   tf  = term count per (doc, term)        (shuffle on doc_id+term)
    *   df  = docs containing term              (shuffle on term, from tf)
    *   n   = corpus size                       (1-row agg, broadcast)
    *   score = tf · ln(n/df), ranked per doc with a deterministic
    *           (score DESC, term ASC) tie-break.
    *
    * 100 TB shape: both aggregates are partial-agg hash shuffles; the
    * tf⋈df join shuffles on `term` (vocab-sized, NOT broadcast — vocab at
    * corpus scale is large); the 1-row corpus count is the only broadcast.
    * The final per-doc rank shuffles on doc_id. No driver-side state.
    */
  def tfidfTopK(docs: DataFrame, docId: Column, text: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(docId.as("doc_id"),
      explode(tokens(lower(text))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))))
      .where(col("rk") <= k)
  }

  /** Fixed-size training-chunk split with overlap: each doc becomes
    * ceil((len-overlap)/stride) chunks of `size` chars starting every
    * `stride` = size-overlap chars (the standard context-window prep for
    * tokenize-and-pack). Pure narrow ops — integer chunk count, sequence
    * explode, dynamic substr — no shuffle, no state; the bounded fan-out is
    * ~len/stride rows per doc. Empty/short docs still yield exactly one
    * chunk so no document is silently dropped.
    */
  def chunkDocs(docs: DataFrame, docId: Column, text: Column,
                size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = length(text).cast("long")
    // ceil((n-overlap)/stride); floor of the exact double ratio == integer
    // division for these magnitudes (< 2^53). >= 1 always.
    val nChunks = greatest(lit(1L),
      floor((n - overlap + (stride - 1)) / stride).cast("long"))
    docs
      .select(docId.as("doc_id"), text.as("__text"), nChunks.as("__nc"))
      .select(col("doc_id"), col("__text"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        substr(col("__text"), col("chunk_idx") * stride + 1, lit(size))
          .as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** Corpus-derived boilerplate stripping (the CCNet/RefinedWeb move at
    * word granularity): a token is boilerplate for a group (source/domain)
    * when its document frequency within the group reaches `dfRatio` of the
    * group's documents; such tokens are removed and every document is
    * rebuilt in original token order. Returns one row per document:
    * (doc_id, n_tokens, n_kept, clean_text), clean_text NULL when nothing
    * survives (matches SQL string_agg-over-no-rows).
    *
    * Scale shape: the boilerplate set is SMALL at any corpus size — a word
    * needs df ≥ dfRatio·n_docs, and total (doc, distinct-word) pairs are
    * n_docs·avgDistinctTokens, so at most avgDistinctTokens/dfRatio words
    * per group qualify — a broadcast, never a shuffle, on the marking join.
    * The group-count frame is one row per group (also broadcast). The two
    * real exchanges are the df count (grp, word keys) and the per-doc
    * rebuild; callers that pre-hash-partition by doc id (docsSpread) get
    * the rebuild exchange elided since posexplode and the broadcast join
    * both preserve partitioning. The rebuild's collect_list holds one doc's
    * surviving tokens — bounded by max doc size, same envelope as the scan.
    *
    * The corpus IS read twice (df pass, then strip pass) plus a
    * column-pruned (docId, group) scan for the group sizes — deliberate,
    * NOT the q111 double-scan defect: df-then-strip is inherently two
    * passes (a token's fate depends on corpus-wide statistics), and
    * persisting the exploded token frame to avoid the second scan would
    * cache MORE bytes than the input it saves re-reading.
    */
  def stripBoilerplate(docs: DataFrame, docId: Column, group: Column,
                       text: Column, dfRatio: Double): DataFrame = {
    val d = docs.select(docId.as("doc_id"), group.as("grp"), text.as("text"))
    val toks = d
      .select(col("doc_id"), col("grp"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .where(length(col("w")) > 0)
    val nDocs = d.groupBy(col("grp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val boiler = toks.groupBy(col("grp"), col("w"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .join(broadcast(nDocs), "grp")
      .where(col("df") >= col("n_docs") * lit(dfRatio))
      .select(col("grp"), col("w"), lit(true).as("boiler"))
    toks.join(broadcast(boiler), Seq("grp", "w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("boiler").isNull, 1)).as("n_kept"),
        // struct sorts by pos (unique per doc) → original order; nulls
        // (boilerplate tokens) are skipped by collect_list
        array_sort(collect_list(when(col("boiler").isNull,
          struct(col("pos"), col("w"))))).as("ks"))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        when(size(col("ks")) === 0, lit(null).cast("string"))
          .otherwise(array_join(expr("transform(ks, x -> x.w)"), " "))
          .as("clean_text"))
  }

  /** Quality-score feature set as a projection. */
  def withQuality(df: DataFrame, text: Column): DataFrame = df
    .withColumn("len", length(text).cast("long"))
    .withColumn("n_tokens", tokenCount(text))
    .withColumn("n_punct", punctCount(text))
    .withColumn("n_spaces", spaceCount(text))
    // single FP division of exact ints — deterministic across engines
    .withColumn("punct_ratio", col("n_punct").cast("double") / col("len"))
}
