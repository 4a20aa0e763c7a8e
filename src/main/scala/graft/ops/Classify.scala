package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed text classification for corpus curation — the "train a
  * quality/language classifier on the corpus itself" step of an LLM data
  * pipeline (cf. fastText filtering in CCNet/GPT-3 data work), built the
  * only way that is one-pass at 100 TB: MULTINOMIAL NAIVE BAYES, whose
  * "training" is nothing but counting.
  *
  *   train:  one tokenize+count pass over the gated training split →
  *           per-(class, bucket) token counts + per-class doc counts.
  *           The model is a (classes × buckets)-row frame — KBs, broadcast.
  *   score:  argmax_c [ ln P(c) + Σ_b c_b · ln P(b|c) ]  (Laplace-smoothed)
  *           via a broadcast join of the model onto the per-doc bucket
  *           counts — no second corpus shuffle beyond the count pass.
  *
  * Exactness recipe (the q68/q132 DECIMAL ln convention): every ln is
  * snapped to DECIMAL(18,12) and scaled to Long 1e-12-nat units, so scores
  * are integer sums, ties break on the class string, and an oracle can
  * replay training AND inference bit-exactly. |lik12| < 2^45; a doc's
  * score sums n_tokens·|lik12| — safe under ANSI to ~2^17 tokens/doc.
  */
object Classify {

  private val Dec1812 = DecimalType(18, 12)
  private val Dec130 = DecimalType(13, 0)
  private def ln12(x: Column): Column =
    (log(x).cast(Dec1812) * lit(1000000000000L).cast(Dec130)).cast("long")

  /** Train on `trainGate` rows, score EVERY row. Output: (id, label,
    * is_train, pred, score12) — `pred` the argmax class (ties to the
    * lexicographically greatest, the max-struct order), `score12` its
    * integer log-posterior numerator. `bucketOf` as in
    * [[Mix.importanceWeights]]: token → bucket in [0, buckets).
    */
  def naiveBayes(df: DataFrame, text: Column, id: Column, label: Column,
                 trainGate: Column, buckets: Int = 64,
                 bucketOf: Option[Column => Column] = None): DataFrame = {
    require(buckets > 0)
    val bucket: Column => Column =
      bucketOf.getOrElse(w => pmod(xxhash64(w), lit(buckets.toLong)))
    val base = df.select(id.as("id"), label.as("label"),
      trainGate.cast("boolean").as("is_train"), text.as("text"))
    // ONE tokenize pass; the (id, bucket) count frame feeds training and
    // scoring both — persist or the corpus tokenizes twice (Caches-tracked:
    // feeds the lazy result, released by the session owner)
    val perDoc = Caches.track(base
      .select(col("id"), col("label"), col("is_train"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .select(col("id"), col("label"), col("is_train"),
        bucket(col("w")).as("b"))
      .groupBy(col("id"), col("label"), col("is_train"), col("b"))
      .agg(count(lit(1)).as("c")))
    // class stats: token count per (class, bucket) and per class; doc
    // counts for the prior — all tiny aggregates off the persisted frame
    val classBucket = perDoc.where(col("is_train"))
      .groupBy(col("label"), col("b")).agg(sum(col("c")).as("cb"))
    val classTok = classBucket.groupBy(col("label"))
      .agg(sum(col("cb")).as("ctok"))
    val classDocs = base.where(col("is_train"))
      .groupBy(col("label")).agg(count(lit(1)).as("ndocs"))
    val nTrain = base.where(col("is_train")).agg(count(lit(1)).as("n"))
    // per-class frame with prior12 and the unseen-bucket likelihood zl12
    // (ln of the Laplace floor 1/(ctok+B)) — the COALESCE default for
    // buckets the class never saw in training
    val classes = classDocs.join(classTok, "label")
      .crossJoin(broadcast(nTrain))
      .select(col("label").as("cls"),
        ln12(col("ndocs").cast("double") / col("n")).as("prior12"),
        ln12(lit(1.0) / (col("ctok") + buckets)).as("zl12"),
        col("ctok"))
    val lik = classBucket.join(classes, col("label") === col("cls"))
      .select(col("cls"), col("b"),
        ln12((col("cb") + 1).cast("double") / (col("ctok") + buckets))
          .as("lik12"))
    // score: cross every doc-bucket row with the (tiny) class list, fill
    // unseen (class, bucket) cells with the class floor, sum per (id, cls)
    val scored = perDoc
      .join(broadcast(classes.select(col("cls"), col("prior12"), col("zl12"))),
        lit(true))
      .join(broadcast(lik), Seq("cls", "b"), "left")
      .groupBy(col("id"), col("label"), col("is_train"), col("cls"),
        col("prior12"))
      .agg(sum(col("c") * coalesce(col("lik12"), col("zl12"))).as("ll12"))
      .select(col("id"), col("label"), col("is_train"), col("cls"),
        (col("prior12") + col("ll12")).as("score12"))
    // argmax per doc as a groupBy-max(struct), never a per-doc window at
    // corpus scale (the q122 lesson); ties resolve to the greater class
    scored.groupBy(col("id"), col("label"), col("is_train"))
      .agg(max(struct(col("score12"), col("cls"))).as("m"))
      .select(col("id"), col("label"), col("is_train"),
        col("m.cls").as("pred"), col("m.score12").as("score12"))
  }
}
