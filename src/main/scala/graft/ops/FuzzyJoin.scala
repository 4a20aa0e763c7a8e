package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join: every pair of rows whose string
  * column is within `maxDist` Levenshtein edits — EXACTLY (candidate
  * filters are lossless; a final `levenshtein` verify removes false
  * positives), and never all-pairs.
  *
  * Candidate generation is the classic q-gram prefix filter
  * (Chaudhuri/Ganti/Kaushik, "A primitive operator for similarity joins",
  * ICDE 2006; count bound from Gravano et al., VLDB 2001, as used by
  * ED-Join, Xiao et al., VLDB 2008):
  *
  *   - `ed(s,t) <= d` implies the positional q-gram multisets overlap in at
  *     least `max(|G(s)|,|G(t)|) - q*d` elements (one edit disturbs at most
  *     q grams, in either direction);
  *   - therefore, with every string's grams sorted by one GLOBAL rarity
  *     order (corpus df, ties by gram text/occurrence), the first
  *     `q*d + 1` grams of s and of t must share an element — so an
  *     equi-join on those prefix grams finds every true pair.
  *
  * Multisets become sets by tagging each gram with its occurrence index
  * within the string, so "aaaa"-style repetition keeps the bound honest.
  *
  * Scale shape (the reason this exists): the join key is the RAREST grams
  * of each string, so bucket sizes track gram df, not corpus size — the
  * stopword-gram blowup that kills a naive all-grams join ("th" pairs
  * everything with everything) never enters the exchange. Every step is a
  * narrow projection, a partial-then-final aggregate, or an equi-join;
  * nothing is quadratic except pairs that genuinely collide on a rare gram,
  * and a bucket of n near-identical strings yields n^2/2 candidates only
  * when the OUTPUT is itself that clique. Strings too short to carry the
  * guarantee (fewer than `q*d + 1` grams) take a separate length-bucketed
  * equi-join — their partner universe is capped at `len <= q*(d+1)-1+d`
  * by the length filter, a handful of distinct length keys.
  */
object FuzzyJoin {

  /** All pairs `(id_a < id_b)` with `levenshtein(str_a, str_b) <= maxDist`,
    * as `(id_a, str_a, id_b, str_b, dist)`. Null strings never match.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "gram length q must be >= 2")
    val d = maxDist
    val minLong = q * (d + 1) // len >= minLong  <=>  numGrams >= q*d + 1
    val pfxLen = q * d + 1

    val base = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("str"),
        length(col(strCol)).as("len"))

    // ---- gram path: strings long enough for the prefix-filter guarantee.
    val long = base.filter(col("len") >= minLong)
    // positional q-grams, each tagged with its occurrence index (occ) so
    // the multiset bound survives the set-valued equi-join
    val grams = long
      .select(col("id"), col("str"), col("len"),
        posexplode(expr(
          s"transform(sequence(1, len - ${q - 1}), p -> substring(str, p, $q))")))
      .withColumnRenamed("col", "gram")
      .withColumn("occ", row_number().over(
        Window.partitionBy(col("id"), col("gram")).orderBy(col("pos"))))
      .select("id", "str", "len", "gram", "occ")
    // global rarity order: corpus df per (gram, occ) element
    val dfTab = grams.groupBy("gram", "occ").agg(count(lit(1)).as("df"))
    // per-string prefix: the q*d+1 rarest elements (df asc, gram, occ) —
    // a per-row sort of ~len grams, never a window over the corpus.
    // Persisted: both sides of the self-join consume it, and without the
    // persist the whole gram+window+df chain runs twice (the q25/q44
    // staged-frame lesson). Kept NARROW (no string column) so the big
    // candidate exchange and distinct move ids, not text.
    val prefix = grams.join(dfTab, Seq("gram", "occ"))
      .groupBy(col("id"))
      .agg(first(col("len")).as("len"),
        slice(sort_array(collect_list(
          struct(col("df"), col("gram"), col("occ")))), 1, pfxLen).as("pfx"))
      .select(col("id"), col("len"), explode(col("pfx")).as("e"))
      .select(col("id"), col("len"),
        col("e.gram").as("gram"), col("e.occ").as("occ"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gramCand = prefix.select(col("id").as("id_a"),
        col("len").as("len_a"), col("gram"), col("occ"))
      .join(prefix.select(col("id").as("id_b"),
        col("len").as("len_b"), col("gram"), col("occ")), Seq("gram", "occ"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= d)
      .select("id_a", "id_b")

    // ---- short path: strings below the gram-path floor meet every
    // possible partner (len within +-d, so len <= minLong-1+d) through a
    // length-keyed equi-join — a bounded set of distinct length keys.
    val shorts = base.filter(col("len") < minLong)
    val partners = base.filter(col("len") <= minLong - 1 + d)
    val shortCand = shorts
      .select(col("id").as("id_s"),
        explode(expr(s"sequence(greatest(len - $d, 0), len + $d)")).as("plen"))
      .join(partners.select(col("id").as("id_o"), col("len").as("plen")),
        Seq("plen"))
      .filter(col("id_s") =!= col("id_o"))
      .select(least(col("id_s"), col("id_o")).as("id_a"),
        greatest(col("id_s"), col("id_o")).as("id_b"))

    // ---- verify: dedup the id pairs (narrow), re-attach the strings by
    // id (equi-joins against the one-row-per-string base; broadcast while
    // small, AQE decides at scale), then threshold-bounded Levenshtein
    // (early-exits past d). False positives die here, so the result is
    // row-exact against the brute-force definition.
    gramCand.union(shortCand).distinct()
      .join(base.select(col("id").as("id_a"), col("str").as("str_a")),
        Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("str").as("str_b")),
        Seq("id_b"))
      .select(col("id_a"), col("str_a"), col("id_b"), col("str_b"),
        levenshtein(col("str_a"), col("str_b"), d).as("dist"))
      .filter(col("dist") >= 0)
  }
}
