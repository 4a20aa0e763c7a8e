package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join: every pair of rows whose string
  * column is within `maxDist` Levenshtein edits — EXACTLY (the candidate
  * filter is lossless; a final `levenshtein` verify removes false
  * positives), and never all-pairs.
  *
  * Candidates come from the deletion-neighborhood signature scheme (FastSS,
  * Bocek/Hunt/Stiller 2007; popularized as SymSpell): every string emits
  * all variants reachable by deleting up to `maxDist` characters, and the
  * candidate join is a plain equi-join on the variant. Losslessness is the
  * aligned-common-subsequence argument: an optimal alignment of s and t
  * with `ed(s,t) = e <= d` matches all but at most e characters of each
  * side, so the matched subsequence u satisfies `u ∈ del≤d(s)` and
  * `u ∈ del≤d(t)` — every true pair shares a variant.
  *
  * Why this scheme and not q-gram prefix filtering: prefix-filter bucket
  * sizes track rare-GRAM document frequency, which degenerates on
  * template-shaped corpora (ids, SKUs, "Customer#000000042" names) where
  * every rare gram is still shared by a df-sized family — measured 26x
  * wall at 10x rows before the switch. A deletion variant instead keeps
  * the WHOLE string minus d characters, so two strings share a bucket only
  * when they are genuinely within-2d-edits-shaped: candidate volume tracks
  * the true-pair output, not the gram distribution.
  *
  * Scale shape: variant generation is narrow (C(len, <=d) rows per string
  * — this operator is for name/title/token-length strings; long-text
  * near-dup is the MinHash/SimHash family in [[Dedup]]); variants travel
  * as 64-bit hashes, never strings (hash collisions only ADD candidates —
  * the verify kills them); the only corpus-sized exchanges are the
  * variant-hash equi-join and one id-pair distinct, both narrow. Strings
  * re-attach by id equi-join for the final threshold-bounded levenshtein,
  * which early-exits past `maxDist`. A bucket of n near-identical strings
  * yields n^2/2 candidates exactly when the true output is that clique.
  */
object FuzzyJoin {

  /** All pairs `(id_a < id_b)` with `levenshtein(str_a, str_b) <= maxDist`,
    * as `(id_a, str_a, id_b, str_b, dist)`. Null strings never match.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist

    val base = df
      .filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("str"),
        length(col(strCol)).as("len"))

    // deletion neighborhood: level k = all strings reachable by exactly k
    // deletions from level k-1; the running union is del<=d. Duplicate
    // variants (deleting "aa" at either position) are collapsed per id
    // before the join — they multiply candidate fan-out k_a·k_b per
    // bucket. d=1 (every catalog face) runs the native kernel — the
    // transform dag rebuilt two substrings per position through
    // interpreted HOF eval (r11; hash-set-identical, OpsSpec pin) — which
    // since r12 dedups IN the kernel (one probe per sig against a tiny
    // per-row set), so the corpus-sized distinct() exchange disappears
    // from the plan outright (guide §2.4; base has one row per id, so
    // per-row-distinct sigs are globally distinct). The generic d>1
    // ladder keeps the dag + the global distinct.
    val sigs = if (d == 1)
      base.select(col("id"), col("len"),
        explode(graft.functions.gfn.del1_sigs(col("str"))).as("sig"))
    else {
      var level = base.select(col("id"), col("len"), col("str").as("variant"))
      var variants = level
      for (_ <- 1 to d) {
        level = level
          .select(col("id"), col("len"),
            explode(expr(
              "transform(sequence(1, length(variant)), p -> " +
                "concat(substring(variant, 1, p - 1), substring(variant, p + 1, length(variant))))"))
              .as("variant"))
        variants = variants.unionByName(level)
      }
      variants.select(col("id"), col("len"), xxhash64(col("variant")).as("sig"))
        .distinct()
    }

    // candidate pairs: share any deletion variant (by 64-bit hash; a
    // collision is just an extra candidate for the verify to kill).
    // SHUFFLE_HASH (r12, the q196 recipe): left to AQE this join
    // broadcasts one sigs copy, which (a) recomputes the explode dag for
    // the build side and (b) chains the probe side directly onto the
    // single-row-group scan — the whole candidate expansion ran as ONE
    // task (probe-measured). Exchanging both sides on sig parallelizes
    // the compute-dense expansion at any scale, and the two exchange
    // subtrees are identical, so ReusedExchange computes the sigs once.
    val cand = sigs.select(col("id").as("id_a"), col("len").as("len_a"), col("sig"))
      .hint("shuffle_hash")
      .join(sigs.select(col("id").as("id_b"), col("len").as("len_b"), col("sig")),
        Seq("sig"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= d)
      .select("id_a", "id_b")
      .distinct()

    // verify: re-attach the strings by id (equi-joins against the
    // one-row-per-string base; broadcast while small, AQE decides at
    // scale), then threshold-bounded Levenshtein (early-exits past d).
    // False positives die here, so the result is row-exact against the
    // brute-force definition.
    cand
      .join(base.select(col("id").as("id_a"), col("str").as("str_a")),
        Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("str").as("str_b")),
        Seq("id_b"))
      .select(col("id_a"), col("str_a"), col("id_b"), col("str_b"),
        levenshtein(col("str_a"), col("str_b"), d).as("dist"))
      .filter(col("dist") >= 0)
  }
}
