package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy risk profiling for release/training corpora.
  *
  * K-ANONYMITY (Sweeney 2002): a row is k-anonymous under a set of
  * quasi-identifier columns when at least k rows share its full
  * quasi-identifier combination — smaller equivalence classes are
  * re-identifiable by linkage. Before a corpus (or its metadata) ships,
  * the release checklist wants: which combinations are risky, how many
  * rows they expose, and the per-slice worst case. PII *redaction* is the
  * q-series `redact_pii` face; this is the STRUCTURED-metadata
  * complement.
  *
  * Scale shape: ONE hash aggregate on the quasi-identifier tuple
  * (partial combine collapses equal tuples map-side — the shuffle carries
  * equivalence CLASSES, not rows), then either the labeled class frame
  * ([[kAnonymityClasses]]) or a second tiny rollup to one row per audit
  * slice ([[kAnonymitySummary]]). Nothing quadratic, no windows, no
  * driver state; both faces are exact and SQL-replayable.
  */
object Privacy {

  /** Equivalence classes of the quasi-identifier tuple with their sizes
    * and the at-risk flag (size < k). Output: quasi columns + (class_size,
    * at_risk).
    */
  def kAnonymityClasses(df: DataFrame, quasi: Seq[Column], k: Int = 5)
      : DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", (col("class_size") < k).cast("int"))
  }

  /** Per-slice k-anonymity rollup: number of equivalence classes, risky
    * classes (size < k), rows they expose, the smallest class, and the
    * worst-case linkage probability 1/min_size. `slice` must be one of
    * the quasi columns (a coarser audit grain over the same classes).
    * Output: (slice, n_classes, n_risky_classes, n_risky_rows, min_size,
    * worst_linkage).
    */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[Column], slice: Column,
                        k: Int = 5): DataFrame =
    kAnonymityClasses(df, quasi, k)
      .groupBy(slice.as("slice"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("at_risk").cast("long")).as("n_risky_classes"),
        sum(when(col("at_risk") === 1, col("class_size")).otherwise(0L))
          .as("n_risky_rows"),
        min(col("class_size")).as("min_size"))
      .withColumn("worst_linkage",
        lit(1.0) / col("min_size").cast("double"))

  /** L-DIVERSITY (Machanavajjhala et al. 2007): k-anonymity's blind spot
    * is the HOMOGENEITY attack — a class can be large yet reveal the
    * sensitive attribute because every member shares it. Per
    * quasi-identifier equivalence class: its size, the number of DISTINCT
    * sensitive values (distinct l-diversity; the class is diverse iff
    * ≥ l), and the dominant sensitive value's share (the direct
    * homogeneity-attack success probability; ties break by max value
    * string, deterministic).
    *
    * Scale shape: one partial-combined groupBy on (quasi…, sensitive) —
    * the shuffle carries (class, value) CELLS, not rows — then a per-class
    * rollup on the same clustering. Exact counts + one IEEE division.
    */
  def lDiversity(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                 l: Int = 3): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    val qNames = df.select(quasi: _*).columns.toSeq
    require(qNames.distinct.size == qNames.size && !qNames.contains("s"),
      s"quasi columns must be uniquely named and not 's': $qNames")
    val cells = df.select(quasi :+ sensitive.cast("string").as("s"): _*)
      .groupBy((qNames :+ "s").map(col): _*)
      .agg(count(lit(1)).as("m"))
    cells
      .groupBy(qNames.map(col): _*)
      .agg(
        sum(col("m")).as("class_size"),
        count(lit(1)).as("n_sensitive"),
        max(struct(col("m"), col("s"))).as("top"))
      .select(qNames.map(col) ++ Seq(col("class_size"), col("n_sensitive"),
        col("top.s").as("top_value"), col("top.m").as("top_freq")): _*)
      .withColumn("dominant_share",
        col("top_freq").cast("double") / col("class_size").cast("double"))
      .withColumn("diverse", (col("n_sensitive") >= l).cast("int"))
  }
}
