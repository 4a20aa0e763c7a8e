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
}
