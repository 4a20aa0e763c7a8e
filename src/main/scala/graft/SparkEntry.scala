package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.LogPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Runs the full reference parity path (SURVEY.md §3.1): the `events`
    * table is rendered to raw JSON log lines, then parsed / validated /
    * routed / partitioned by LogPipeline and aggregated per route-partition.
    * Same builder as the oracle-checked q37_pipeline_parse — one copy of
    * the pipeline, two gates (driver smoke + DuckDB hash).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q37_pipeline_parse")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (LSH /
    * xxhash64-based signatures) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
