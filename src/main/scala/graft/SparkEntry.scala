package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.LogPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Runs the full reference parity path (SURVEY.md §3.1): the `events`
    * table is rendered to raw JSON log lines (log_type/log_id/time envelope
    * + passthrough fields), then parsed / validated / routed / partitioned
    * by LogPipeline, and aggregated per route-partition — the per-prefix
    * grouping the reference's save step performs per batch.
    */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = PipelineConfig()
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val rawLines = events.select(
      to_json(struct(
        col("event_type").as("log_type"),
        col("event_id").cast("string").as("log_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("time"),
        col("user_id"), col("value"), col("props"))).as("payload"))
    LogPipeline.parse(rawLines, cfg)
      .groupBy(col("route"), col("month"), col("day"))
      .agg(count(lit(1)).as("n"), sum(when(col("valid"), 1).otherwise(0)).as("n_valid"))
      .orderBy(col("route"), col("month"), col("day"))
  }

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
