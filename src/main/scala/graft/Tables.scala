package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loads the driver-generated parquet corpus (see /root/repo/TESTDATA.md).
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * tables they need through here, so filter/column pushdown reaches the
  * parquet scan untouched.
  *
  * `events.ts` has shipped as both TIMESTAMP(NANOS) (older corpora — Spark 4
  * refuses to map nanos to TimestampType, so we read nanos as long via the
  * legacy conf and truncate to micros, exactly what DuckDB's reader does)
  * and native TIMESTAMP(MICROS)/NTZ (current corpora — already a timestamp,
  * normalized to session-TZ TimestampType so downstream window/extract
  * semantics match the oracle). The branch is on the LOADED type, so either
  * corpus generation works unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema METADATA memo (r11): every `spark.read.parquet` call re-infers
  // the schema from footers on the driver (~60 ms here, worse on
  // many-file tables at scale); a catalog session builds hundreds of
  // frames over the same ten immutable tables, so the inferred StructType
  // is cached per path and handed to the reader explicitly. Data is never
  // cached — each query still scans parquet; this is exactly what a table
  // catalog (metastore/Iceberg manifest) provides in production.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    if (name == "events") {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }
}
