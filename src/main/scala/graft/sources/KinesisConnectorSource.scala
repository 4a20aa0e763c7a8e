package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** O1: optional binding to a real Kinesis streaming connector.
  *
  * The reference's actual source is a Kinesis event-source mapping
  * (/root/reference/main.tf:56-62) configured by `batch_size`
  * (/root/reference/variables.tf:16-18), `starting_position`
  * (variables.tf:50-53) and `kinesis_stream_arn` (variables.tf:20-22).
  * This object maps those knobs verbatim onto the public
  * awslabs/spark-sql-kinesis-connector option surface
  * (format "aws-kinesis"); the connector jar is environment-provided and
  * not present offline, so everything here is compile-checked and the
  * option/schema mapping is unit-tested, while `readStream` itself only
  * works where the connector is on the classpath. The offline seam
  * (KinesisEventSource / LogStreamJob file source) stays the default.
  *
  * Scale note: one connector partition per shard; downstream the pipeline
  * repartitions by its own keys, so shard skew does not propagate past the
  * first stage.
  */
object KinesisConnectorSource {

  /** Connector short-name registered by the public awslabs connector. */
  val Format = "aws-kinesis"

  /** The reference module's ESM knobs, 1:1. */
  final case class Config(
      streamArn: String,                           // kinesis_stream_arn
      region: String = "",                         // parsed from the ARN if empty
      batchSize: Option[Long] = None,              // batch_size
      startingPosition: String = "TRIM_HORIZON",   // starting_position
      endpointUrl: Option[String] = None,          // test/localstack override
      consumerType: String = "GetRecords")         // polling, like the ESM

  /** streamName + region out of a Kinesis ARN
    * (arn:aws:kinesis:REGION:ACCT:stream/NAME).
    */
  private[graft] def parseArn(arn: String): (String, String) = {
    val parts = arn.split(":", 6)
    require(parts.length == 6 && parts(2) == "kinesis" && parts(5).startsWith("stream/"),
      s"not a Kinesis stream ARN: $arn")
    (parts(5).stripPrefix("stream/"), parts(3))
  }

  /** Reference knobs → connector options. Pure, unit-testable offline.
    *
    * - `batch_size` bounds records per invocation in the ESM; the connector
    *   equivalent is `maxFetchRecordsPerShard` (per-shard micro-batch bound).
    * - `starting_position` passes through verbatim: the connector accepts the
    *   same ShardIterator names (TRIM_HORIZON / LATEST / AT_TIMESTAMP).
    */
  private[graft] def options(cfg: Config): Map[String, String] = {
    val (name, arnRegion) = parseArn(cfg.streamArn)
    val region = Option(cfg.region).filter(_.nonEmpty).getOrElse(arnRegion)
    Map(
      "kinesis.streamName" -> name,
      "kinesis.region" -> region,
      "kinesis.consumerType" -> cfg.consumerType,
      "kinesis.startingPosition" -> cfg.startingPosition.toUpperCase,
      "kinesis.endpointUrl" ->
        cfg.endpointUrl.getOrElse(s"https://kinesis.$region.amazonaws.com")) ++
      cfg.batchSize.map(n => "kinesis.maxFetchRecordsPerShard" -> n.toString)
  }

  /** Connector rows → the seam schema every downstream stage expects
    * (partition_key, sequence_number, arrival_ts, data) — identical to
    * KinesisEventSource's output, so LogStreamJob.start works unchanged.
    * The connector emits (data: binary, streamName, partitionKey,
    * sequenceNumber, approximateArrivalTimestamp).
    */
  def normalize(records: DataFrame): DataFrame =
    records.select(
      col("partitionKey").as("partition_key"),
      col("sequenceNumber").as("sequence_number"),
      col("approximateArrivalTimestamp").cast("timestamp").as("arrival_ts"),
      col("data"))

  /** Open the stream. Requires the connector jar on the classpath; offline
    * this throws the data-source-not-found error at `load()`.
    */
  def readStream(spark: SparkSession, cfg: Config): DataFrame =
    normalize(
      spark.readStream.format(Format).options(options(cfg)).load())
}
