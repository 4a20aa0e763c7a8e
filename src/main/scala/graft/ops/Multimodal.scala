package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a decode/feature-extract stage.
  *
  * The decode kernel is a STUB — this container has no image/audio codecs —
  * implemented as a deterministic fake (CRC32/length-derived features) so the
  * Spark-side plumbing (schema, Dataset encoders, per-partition batch
  * processing, partitioning) is real and testable. Swap `fakeDecode` for a
  * JNI/codec call in production; everything around it stands.
  *
  * Scale notes: decode runs per-partition via mapPartitions (the Scala
  * analogue of mapInPandas batches) so a real decoder can amortize codec
  * init per partition; media rows are repartitioned by media_id before
  * decode so a huge corpus spreads evenly and no partition holds adjacent
  * (often same-source, same-size) blobs.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                           checksum: Long, width: Int, height: Int,
                           n_frames: Int, feature: Array[Float])

  /** Synthesize a media table from `documents` (text bytes stand in for
    * encoded media content; kind assigned round-robin).
    */
  def mediaTable(docs: DataFrame): DataFrame = docs.select(
    col("doc_id").as("media_id"),
    when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio")
      .otherwise("video").as("kind"),
    to_binary(col("text"), lit("utf-8")).as("content"))

  /** STUB decode kernel: deterministic features from the raw bytes. */
  private def fakeDecode(m: MediaRow): MediaFeatures = {
    val crc = new java.util.zip.CRC32()
    crc.update(m.content)
    val c = crc.getValue
    val len = m.content.length.toLong
    MediaFeatures(
      media_id = m.media_id,
      kind = m.kind,
      byte_len = len,
      checksum = c,
      width = (len % 640).toInt + 1,
      height = ((len * 7) % 480).toInt + 1,
      n_frames = if (m.kind == "video") (len % 30).toInt + 1 else 1,
      feature = Array.tabulate(8)(i => (((c >>> (i * 8)) & 0xff).toFloat / 255.0f)))
  }

  /** Decode/feature-extract stage: binary in, typed features out. */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "kind", "content").as[MediaRow]
      .repartition(col("media_id"))
      .mapPartitions(_.map(fakeDecode))
  }

  /** Per-kind feature aggregate used by the q30 smoke query. */
  def kindStats(docs: DataFrame)(implicit spark: SparkSession): DataFrame =
    decode(mediaTable(docs)).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        max(col("width")).as("max_w"),
        max(col("height")).as("max_h"),
        sum(col("n_frames").cast("long")).as("total_frames"))
      .orderBy("kind")
}
