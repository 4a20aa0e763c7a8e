package graft.functions

import java.security.MessageDigest
import scala.collection.mutable.ArrayBuffer

/** KPL (Kinesis Producer Library) aggregate-record deaggregation.
  *
  * The reference depends on `aws_kinesis_agg` to unpack these inside
  * `kinesis.parse_records` (/root/reference/lambda/requirements.txt:4, call
  * site /root/reference/lambda/main.py:47). The wire format is public
  * (awslabs/kinesis-aggregation):
  *
  *   [4-byte magic F3 89 9A C2][protobuf AggregatedRecord][16-byte MD5 of protobuf]
  *
  *   message AggregatedRecord {
  *     repeated string partition_key_table    = 1;
  *     repeated string explicit_hash_key_table = 2;
  *     repeated Record records                = 3;
  *   }
  *   message Record {
  *     required uint64 partition_key_index    = 1;
  *     optional uint64 explicit_hash_key_index = 2;
  *     required bytes  data                   = 3;
  *   }
  *
  * We hand-roll the tiny protobuf subset needed (varints + length-delimited
  * fields) rather than pulling a protobuf dependency. A record that is not a
  * KPL aggregate (no magic, or digest mismatch) deaggregates to itself —
  * matching the library's passthrough behavior for plain records.
  */
object Kpl {
  private val Magic = Array(0xf3, 0x89, 0x9a, 0xc2).map(_.toByte)

  def isAggregate(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length > 20 &&
      bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3)

  /** One Kinesis record → 1..N user-record payloads. */
  def deaggregate(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (!isAggregate(bytes)) return if (bytes == null) Nil else Seq(bytes)
    val body = java.util.Arrays.copyOfRange(bytes, 4, bytes.length - 16)
    val digest = java.util.Arrays.copyOfRange(bytes, bytes.length - 16, bytes.length)
    val md5 = MessageDigest.getInstance("MD5").digest(body)
    if (!java.util.Arrays.equals(md5, digest)) return Seq(bytes) // not actually KPL
    try parseAggregatedRecord(body) catch { case _: Exception => Seq(bytes) }
  }

  private def parseAggregatedRecord(body: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < body.length) {
      val (tag, p1) = readVarint(body, pos)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      pos = p1
      wire match {
        case 2 => // length-delimited
          val (len, p2) = readVarint(body, pos)
          val end = p2 + len.toInt
          if (field == 3) out += recordData(body, p2, end) // Record
          pos = end
        case 0 => pos = readVarint(body, pos)._2
        case 5 => pos += 4
        case 1 => pos += 8
        case _ => throw new IllegalArgumentException(s"bad wire type $wire")
      }
    }
    out.toSeq
  }

  /** Extract field 3 (`data`) of an embedded Record message. */
  private def recordData(b: Array[Byte], start: Int, end: Int): Array[Byte] = {
    var pos = start
    var data: Array[Byte] = Array.emptyByteArray
    while (pos < end) {
      val (tag, p1) = readVarint(b, pos)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      pos = p1
      wire match {
        case 2 =>
          val (len, p2) = readVarint(b, pos)
          if (field == 3) data = java.util.Arrays.copyOfRange(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case 0 => pos = readVarint(b, pos)._2
        case 5 => pos += 4
        case 1 => pos += 8
        case _ => throw new IllegalArgumentException(s"bad wire type $wire")
      }
    }
    data
  }

  private def readVarint(b: Array[Byte], start: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var pos = start
    while (true) {
      val x = b(pos); pos += 1
      v |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) return (v, pos)
      shift += 7
      if (shift > 63) throw new IllegalArgumentException("varint too long")
    }
    (v, pos)
  }

  // ---- test-support encoder (used by ScalaTest fixtures only) ----

  /** Build a KPL aggregate of the given payloads (single partition key). */
  def aggregate(payloads: Seq[Array[Byte]], partitionKey: String = "pk"): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    writeLenDelim(body, 1, partitionKey.getBytes("UTF-8"))
    payloads.foreach { p =>
      val rec = new java.io.ByteArrayOutputStream()
      writeVarintField(rec, 1, 0L) // partition_key_index
      writeLenDelim(rec, 3, p)
      writeLenDelim(body, 3, rec.toByteArray)
    }
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic.map(_.toInt).map(_ & 0xff).toArray.map(_.toByte))
    out.write(b)
    out.write(MessageDigest.getInstance("MD5").digest(b))
    out.toByteArray
  }

  private def writeVarint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    o.write(v.toInt)
  }
  private def writeVarintField(o: java.io.ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeVarint(o, (field << 3) | 0); writeVarint(o, v)
  }
  private def writeLenDelim(o: java.io.ByteArrayOutputStream, field: Int, data: Array[Byte]): Unit = {
    writeVarint(o, (field << 3) | 2); writeVarint(o, data.length.toLong); o.write(data)
  }
}
