package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** O16: observability. The reference wraps its parse loop in an X-Ray
  * subsegment and patches boto3 for tracing (/root/reference/lambda/main.py:7-17,46,65).
  * The Spark-native equivalents are listener-based: task/stage IO counters
  * from the SparkListener bus and per-micro-batch progress from the
  * StreamingQueryListener — no Catalyst changes, no hot-path cost.
  */
class PipelineMetrics extends SparkListener {
  val recordsRead = new LongAdder
  val bytesRead = new LongAdder
  val recordsWritten = new LongAdder
  val bytesWritten = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val tasks = new LongAdder

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      tasks.increment()
      recordsRead.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
      recordsWritten.add(m.outputMetrics.recordsWritten)
      bytesWritten.add(m.outputMetrics.bytesWritten)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def snapshot: Map[String, Long] = Map(
    "tasks" -> tasks.sum(),
    "records_read" -> recordsRead.sum(),
    "bytes_read" -> bytesRead.sum(),
    "records_written" -> recordsWritten.sum(),
    "bytes_written" -> bytesWritten.sum(),
    "shuffle_bytes_written" -> shuffleBytesWritten.sum())
}

object PipelineMetrics {
  /** Attach task-level counters to the session; caller keeps the handle. */
  def attach(spark: SparkSession): PipelineMetrics = {
    val m = new PipelineMetrics
    spark.sparkContext.addSparkListener(m)
    m
  }

  /** Surface LSH bucket-cap drop counts (the `*_lsh_cap` observe nodes in
    * Dedup.pairsFromBuckets) on every query execution that contains one —
    * the "logged drops" half of the giant-bucket guard. Returns the
    * listener so tests/ops can detach it.
    */
  def attachCapLogger(spark: SparkSession)
                     (onDrop: (String, Map[String, Long]) => Unit = defaultCapLog)
      : QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.endsWith("_cap"))
            onDrop(name, row.schema.fieldNames.map(f =>
              f -> (row.getAs[Any](f) match {
                case null => 0L
                case n: Number => n.longValue()
              })).toMap)
        }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    l
  }

  private def defaultCapLog(name: String, m: Map[String, Long]): Unit =
    if (m.getOrElse("dropped_buckets", 0L) > 0L)
      System.err.println(s"[graft] $name: dropped ${m("dropped_buckets")} giant " +
        s"bucket(s) holding ${m.getOrElse("dropped_ids", 0L)} ids " +
        s"(max bucket seen = ${m.getOrElse("max_bucket_size", 0L)})")

  /** Per-micro-batch progress log (rows/s per batch), the analogue of the
    * reference's per-invocation trace segment.
    */
  def attachStreaming(spark: SparkSession)(onProgress: String => Unit): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        onProgress(s"batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
          f"rows/s=${e.progress.processedRowsPerSecond}%.1f")
    }
    spark.streams.addListener(l)
    l
  }
}
