package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{KplDeaggregate, LenientTimestamp, TryGunzip}

/** SparkSessionExtensions hook: makes the engine's custom expressions
  * available to plain `spark.sql(...)` users via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * or `SparkSession.builder.withExtensions(new GraftExtensions)`. This is the
  * idiomatic extension seam — no session-state mutation, works on connect-
  * style deployments, and survives session cloning.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, "", name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("try_gunzip"),
      info("try_gunzip", "try_gunzip(bin) - inflate gzip values, pass through others"),
      (es: Seq[Expression]) => TryGunzip(es.head)))
    e.injectFunction((FunctionIdentifier("lenient_ts"),
      info("lenient_ts", "lenient_ts(str[, zone]) - dateutil-grade timestamp parse"),
      (es: Seq[Expression]) => es match {
        case Seq(c) => LenientTimestamp(c, "UTC")
        case Seq(c, z) => LenientTimestamp(c,
          z.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
        case _ => throw new IllegalArgumentException("lenient_ts takes 1 or 2 args")
      }))
    e.injectFunction((FunctionIdentifier("kpl_deaggregate"),
      info("kpl_deaggregate", "kpl_deaggregate(bin) - explode KPL aggregate records"),
      (es: Seq[Expression]) => KplDeaggregate(es.head)))
  }
}
