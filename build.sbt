ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "terraformawslambdakinesistos3spark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// r12: forked-run stdout must reach the console UNPREFIXED — the default
// LoggedOutput strategy stamps "[info] " on every line, which breaks any
// line-based JSON parse of the bench's one-line total (every
// BENCH_r01..r11.json shows "parsed": null). StdoutOutput passes the
// child's stdout/stderr straight through.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (box has 128 GiB): r7/r8 showed the 132-query bench and
  // iterative graph ops GC-thrashing in 8g — a 3x headroom bump removes
  // old-gen pressure as a variance source. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // r11, measured root cause of the gram-family bench variance (one pass
  // in ~6 burning 7-10x the TASK CPU on byte-identical shuffles — q140
  // 280s-cpu vs 40s-cpu normal, GC/shuffle/spill/peak-mem all flat):
  // HotSpot refuses to JIT methods over 8000 bytecodes
  // (DontCompileHugeMethods), and q140's 5-join whole-stage-codegen
  // method exceeds that, so whether the pass ran compiled or INTERPRETED
  // was profiler luck. 12-pass A/B: bursts 2-in-10 before, zero after,
  // worst pass 11.8s -> 5.9s, median 4.7 -> 3.3s. The code-cache bump
  // keeps 240 queries x 3 passes of generated classes resident (240 MB
  // default flushes hot code mid-run).
  "-XX:-DontCompileHugeMethods",
  "-XX:ReservedCodeCacheSize=1g",
  // Second failure mode, same symptom (q202 pass burning 280s task CPU
  // with only 6 fresh codegen fragments): generated joins deopt on
  // uncommon traps, and once a method crosses the per-method/bytecode
  // RECOMPILATION cutoff HotSpot banishes it to the interpreter for the
  // rest of the JVM. Unlimited recompilation keeps the worst case at
  // "recompile again" instead of "interpret a 100M-row loop". 8-pass A/B
  // on the q135/q137/q202 trio: bursts gone, task CPU flat at ~30s.
  "-XX:PerMethodRecompilationCutoff=-1",
  "-XX:PerBytecodeRecompilationCutoff=-1",
  // static SQL conf, read from system properties by every SparkSession
  // in the JVM (Bench/Verify set it on the builder too; this covers the
  // ScalaTest sessions): the 100-entry default evicts constantly under
  // this catalog's fragment count
  "-Dspark.sql.codegen.cache.maxEntries=10000",
)
