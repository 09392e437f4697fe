ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wrf_to_geodataframespark"
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
// Forked run output goes RAW to stdout (no sbt "[info] " prefix):
// the driver extracts graft.Bench's one-line JSON from stdout and the
// logger prefix defeated that extraction every round (BENCH_r* carried
// "parsed: null" — VERDICT r13 Next #6).
run / outputStrategy := Some(StdoutOutput)
// ...and suppress sbt's "[success] Total time: ..." trailer, which
// prints AFTER the forked JSON line and defeated the driver's
// last-line extraction even once the prefix was gone (BENCH_r14 still
// "parsed: null" — VERDICT r14 Next #1). With this, graft.Bench's
// one-line JSON is the final stdout line of `sbt "runMain graft.Bench"`.
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Starved heaps die with "Retried waiting for GCLocker too often"
  // before they are actually full: 32 tasks in lz4 JNI critical
  // sections block GC and the default 2 allocation retries give up
  // (measured on the 4 GiB Prep10M ladder rung). 64 retries lets the
  // allocation wait for the locker to drain; no effect on healthy heaps.
  "-XX:+UnlockDiagnosticVMOptions",
) ++ {
  // The GCLocker (and this diagnostic flag) was removed in JDK 22
  // (JDK-8318706); passing it there fails startup with an
  // unknown-flag error. Gate on the running major version — the
  // pinned toolchain is JDK 17, where the retry count is needed.
  val major = System.getProperty("java.version").split("[.+-]")(0).toInt
  if (major < 22) Seq("-XX:GCLockerRetryAllocationCount=64") else Seq.empty
}
