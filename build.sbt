ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rabbitsketchspark"
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
// Pass the forked JVM's stdout through unprefixed: Bench's contract is ONE
// machine-parseable JSON line on stdout, and sbt's default LoggedOutput
// prepends "[info] " to it (BENCH_r{1,2,3}.json all show parsed:null —
// the harness could not find a bare JSON line in the output).
run / outputStrategy := Some(StdoutOutput)
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
// Panama Vector API (incubator in JDK 17) for the SIMD MinHash kernel
// (graft.sketch.VectorMinHash); JVMs launched without the flag (e.g. plain
// spark-submit executors) fall back to the scalar loop via the
// MinHash.vectorKernelUsable probe.
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // fixed, pre-touched heap: lazily growing/faulting tens of GB mid-job puts
  // the kernel page-zeroing storm (90%+ sys time) inside whatever stage runs
  // first — pre-touch moves it to JVM startup, outside all measurements
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // ParallelGC over G1: pure-throughput batch jobs with a fixed pre-touched
  // heap measured ~7% faster wall at BOTH 8 and 32 cores on the e2e pipeline
  // (ScaleProbe A/B, sf0.1); pause times are irrelevant here
  sys.env.getOrElse("GRAFT_GC", "-XX:+UseParallelGC"),
  sys.env.getOrElse("GRAFT_GCLOG", "-Dgraft.gclog.off=1"),
)
