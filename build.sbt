ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkextensionsspark"
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
  // default matches the committed-bench convention (24g G1): BENCH_r*
  // and BENCH_LOCAL_r* are only comparable when both record
  // heap_max_mb 24576 (round-11 advice: an 89g driver run diverged 13%
  // from the 24g local runs). Override via SPARK_DRIVER_MEM for
  // experiments; the bench JSON records the live heap either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // pin the collector (G1 is the JDK 17 default, but an explicit pin
  // makes driver-run vs local bench totals comparable by construction;
  // the bench JSON records the live heap/GC so drift is visible)
  "-XX:+UseG1GC",
  // 32m regions (G1's maximum): the per-doc shingle-hash / signature
  // arrays the dedup gates allocate classify as HUMONGOUS under the
  // default region sizing at 24g, and their churn fragments the region
  // map — bisected round 16 to d_dup_spans_fuzzy's aftermath tripling a
  // later gate's GC (mm_dup_union gc_ms 29 s -> 5 s with 32m regions,
  // same code, same bytes). Larger regions keep those arrays ordinary
  // young-gen allocations.
  "-XX:G1HeapRegionSize=32m",
)

// Pre-size the heap to the cap for RUN JVMs only (Bench/Verify mains):
// G1 heap EXPANSION during the humongous-allocation gates left the
// region layout in a state that tripled the GC wall time of whichever
// allocation-heavy gate ran later in the same JVM (mm_dup_union
// 13 s -> 44-51 s with identical shuffle bytes, gc_ms 12 s -> 62-96 s,
// reproduced and bisected round 16); a fixed-size heap removes the
// expansion dynamic — the same comparable-by-construction rationale as
// the pinned collector above. Scoped to `run` so `sbt test` keeps the
// lazy 24g CAP and still starts on hosts that cannot reserve 24g up
// front (override either via SPARK_DRIVER_MEM).
Compile / run / javaOptions +=
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
