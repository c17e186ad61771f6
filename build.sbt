ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sdgbigdataspark"
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
// Pass the forked JVM's stdout straight through (no sbt "[info] " prefix):
// graft.Bench prints ONE bare JSON line that the driver must json-parse.
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
val graftMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
// extra forked-JVM flags (GC experiments, heap sizing) without a build
// edit: SPARK_GRAFT_JAVA_OPTS="-XX:+UseG1GC"
val graftExtraJvm = sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftMem",
  // Pre-size the heap: growth pauses during the first passes are pure
  // measurement noise on a batch workload.
  s"-Xms$graftMem",
) ++
  // Throughput GC for a batch engine: two reversed-order full-bench
  // pairs (321 queries, 3 passes, sf0.1, local[32]) read ParallelGC at
  // geomean 0.915 and 0.839 vs default G1 (306/321 queries faster in
  // the cleaner pair) AND far more stable totals (154.4 vs 154.9 s
  // across sessions, where G1 scattered 172.6→184.7). G1 optimizes
  // pause times this harness doesn't care about. Override by putting
  // any -XX:+Use*GC flag in SPARK_GRAFT_JAVA_OPTS.
  (if (graftExtraJvm.exists(_.matches("-XX:\\+Use\\w+GC"))) Seq.empty
   else Seq("-XX:+UseParallelGC")) ++
  graftExtraJvm
