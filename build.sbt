ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datawarehouseetlusinghyperjoinspark"
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
// The bench/verify harness json-parses the tail of sbt's stdout. Two
// things broke that in every round so far (BENCH_r0{1,2,3}.json all
// show "parsed": null): the logger's "[info] " prefix on each forked-
// process line, and the trailing "[success] Total time" banner landing
// after the JSON line. Stream forked output raw and drop the banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // local[32] = one JVM doing all executor work: size the heap for 32
  // concurrent tasks (the box has 125 GiB; 8g thrashes GC under shuffle).
  // Xms=Xmx + AlwaysPreTouch: with a lazily-grown heap, G1's
  // grow/uncommit cycles left multi-query sessions spending 50-70% of
  // CPU in the kernel zeroing pages — observed as random 30-100x
  // slowdowns on whichever query ran during a growth phase.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // 40+ codegen'd queries in one JVM overflow the default 240m code
  // cache; the sweeper then deoptimizes hot loops mid-bench
  "-XX:ReservedCodeCacheSize=1g",
)
