ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "processoetlspark"
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
  // Keep the heap at 8g: this box is a microVM where FIRST-TOUCH of
  // cold heap pages is kernel-expensive — a 32g heap measured q135 at
  // 98s vs 2.6s at 8g on identical code (G1 keeps evacuating into
  // never-touched regions, each fault a host page allocation). A small
  // heap the GC churns WITHIN beats a big one it wanders ACROSS.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 54 codegen-heavy queries (x warmup) overflow the default 240m code
  // cache; once full the JIT disables itself and late queries run
  // interpreted — seen as 3-8x spikes on unchanged queries late in a
  // bench run.
  // 69 codegen-heavy queries in one Bench JVM: 54 overflowed the 240m
  // default (JIT disables itself -> random 3-8x spikes on late queries,
  // q41 the usual victim); headroom scaled with the query count
  // 176 queries now: 768m left no margin; 1g.
  "-XX:ReservedCodeCacheSize=1024m",
)
// ad-hoc JVM flags for perf triage (GC logs etc.) without editing the build
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq
  .flatMap(_.split(" ").filter(_.nonEmpty))
