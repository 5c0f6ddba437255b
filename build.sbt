ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hivejsonspark"
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
// the 10x scale-smoke suite is excluded from the default run (it
// synthesizes multi-thousand-doc corpora and measures wall-time);
// run it explicitly with:
//   sbt -batch "set Test/testOptions := Seq()" "testOnly graft.ops.ScaleSmokeSpec"
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTag")
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
scalacOptions ++= Seq("-deprecation")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // r17 bench finding: a 258-query suite generates enough whole-stage
  // codegen classes to pressure the default 240 MB code cache — with
  // flushing, LATE queries' hot loops stop getting JIT-compiled and
  // ran 3-4x their isolated steady state (q127 suite 4.1s vs 0.9s
  // isolated, both passes slow). Headroom keeps late-suite queries in
  // compiled code; irrelevant to correctness, sized well under the
  // sandbox budget.
  "-XX:ReservedCodeCacheSize=512m",
)
