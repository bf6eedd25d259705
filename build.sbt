ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "servicealertsconnectorspark"
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
// Default `sbt test` excludes graft.LongRun-tagged depth/soak tests so the
// correctness surface finishes inside the driver's test window (the r19
// full suite overran it); SPARK_GRAFT_FULL_TESTS=1 runs everything.
Test / testOptions ++= (
  if (sys.env.contains("SPARK_GRAFT_FULL_TESTS")) Seq()
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.LongRun")))
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
  // A full bench run compiles thousands of Janino whole-stage classes
  // (178 entries x 4 executions); the JDK default 240 MB code cache can
  // fill late in the run, and code-cache flushing then de-optimizes hot
  // task loops back to the interpreter — the signature of the r20 c8
  // one-rep CPU spikes (task-thread CPU, late sequence position,
  // transient). Not a scale-dependent tuning: any long-lived driver JVM
  // running this many distinct plans needs the headroom.
  "-XX:ReservedCodeCacheSize=512m",
)
