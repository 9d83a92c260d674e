ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airflowetlfinancemarketspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The streaming gates' teardown hygiene calls System.gc() (measured in
  // round 9 as the fix for 20-38 s q119 run-order variance at 100x). Under
  // the default G1 behavior that is a stop-the-world FULL collection paid
  // INSIDE 11+ timed gate queries per bench pass — measured r19-opt at
  // sf0.1 as 0.3-2 s per gate query (q85 2.96->2.28 s, q87 5.95->4.24 s,
  // q165 6.42->5.31 s, alternating legs). This flag keeps the deterministic
  // reclamation trigger but runs it as a CONCURRENT G1 cycle: the gate
  // thread pays only the initiation pause, and the off-thread cycle still
  // processes the ContextCleaner's weak refs. A/B legs with the flag match
  // the gc-removed legs within noise while preserving the hygiene call.
  "-XX:+ExplicitGCInvokesConcurrent",
)
