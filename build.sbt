ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hpmrspark"
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
// Inherit the parent's stdout/stderr directly: without this, sbt's logger
// prefixes every forked-run line with [info], which broke the driver's
// parse of Bench's single JSON output line in round 1 (BENCH_r01 parsed:null).
Compile / run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The 143-query inventory compiles thousands of codegen classes per
  // bench/verify session (LocalSpark raises the codegen class cache for
  // the same reason); the JVM default 240 MB code cache can fill and
  // silently disable the JIT mid-run — headroom keeps compiled code hot.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Debug hook for the FORKED test/run JVMs (sbt's own JAVA_OPTS doesn't
  // reach them): e.g. GRAFT_TEST_OPTS="-Dgraft.cc.debug=true" surfaces
  // the per-round component-loop timings inside a forked ScaleProbeSpec.
  sys.env.get("GRAFT_TEST_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))

// ScaleProbeSpec asserts on WALL TIME (10x corpus must stay ~linear); in
// the shared test JVM it runs after ~19 suites whose accumulated heap and
// cached-RDD cleanup debt inflated a measured-linear 10x run by an order
// of magnitude (ratios 19-40x vs 2-4x in a clean JVM — same commit, same
// machine). Forked test groups run one-at-a-time (sbt's default
// Tags.ForkedTestGroup limit), so giving the probe its own JVM restores
// honest timing without letting two test JVMs contend.
Test / testGrouping := {
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val (timed, rest) = (Test / definedTests).value
    .partition(_.name == "graft.ScaleProbeSpec")
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(opts)),
    Tests.Group("timed-probes", timed, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
