package graft

import java.nio.file.Files
import scala.sys.process.{Process, ProcessLogger}

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[graft.engine.HiveSmoke]] in a CHILD JVM: the suite-wide
  * session pins `spark.sql.catalogImplementation=in-memory` for its
  * SharedState, so the hive-catalog path (walden's metastore,
  * `docker/metastore/Dockerfile:6-12`) must come up in its own process
  * to be exercised honestly.
  */
class HiveSmokeSpec extends AnyFunSuite {

  // same list build.sbt passes to forked test/run JVMs (Spark on JDK 17)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("hive-metastore catalog DDL cycle + persistence (child JVM, derby)") {
    val base = Files.createTempDirectory("graft_hive").toString
    val java = s"${System.getProperty("java.home")}/bin/java"
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx3g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.engine.HiveSmoke", base)
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.synchronized { out.append(l).append('\n') })
    val code = Process(cmd).!(logger)
    val text = out.toString()
    assert(code == 0, s"HiveSmoke exited $code:\n${text.takeRight(4000)}")
    assert(text.contains("HIVE_SMOKE> phase1 rows=4"), text.takeRight(2000))
    assert(text.contains("HIVE_SMOKE> phase2 persistent"), text.takeRight(2000))
    assert(text.contains("HIVE_SMOKE> OK"), text.takeRight(2000))
  }
}
