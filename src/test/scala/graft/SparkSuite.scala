package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession for the whole test JVM (guide: one per suite via
  * lazy val; a process-wide singleton is cheaper still and safe —
  * getOrCreate returns the same session). */
object SparkSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // register up front: individual tests must not depend on an
    // earlier test having read a table (which registers as a side
    // effect) — `testOnly X -- -z <one test>` runs in isolation too
    graft.functions.GraftFunctions.register(s)
    graft.plans.GraftExtensions.install(s)
    s
  }
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark

  def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  def writeText(dir: Path, name: String, content: String): Path = {
    Files.createDirectories(dir)
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p
  }

  val sf0001 = "/root/testdata/sf0.001"
}
