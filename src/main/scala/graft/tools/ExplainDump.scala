package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for registry queries to files — the
  * plan evidence the optimization rounds commit under plans/rNN/.
  * Runs the query function under the same session shape as Bench
  * (local[N], shuffle=N, UTC, audit off) so the dumped plan is the
  * one the bench actually executes. Usage:
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,…> [sfDir] [cpus]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 4) args(4) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.sketchAudit", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), plan)
        println(s"[explain] wrote $q ($suffix)")
      } catch { case e: Throwable =>
        println(s"[explain] $q FAILED: $e")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      graft.queries.GlogFixtures.sweepClones()
    }
    spark.stop()
  }
}
