package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan evidence for ITERATIVE operators: the registry queries
  * localCheckpoint each round, so a plain `.explain` of the returned
  * frame shows only the post-loop tail (the r15 verdict's complaint —
  * "the q100 dump proves nothing"). This tool registers a
  * QueryExecutionListener and dumps the executed plan of EVERY action
  * the query runs — per-round checkpoint materializations included —
  * so the in-loop join strategy (broadcast vs exchange) is visible
  * and committable. Measurement-only; not on the bench path.
  * Usage: runMain graft.tools.ExplainLoop <outDir> <suffix> <q1,…> [sfDir] [cpus]
  */
object ExplainLoop {
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
    val plans = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        plans.add(s"==== action: $funcName (${durationNs / 1000000} ms)\n" +
          qe.explainString(org.apache.spark.sql.execution.SimpleMode))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    names.foreach { q =>
      plans.clear()
      try {
        graft.SparkEntry.queries(q)(spark, dir).count()
        Thread.sleep(1500) // listener bus is async — let it drain
        val sb = new StringBuilder
        plans.forEach(p => { sb.append(p).append('\n'); () })
        Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"),
          sb.toString)
        println(s"[explain-loop] wrote $q ($suffix): " +
          s"${plans.size} executed plans")
      } catch { case e: Throwable =>
        println(s"[explain-loop] $q FAILED: $e")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      graft.queries.GlogFixtures.sweepClones()
    }
    spark.stop()
  }
}
