package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dumps the formatted physical plan for each (or one named) query —
  * the review loop for pushdown/broadcast/codegen checks:
  * `sbt "runMain graft.tools.ExplainAudit [queryName] [sfDir]"`. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.headOption match {
      case Some(n) if n != "all" => Seq(n)
      case _ => SparkEntry.queries.keys.toSeq.sorted
    }
    names.foreach { n =>
      println(s"\n================ $n ================")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
