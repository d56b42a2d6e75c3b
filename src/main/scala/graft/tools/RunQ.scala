package graft.tools
import org.apache.spark.sql.SparkSession
object RunQ {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.plans.GraftExtensions.install(spark)
    args(0).split(",").foreach { q =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.show(50, false)
      println(f"$q took ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
