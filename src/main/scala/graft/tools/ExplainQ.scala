package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    graft.plans.GraftExtensions.install(spark)
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.explain("formatted")
    spark.stop()
  }
}
