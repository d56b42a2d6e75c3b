package graft

import org.apache.spark.sql.functions._

import graft.store.{IncrementalAgg, Retention}
import graft.store.IncrementalAgg.Spec

/** Lake maintenance ops: incremental aggregate refresh ≡ full
  * recompute; retention deletes exactly the expired partitions. */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("incremental refresh over 3 increments equals one full recompute") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_returnflag", $"l_quantity", $"l_extendedprice")
    val spec = Spec(keys = Seq("l_returnflag"),
      sums = Seq("l_quantity"), mins = Seq("l_extendedprice"),
      maxs = Seq("l_extendedprice"))
    val parts = Seq(
      li.filter($"l_orderkey" % 3 === 0),
      li.filter($"l_orderkey" % 3 === 1),
      li.filter($"l_orderkey" % 3 === 2))
    val path = tmpDir("incagg").resolve("gold").toString
    parts.foreach(p => IncrementalAgg.refresh(spark, path, p, spec))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"l_returnflag", $"n_rows",
          $"sum_l_quantity".cast("double"),
          $"min_l_extendedprice", $"max_l_extendedprice")
        .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val incremental = canon(spark.read.parquet(path))
    val full = canon(IncrementalAgg.aggregate(li, spec))
    assert(incremental === full)
    // refreshing with an EMPTY increment is a no-op
    IncrementalAgg.refresh(spark, path, li.limit(0), spec)
    assert(canon(spark.read.parquet(path)) === full)
  }

  test("retention expires exactly the partitions below the cutoff") {
    val dir = tmpDir("retention").resolve("t").toString
    Tables.table(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "cast(o_orderdate as string) AS d")
      .selectExpr("o_orderkey", "substr(d, 1, 7) AS month")
      .write.partitionBy("month").parquet(dir)
    val months = spark.read.parquet(dir)
      .select($"month").distinct().as[String].collect().sorted
    assert(months.length > 3, "fixture must have several partitions")
    val cutoff = months(2) // keep from the 3rd month on
    val expired = Retention.expire(spark, dir, "month", cutoff)
    assert(expired === months.take(2).toSeq)
    val left = spark.read.parquet(dir)
      .select($"month").distinct().as[String].collect().sorted
    assert(left.toSeq === months.drop(2).toSeq)
    // expired rows are gone, surviving rows intact
    assert(Retention.expire(spark, dir, "month", cutoff) === Nil,
      "second run is a no-op")
  }
}
