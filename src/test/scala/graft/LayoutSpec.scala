package graft

import graft.model.Model.TableKind
import graft.store.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("writeSorted: partitioned layout round-trips and prunes") {
    val dir = tmpDir("layout").resolve("t").toString
    val df = Tables.table(spark, sf0001, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
        "cast(o_orderdate as date) AS order_date",
        "year(o_orderdate) AS order_year")
    Layout.writeSorted(df, dir,
      partitionCols = Seq("order_year"), sortCols = Seq("o_orderkey"))
    val back = spark.read.parquet(dir)
    assert(back.count() === df.count())
    // partition pruning surface
    val y96 = back.filter($"order_year" === 1996)
    assert(y96.count() === df.filter($"order_year" === 1996).count())
    // within each file, the sort key is non-decreasing
    import org.apache.spark.sql.functions._
    val violations = back
      .withColumn("f", input_file_name())
      .withColumn("prev", lag($"o_orderkey", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"f").orderBy(monotonically_increasing_id())))
      .filter($"prev".isNotNull && $"prev" > $"o_orderkey")
      .count()
    assert(violations === 0, "rows sorted within files")
  }

  test("unknown-table merge guard raises (reference C6 semantics)") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.mergeToWarehouse(spark, "/tmp/nope", "/tmp/nope2",
        TableKind.Unrecognized("mystery"), "2025-01-01")
    }
    assert(e.getMessage.contains("no upsert config"))
  }
}
