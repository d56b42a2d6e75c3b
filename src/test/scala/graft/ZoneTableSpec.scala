package graft

import graft.sources.ZoneTable
import graft.sources.ZoneTable.{Csv, Json, Orc, Parquet}

/** Round-trip every supported zone format with hive partitioning. */
class ZoneTableSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    ("a", 1, "2025-01-01"), ("b", 2, "2025-01-01"),
    ("c", 3, "2025-01-02"))

  test("parquet/orc/json/csv round-trip with partition columns") {
    Seq(Parquet, Orc, Json, Csv()).foreach { fmt =>
      val dir = tmpDir(s"zone-${fmt.name}").resolve("t").toString
      val df = rows.toDF("id", "n", "day")
      ZoneTable.write(df, dir, fmt, mode = "overwrite",
        partitionBy = Seq("day"))
      val back = ZoneTable.read(spark, dir, fmt)
        .selectExpr("id", "cast(n as int) n", "cast(day as string) day")
        .as[(String, Int, String)].collect().sorted.toSeq
      assert(back === rows.sorted, s"round-trip failed for ${fmt.name}")
      // partition pruning surface: day is a directory-derived column
      val pruned = ZoneTable.read(spark, dir, fmt)
        .filter($"day" === "2025-01-01").count()
      assert(pruned === 2, s"partition filter wrong for ${fmt.name}")
    }
  }
}
