package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.sources.GraftLog

/** Column DEFAULTs on schema evolution (`ALTER TABLE … ADD COLUMN c T
  * DEFAULT d`, Delta's "exists default"): rows written BEFORE the
  * ALTER read the default (their lines simply lack the field — no
  * rewrite), rows written after carry explicit values, and an
  * explicitly-written NULL stays NULL. */
class DefaultValueSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      ($"id" % 100).cast("double").as("value"))

  test("pre-ALTER rows read the default; post-ALTER rows their values") {
    val dir = tmpDir("glog-dft").toString
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    GraftLog.addColumn(dir, "score", DoubleType, Some("1.5"))
    GraftLog.addColumn(dir, "tag", StringType, Some("legacy"))
    // new rows with explicit values, including an explicit NULL
    feed(100, 120)
      .withColumn("score", when($"event_id" < 110, lit(2.0)))
      .withColumn("tag", lit("fresh"))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    val df = spark.read.format(fmt).load(dir)
    // 100 old rows → default 1.5; 10 new explicit 2.0; 10 explicit NULL
    assert(df.groupBy($"score").count().as[(Option[Double], Long)]
      .collect().toMap === Map(Some(1.5) -> 100L, Some(2.0) -> 10L,
        None -> 10L),
      "short line → default; written value → value; written NULL → NULL")
    assert(df.filter($"tag" === "legacy").count() === 100L)
    assert(df.filter($"tag" === "fresh").count() === 20L)
    // columnar and row paths agree (metadata-column projection forces
    // the row reader)
    val viaRow = spark.read.format(fmt).load(dir)
      .select($"score", col("_shard")).groupBy($"score").count()
      .as[(Option[Double], Long)].collect().toMap
    assert(viaRow === Map(Some(1.5) -> 100L, Some(2.0) -> 10L,
      None -> 10L))
  }

  test("SQL ALTER TABLE ADD COLUMN DEFAULT via the catalog") {
    val base = tmpDir("glog-dft-cat").toString
    spark.conf.set("spark.sql.catalog.glogdft",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogdft.base", base)
    feed(0, 50).write.format(fmt).mode("append")
      .option("shards", 1).save(s"$base/t")
    spark.sql("ALTER TABLE glogdft.t ADD COLUMN weight BIGINT DEFAULT 7")
    assert(spark.sql("SELECT sum(weight) FROM glogdft.t").as[Long].head()
      === 350L, "50 pre-ALTER rows read the declared default")
    // a no-default ADD COLUMN still null-fills (back-compat)
    spark.sql("ALTER TABLE glogdft.t ADD COLUMN note STRING")
    assert(spark.sql(
      "SELECT count(*) FROM glogdft.t WHERE note IS NULL")
      .as[Long].head() === 50L)
  }

  test("defaults survive compact and feed constraint evaluation") {
    val dir = tmpDir("glog-dft2").toString
    feed(0, 80).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    GraftLog.addColumn(dir, "w", LongType, Some("3"))
    // a constraint over the evolved column: existing rows validate
    // through their DEFAULT (the value they read back as)
    GraftLog.addConstraint(spark, dir, "w_pos", "w > 0")
    // compact materializes the defaults physically; values unchanged
    GraftLog.compact(spark, dir, 1)
    val df = spark.read.format(fmt).load(dir)
    assert(df.agg(sum($"w")).as[Long].head() === 240L)
    // the upsert path pads with the DEFAULT for constraint eval: a
    // base-only upsert row reads back w=3 > 0 → passes
    GraftLog.mergeRows(dir, Seq((5L,
      1704067200000000L, 1L, "fixed", 9.0)))
    assert(spark.read.format(fmt).load(dir)
      .filter($"event_id" === 5L).select($"w").as[Long].head() === 3L)
    // malformed defaults rejected at declaration
    intercept[Exception] {
      GraftLog.addColumn(dir, "bad", LongType, Some("not_a_long"))
    }
    intercept[IllegalArgumentException] {
      GraftLog.addColumn(dir, "bad2", StringType, Some("a|b"))
    }
  }

  test("empty string at the last evolved position round-trips") {
    // trailing-empty-field regression (split must keep trailing
    // empties): an empty-string DEFAULT renders as `name|string|`
    // and a data line whose LAST evolved string value is "" ends in
    // '|' — both must read back as "", never as missing/NULL/default
    val dir = tmpDir("glog-dft-empty").toString
    feed(0, 40).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    GraftLog.addColumn(dir, "tag", StringType, Some(""))
    feed(40, 60)
      .withColumn("tag",
        when($"event_id" < 45, lit("x"))
          .when($"event_id" < 50, lit(""))) // 10 explicit NULL
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    def censusOf(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"tag").count().as[(Option[String], Long)]
      .collect().toMap
    val want = Map(Some("") -> 45L, // 40 exists-default "" + 5 written ""
      Some("x") -> 5L, None -> 10L)
    assert(censusOf(spark.read.format(fmt).load(dir)) === want,
      "columnar path: written '' stays '', default '' applies, NULL stays")
    assert(censusOf(spark.read.format(fmt).load(dir)
      .withColumn("_s", col("_shard")).drop("_s")) === want)
    val viaRow = spark.read.format(fmt).load(dir)
      .select($"tag", col("_shard")).groupBy($"tag").count()
      .as[(Option[String], Long)].collect().toMap
    assert(viaRow === want, "row path agrees")
  }
}
