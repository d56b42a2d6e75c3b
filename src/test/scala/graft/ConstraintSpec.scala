package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.sources.GraftLog

/** Write-time CHECK constraints (`GraftLog.addConstraint` /
  * `CALL glog.add_constraint`): named SQL predicates enforced in
  * every row-landing path — batch append, INSERT OVERWRITE, the CoW
  * UPDATE rewrite, streaming epochs — with Delta's declaration rule
  * (existing data must already satisfy) and SQL tri-state (NULL
  * passes, only FALSE violates). A violating write aborts with NO
  * partial commit. */
class ConstraintSpec extends SparkSuite {
  import spark.implicits._

  private val fmt = "graft.sources.GraftLogSource"

  private def feed(lo: Int, hi: Int, value: Column = ($"id" % 100)
      .cast("double")) = spark.range(lo, hi)
    .select($"id".as("event_id"),
      to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
      ($"id" % 7).as("user_id"), lit("click").as("event_type"),
      value.as("value"))

  private def freshLog(n: Int): String = {
    val dir = tmpDir("glog-ck").toString
    feed(0, n).write.format(fmt).mode("append")
      .option("shards", 2).save(dir)
    dir
  }

  private def count(dir: String): Long =
    spark.read.format(fmt).load(dir).count()

  test("a violating append aborts with no partial commit") {
    val dir = freshLog(200)
    GraftLog.addConstraint(spark, dir, "value_nonneg", "value >= 0")
    assert(GraftLog.constraints(dir) ===
      Seq(("value_nonneg", "value >= 0")))
    // good rows pass
    feed(200, 300).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    assert(count(dir) === 300L)
    // a batch with ONE bad row among many commits NOTHING
    val before = GraftLog.listShards(dir).map(_.file).sorted
    val e = intercept[Exception] {
      feed(300, 400,
        when($"id" === 350, lit(-1.0)).otherwise(lit(2.0)))
        .write.format(fmt).mode("append").option("shards", 1).save(dir)
    }
    assert(e.getMessage != null)
    assert(count(dir) === 300L, "no partial commit")
    assert(GraftLog.listShards(dir).map(_.file).sorted === before)
  }

  test("declaration validates existing data; coercion is the engine's") {
    val dir = freshLog(100)
    // existing rows have value in [0, 100) — a tighter bound fails
    val e = intercept[IllegalArgumentException] {
      GraftLog.addConstraint(spark, dir, "too_tight", "value > 50")
    }
    assert(e.getMessage.contains("existing rows"))
    assert(GraftLog.constraints(dir).isEmpty)
    // integer literal against a double column: analyzer coercion
    GraftLog.addConstraint(spark, dir, "v", "value BETWEEN 0 AND 99")
    feed(100, 150).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    assert(count(dir) === 150L)
    // unresolvable predicates are rejected at declaration
    intercept[IllegalArgumentException] {
      GraftLog.addConstraint(spark, dir, "bad", "no_such_col > 0")
    }
  }

  test("the CoW UPDATE rewrite is gated too") {
    val base = tmpDir("glog-ck-cat").toString
    spark.conf.set("spark.sql.catalog.glogck",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogck.base", base)
    val dir = s"$base/t"
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    GraftLog.addConstraint(spark, dir, "v_cap", "value <= 1000")
    // an UPDATE that stays under the cap works
    spark.sql("UPDATE glogck.t SET value = value + 100 " +
      "WHERE event_id < 10")
    assert(spark.sql(
      "SELECT count(*) FROM glogck.t WHERE value >= 100").as[Long].head()
      === 10L)
    // one that breaks it aborts, table unchanged
    val pre = spark.sql("SELECT sum(value) FROM glogck.t")
      .as[Double].head()
    intercept[Exception] {
      spark.sql("UPDATE glogck.t SET value = value + 10000 " +
        "WHERE event_id < 5")
    }
    assert(spark.sql("SELECT sum(value) FROM glogck.t")
      .as[Double].head() === pre, "failed UPDATE committed nothing")
  }

  test("NULL evaluates as pass (SQL CHECK tri-state)") {
    val dir = freshLog(50)
    GraftLog.addColumn(dir, "score", org.apache.spark.sql.types.DoubleType)
    GraftLog.addConstraint(spark, dir, "score_pos", "score > 0")
    // rows with NULL score pass the check
    spark.range(50, 80)
      .select($"id".as("event_id"),
        to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
        ($"id" % 7).as("user_id"), lit("click").as("event_type"),
        ($"id" % 100).cast("double").as("value"),
        lit(null).cast("double").as("score"))
      .write.format(fmt).mode("append").option("shards", 1).save(dir)
    assert(count(dir) === 80L)
    // a FALSE on the evolved column still violates
    intercept[Exception] {
      spark.range(80, 90)
        .select($"id".as("event_id"),
          to_timestamp_ntz(lit("2024-01-01 00:00:00")).as("ts"),
          ($"id" % 7).as("user_id"), lit("click").as("event_type"),
          ($"id" % 100).cast("double").as("value"),
          lit(-1.0).as("score"))
        .write.format(fmt).mode("append").option("shards", 1).save(dir)
    }
    assert(count(dir) === 80L)
  }

  test("streaming epochs are gated too; a violating batch commits nothing") {
    val dir = freshLog(100)
    GraftLog.addConstraint(spark, dir, "v_nonneg", "value >= 0")
    val src = tmpDir("glog-ck-src").toString
    // epoch 1 clean, epoch 2 carries one violating row
    feed(100, 150).write.mode("append").parquet(src)
    def drain(cp: String): Unit = {
      val q = spark.readStream.schema(
          spark.read.parquet(src).schema).parquet(src)
        .withColumn("ts", $"ts".cast("timestamp"))
        .writeStream.format(fmt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .start(dir)
      q.awaitTermination(120000)
    }
    drain(tmpDir("glog-ck-cp1").toString)
    assert(count(dir) === 150L, "the clean epoch lands")
    feed(150, 200, when($"id" === 170, lit(-9.0)).otherwise(lit(1.0)))
      .write.mode("append").parquet(src)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(tmpDir("glog-ck-cp2").toString)
    }
    assert(e.toString.contains("v_nonneg") ||
      Option(e.getCause).exists(_.toString.contains("v_nonneg")) ||
      count(dir) === 150L)
    assert(count(dir) === 150L,
      "the violating epoch committed nothing (no partial shards)")
  }

  test("drop_constraint lifts the gate; CALL surface works") {
    val base = tmpDir("glog-ck2-cat").toString
    spark.conf.set("spark.sql.catalog.glogck2",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.glogck2.base", base)
    val dir = s"$base/t"
    feed(0, 100).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    val n = spark.sql(
      "CALL glogck2.add_constraint(table => 't', name => 'vn', " +
        "expr => 'value >= 0')").as[Int].head()
    assert(n === 1)
    intercept[Exception] {
      feed(100, 110, lit(-5.0)).write.format(fmt).mode("append")
        .option("shards", 1).save(dir)
    }
    assert(spark.sql(
      "CALL glogck2.drop_constraint(table => 't', name => 'vn')")
      .as[Boolean].head() === true)
    feed(100, 110, lit(-5.0)).write.format(fmt).mode("append")
      .option("shards", 1).save(dir)
    assert(count(dir) === 110L, "dropped constraint no longer gates")
  }
}
