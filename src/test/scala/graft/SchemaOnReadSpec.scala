package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read tolerance at the source layer (SURVEY §1.2; the
  * reference's own contract is dynamic at the edges — CSV inferSchema,
  * DynamicFrame schema-on-read). `events.ts` has shipped in two
  * physical encodings so far: parquet TIMESTAMP(NANOS) (surfaced as
  * int64 nanos under `nanosAsLong`) and standard timestamp[us]
  * (surfaced as TIMESTAMP_NTZ from pyarrow's isAdjustedToUTC=false
  * default). A testdata regeneration swapping one for the other must
  * not change a single query result — r7 lost 30 of 141 queries to
  * exactly that, so this spec writes BOTH encodings (plus session-TZ
  * timestamp) to tmp parquet and asserts identical output through
  * [[Tables.normalizeEventsTs]] for batch and streaming reads.
  */
class SchemaOnReadSpec extends SparkSuite {

  // 2021-03-04T05:06:07.123456Z and a second-day value, as epoch micros
  private val us1 = 1614834367123456L
  private val us2 = us1 + 86400L * 1000000L + 999999L

  /** Write the same two logical rows under one ts encoding. */
  private def writeEncoded(enc: String): String = {
    val out = tmpDir(s"graft_sor_${enc}_").toString + "/events.parquet"
    val base = spark.range(2).select(
      col("id").as("event_id"),
      (col("id") + 100L).as("user_id"),
      when(col("id") === 0, lit(us1)).otherwise(lit(us2)).as("us"),
      lit("view").as("event_type"),
      lit(1.5).as("value"))
    val df = enc match {
      case "long_nanos" => base.withColumn("ts", col("us") * 1000L)
      case "timestamp_ntz" =>
        base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      case "timestamp" => base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.drop("us").write.mode("overwrite").parquet(out)
    out
  }

  private val encodings = Seq("long_nanos", "timestamp_ntz", "timestamp")

  test("normalizeEventsTs: all encodings yield identical canonical rows") {
    val results = encodings.map { enc =>
      val path = writeEncoded(enc)
      val df = Tables.normalizeEventsTs(spark.read.parquet(path))
      assert(df.schema("ts").dataType === TimestampType,
        s"$enc must normalize to session-TZ TIMESTAMP")
      enc -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }.toMap
    val expected = Seq((0L, us1), (1L, us2))
    results.foreach { case (enc, rows) =>
      assert(rows === expected, s"encoding $enc")
    }
  }

  test("a windowed aggregation is encoding-invariant") {
    val outs = encodings.map { enc =>
      val dir = writeEncoded(enc).stripSuffix("/events.parquet")
      Tables.table(spark, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("w.start").cast("date").as("day"), col("event_type"),
          col("n"), col("v"))
        .orderBy("day").collect().toSeq
    }
    assert(outs.distinct.size === 1,
      s"window agg differs across encodings: $outs")
  }

  test("streaming read normalizes like batch") {
    encodings.foreach { enc =>
      val dir = writeEncoded(enc).stripSuffix("/events.parquet")
      val stream = Tables.eventsStream(spark, dir)
      assert(stream.isStreaming)
      assert(stream.schema("ts").dataType === TimestampType, s"$enc streaming")
    }
  }

  test("legacy INT96 parquet timestamps normalize identically too") {
    // the fourth physical encoding a feed can arrive in (old
    // Hive/Impala writers); Spark surfaces INT96 as TIMESTAMP, so the
    // normalizer's pass-through branch must hold value-exactly
    val out = tmpDir("graft_sor_int96_").toString + "/events.parquet"
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      spark.range(2).select(
          col("id").as("event_id"),
          when(col("id") === 0, lit(us1)).otherwise(lit(us2)).as("us"))
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .write.mode("overwrite").parquet(out)
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val df = Tables.normalizeEventsTs(spark.read.parquet(out))
    assert(df.schema("ts").dataType === TimestampType)
    val rows = df.select(col("event_id"), unix_micros(col("ts")))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((0L, us1), (1L, us2)))
  }

  test("an unsupported ts type is rejected loudly, not mis-read") {
    val df = spark.range(1).select(lit("2021-01-01").as("ts"))
    val e = intercept[IllegalArgumentException](Tables.normalizeEventsTs(df))
    assert(e.getMessage.contains("unsupported"))
  }

  test("the live testdata reads through the normalizer") {
    val ev = Tables.table(spark, sf0001, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
  }
}
