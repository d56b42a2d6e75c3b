package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source layer: the driver's read-only synthetic star schema
  * (see /root/repo/TESTDATA.md, FIXTURES.md §B).
  *
  * Mirrors the reference's "zone table" abstraction — a table is a
  * directory of parquet files (SURVEY.md §1.1). Reads go through
  * `spark.read.parquet`, so Catalyst partition discovery, column
  * pruning and parquet predicate pushdown all apply natively.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor.
    * At 100 TB the facts (lineitem/orders/events) grow unboundedly but
    * these stay bounded (region=5, nation=25, supplier ~100s) — safe
    * broadcast-join candidates (SURVEY.md §7.3).
    */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    graft.plans.GraftExtensions.install(spark) // idempotent
    if (name == "events") {
      // Tolerate either physical encoding of events.ts (legacy
      // TIMESTAMP(NANOS) or standard timestamp[us]) — see
      // [[normalizeEventsTs]]. nanosAsLong lets the NANOS encoding
      // load at all; it is a no-op for µs data.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(path(dir, name)))
    } else spark.read.parquet(path(dir, name))
  }

  /** Schema-on-read normalization for the `events.ts` column.
    *
    * The reference's own source contract is dynamic at the edges —
    * CSV `inferSchema` and DynamicFrame schema-on-read for unknown
    * feeds (reference glue_jobs/dynamic-data-processor.py:31-38,
    * etl-s3-processed-to-redshift.py:109-114; SURVEY §1.2). The same
    * regime applies here: a feed may arrive with `ts` stored as
    * parquet TIMESTAMP(NANOS) (surfaced as raw int64 nanoseconds via
    * `spark.sql.legacy.parquet.nanosAsLong`) or as a standard
    * timestamp — with or without timezone. All are coerced to one
    * canonical session-TZ TIMESTAMP (UTC is pinned engine-wide):
    *
    *  - LongType: nanoseconds since epoch → integer-divide by 1000
    *    and reinterpret as µs (the same ns→µs truncation DuckDB
    *    applies; a double `/` would lose precision at ~1.7e18).
    *  - TIMESTAMP_NTZ (parquet `isAdjustedToUTC=false`, the pyarrow
    *    default): reinterpret the wall-clock value as UTC. Under the
    *    pinned UTC session this is value-preserving and matches
    *    DuckDB's naive-timestamp read.
    *  - TIMESTAMP: already canonical.
    *
    * Works on both batch and streaming DataFrames (pure projection,
    * no data-dependent branching — the branch is on the schema).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts arrived as unsupported type $other; " +
          "expected int64 nanos, timestamp_ntz, or timestamp")
    }
  }

  /** Streaming source over the events table, normalized exactly like
    * the batch path ([[normalizeEventsTs]] is a pure projection, so it
    * applies to a streaming DataFrame unchanged). The file stream
    * source needs an explicit schema and a directory/glob basePath —
    * events.parquet is a single file, hence the glob.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(path(dir, "events")).schema
    normalizeEventsTs(
      spark.readStream.schema(schema).parquet(s"$dir/events.parque*"))
  }

  /** Register every table as a temp view so `spark.sql` text (the
    * reference's analytics surface, SURVEY.md §3.3) can run verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
