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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
      // rejects. Read nanos as raw longs and truncate to microsecond
      // timestamps — the same ns->us truncation DuckDB applies, so
      // oracle comparisons agree. `div` is integer division (a double
      // `/` would lose precision on ~1.7e18 nanosecond values).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(dir, name))
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(path(dir, name))
  }

  /** Register every table as a temp view so `spark.sql` text (the
    * reference's analytics surface, SURVEY.md §3.3) can run verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
