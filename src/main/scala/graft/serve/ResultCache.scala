package graft.serve

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-fingerprint result cache — the serving-layer memoization every
  * query engine with a dashboard in front of it grows (Presto/Trino
  * result cache, Athena's reuse-results flag, the reference's repeated
  * Athena invocations of the same three SQL files re-billing every
  * run): a deterministic query re-submitted against unchanged inputs
  * should re-READ, not re-COMPUTE.
  *
  * The key is the CANONICALIZED analyzed plan (expression-id
  * normalization included), so two submissions of the same logical
  * query — even built through different DataFrame call sequences —
  * share a fingerprint, while any change to a literal, a column set,
  * or an input path (paths live in the relation nodes) re-keys. That
  * is Spark's own semantic-equality machinery (`sameResult`), reused
  * as a cache key rather than re-invented.
  *
  * Scale shape: a cache hit is a bare parquet scan of the PRIOR
  * RESULT (typically KBs for analytic rollups) — zero shuffle, zero
  * source I/O; a miss pays one extra result write, amortized across
  * every later hit. The atomic-visibility rule follows the
  * store.Merge discipline: results are written to a tmp dir and
  * renamed in, so a concurrent reader sees the old entry or the new
  * one, never a partial file.
  */
object ResultCache {

  /** Stable fingerprint of the query's canonicalized analyzed plan +
    * result schema. Plan hashCode is structural (case-class trees over
    * strings/longs), so it is stable across JVMs for the same plan —
    * schema rides along so a cast-only change can never collide into a
    * stale schema. */
  def fingerprint(df: DataFrame): String = {
    val p = df.queryExecution.analyzed.canonicalized
    f"${p.hashCode}%08x_${df.schema.catalogString.hashCode}%08x"
  }

  /** Route `df` through the on-disk cache at `cacheDir`: compute and
    * persist on miss, re-read on hit. Ordering is NOT preserved by the
    * parquet round-trip — callers re-apply their ORDER BY (the same
    * contract as any result-set store). */
  def through(spark: SparkSession, cacheDir: String, df: DataFrame)
      : DataFrame = {
    val fp = fingerprint(df)
    val path = Paths.get(cacheDir, fp)
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Paths.get(cacheDir, s"_tmp_$fp")
      df.write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(path.getParent)
      // atomic swap: readers see the whole entry or none of it
      if (!Files.exists(path.resolve("_SUCCESS")))
        try Files.move(tmp, path)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    spark.read.parquet(path.toString)
  }

  /** True iff a cache entry for `df` is already present (spec hook). */
  def isCached(cacheDir: String, df: DataFrame): Boolean =
    Files.exists(Paths.get(cacheDir, fingerprint(df), "_SUCCESS"))
}
