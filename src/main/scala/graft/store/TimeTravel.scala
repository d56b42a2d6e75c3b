package graft.store

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot table with as-of reads — the lakehouse
  * time-travel primitive (Delta/Iceberg `VERSION AS OF`) next to the
  * engine's merge (Merge), history (Scd2), change-capture
  * (SnapshotDiff) and compaction (Layout.compact) surfaces.
  *
  * Layout: `dir/v=<k>/` holds version k's full snapshot; a version is
  * visible iff its `_SUCCESS` marker exists (the atomic commit point —
  * Spark writes it last, so a crashed writer leaves an invisible
  * directory, never a torn snapshot). `readAsOf(k)` resolves to the
  * LARGEST committed version ≤ k, so reads pin a version while later
  * writers append new ones — writers never mutate an existing
  * snapshot (copy-on-write), which is what makes a historical read
  * reproducible.
  *
  * Scale notes (100 TB): each snapshot is a full copy, so this layout
  * prices storage at versions × table size — right for dimension-scale
  * tables (the reference's Redshift dims) and for fact tables only
  * with a retention window ([[dropBefore]]). A 100 TB fact log wants
  * the engine's DELTA renderings instead (Scd2 keeps history in one
  * table; SnapshotDiff reconstructs any version from a base + change
  * log); time travel here is the read-side contract those share.
  * Version listing is one filesystem `listStatus` of the table root —
  * O(versions), no data read — and the as-of read scans exactly one
  * snapshot with full pushdown (it is a plain parquet dir).
  */
object TimeTravel {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Commit `df` as version `version` (full snapshot, copy-on-write).
    * Refuses to rewrite an existing committed version — history is
    * immutable by contract. */
  def writeSnapshot(df: DataFrame, dir: String, version: Long): Unit = {
    val spark = df.sparkSession
    require(!listVersions(spark, dir).contains(version),
      s"version $version already committed at $dir — snapshots are immutable")
    df.write.mode("overwrite").parquet(s"$dir/v=$version")
  }

  /** Committed versions (ascending): `v=<k>` dirs whose _SUCCESS
    * marker exists. */
  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val root = new HPath(dir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
      .filter(v => f.exists(new HPath(s"$dir/v=$v/_SUCCESS")))
      .sorted
  }

  /** Read the table as of `version`: the largest committed version
    * ≤ `version`. Throws if none is. */
  def readAsOf(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val vs = listVersions(spark, dir).filter(_ <= version)
    require(vs.nonEmpty, s"no committed version <= $version at $dir")
    spark.read.parquet(s"$dir/v=${vs.max}")
  }

  /** Latest committed version's snapshot. */
  def readLatest(spark: SparkSession, dir: String): DataFrame = {
    val vs = listVersions(spark, dir)
    require(vs.nonEmpty, s"no committed version at $dir")
    spark.read.parquet(s"$dir/v=${vs.max}")
  }

  /** Retention: drop committed versions strictly below `minVersion`,
    * keeping at least the latest (a table always stays readable).
    * Returns the dropped versions. */
  def dropBefore(spark: SparkSession, dir: String,
      minVersion: Long): Seq[Long] = {
    val vs = listVersions(spark, dir)
    val dropped = vs.filter(_ < minVersion).filterNot(_ == vs.max)
    val f = fs(spark, dir)
    dropped.foreach(v => f.delete(new HPath(s"$dir/v=$v"), true))
    dropped
  }
}
