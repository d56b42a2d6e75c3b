package graft

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.Ingest
import graft.ingest.Ingest.IngestedFile
import graft.model.Model.TableKind
import graft.store.Merge
import graft.transform.Transforms

/** End-to-end medallion pipeline: landing → raw → processed →
  * warehouse — the reference's Lambda → Glue1 → Step Function → Glue2
  * chain (SURVEY.md §3.1–3.2) collapsed into sequential calls in one
  * driver (§2.11 C3).
  */
object Pipeline {

  /** Raw CSV → typed processed parquet, append-mode, hive-partitioned
    * by load date (dynamic-data-processor.py:153-155). Returns the
    * processed table directory. */
  def processFile(spark: SparkSession, file: IngestedFile,
      processedZone: String): String = {
    val raw = Ingest.readCsv(spark, file.rawPath.toString)
    val transformed =
      Transforms.forKind(file.kind, file.sourceFile, file.loadDate)(raw)
    val out = s"$processedZone/${file.kind.targetTable}"
    // The reference partitions every write by load_date_partition
    // (dynamic-data-processor.py:155) — but its fallback branch never
    // adds that column (:130-139), which would fail the write. We keep
    // the partitioning for known tables and write unrecognized feeds
    // unpartitioned instead of reproducing the bug.
    val writer = transformed.write.mode("append")
    (if (transformed.columns.contains("load_date_partition"))
       writer.partitionBy("load_date_partition")
     else writer).parquet(out)
    out
  }

  /** Processed partition → keyed warehouse upsert — the reference's
    * Redshift job (etl-s3-processed-to-redshift.py:54-96): read one
    * load_date partition (partition-pruned scan), empty-input guard
    * (:116), dropDuplicates(keys) (:58-59), staged upsert (:65-82).
    * Unrecognized tables have no keys and are skipped, matching the
    * reference's known-table guard (:99-100). */
  def mergeToWarehouse(spark: SparkSession, processedZone: String,
      warehouseZone: String, kind: TableKind, loadDate: String): Unit = {
    val keys = TableKind.upsertKeys(kind)
    require(keys.nonEmpty, s"no upsert config for table ${kind.targetTable}")
    val table = spark.read.parquet(s"$processedZone/${kind.targetTable}")
      .filter(org.apache.spark.sql.functions.col("load_date_partition") === loadDate)
    if (!table.isEmpty) {
      // precedence: latest load wins when one partition holds several
      // loads of the same business key (the reference re-reads the
      // whole load-date partition too, but picks arbitrarily)
      Merge.mergeIntoParquet(
        spark, s"$warehouseZone/${kind.targetTable}", table, keys,
        precedence = Seq(
          org.apache.spark.sql.functions.col("load_timestamp_utc").desc))
    }
  }

  /** Full chain for a landing directory: ingest every file, transform
    * each to the processed zone, then merge each touched known table
    * into the warehouse. */
  def runBatch(spark: SparkSession, landingDir: Path, rawZone: Path,
      processedZone: String, warehouseZone: String): Seq[IngestedFile] = {
    val files = Ingest.ingestAll(landingDir, rawZone)
    files.foreach(f => processFile(spark, f, processedZone))
    files.filter(f => TableKind.upsertKeys(f.kind).nonEmpty)
      .map(f => (f.kind, f.loadDate)).distinct
      .foreach { case (kind, date) =>
        mergeToWarehouse(spark, processedZone, warehouseZone, kind, date)
      }
    files
  }

  /** Register the warehouse tables as temp views so the reference's
    * analytic SQL runs verbatim (SURVEY.md §3.3). */
  def registerWarehouse(spark: SparkSession, warehouseZone: String): Unit =
    TableKind.known.foreach { k =>
      val dir = new java.io.File(s"$warehouseZone/${k.targetTable}")
      if (dir.exists())
        spark.read.parquet(dir.toString).createOrReplaceTempView(k.targetTable)
    }
}
