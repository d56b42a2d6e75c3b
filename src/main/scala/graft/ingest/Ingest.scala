package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, ZoneOffset}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Model.TableKind

/** Landing→raw ingestion — the reference's S3-event Lambda
  * (/root/reference/lambda/ingestion_to_raw.py) as a local-FS utility.
  *
  * Semantics preserved: non-CSV objects skipped (:21-23), file type =
  * name prefix before the first '_' (:28-29), millisecond-timestamped
  * rename (:31-33), hive-partitioned raw layout
  * `raw/{type}/fecha_carga={load_date}/...` (:35), move = copy+delete
  * (:40-47) so the landing dir is a queue, not a store.
  */
object Ingest {

  final case class IngestedFile(
      kind: TableKind, rawPath: Path, loadDate: String, sourceFile: String)

  /** Name-prefix routing (ingestion_to_raw.py:28-29). Like the
    * reference's `split('_', 1)[0]`, a name with no underscore routes
    * to its full name (extension included) — faithful to the original,
    * which would produce an `unrecognized_data_*` table for it. */
  def routeFileType(fileName: String): String = fileName.split("_", 2)(0)

  private val tsFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmssSSS")
    .withZone(ZoneOffset.UTC)

  def rawKey(fileType: String, loadDate: String, fileName: String, now: Instant): String = {
    val dot = fileName.lastIndexOf('.')
    val (base, ext) =
      if (dot >= 0) (fileName.substring(0, dot), fileName.substring(dot))
      else (fileName, "")
    s"raw/$fileType/fecha_carga=$loadDate/${base}_${tsFmt.format(now)}$ext"
  }

  /** Move one landed file into the raw zone. Returns None for non-CSV
    * (skipped, like ingestion_to_raw.py:21-23). */
  def ingestFile(
      landed: Path, rawZoneRoot: Path,
      now: Instant = Instant.now(),
      loadDate: Option[String] = None): Option[IngestedFile] = {
    val name = landed.getFileName.toString
    if (!name.endsWith(".csv")) return None
    val date = loadDate.getOrElse(
      LocalDate.ofInstant(now, ZoneOffset.UTC).toString)
    val fileType = routeFileType(name)
    val dest = rawZoneRoot.resolve(rawKey(fileType, date, name, now))
    Files.createDirectories(dest.getParent)
    // copy then delete — the reference's two-step move (:40-47)
    Files.copy(landed, dest, StandardCopyOption.REPLACE_EXISTING)
    Files.delete(landed)
    Some(IngestedFile(TableKind.fromFileType(fileType), dest, date, name))
  }

  /** Drain a landing directory (the reference processes each S3 event
    * record in a loop, ingestion_to_raw.py:17). */
  def ingestAll(landingDir: Path, rawZoneRoot: Path,
      now: Instant = Instant.now()): Seq[IngestedFile] =
    Files.list(landingDir).iterator().asScala.toSeq.sorted
      .flatMap(p => ingestFile(p, rawZoneRoot, now))

  /** The reference's CSV scan options
    * (/root/reference/glue_jobs/dynamic-data-processor.py:31-38),
    * plus pinned timestamp/date formats: Spark's default lenient
    * ISO-8601 inference parses an id like "T1" as the time 01:00:00,
    * silently corrupting key columns. With explicit formats the
    * inference is strict; the processed schema still comes from the
    * transform casts, so this cannot change downstream types. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("sep", ",")
      .option("quote", "\"")
      .option("escape", "\\")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)

  /** Dead-letter ingest: read with a DECLARED schema in PERMISSIVE
    * mode, split rows that failed to parse into a quarantine frame
    * carrying the raw line — the hardened form of the reference's
    * try/except-log-and-exit (dynamic-data-processor.py:43-46), which
    * abandons the whole file when one row is torn. A feed at 100 TB
    * always contains torn rows; the pipeline's contract should be
    * "clean rows flow, torn rows land in the DLQ with evidence",
    * never all-or-nothing.
    *
    * Returns (clean, quarantined): `clean` has exactly `schema`'s
    * columns; `quarantined` is (raw_line, quarantined_at_utc,
    * source_path). Malformed = Spark put the raw text in the corrupt
    * column (unparseable row) OR a non-nullable-by-contract key
    * column came back null from a half-torn line. For the latter,
    * raw_line is a field-order reconstruction, not the original
    * bytes — the row PARSED, so Spark never kept its raw text.
    *
    * Both frames share one cached parse (required for reliable
    * corrupt-record queries), and the CALLER owns releasing it:
    * prefer [[withCsvQuarantine]], which unpersists in a finally;
    * this variant returns the cached handle as the third element for
    * callers that must hold the frames open (unpersist it when done,
    * or executor storage accumulates for the session's lifetime).
    */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      requiredCols: Seq[String] = Nil)
      : (DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val corrupt = "_corrupt_record"
    val withCorrupt = schema.add(corrupt,
      org.apache.spark.sql.types.StringType, nullable = true)
    val raw = spark.read
      .option("header", "true")
      .option("sep", ",")
      .option("quote", "\"")
      .option("escape", "\\")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .option("dateFormat", "yyyy-MM-dd")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(withCorrupt)
      .csv(path)
      // source path must bind BEFORE the cache (input_file_name loses
      // its scan context on a cached relation)
      .withColumn("__source_path", input_file_name())
      // the corrupt column is lazily populated from the raw line; a
      // filter on it alone is unreliable without materializing — cache
      // per Spark's documented requirement for corrupt-record queries
      .cache()
    val torn = requiredCols.map(c => col(c).isNull)
      .foldLeft(col(corrupt).isNotNull)(_ || _)
    val clean = raw.filter(!torn)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = raw.filter(torn)
      .select(
        coalesce(col(corrupt),
          concat_ws(",", schema.fieldNames.map(c =>
            col(c).cast("string")).toSeq: _*)).as("raw_line"),
        current_timestamp().as("quarantined_at_utc"),
        col("__source_path").as("source_path"))
    (clean, quarantined, raw)
  }

  /** Scope-bound dead-letter ingest: runs `body` over (clean,
    * quarantined) and unpersists the shared cached parse in a
    * finally — the leak-free entry point for repeated ingest calls
    * in a long-lived session. */
  def withCsvQuarantine[T](spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      requiredCols: Seq[String] = Nil)(
      body: (DataFrame, DataFrame) => T): T = {
    val (clean, quarantined, cached) =
      readCsvWithQuarantine(spark, path, schema, requiredCols)
    try body(clean, quarantined)
    finally cached.unpersist(false)
  }
}
