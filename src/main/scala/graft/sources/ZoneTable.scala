package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Format-polymorphic zone tables: the reference's lake zones are
  * CSV (raw) and Parquet (processed/warehouse) (SURVEY.md §1.1); this
  * generalizes the read/write surface to the formats Spark ships
  * (parquet, orc, json, csv) behind one API so a zone's storage
  * format is a deployment choice, not a code change.
  *
  * Format guidance at 100 TB: columnar (parquet/orc) for any queried
  * zone — predicate pushdown, column pruning, vectorized reads; text
  * formats only at the ingestion edge. Hive-style partition columns
  * work identically across formats.
  */
object ZoneTable {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Orc extends Format { val name = "orc" }
  case object Json extends Format { val name = "json" }
  final case class Csv(header: Boolean = true) extends Format { val name = "csv" }

  def read(spark: SparkSession, path: String, format: Format,
      options: Map[String, String] = Map.empty): DataFrame = {
    val base: DataFrameReader = spark.read.options(options)
    format match {
      case Parquet => base.parquet(path)
      case Orc => base.orc(path)
      case Json => base.json(path)
      case Csv(header) =>
        base.option("header", header.toString)
          .option("inferSchema", "true")
          .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
          .option("dateFormat", "yyyy-MM-dd")
          .csv(path)
    }
  }

  def write(df: DataFrame, path: String, format: Format,
      mode: String = "append", partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    val w0 = df.write.mode(mode).options(options)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    format match {
      case Parquet => w.parquet(path)
      case Orc => w.orc(path)
      case Json => w.json(path)
      case Csv(header) => w.option("header", header.toString).csv(path)
    }
  }
}
