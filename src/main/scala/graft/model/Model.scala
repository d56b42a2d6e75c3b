package graft.model

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.types._

/** Typed data model for the medallion pipeline (SURVEY.md §1).
  *
  * Raw-input shapes come from the reference's select(col(...)) lists
  * (/root/reference/glue_jobs/dynamic-data-processor.py:58-63, 80-86,
  * 110-116); processed shapes add the audit/derived columns
  * (:67-71, :94-100, :118-126). Spanish raw names are the CSV
  * contract; English names are the processed contract.
  */
object Model {

  /** The routing key parsed from a landed file's name prefix
    * (/root/reference/lambda/ingestion_to_raw.py:28-29). A sealed ADT
    * so transform dispatch is exhaustiveness-checked (SURVEY.md P13).
    */
  sealed trait TableKind { def fileType: String; def targetTable: String }
  object TableKind {
    case object Proveedores extends TableKind {
      val fileType = "proveedores"; val targetTable = "dim_proveedores"
    }
    case object Clientes extends TableKind {
      val fileType = "clientes"; val targetTable = "dim_clientes"
    }
    case object Transacciones extends TableKind {
      val fileType = "transacciones"
      val targetTable = "fact_transacciones_energia"
    }
    /** Unknown feeds pass through with audit columns only
      * (dynamic-data-processor.py:130-139). */
    final case class Unrecognized(fileType: String) extends TableKind {
      val targetTable = s"unrecognized_data_$fileType"
    }

    val known: Seq[TableKind] = Seq(Proveedores, Clientes, Transacciones)

    def fromFileType(fileType: String): TableKind =
      known.find(_.fileType == fileType).getOrElse(Unrecognized(fileType))

    /** Upsert business keys per warehouse table
      * (/root/reference/glue_jobs/etl-s3-processed-to-redshift.py:39,44,49). */
    def upsertKeys(kind: TableKind): Seq[String] = kind match {
      case Proveedores => Seq("supplier_id")
      case Clientes => Seq("customer_id")
      case Transacciones => Seq("transaction_id")
      case Unrecognized(_) => Seq.empty
    }
  }

  /** Raw CSV input schemas (explicit — used by the streaming reader,
    * which cannot infer; the batch path still infers like the
    * reference, dynamic-data-processor.py:31-38). All strings: the
    * typed contract is applied by the transform's casts, so inference
    * drift can't change downstream types (SURVEY.md §7.3).
    */
  object rawSchemas {
    val proveedores: StructType = StructType(Seq(
      StructField("ID_Proveedor", StringType),
      StructField("NombreProveedor", StringType),
      StructField("TipoEnergia", StringType),
      StructField("PaisOrigen", StringType),
      StructField("FechaInicioContrato", StringType)))
    val clientes: StructType = StructType(Seq(
      StructField("ID_Cliente", StringType),
      StructField("NombreCliente", StringType),
      StructField("TipoCliente", StringType),
      StructField("Direccion", StringType),
      StructField("Ciudad", StringType),
      StructField("Pais", StringType)))
    val transacciones: StructType = StructType(Seq(
      StructField("ID_Transaccion", StringType),
      StructField("ID_Cliente", StringType),
      StructField("ID_Proveedor", StringType),
      StructField("FechaTransaccion", StringType),
      StructField("CantidadEnergiaMWh", StringType),
      StructField("PrecioPorMWh", StringType)))

    def forKind(kind: TableKind): Option[StructType] = kind match {
      case TableKind.Proveedores => Some(proveedores)
      case TableKind.Clientes => Some(clientes)
      case TableKind.Transacciones => Some(transacciones)
      case TableKind.Unrecognized(_) => None
    }
  }

  /** Processed-zone rows as case classes — a typed Dataset[T] surface
    * for the three core tables (SURVEY.md §1.5). */
  final case class DimProveedor(
      supplier_id: String, supplier_name: String, energy_type: String,
      country_of_origin: String, contract_start_date: Date,
      load_timestamp_utc: Timestamp, source_file: String,
      load_date_partition: Date)

  final case class DimCliente(
      customer_id: String, customer_name: String, customer_type_raw: String,
      address: String, city: String, country: String,
      customer_category: String, hashed_customer_id: String,
      load_timestamp_utc: Timestamp, source_file: String,
      load_date_partition: Date)

  final case class FactTransaccion(
      transaction_id: String, customer_id: String, supplier_id: String,
      transaction_timestamp: Timestamp, energy_quantity_mwh: Option[Double],
      price_per_mwh: Option[Double], total_cost: Option[Double],
      load_timestamp_utc: Timestamp, source_file: String,
      transaction_date: Date, load_date_partition: Date)
}
