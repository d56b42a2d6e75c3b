package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Model.TableKind

/** The reference's per-table transform pipelines re-expressed as pure
  * `DataFrame => DataFrame` functions (SURVEY.md §2.2 P1–P13;
  * /root/reference/glue_jobs/dynamic-data-processor.py:52-139).
  *
  * Everything is built-in Catalyst expressions — rename/cast
  * projections, CASE+LIKE categorization, sha2 masking, derived
  * metrics, audit columns — so the whole pipeline stays inside
  * whole-stage codegen and pushes down to the scan. No UDFs.
  */
object Transforms {

  /** Audit columns shared by every branch
    * (dynamic-data-processor.py:67-71 etc.). */
  private def audited(df: DataFrame, sourceFile: String, loadDate: String): DataFrame =
    df.withColumn("load_timestamp_utc", current_timestamp())
      .withColumn("source_file", lit(sourceFile))
      .withColumn("load_date_partition", to_date(lit(loadDate)))

  /** proveedores → dim_proveedores (dynamic-data-processor.py:52-71):
    * rename/cast projection + null-key guard. */
  def proveedores(sourceFile: String, loadDate: String)(df: DataFrame): DataFrame =
    audited(
      df.select(
        col("ID_Proveedor").cast("string").alias("supplier_id"),
        col("NombreProveedor").alias("supplier_name"),
        col("TipoEnergia").alias("energy_type"),
        col("PaisOrigen").alias("country_of_origin"),
        col("FechaInicioContrato").cast("date").alias("contract_start_date"))
        .filter(col("supplier_id").isNotNull),
      sourceFile, loadDate)

  /** clientes → dim_clientes (dynamic-data-processor.py:73-101):
    * rename projection + CASE categorization + sha2-256 PII mask. */
  def clientes(sourceFile: String, loadDate: String)(df: DataFrame): DataFrame =
    audited(
      df.select(
        col("ID_Cliente").cast("string").alias("customer_id"),
        col("NombreCliente").alias("customer_name"),
        col("TipoCliente").alias("customer_type_raw"),
        col("Direccion").alias("address"),
        col("Ciudad").alias("city"),
        col("Pais").alias("country"))
        .withColumn("customer_category",
          when(col("customer_type_raw").like("%Residencial%"), "Residential")
            .when(col("customer_type_raw").like("%Comercial%"), "Commercial")
            .when(col("customer_type_raw").like("%Industrial%"), "Industrial")
            .otherwise("Other"))
        .withColumn("hashed_customer_id", sha2(col("customer_id"), 256)),
      sourceFile, loadDate)

  /** transacciones → fact_transacciones_energia
    * (dynamic-data-processor.py:103-127): rename/cast projection +
    * derived total_cost (null-propagating double multiply) +
    * timestamp→date derivation. */
  def transacciones(sourceFile: String, loadDate: String)(df: DataFrame): DataFrame =
    audited(
      df.select(
        col("ID_Transaccion").cast("string").alias("transaction_id"),
        col("ID_Cliente").cast("string").alias("customer_id"),
        col("ID_Proveedor").cast("string").alias("supplier_id"),
        col("FechaTransaccion").cast("timestamp").alias("transaction_timestamp"),
        col("CantidadEnergiaMWh").cast("double").alias("energy_quantity_mwh"),
        col("PrecioPorMWh").cast("double").alias("price_per_mwh"))
        .withColumn("total_cost",
          col("energy_quantity_mwh") * col("price_per_mwh")),
      sourceFile, loadDate)
      .withColumn("transaction_date", col("transaction_timestamp").cast("date"))
      // keep the reference's column order: load_date_partition last
      .select(
        col("transaction_id"), col("customer_id"), col("supplier_id"),
        col("transaction_timestamp"), col("energy_quantity_mwh"),
        col("price_per_mwh"), col("total_cost"), col("load_timestamp_utc"),
        col("source_file"), col("transaction_date"), col("load_date_partition"))

  /** Unknown feeds: schema-on-read passthrough + audit columns
    * (dynamic-data-processor.py:130-139). */
  def unrecognized(fileType: String, sourceFile: String)(df: DataFrame): DataFrame =
    df.withColumn("load_timestamp_utc", current_timestamp())
      .withColumn("source_file", lit(sourceFile))
      .withColumn("data_category", lit(fileType))

  /** Dispatch on file type — the reference's if/elif ladder
    * (dynamic-data-processor.py:52-139) as an exhaustive match. */
  def forKind(kind: TableKind, sourceFile: String, loadDate: String): DataFrame => DataFrame =
    kind match {
      case TableKind.Proveedores => proveedores(sourceFile, loadDate)
      case TableKind.Clientes => clientes(sourceFile, loadDate)
      case TableKind.Transacciones => transacciones(sourceFile, loadDate)
      case TableKind.Unrecognized(ft) => unrecognized(ft, sourceFile)
    }
}
