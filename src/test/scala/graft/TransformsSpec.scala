package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.model.Model.TableKind
import graft.transform.Transforms

/** Per-branch transform semantics (FIXTURES.md §A; reference behavior
  * from /root/reference/glue_jobs/dynamic-data-processor.py:52-139). */
class TransformsSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val provSchema = StructType(Seq(
    StructField("ID_Proveedor", StringType),
    StructField("NombreProveedor", StringType),
    StructField("TipoEnergia", StringType),
    StructField("PaisOrigen", StringType),
    StructField("FechaInicioContrato", StringType)))

  test("proveedores: rename/cast projection, null-key rows dropped") {
    val in = df(provSchema,
      Row("P1", "SolarCo", "Solar", "ES", "2024-01-05"),
      Row(null, "GhostCo", "Gas", "AR", "2023-06-01"))
    val out = Transforms.proveedores("proveedores_a.csv", "2025-01-02")(in)
    assert(out.columns.toSeq === Seq("supplier_id", "supplier_name",
      "energy_type", "country_of_origin", "contract_start_date",
      "load_timestamp_utc", "source_file", "load_date_partition"))
    val rows = out.collect()
    assert(rows.length === 1) // null key dropped (:64-66)
    val r = rows.head
    assert(r.getAs[String]("supplier_id") === "P1")
    assert(r.getAs[java.sql.Date]("contract_start_date").toString === "2024-01-05")
    assert(r.getAs[java.sql.Date]("load_date_partition").toString === "2025-01-02")
    assert(r.getAs[String]("source_file") === "proveedores_a.csv")
    assert(r.getAs[java.sql.Timestamp]("load_timestamp_utc") != null)
  }

  private val cliSchema = StructType(Seq(
    StructField("ID_Cliente", StringType),
    StructField("NombreCliente", StringType),
    StructField("TipoCliente", StringType),
    StructField("Direccion", StringType),
    StructField("Ciudad", StringType),
    StructField("Pais", StringType)))

  test("clientes: CASE arms incl. Other fallback + sha2 determinism") {
    val in = df(cliSchema,
      Row("C1", "Ana", "Cliente Residencial", "a", "x", "ES"),
      Row("C2", "Luis", "Gran Comercial", "b", "y", "ES"),
      Row("C3", "Eva", "Industrial pesado", "c", "z", "AR"),
      Row("C4", "Max", "Gobierno", "d", "w", "CL"))
    val out = Transforms.clientes("clientes_a.csv", "2025-01-02")(in)
      .orderBy("customer_id").collect()
    assert(out.map(_.getAs[String]("customer_category")).toSeq ===
      Seq("Residential", "Commercial", "Industrial", "Other"))
    // sha2-256 of "C1" (:94) — deterministic, lowercase hex
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("C1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head.getAs[String]("hashed_customer_id") === expected)
  }

  private val txSchema = StructType(Seq(
    StructField("ID_Transaccion", StringType),
    StructField("ID_Cliente", StringType),
    StructField("ID_Proveedor", StringType),
    StructField("FechaTransaccion", StringType),
    StructField("CantidadEnergiaMWh", StringType),
    StructField("PrecioPorMWh", StringType)))

  test("transacciones: total_cost arithmetic, null propagation, date derivation") {
    val in = df(txSchema,
      Row("T1", "C1", "P1", "2025-03-01 10:30:00", "10.5", "40.0"),
      Row("T2", "C2", "P1", "2024-12-31 23:59:59", null, "40.0"))
    val out = Transforms.transacciones("transacciones_a.csv", "2025-03-02")(in)
      .orderBy("transaction_id").collect()
    assert(out(0).getAs[Double]("total_cost") === 10.5 * 40.0)
    assert(out(1).isNullAt(out(1).fieldIndex("total_cost"))) // null propagates (:118)
    assert(out(0).getAs[java.sql.Date]("transaction_date").toString === "2025-03-01")
    assert(out(1).getAs[java.sql.Date]("transaction_date").toString === "2024-12-31")
  }

  test("unrecognized: passthrough + audit columns, no schema change") {
    val in = df(StructType(Seq(
      StructField("foo", StringType), StructField("bar", StringType))),
      Row("1", "2"))
    val out = Transforms.forKind(
      TableKind.fromFileType("desconocido"), "desconocido_x.csv", "2025-01-02")(in)
    assert(out.columns.toSeq === Seq("foo", "bar", "load_timestamp_utc",
      "source_file", "data_category"))
    assert(out.collect().head.getAs[String]("data_category") === "desconocido")
  }
}
