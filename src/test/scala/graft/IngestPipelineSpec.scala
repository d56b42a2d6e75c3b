package graft

import java.nio.file.Files
import java.time.Instant

import graft.ingest.Ingest
import graft.model.Model.TableKind
import graft.serve.QueryRegistry

/** Ingestion routing + the full medallion chain end-to-end, then the
  * reference's three analytic queries over the resulting warehouse
  * (SURVEY.md §5.3). */
class IngestPipelineSpec extends SparkSuite {

  test("routing: prefix before first underscore; no-underscore edge") {
    assert(Ingest.routeFileType("proveedores_2024.csv") === "proveedores")
    assert(Ingest.routeFileType("clientes_a_b.csv") === "clientes")
    // faithful to the reference's split('_', 1)[0]
    assert(Ingest.routeFileType("nounderscore.csv") === "nounderscore.csv")
  }

  test("ingestFile: non-CSV skipped; CSV moved into hive-partitioned raw key") {
    val landing = tmpDir("landing")
    val raw = tmpDir("raw")
    writeText(landing, "notes_1.txt", "ignored")
    val csv = writeText(landing, "proveedores_enero.csv",
      "ID_Proveedor,NombreProveedor,TipoEnergia,PaisOrigen,FechaInicioContrato\n" +
        "P1,SolarCo,Solar,ES,2024-01-05\n")
    val now = Instant.parse("2025-01-02T03:04:05.678Z")

    assert(Ingest.ingestFile(landing.resolve("notes_1.txt"), raw, now).isEmpty)
    val got = Ingest.ingestFile(csv, raw, now).get
    assert(got.kind === TableKind.Proveedores)
    assert(got.loadDate === "2025-01-02")
    val rel = raw.relativize(got.rawPath).toString
    assert(rel === "raw/proveedores/fecha_carga=2025-01-02/" +
      "proveedores_enero_20250102030405678.csv")
    assert(Files.exists(got.rawPath), "copied to raw zone")
    assert(!Files.exists(csv), "deleted from landing (move semantics)")
  }

  test("end-to-end: landing -> raw -> processed -> warehouse -> analytics SQL") {
    val landing = tmpDir("e2e-landing")
    val raw = tmpDir("e2e-raw")
    val processed = tmpDir("e2e-proc").toString
    val warehouse = tmpDir("e2e-wh").toString

    writeText(landing, "proveedores_a.csv",
      """ID_Proveedor,NombreProveedor,TipoEnergia,PaisOrigen,FechaInicioContrato
        |P1,SolarCo,Solar,ES,2024-01-05
        |P2,WindCo,Eolica,ES,2023-02-01
        |P3,HydroCo,Hidraulica,AR,2022-03-10
        |,NullCo,Gas,CL,2021-01-01
        |""".stripMargin)
    writeText(landing, "clientes_a.csv",
      """ID_Cliente,NombreCliente,TipoCliente,Direccion,Ciudad,Pais
        |C1,Ana,Cliente Residencial,a,x,ES
        |C2,Luis,Comercial,b,y,ES
        |C3,Eva,Industrial,c,z,AR
        |""".stripMargin)
    writeText(landing, "transacciones_a.csv",
      """ID_Transaccion,ID_Cliente,ID_Proveedor,FechaTransaccion,CantidadEnergiaMWh,PrecioPorMWh
        |T1,C1,P1,2025-03-01 10:00:00,10.0,50.0
        |T2,C1,P2,2025-04-01 11:00:00,20.0,30.0
        |T3,C2,P1,2025-05-01 12:00:00,5.0,100.0
        |T4,C3,P3,2024-06-01 13:00:00,7.0,10.0
        |""".stripMargin)
    writeText(landing, "desconocido_a.csv", "foo,bar\n1,2\n")

    val files = Pipeline.runBatch(spark, landing, raw, processed, warehouse)
    assert(files.length === 4)

    Pipeline.registerWarehouse(spark, warehouse)

    assert(QueryRegistry.run(spark, "conteo_total_clientes")
      .collect().head.getLong(0) === 3L)

    val porPais = QueryRegistry.run(spark, "proveedores_por_pais")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(porPais === Map("ES" -> 2L, "AR" -> 1L), "null-key supplier dropped")

    val top = QueryRegistry.run(spark, "costo_total_por_cliente").collect()
    assert(top.map(_.getString(0)).toSeq === Seq("C1", "C2"),
      "2025 filter excludes T4; C1=1100 > C2=500")
    assert(top.head.getDouble(1) === 10.0 * 50.0 + 20.0 * 30.0)

    // unrecognized feed landed in its own processed table, unmerged
    val unrec = spark.read.parquet(s"$processed/unrecognized_data_desconocido")
    assert(unrec.count() === 1)

    // re-running the same transacciones batch is idempotent in the
    // warehouse (keyed upsert), not in the processed zone (append)
    val landing2 = tmpDir("e2e-landing2")
    writeText(landing2, "transacciones_b.csv",
      """ID_Transaccion,ID_Cliente,ID_Proveedor,FechaTransaccion,CantidadEnergiaMWh,PrecioPorMWh
        |T1,C1,P1,2025-03-01 10:00:00,99.0,1.0
        |""".stripMargin)
    Pipeline.runBatch(spark, landing2, raw, processed, warehouse)
    Pipeline.registerWarehouse(spark, warehouse)
    val fact = spark.read.parquet(s"$warehouse/fact_transacciones_energia")
    assert(fact.count() === 4, "still 4 keys after upsert")
    assert(fact.filter("transaction_id = 'T1'").collect()
      .head.getAs[Double]("total_cost") === 99.0, "latest batch wins")
  }

  test("sql file loading strips trailing semicolon") {
    val d = tmpDir("sql")
    val f = writeText(d, "q.sql", "SELECT 1 AS one;\n")
    assert(QueryRegistry.runSqlFile(spark, f.toString)
      .collect().head.getInt(0) === 1)
  }

  test("torn rows land in the quarantine, clean rows keep flowing") {
    import org.apache.spark.sql.types._
    val d = tmpDir("dlq")
    val f = writeText(d, "feed.csv",
      """id,qty,price
        |A,2,10.5
        |B,notanumber,3.0
        |C,4,7.25
        |,5,1.0
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("qty", IntegerType),
      StructField("price", DoubleType)))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    Ingest.withCsvQuarantine(
      spark, f.toString, schema, requiredCols = Seq("id")) {
      (clean, quarantined) =>
        // clean: parseable rows with a non-null key — file order free
        val got = clean.collect().map(r =>
          (r.getString(0), r.getInt(1), r.getDouble(2))).sortBy(_._1)
        assert(got.toSeq === Seq(("A", 2, 10.5), ("C", 4, 7.25)))
        // quarantine: the torn row (bad int) with its RAW LINE
        // preserved, and the null-key row (parseable but violating
        // the contract)
        val q = quarantined.collect()
        assert(q.length === 2, q.mkString("; "))
        val rawLines = q.map(_.getAs[String]("raw_line")).sorted
        assert(rawLines.exists(_.contains("notanumber")),
          s"raw evidence lost: ${rawLines.mkString("|")}")
        assert(q.forall(
          _.getAs[String]("source_path").contains("feed.csv")))
        // nothing silently dropped: clean + quarantined = all rows
        assert(got.length + q.length === 4)
    }
    // the scoped form released the shared cached parse (delta against
    // whatever OTHER suites in this JVM left cached)
    assert(spark.sparkContext.getPersistentRDDs.keySet
      .diff(cachedBefore).isEmpty,
      "withCsvQuarantine must unpersist its cached parse")
  }
}
