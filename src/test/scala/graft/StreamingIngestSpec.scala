package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime

import graft.model.Model.TableKind
import graft.streaming.StreamingIngest

/** Streaming ingest parity: Trigger.AvailableNow over raw-zone CSVs
  * must land the same warehouse state as the batch pipeline
  * (SURVEY.md §2.9). */
class StreamingIngestSpec extends SparkSuite {

  test("AvailableNow drains raw zone; upsert keeps keys unique; checkpoint skips done files") {
    val raw = tmpDir("s-raw")
    val typeDir = raw.resolve("raw/proveedores")
    val fA = writeText(typeDir.resolve("fecha_carga=2025-01-01"), "proveedores_a_1.csv",
      """ID_Proveedor,NombreProveedor,TipoEnergia,PaisOrigen,FechaInicioContrato
        |P1,SolarCo,Solar,ES,2024-01-05
        |P2,WindCo,Eolica,AR,2023-02-01
        |""".stripMargin)
    val fB = writeText(typeDir.resolve("fecha_carga=2025-01-02"), "proveedores_b_1.csv",
      """ID_Proveedor,NombreProveedor,TipoEnergia,PaisOrigen,FechaInicioContrato
        |P2,WindCo2,Eolica,AR,2023-02-01
        |P3,HydroCo,Hidraulica,CL,2022-03-10
        |""".stripMargin)
    // FileStreamSource orders micro-batches by modification time; pin
    // distinct mtimes so "file B arrived later" is deterministic (in
    // production files genuinely arrive at different times).
    Files.setLastModifiedTime(fA, FileTime.fromMillis(1_700_000_000_000L))
    Files.setLastModifiedTime(fB, FileTime.fromMillis(1_700_000_100_000L))

    val processed = tmpDir("s-proc").toString
    val warehouse = tmpDir("s-wh").toString
    val ckpt = tmpDir("s-ckpt").toString

    StreamingIngest.runAvailableNow(spark, typeDir.toString,
      TableKind.Proveedores, processed, warehouse, ckpt, "2025-01-02")

    val wh = spark.read.parquet(s"$warehouse/dim_proveedores")
    val byId = wh.collect().map(r =>
      r.getAs[String]("supplier_id") -> r.getAs[String]("supplier_name")).toMap
    assert(byId.keySet === Set("P1", "P2", "P3"), "keys unique post-merge")
    // maxFilesPerTrigger=1 → the second file is a later micro-batch, wins
    assert(byId("P2") === "WindCo2")

    // a second AvailableNow run with the same checkpoint re-processes
    // nothing (exactly-once per file)
    val before = spark.read.parquet(s"$processed/dim_proveedores").count()
    StreamingIngest.runAvailableNow(spark, typeDir.toString,
      TableKind.Proveedores, processed, warehouse, ckpt, "2025-01-02")
    val after = spark.read.parquet(s"$processed/dim_proveedores").count()
    assert(before === after, "checkpoint prevents reprocessing")
  }
}
