package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime

import graft.model.Model.TableKind
import graft.streaming.StreamingIngest

/** Streaming ingest parity: Trigger.AvailableNow over raw-zone CSVs
  * must land the same warehouse state as the batch pipeline
  * (SURVEY.md §2.9). */
class StreamingIngestSpec extends SparkSuite {

  test("maxFilesPerTrigger bounds every micro-batch (backpressure): " +
      "6 files at 2/trigger drain as exactly 3 two-file batches") {
    import org.apache.spark.sql.functions._
    // the ingest knob a 100 TB backfill actually turns: a raw zone
    // with a large backlog must drain in BOUNDED micro-batches (state,
    // memory, and downstream merge cost per trigger stay flat), not
    // one giant batch. Pin the batch BOUNDARIES, not just the total.
    val raw = tmpDir("s-mfpt")
    val files = (1 to 6).map { i =>
      val f = writeText(raw, f"part_$i%02d.csv",
        s"id,v\n${i}a,1\n${i}b,2\n")
      // distinct mtimes: arrival order is the source's batch order
      Files.setLastModifiedTime(f,
        FileTime.fromMillis(1_700_000_000_000L + i * 1000L))
      f
    }
    val schema = "id STRING, v INT"
    val seen =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Set[String])]
    val q = spark.readStream.schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", "2")
      .csv(raw.toString)
      .select(col("id"), col("v"), input_file_name().as("f"))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("s-mfpt-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = b.collect()
        seen.synchronized {
          seen += ((id, rows.length.toLong,
            rows.map(_.getString(2)).toSet))
        }
        ()
      }
      .start()
    q.awaitTermination()
    val batches = seen.sortBy(_._1).toSeq
    assert(batches.size === 3,
      s"6 files at maxFilesPerTrigger=2 must drain in 3 batches: $batches")
    assert(batches.forall(_._3.size == 2),
      s"every micro-batch must contain exactly 2 files: $batches")
    assert(batches.forall(_._2 == 4L),
      "every micro-batch must carry exactly its 2 files' 4 rows")
    // the batches PARTITION the backlog (no overlap, full coverage)
    val all = batches.flatMap(_._3)
    assert(all.size === all.distinct.size, "a file appeared in 2 batches")
    assert(all.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet ===
      files.map(_.getFileName.toString).toSet)
    // and arrival order is respected: batch i holds files 2i+1, 2i+2
    val ordered = batches.map(_._3.map(f =>
      f.substring(f.lastIndexOf('/') + 1)).toSeq.sorted)
    assert(ordered === Seq(Seq("part_01.csv", "part_02.csv"),
      Seq("part_03.csv", "part_04.csv"),
      Seq("part_05.csv", "part_06.csv")),
      s"micro-batches must follow arrival order: $ordered")
  }

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
