package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the `.graftlog` shard format — the
  * last custom-extension tier (after codegen Expressions, typed
  * aggregates, an optimizer Rule, and a custom SparkPlan): a
  * from-scratch batch source that does BOTH V2 optimizations a scan
  * can offer the engine:
  *
  *  - **file pruning from pushed filters**: every shard carries a
  *    `.meta` sidecar with its event_id min/max (written at ingest —
  *    the q136 zone-map idea moved INTO the connector). Pushed
  *    event_id predicates prune whole shards in `planInputPartitions`,
  *    so a selective probe opens a handful of files out of thousands —
  *    the same skipping a 100 TB lakehouse table gets from its
  *    manifest, expressed at the DSv2 seam. Pruned-at-planning is
  *    observable (FilesOpened counter) and spec-asserted.
  *  - **column pruning**: `pruneColumns` narrows the reader to the
  *    requested fields; the line parser materializes only those (a
  *    projection over a 5-column format parses 1 column when 1 is
  *    asked for).
  *
  * Format: UTF-8 lines `event_id|ts_us|user_id|event_type|value`,
  * one shard per file, one InputPartition per shard (splittability
  * would follow parquet's row-group model; shards are written
  * bounded instead — the [[GraftLog.write]] helper caps rows per
  * shard). Filters are also re-applied by Spark above the scan
  * (pushFilters returns them as residuals), so pruning is purely an
  * I/O optimization and can never change results.
  */
class GraftLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftLog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftLogTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object GraftLog {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Shards opened by readers since the last reset — the spec's
    * pruning probe (a SparkListener would work too; a counter keeps
    * the assertion exact under local[*]). */
  val filesOpened = new AtomicLong(0)

  /** Write rows as `.graftlog` shards + `.meta` sidecars
    * (`min|max|rows` over event_id), `rowsPerShard` per file in
    * event_id order — ingest-side clustering, which is what makes
    * the sidecar ranges disjoint and the pruning sharp (the q141
    * lesson: skipping power is a property of the LAYOUT). */
  def write(rows: Seq[(Long, Long, Long, String, Double)], dir: String,
      rowsPerShard: Int): Unit = {
    Files.createDirectories(Paths.get(dir))
    rows.sortBy(_._1).grouped(rowsPerShard).zipWithIndex.foreach {
      case (shard, i) =>
        val body = shard.map { case (id, tsUs, uid, typ, v) =>
          s"$id|$tsUs|$uid|$typ|$v"
        }.mkString("", "\n", "\n")
        Files.write(Paths.get(dir, f"shard-$i%05d.graftlog"),
          body.getBytes(StandardCharsets.UTF_8))
        val meta = s"${shard.head._1}|${shard.last._1}|${shard.size}"
        Files.write(Paths.get(dir, f"shard-$i%05d.meta"),
          meta.getBytes(StandardCharsets.UTF_8))
    }
  }
}

class GraftLogTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null, "graftlog source requires a path")
  override def name(): String = s"graftlog($path)"
  override def schema(): StructType = GraftLog.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScanBuilder(path,
      Option(options.get("maxShardsPerTrigger")).map(_.toInt))

  /** Batch write: `df.write.format("graft.sources.GraftLogSource")
    * .mode("append").save(dir)`. The arriving schema must BE the
    * graftlog schema — this is a fixed-format sink, not a generic
    * one; a mismatch is a pipeline bug better thrown at plan time
    * than parsed wrong at read time. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // Spark's own analysis already rejects name/type mismatches
    // against schema() (INCOMPATIBLE_DATA_FOR_TABLE); this require is
    // the backstop for column-ORDER drift, which resolution-by-name
    // would otherwise let through to positional writers.
    val got = info.schema().fields.map(f => (f.name, f.dataType)).toSeq
    val want = GraftLog.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(got == want,
      s"graftlog sink needs schema ${GraftLog.schema.simpleString}, " +
        s"got ${info.schema().simpleString}")
    val shards = Option(info.options().get("shards")).map(_.toInt)
    new WriteBuilder {
      override def build(): Write = new GraftLogWrite(path, shards)
    }
  }
}

/** The write declares its layout needs at the DSv2 seam and CATALYST
  * plans the exchange: `RequiresDistributionAndOrdering` asks for an
  * ordered (range) distribution + per-partition sort on event_id, so
  * every shard covers a disjoint event_id range and the `.meta`
  * sidecar stats prune sharply on read — the q141 lesson (skipping
  * power is a property of the layout) enforced BY the connector
  * instead of hoped for from the caller. A writer that forgets to
  * pre-shape its data still produces a well-clustered log. */
class GraftLogWrite(path: String, shards: Option[Int] = None)
    extends Write with RequiresDistributionAndOrdering {
  private val byEventId: Array[SortOrder] = Array(
    Expressions.sort(Expressions.column("event_id"),
      SortDirection.ASCENDING))
  override def requiredDistribution(): Distribution =
    Distributions.ordered(byEventId)
  override def requiredOrdering(): Array[SortOrder] = byEventId
  // `.option("shards", n)` pins the shard count; the default 0 lets
  // the planner (and AQE coalescing) size the exchange — a tiny
  // write legitimately lands in one shard, a 100 TB one in thousands
  override def requiredNumPartitions(): Int = shards.getOrElse(0)
  override def toBatch: BatchWrite = new GraftLogBatchWrite(path)
  override def description(): String = s"graftlog write $path"
}

class GraftLogBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    new GraftLogWriterFactory(path)
  }
  // Per-shard visibility is handled at the task seam (tmp file +
  // atomic rename in DataWriter.commit; Spark's output commit
  // coordinator admits ONE attempt per partition) and readers treat
  // a missing sidecar as "cannot prune, still read" — so there is no
  // global commit action. A lakehouse-grade all-or-nothing commit
  // would write a manifest here (the store.TimeTravel _SUCCESS
  // pattern); shard-level atomicity is the log-ingest contract.
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftLogWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftLogWriter(path, partitionId, taskId)
}

case class GraftLogCommitMessage(file: String, rows: Long,
    min: Long, max: Long) extends WriterCommitMessage

/** One shard + sidecar per non-empty partition. Data lands in a
  * hidden `.tmp` (invisible to both batch listing and the streaming
  * source's shard poll — neither matches `*.graftlog`), then task
  * commit atomically renames shard BEFORE writing the sidecar: a
  * crash between the two leaves a readable, merely unprunable shard,
  * never a torn or half-visible one. Min/max/count accumulate while
  * writing — stats cost nothing extra. */
class GraftLogWriter(dir: String, pid: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val tmp = Paths.get(dir, f".shard-$pid%05d-$taskId.tmp")
  private val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
  private var n = 0L
  private var mn = Long.MaxValue
  private var mx = Long.MinValue

  override def write(r: InternalRow): Unit = {
    val id = r.getLong(0)
    // TimestampType's internal representation IS micros-since-epoch —
    // the format's ts_us column, no conversion
    out.write(s"$id|${r.getLong(1)}|${r.getLong(2)}|" +
      s"${r.getUTF8String(3)}|${r.getDouble(4)}\n")
    if (id < mn) mn = id
    if (id > mx) mx = id
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (n == 0L) {
      Files.deleteIfExists(tmp)
      GraftLogCommitMessage("", 0L, 0L, 0L)
    } else {
      val shard = Paths.get(dir, f"shard-$pid%05d.graftlog")
      Files.move(tmp, shard,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Files.write(Paths.get(dir, f"shard-$pid%05d.meta"),
        s"$mn|$mx|$n".getBytes(StandardCharsets.UTF_8))
      GraftLogCommitMessage(shard.toString, n, mn, mx)
    }
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmp)
  }

  override def close(): Unit = ()
}

class GraftLogScanBuilder(path: String,
    maxShardsPerTrigger: Option[Int] = None) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftLog.schema

  /** Accept event_id comparisons for shard pruning; return EVERY
    * filter as a residual so Spark re-applies them row-level —
    * pruning stays an I/O optimization, never a semantics change. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("event_id", _) | GreaterThan("event_id", _) |
           GreaterThanOrEqual("event_id", _) | LessThan("event_id", _) |
           LessThanOrEqual("event_id", _) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftLogScan(path, pushed, required, maxShardsPerTrigger)
}

class GraftLogScan(path: String, pushed: Array[Filter],
    required: StructType, maxShardsPerTrigger: Option[Int] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftLogMicroBatchStream(path, required, maxShardsPerTrigger)
  override def description(): String =
    s"graftlog $path pushed=[${pushed.mkString(",")}] " +
      s"cols=[${required.fieldNames.mkString(",")}]"

  /** The pushed event_id interval [lo, hi] (inclusive). */
  private def bounds: (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    pushed.foreach {
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("event_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, v)
      case _ => ()
    }
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = bounds
    val dir = Paths.get(path)
    val shards = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".graftlog")).toSeq.sortBy(_.toString)
    shards.filter { shard =>
      val meta = Paths.get(shard.toString.stripSuffix(".graftlog") + ".meta")
      if (!Files.exists(meta)) true // no stats -> cannot prune
      else {
        val parts = new String(Files.readAllBytes(meta),
          StandardCharsets.UTF_8).trim.split('|')
        val (mn, mx) = (parts(0).toLong, parts(1).toLong)
        mx >= lo && mn <= hi // ranges overlap -> must read
      }
    }.map(p => GraftLogPartition(p.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(required.fieldNames)
}

case class GraftLogPartition(file: String) extends InputPartition

/** Streaming read of a graftlog directory: the offset is how many
  * shards (in name order) have been admitted — the FileStreamSource
  * model on the custom format. New shards appended by an ingest
  * process are picked up by the next `latestOffset` poll;
  * `maxShardsPerTrigger` is the admission-control knob (a micro-batch
  * admits at most that many shards), and Trigger.AvailableNow pins
  * the drain target at start so a concurrent writer cannot keep the
  * drain alive forever. Shards are immutable once written (the
  * sidecar is the commit marker in spirit; ingest writes shard then
  * sidecar), so replaying a (start, end] slice after a crash reads
  * identical data — exactly-once composes with the engine's
  * idempotent foreachBatch sinks. */
case class GraftLogOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"shards":$n}"""
}

class GraftLogMicroBatchStream(path: String, required: StructType,
    maxShardsPerTrigger: Option[Int])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private var availableNowTarget: Option[Int] = None

  private def shardFiles: Seq[String] = {
    val dir = Paths.get(path)
    Files.list(dir).iterator().asScala
      .map(_.toString).filter(_.endsWith(".graftlog")).toSeq.sorted
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(shardFiles.size)

  override def getDefaultReadLimit: ReadLimit =
    maxShardsPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowTarget.getOrElse(shardFiles.size)
    val from = start.asInstanceOf[GraftLogOffset].n
    val admitted = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(target, from + m.maxFiles())
      case _ => target
    }
    GraftLogOffset(math.max(from, admitted))
  }

  override def reportLatestOffset(): Offset =
    GraftLogOffset(availableNowTarget.getOrElse(shardFiles.size))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def initialOffset(): Offset = GraftLogOffset(0)

  override def deserializeOffset(json: String): Offset =
    GraftLogOffset("""\d+""".r.findFirstIn(json).get.toInt)

  override def planInputPartitions(start: Offset, end: Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogOffset].n
    val e = end.asInstanceOf[GraftLogOffset].n
    shardFiles.slice(s, e)
      .map(f => GraftLogPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(required.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class GraftLogReaderFactory(requiredCols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition):
      PartitionReader[InternalRow] =
    new GraftLogReader(
      partition.asInstanceOf[GraftLogPartition].file, requiredCols)
}

/** Line parser materializing ONLY the pruned columns. */
class GraftLogReader(file: String, requiredCols: Array[String])
    extends PartitionReader[InternalRow] {
  GraftLog.filesOpened.incrementAndGet()
  private val lines = Files.lines(Paths.get(file))
  private val it = lines.iterator()
  private var row: InternalRow = _

  // required column -> source field index, resolved once per shard
  private val srcIdx: Array[Int] =
    requiredCols.map(c => GraftLog.schema.fieldIndex(c))

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val line = it.next()
    if (line.isEmpty) return next()
    val parts = line.split('|')
    val values = new Array[Any](srcIdx.length)
    var i = 0
    while (i < srcIdx.length) {
      values(i) = srcIdx(i) match {
        case 0 => parts(0).toLong
        case 1 => parts(1).toLong // TimestampType carries micros
        case 2 => parts(2).toLong
        case 3 => UTF8String.fromString(parts(3))
        case 4 => parts(4).toDouble
      }
      i += 1
    }
    row = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}
