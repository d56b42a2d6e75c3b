package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.GraftLog

/** Child-PROCESS appender for the cross-process publish race
  * (GraftLogConcurrencySpec): stages one hidden tmp per batch and
  * commits it through [[GraftLog.publishAppend]] — the exact path a
  * V2 append job takes at job commit — so a parent JVM can race its
  * own appends/token mints against a genuinely separate process.
  * Args: dir, startId, batches, rowsPerBatch. No SparkSession: the
  * publish path is pure metadata. */
object AppendProc {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    var id = args(1).toLong
    val batches = args(2).toInt
    val per = args(3).toInt
    (0 until batches).foreach { _ =>
      val tmp = s".proc-${java.util.UUID.randomUUID().toString.take(8)}.tmp"
      val body = (0 until per).map { j =>
        val i = id + j
        s"$i|1700000000000000|${i % 7}|proc|0.5"
      }.mkString("", "\n", "\n")
      Files.write(Paths.get(dir, tmp),
        body.getBytes(StandardCharsets.UTF_8))
      GraftLog.publishAppend(dir,
        Seq((tmp, s"$id|${id + per - 1}|$per", None)))
      id += per
    }
    println(s"appended ${batches.toLong * per} rows")
  }
}
