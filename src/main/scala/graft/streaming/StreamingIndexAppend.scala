package graft.streaming
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.Q
import graft.vector.Ivf

/** Streaming rendering of the q143 index-append path: embedding rows
  * arrive as a stream, each micro-batch is assigned under the STATIC
  * model inside foreachBatch — a pure per-row argmax, no stream
  * state — and appended to the cell-partitioned at-rest index
  * (Ivf.writeIndex layout, append mode). This is how a 100 TB vector
  * store actually ingests: the model is fixed between re-fits (q143's
  * drift gate decides when), arriving vectors land in their cell
  * directory as they drain, and a probe stream reads nprobe/cells of
  * the files via partition pruning the whole time. With
  * Trigger.AvailableNow over a finite source the drained index equals
  * the batch assignment of the same rows — what the oracle checks.
  *
  * The model is fit on the base corpus (vec_id % 5 ≠ 0, q143's
  * split) and the STREAM carries the append batch (% 5 = 0): fit
  * input and streamed input are disjoint, like production.
  */
object StreamingIndexAppend {
  private val runId = new AtomicInteger(0)

  def streamedIndexAppend(spark: SparkSession, dir: String): DataFrame =
    StreamTuning.withStatePartitions(spark) {
    import spark.implicits._
    val emb = Q.fanout(graft.Tables.table(spark, dir, "embeddings"))
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val n = base.count()
    val bits = if (n <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
    val cells = 1 << math.max(4, math.min(12, bits / 2))
    val model = Ivf.fit(base, "vec_id", "embedding", cells = cells,
      iters = 1)
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_stream_idx_${runId.incrementAndGet()}_")
      .toString
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val q = spark.readStream
      .schema(schema)
      .parquet(s"$dir/embeddings.parque*")
      .filter($"vec_id" % 5 === 0)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // assignment is stateless per-row compute; append lands each
        // row under its cell directory (the at-rest index layout)
        Ivf.assign(batch, model, corpusId = "vec_id")
          .write.partitionBy("cell").mode("append").parquet(s"$out/index")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Ivf.openIndex(spark, s"$out/index")
      .select($"vec_id", $"cell".cast("int").as("cell"))
      .orderBy($"vec_id")
  }

  val queries: Map[String, Q.Fn] = Map(
    "q146_stream_index_append" -> ((s, dir) => streamedIndexAppend(s, dir)))

  /** Drained stream == batch assignment of the same rows: the q143
    * oracle's Lloyd replay (fit on base, score everything), restricted
    * to the streamed (% 5 = 0) ids. */
  val oracles: Map[String, String] = Map(
    "q146_stream_index_append" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id % 5 <> 0),
          ${graft.queries.VectorQueries.lloydCtesSplit("base", "embeddings")},
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1) WHERE rn = 1)
          SELECT vec_id, cell FROM asg
          WHERE vec_id % 5 = 0
          ORDER BY vec_id""")
}
