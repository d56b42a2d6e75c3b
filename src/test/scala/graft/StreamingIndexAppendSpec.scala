package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIndexAppend
import graft.vector.Ivf

/** q146: the drained streaming index append must equal the batch
  * assignment of the same rows under the same static model (the
  * DuckDB oracle pins this against the Lloyd replay; here the same
  * property is pinned engine-side, plus the id-space contract: ONLY
  * the streamed (% 5 = 0) ids land in the index). */
class StreamingIndexAppendSpec extends SparkSuite {
  import spark.implicits._

  test("drained stream equals batch assignment; only appended ids present") {
    val streamed = StreamingIndexAppend
      .streamedIndexAppend(spark, sf0001)
      .as[(Long, Int)].collect().toSeq

    val emb = Tables.table(spark, sf0001, "embeddings")
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val n = base.count()
    val bits = if (n <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
    val cells = 1 << math.max(4, math.min(12, bits / 2))
    val model = Ivf.fit(base, "vec_id", "embedding", cells = cells, iters = 1)
    val batch = emb.filter($"vec_id" % 5 === 0)
      .select($"vec_id", Ivf.cellColumn($"embedding", model).as("cell"))
      .orderBy($"vec_id")
      .as[(Long, Int)].collect().toSeq

    assert(streamed === batch)
    assert(streamed.map(_._1).forall(_ % 5 == 0))
    assert(streamed.nonEmpty)
  }
}
