package graft

import org.apache.spark.sql.functions.{col, collect_list, struct}

import graft.text.{Chunking, Sampling}

/** Context-window chunking invariants + the quality quantile trim. */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Tables.table(spark, sf0001, "documents")

  test("chunk: every token of every doc is covered by exactly the expected windows") {
    val window = 64; val stride = 48
    val chunks = Chunking.chunk(docs, "doc_id", "text", window, stride)
      .select($"doc_id", $"chunk_id", $"start_token", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
    val lens = docs.selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .as[(Long, Int)].collect().toMap
    assert(chunks.keySet === lens.keySet)
    chunks.foreach { case (id, cs) =>
      val n = lens(id).toLong
      // chunk ids dense from 0; starts at multiples of stride
      assert(cs.map(_._2) === (0L until cs.length).toSeq)
      cs.foreach { case (_, cid, st, nt) =>
        assert(st === cid * stride)
        assert(nt === math.min(window, n - st), s"doc $id chunk $cid")
      }
      // union of [start, start+n_tokens) covers [0, n) with no gap
      assert(cs.map(_._3).max < n, "last chunk starts inside the doc")
      assert(cs.last._3 + cs.last._4 === n, "tail reaches the end")
      cs.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(1)._3 <= pair(0)._3 + pair(0)._4, "no coverage gap")
        assert(pair(1)._3 + pair(1)._4 > pair(0)._3 + pair(0)._4,
          "no window fully contained in its predecessor (duplicated content)")
      }
      // window-count formula: 1 if n <= window else ceil((n-window)/stride)+1
      val expect = if (n <= window) 1L
        else (n - window + stride - 1) / stride + 1
      assert(cs.length.toLong === expect, s"doc $id chunk count")
    }
  }

  test("chunk with stride == window reconstructs each document exactly") {
    val rebuilt = Chunking.chunk(docs, "doc_id", "text", 32, 32)
      .orderBy($"doc_id", $"chunk_id")
      .groupBy($"doc_id")
      .agg(collect_list(struct($"chunk_id", $"chunk_text")).as("cs"))
      .selectExpr("doc_id",
        "array_join(transform(array_sort(cs), c -> c.chunk_text), ' ') AS t")
      .as[(Long, String)].collect().toMap
    val original = docs.select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    assert(rebuilt === original)
  }

  test("chunk rejects invalid window/stride") {
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, "doc_id", "text", 0, 1))
    intercept[IllegalArgumentException](
      Chunking.chunk(docs, "doc_id", "text", 16, 32))
  }

  test("qualityTopFraction keeps exactly ceil(frac·n) best docs per source") {
    val frac = 0.3
    val kept = Sampling.qualityTopFraction(docs, "doc_id", "source", "text", frac)
      .select($"doc_id", $"source", $"quality_score")
      .as[(Long, String, Double)].collect()
    val all = docs.select($"doc_id", $"source",
        graft.text.TextFunctions.qualityScore($"text"))
      .as[(Long, String, Double)].collect()
    all.groupBy(_._2).foreach { case (src, rows) =>
      val k = kept.filter(_._2 == src)
      assert(k.length === math.ceil(rows.length * frac).toLong, src)
      // the kept set IS the prefix of the (quality desc, id) ranking
      val expect = rows.sortBy(r => (-r._3, r._1)).take(k.length)
        .map(_._1).toSet
      assert(k.map(_._1).toSet === expect, src)
    }
    // frac=1 keeps everything, frac=0 keeps nothing
    assert(Sampling.qualityTopFraction(docs, "doc_id", "source", "text", 1.0)
      .count() === docs.count())
    assert(Sampling.qualityTopFraction(docs, "doc_id", "source", "text", 0.0)
      .count() === 0L)
  }
}
