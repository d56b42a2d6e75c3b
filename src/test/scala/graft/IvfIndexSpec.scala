package graft

import org.apache.spark.sql.functions._

import graft.vector.Ivf

/** The persisted IVF index: cell directories are the inverted lists,
  * probes must physically touch only their cells' files, and search
  * over the reopened index must equal search over the in-memory
  * assignment. */
class IvfIndexSpec extends SparkSuite {
  import spark.implicits._

  test("write/open index: identical results, cell-pruned file reads") {
    val emb = Tables.table(spark, sf0001, "embeddings")
    val model = Ivf.fit(emb, "vec_id", "embedding", cells = 8, iters = 1)
    val assigned = Ivf.assign(
      emb.withColumnRenamed("vec_id", "neighbor_id"), model)
    val dir = tmpDir("ivf_index").toString + "/index"
    Ivf.writeIndex(assigned, dir)
    val idx = Ivf.openIndex(spark, dir)

    val q = emb.filter($"vec_id" < 5).withColumnRenamed("vec_id", "query_id")
    def run(corpus: org.apache.spark.sql.DataFrame) =
      Ivf.searchAssigned(q, corpus, model, k = 5, nprobe = 2)
        .select($"query_id", $"rank", $"neighbor_id")
        .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(run(idx) === run(assigned),
      "persisted index must reproduce the in-memory search exactly")

    // physical pruning: a probe restricted to two cells may only read
    // files under those two cell directories
    val touched = idx.filter($"cell".isin(0, 1))
      .select(input_file_name()).distinct().as[String].collect()
    assert(touched.nonEmpty)
    assert(touched.forall(f => f.contains("cell=0/") || f.contains("cell=1/")),
      s"probe read outside its cells: ${touched.mkString(", ")}")
  }
}
