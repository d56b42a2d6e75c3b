package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replication scale-up for load testing: writes an N× surrogate of a
  * testdata sf dir as N disjoint key universes (every id column gets
  * replica·stride added), so row volume scales linearly while join
  * fan-outs and per-key densities stay those of the source — the
  * shape real TPC-H scaling has, and the honest way to measure "would
  * this plan survive 10×?" without inventing new data distributions.
  *
  * documents.text gets a per-replica suffix (replica 0 is verbatim):
  * unperturbed copies would make every cross-replica pair an exact
  * near-dup and blow pair counts quadratically — a different (and
  * wrong) workload.
  *
  * events.ts is read as RAW nanosecond longs (no µs conversion), so
  * the written copy round-trips through Tables.table's events branch
  * unchanged. Timestamps are NOT offset: 10× event density in the
  * same time range is exactly what a 10× cluster ingests.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [copies]
  * Defaults: /root/testdata/sf0.1 → /tmp/graft-sf1 ×10.
  */
object ScaleUp {
  private val stride = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(base: DataFrame, keyCols: Seq[String],
        perturbText: Option[String]): DataFrame =
      (0 until copies).map { i =>
        val keyed = keyCols.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(i * stride)))
        perturbText match {
          case Some(tc) if i > 0 =>
            keyed.withColumn(tc, concat(col(tc), lit(s" r$i")))
          case _ => keyed
        }
      }.reduce(_ unionByName _)

    val specs: Seq[(String, Seq[String], Option[String])] = Seq(
      ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey", "l_custkey"),
        None),
      ("orders", Seq("o_orderkey", "o_custkey"), None),
      // nationkeys are NOT offset: nation/region stay 1× (bounded
      // dims), so FKs into them must keep resolving for every replica
      ("customer", Seq("c_custkey"), None),
      ("supplier", Seq("s_suppkey"), None),
      ("part", Seq("p_partkey"), None),
      ("events", Seq("user_id", "event_id"), None),
      ("documents", Seq("doc_id"), Some("text")),
      ("embeddings", Seq("doc_id"), None),
      // bounded dims stay 1×: at any real SF region/nation are fixed
      ("region", Seq(), None),
      ("nation", Seq(), None))

    specs.foreach { case (name, keys, perturb) =>
      val base =
        if (name == "events") {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(graft.Tables.path(src, name))
        } else spark.read.parquet(graft.Tables.path(src, name))
      val present = keys.filter(base.columns.contains)
      val out = if (keys.isEmpty) base
        else replicate(base, present, perturb)
      out.write.mode("overwrite")
        .parquet(graft.Tables.path(dst, name))
      System.err.println(s"[scaleup] $name done")
    }
    spark.stop()
  }
}
