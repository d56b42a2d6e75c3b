package graft

import graft.queries.HybridQueries

/** Properties of the fusion/governance/layout operators that the
  * hash-match oracles can't express: set containment of the fused
  * candidates, the DP noise bound, and the layout's skipping power
  * (value equality itself is pinned by q139/q140/q141's oracles). */
class HybridQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("q139: fused ids come from the two top-20 legs, both-leg " +
    "rows score 1/(60+rs) + 1/(60+rd)") {
    val fused = HybridQueries.queries("q139_hybrid_rrf")(spark, sf0001)
      .collect()
    assert(fused.length === 10)
    // every fused row cites at least one leg, and the rrf recomputes
    // from the reported ranks exactly (0 = absent leg)
    fused.foreach { r =>
      val (rs, rd) = (r.getAs[Int]("sparse_rank"), r.getAs[Int]("dense_rank"))
      assert(rs > 0 || rd > 0)
      assert(rs <= 20 && rd <= 20)
      val expect = (if (rs > 0) 1.0 / (60.0 + rs) else 0.0) +
        (if (rd > 0) 1.0 / (60.0 + rd) else 0.0)
      assert(r.getAs[Double]("rrf") === expect)
    }
    // fused list is rrf-descending and both-leg docs (if any) beat
    // the best single-leg doc at equal ranks
    val scores = fused.map(_.getAs[Double]("rrf")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("q140: DP counts stay within the geometric mechanism's " +
    "support and replay deterministically") {
    val rel = HybridQueries.queries("q140_dp_group_counts")(spark, sf0001)
    val a = rel.collect()
    val exact = graft.Tables.table(spark, sf0001, "documents")
      .groupBy($"lang", $"source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    a.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val nDp = r.getAs[Long]("n_dp")
      // |noise| <= 31 per 32-bit leading-zero draw, clamped at 0
      assert(nDp >= math.max(0L, exact(key) - 31) && nDp <= exact(key) + 31)
    }
    // same salt, same release: the mechanism is a pure function of
    // the key (the deterministic test rendering)
    val b = HybridQueries.queries("q140_dp_group_counts")(spark, sf0001)
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // the mechanism does perturb: not every group survives unchanged
    assert(a.exists { r =>
      r.getAs[Long]("n_dp") != exact((r.getString(0), r.getString(1)))
    })
  }

  test("q141: z-order layout skips strictly more files than linear " +
    "on the 2-D probe, and both layouts partition the table") {
    val zm = HybridQueries.queries("q141_zorder_layout")(spark, sf0001)
      .collect()
    val byLayout = zm.groupBy(_.getAs[String]("layout"))
    val total = graft.Tables.table(spark, sf0001, "lineitem").count()
    byLayout.foreach { case (_, files) =>
      assert(files.map(_.getAs[Long]("n_rows")).sum === total)
    }
    def skipFrac(layout: String): (Int, Int) = {
      val fs = byLayout(layout)
      (fs.count(_.getAs[Boolean]("skip_probe")), fs.length)
    }
    val (zSkip, zFiles) = skipFrac("zorder")
    val (lSkip, lFiles) = skipFrac("linear")
    // linear layout can only prune on x: files overlapping x∈[10,19]
    // are unprunable because min_y..max_y spans the probe's y range
    val linUnprunable = byLayout("linear").filter(f =>
      !f.getAs[Boolean]("skip_probe"))
    assert(linUnprunable.forall(f =>
      f.getAs[Int]("min_y") < 20 && f.getAs[Int]("max_y") > 29))
    // the z-order point: a strictly larger skipped FRACTION
    assert(zSkip.toDouble / zFiles > lSkip.toDouble / lFiles,
      s"zorder $zSkip/$zFiles vs linear $lSkip/$lFiles")
  }
}
