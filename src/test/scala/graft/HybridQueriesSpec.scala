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

  test("q140 mechanism: the noise IS two-sided geometric (p = 1/2) " +
    "across the key space") {
    // The release's per-group noise = bitlen(h2) − bitlen(h1) over two
    // uniform 32-bit hash draws; P(bitlen = 32−k) = 2^−(k+1), so the
    // difference is P(d) = 2^−|d|/3 — the discrete-Laplace (geometric)
    // mechanism at ε = ln 2. The bound check above pins support; this
    // pins the SHAPE by replaying the exact integer pipeline (md5 →
    // first 8 hex → bit length) over a large synthetic key space, the
    // way a real release would draw fresh keyed noise via its secret
    // per-release salt. NB the fixed '_dp1'/'_dp2' salts in the q140
    // TEST RENDERING make the noise recomputable from public keys —
    // deterministic-replay harness semantics, NOT a private release;
    // production must use a secret fresh salt per release (same plan).
    val md = java.security.MessageDigest.getInstance("MD5")
    def bitlen(key: String): Int = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.toBinaryString(java.lang.Long.parseLong(hex, 16)).length
    }
    val n = 40000
    val noise = (0 until n).map(i => bitlen(s"k$i|s_dp2") - bitlen(s"k$i|s_dp1"))
    val mean = noise.sum.toDouble / n
    assert(math.abs(mean) < 0.05, s"mean $mean") // Var = 4 ⇒ se ≈ 0.01
    val freq = noise.groupBy(identity).view.mapValues(_.size.toDouble / n)
    for (d <- -3 to 3) {
      val expect = math.pow(2.0, -math.abs(d)) / 3.0
      val got = freq.getOrElse(d, 0.0)
      assert(math.abs(got - expect) < 0.02, s"P($d): got $got expect $expect")
    }
    // strict two-sided decay out to |d| = 4
    for (k <- 0 to 3) {
      val pk = freq.getOrElse(k, 0.0) + freq.getOrElse(-k, 0.0)
      val pk1 = freq.getOrElse(k + 1, 0.0) + freq.getOrElse(-(k + 1), 0.0)
      assert(pk1 < pk, s"no decay at |d|=$k→${k + 1}")
    }
    // the production seam: a different release salt draws different
    // noise (same mechanism, fresh randomness) — so a SECRET salt is
    // all that separates the replay harness from a private release
    val docs = graft.Tables.table(spark, sf0001, "documents")
    val a = HybridQueries.dpGroupCounts(docs, salt = "_dp").collect()
    val c = HybridQueries.dpGroupCounts(docs, salt = "_release7").collect()
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("q141 sweep: z-order skipping dominates across 2-D probe " +
    "selectivities; linear wins only the 1-D x probe") {
    // the manifest carries full (min,max) boxes, so any probe can be
    // evaluated from the collected rows — sweep probes from tight to
    // wide and pin the layout trade, not just the single hardcoded box
    val zm = HybridQueries.queries("q141_zorder_layout")(spark, sf0001)
      .collect()
    val byLayout = zm.groupBy(_.getAs[String]("layout"))
    def skipped(layout: String, x0: Int, x1: Int, y0: Int, y1: Int): Int =
      byLayout(layout).count { f =>
        f.getAs[Int]("max_x") < x0 || f.getAs[Int]("min_x") > x1 ||
          f.getAs[Int]("max_y") < y0 || f.getAs[Int]("min_y") > y1
      }
    // tight and mid-size 2-D boxes in-domain (x = quantity 1..50,
    // y = partkey % 64): z-order must skip strictly more files
    val boxes = Seq((10, 19, 20, 29), (1, 5, 1, 5), (30, 39, 48, 59),
      (20, 35, 8, 23))
    boxes.foreach { case (x0, x1, y0, y1) =>
      assert(skipped("zorder", x0, x1, y0, y1) >
        skipped("linear", x0, x1, y0, y1),
        s"probe x∈[$x0,$x1] y∈[$y0,$y1]")
    }
    // the 1-D x-only probe (y unconstrained) is linear's home game:
    // a single-dimension sort puts the whole x range in few files,
    // while z-order dilutes x locality across the y bits — the
    // documented trade every Z-ORDER-vs-linear layout choice weighs
    val zX = skipped("zorder", 10, 19, 0, 63)
    val lX = skipped("linear", 10, 19, 0, 63)
    assert(lX >= zX, s"linear $lX should win the 1-D probe vs zorder $zX")
    assert(zX > 0, "z-order still prunes some files on the 1-D probe")
  }
}
