package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 statistics/graph operators beyond
  * the hash gate: q263 Kaplan-Meier (risk-set telescoping + the exact
  * integer survival fold recomputed), q264 PAV (monotone fit +
  * weighted-mean conservation up to ppm quantization), q265 SES
  * (convexity: a weights-sum-to-1 smoother never leaves the hull of
  * its lags), q266 BFS (driver-side BFS replay), q267/q268
  * (Mann-Kendall S and the Theil-Sen median recomputed from the raw
  * pairs), q270 k-means (final assignment is argmin over the output
  * centroids), q271 bootstrap (CI brackets, replicate count).
  */
class StatsOpsSpec extends SparkSuite {
  import spark.implicits._

  test("q263 KM: risk set telescopes and the ppb fold replays") {
    val rows = SparkEntry.queries("q263_kaplan_meier")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // n_risk telescoping: each bucket's at-risk = previous minus
    // previous bucket's departures (deaths + censored)
    rows.sliding(2).foreach {
      case Seq((_, _, n1, d1, c1, _), (_, _, n2, _, _, _)) =>
        assert(n2 == n1 - d1 - c1)
      case _ =>
    }
    // survival is non-increasing and replays the exact integer fold
    var s = 1000000000L
    rows.foreach { case (_, _, n, d, _, surv) =>
      s = s * (n - d) / n
      assert(surv == s)
    }
  }

  test("q264 PAV: monotone and conserves the weighted mean to ppm") {
    val rows = SparkEntry.queries("q264_isotonic_calibration")(
      spark, sf0001)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Seq((_, _, _, i1), (_, _, _, i2)) => assert(i1 <= i2)
      case _ =>
    }
    // PAV preserves the n-weighted mean exactly on rationals; both
    // sides here are floor-quantized to ppm, so the drift is bounded
    // by one ppm unit per row of weight
    val n = rows.map(_._2).sum
    val drift = rows.map { case (_, w, emp, iso) => w * (iso - emp) }
      .sum
    assert(math.abs(drift) <= 2L * n)
  }

  test("q265 SES: forecast stays in the convex hull of its 14 lags") {
    val daily = Tables.table(spark, sf0001, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2.toString).map(_._3).toVector
      }
    val out = SparkEntry.queries("q265_ses_forecast")(spark, sf0001)
      .selectExpr("event_type", "actual_cents", "f8192",
        "forecast_cents")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // replay the integer combination from the raw series
    val expect = daily.flatMap { case (t, ys) =>
      (14 until ys.length).map { i =>
        val f = (1 to 13).map(l => ys(i - l) * (1L << (13 - l))).sum +
          ys(i - 14)
        (t, ys(i)) -> f
      }
    }.toMap
    out.foreach { case (t, actual, f8192, fc) =>
      assert(expect((t, actual)) == f8192)
      val window = daily(t)
      assert(fc >= window.min && fc <= window.max)
    }
  }

  test("q266 BFS: hop census matches a driver-side BFS replay") {
    val li = Tables.table(spark, sf0001, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ords = Tables.table(spark, sf0001, "orders")
      .select($"o_orderkey", $"o_custkey")
    val pairs = li.join(ords, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("cust"), ($"l_suppkey" + 1000000L)
        .as("supp")).as[(Long, Long)].collect().toSeq
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val src = pairs.map(_._1).min
    var dist = Map(src -> 0)
    var frontier = Set(src)
    for (h <- 1 to 6; if frontier.nonEmpty) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .diff(dist.keySet)
      dist ++= nxt.map(_ -> h)
      frontier = nxt
    }
    val expect = dist.groupBy(_._2).map { case (h, m) =>
      h -> (m.size.toLong, m.keys.min, m.keys.max, m.keys.sum)
    }
    val got = SparkEntry.queries("q266_bfs_hops")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1).toSet == expect.keySet)
    got.foreach { case (h, n, mn, mx, sm) =>
      assert(expect(h) == ((n, mn, mx, sm)))
    }
  }

  test("q267/q268: S statistic and Theil-Sen median replay per type") {
    val daily = Tables.table(spark, sf0001, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(sum(floor($"value" * lit(100.0)).cast("long")).as("y"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2.toString).map(_._3).toVector
      }
    val mk = SparkEntry.queries("q267_mann_kendall")(spark, sf0001)
      .selectExpr("event_type", "n_days", "s_stat")
      .as[(String, Long, Long)].collect().toSeq
    assert(mk.nonEmpty)
    mk.foreach { case (t, n, sStat) =>
      val ys = daily(t)
      assert(n == ys.length)
      val s = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield java.lang.Long.signum(ys(j) - ys(i)).toLong).sum
      assert(sStat == s)
    }
    val ts = SparkEntry.queries("q268_theil_sen")(spark, sf0001)
      .selectExpr("event_type", "n_pairs", "lo_ucents", "hi_ucents")
      .as[(String, Long, Long, Long)].collect().toSeq
    ts.foreach { case (t, m, lo, hi) =>
      val ys = daily(t)
      val slopes = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield (ys(j) - ys(i)) * 1000000L / (j - i)).sorted
      assert(m == slopes.length)
      assert(lo == slopes((slopes.length - 1) / 2))
      assert(hi == slopes(slopes.length / 2))
    }
  }

  test("q270 k-means: reported assignment is argmin over centroids") {
    val out = SparkEntry.queries("q270_kmeans_lloyd")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2).sum > 0 && out.size <= 4)
    val cents = out.map(c => (c._1, c._3, c._4))
    val pts = Tables.table(spark, sf0001, "orders")
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * lit(100.0)).cast("long"))
        .as("x"), count(lit(1)).as("n"))
      .selectExpr("x", "x DIV n AS y")
      .as[(Long, Long)].collect().toSeq
    def assign(x: Long, y: Long): Int = cents.minBy { case (c, cx, cy) =>
      ((x - cx) * (x - cx) + (y - cy) * (y - cy), c)
    }._1
    val census = pts.groupBy(p => assign(p._1, p._2))
      .map { case (c, v) => c -> v.size.toLong }
    out.foreach { case (cid, n, _, _, wcss) =>
      assert(census(cid) == n)
      assert(wcss >= 0)
    }
  }

  test("q271 bootstrap: CI brackets and replicate count") {
    val r = SparkEntry.queries("q271_poisson_bootstrap")(spark, sf0001)
      .as[(Long, Double, Double, Double, Double)].collect()(0)
    val (nReps, mean, lo, hi, se) = r
    assert(nReps == 32 && lo <= hi && se > 0)
    assert(mean > lo - 10 * se && mean < hi + 10 * se)
  }

  test("q277 RRF: fused score is exactly the two leg contributions") {
    val rows = SparkEntry.queries("q277_rrf_fusion")(spark, sf0001)
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rrf, lexR, vecR) =>
      val expect = (if (lexR > 0) 1000000000L / (60 + lexR) else 0L) +
        (if (vecR > 0) 1000000000L / (60 + vecR) else 0L)
      assert(rrf == expect)
    }
    // per probe: ≤5 rows, score non-increasing
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.size <= 5)
      val s = g.sortBy(r => (-r._3, r._2)).map(_._3)
      assert(s == s.sorted.reverse)
    }
  }

  test("q280/q281: correlation and drift statistics stay in range") {
    val corr = SparkEntry.queries("q280_corr_matrix")(spark, sf0001)
      .selectExpr("r").as[Double].collect()
    assert(corr.length == 10)
    corr.foreach(r => assert(r >= -1.0000001 && r <= 1.0000001))
    val drift = SparkEntry.queries("q281_dist_drift")(spark, sf0001)
      .selectExpr("tv_ppm", "chi2_micro").as[(Long, Long)].collect()
    assert(drift.nonEmpty)
    drift.foreach { case (tv, chi) =>
      assert(tv >= 0 && tv <= 1000000 && chi >= 0)
    }
  }

  test("q284 level-1 row replays q257's single changepoint") {
    val all = SparkEntry.queries("q284_binary_segmentation")(
      spark, sf0001)
      .filter($"segment" === "all")
      .selectExpr("event_type", "n_days", "cp_day",
        "max_dev_dollar_days")
      .as[(String, Long, java.sql.Date, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3.toString, r._4))).toMap
    val q257 = SparkEntry.queries("q257_cusum_changepoint")(
      spark, sf0001)
      .selectExpr("event_type", "CAST(n_days AS BIGINT)", "cp_day",
        "max_dev_dollar_days")
      .as[(String, Long, java.sql.Date, Double)].collect()
    assert(q257.nonEmpty)
    q257.foreach { case (t, n, cp, dev) =>
      assert(all(t) == ((n, cp.toString, dev)))
    }
  }

  test("q285: every bucket's min/max sit inside [2^k, 2^(k+1))") {
    val rows = SparkEntry.queries("q285_log2_histogram")(spark, sf0001)
      .selectExpr("bucket", "min_us", "max_us")
      .as[(Int, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (k, mn, mx) =>
      assert(mn >= (1L << k) || k == 0)
      assert(mx < (1L << (k + 1)))
      assert(mn <= mx)
    }
  }
}
