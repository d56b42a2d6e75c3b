package graft

/** Semantic pins for the round-9 census operators: q249 sweep-line
  * peak concurrency (checked against a brute-force instantaneous
  * count on the real data), q250 basket lift (marginal conservation
  * and the lift identity), q251 column profiler (profile rows must
  * agree with directly-computed per-column facts).
  */
class CensusOpsSpec extends SparkSuite {
  import spark.implicits._

  test("q249 peak equals brute-force max instantaneous overlap") {
    val rows = SparkEntry.queries("q249_peak_concurrency")(spark, sf0001)
      .selectExpr("event_type", "peak", "unix_micros(first_peak_ts)",
        "n_at_peak")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val evs = Tables.table(spark, sf0001, "events")
      .selectExpr("event_type", "unix_micros(ts)")
      .as[(String, Long)].collect().toSeq
    val W = 300000000L // 300 s in micros — ts has sub-second parts
    rows.foreach { case (tpe, peak, firstTs, nAtPeak) =>
      val starts = evs.collect { case (t, s) if t == tpe => s }
      // brute force: concurrency just after each start (half-open
      // [s, s+W)) — the sweep's +1 points are the only candidates
      // for a new maximum
      def conc(at: Long) = starts.count(s => s <= at && at < s + W)
      val brute = starts.map(conc).max
      assert(peak === brute, s"$tpe: sweep peak $peak != brute $brute")
      assert(conc(firstTs) === peak,
        s"$tpe: first_peak_ts not actually at peak")
      // no start strictly before firstTs attains the peak
      assert(starts.filter(_ < firstTs).forall(s => conc(s) < peak),
        s"$tpe: an earlier instant already hit the peak")
      assert(nAtPeak >= 1L)
    }
  }

  test("q250 lift identity and marginal bounds hold on every row") {
    val rows = SparkEntry.queries("q250_basket_lift")(spark, sf0001)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty, "support threshold left no pairs at sf0.001")
    val nOrders = Tables.table(spark, sf0001, "lineitem")
      .join(Tables.table(spark, sf0001, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey").distinct().count()
    rows.foreach { case (a, b, nAb, nA, nB, lift) =>
      assert(a < b, "pair not canonically ordered")
      assert(nAb <= math.min(nA, nB), "joint exceeds a marginal")
      assert(nA <= nOrders && nB <= nOrders)
      val expect = BigDecimal(nAb.toDouble * nOrders.toDouble /
        (nA.toDouble * nB.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lift === expect, s"($a,$b) lift mismatch")
    }
    // descending lift with (brand_a, brand_b) tie-break
    val key = rows.map(r => (-r._6, r._1, r._2))
    assert(key === key.sorted, "rows not in declared order")
  }

  test("q251 profile row agrees with direct per-column computation") {
    val prof = SparkEntry.queries("q251_column_profile")(spark, sf0001)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val o = Tables.table(spark, sf0001, "orders")
    val n = o.count()
    assert(prof.values.forall(_._2 === n))
    val ck = prof("o_custkey")
    assert(ck._3 === o.filter($"o_custkey".isNull).count())
    assert(ck._4 === o.select($"o_custkey").distinct().count())
    assert(ck._5.toLong ===
      o.agg(org.apache.spark.sql.functions.min($"o_custkey"))
        .head.getLong(0))
    // the double renders through decimal(18,2): fixed 2dp, no
    // scientific notation
    assert(prof("o_totalprice")._6.matches("""-?\d+\.\d{2}"""))
    // the timestamp renders second-resolution ISO-ish
    assert(prof("o_orderdate")._5
      .matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
  }
}
