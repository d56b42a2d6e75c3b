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

  test("q252 arms partition the user set; z matches a recompute") {
    val r = SparkEntry.queries("q252_ab_ztest")(spark, sf0001)
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean)]
      .head()
    val (nA, cA, nB, cB, _, _, z, sig) = r
    val nUsers = Tables.table(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(nA + nB === nUsers, "arms must partition the users")
    assert(cA <= nA && cB <= nB)
    assert(cA > 0 && cA < nA, "conversion degenerate in arm A")
    val (na, ca, nb, cb) =
      (nA.toDouble, cA.toDouble, nB.toDouble, cB.toDouble)
    val p = (ca + cb) / (na + nb)
    val zExp = (ca / na - cb / nb) /
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(z - zExp) < 5e-5, s"z $z vs recomputed $zExp")
    assert(sig === (math.abs(zExp) > 1.96))
  }

  test("q253 buckets partition the table into near-eighths") {
    val rows = SparkEntry.queries("q253_equidepth_hist")(spark, sf0001)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(rows.map(_._1) === (1 to 8))
    val n = Tables.table(spark, sf0001, "orders").count()
    assert(rows.map(_._2).sum === n, "bucket populations must sum to n")
    // equi-depth up to boundary ties: every bucket within ±1 of the
    // ceil/floor eighth (o_totalprice has no heavy ties at sf0.001)
    rows.foreach { case (b, cnt, _, _, _) =>
      assert(math.abs(cnt - n / 8.0) <= 1.0,
        s"bucket $b holds $cnt of $n — not equi-depth") }
    // value ranges are ordered and non-overlapping
    rows.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo._4 <= hi._3,
        s"bucket ${lo._1} hi ${lo._4} overlaps ${hi._1} lo ${hi._3}")
      case _ => ()
    }
  }

  test("q254 census partitions the held-out half; beats majority") {
    val rows = SparkEntry.queries("q254_naive_bayes")(spark, sf0001)
      .as[(Boolean, Boolean, Long, Long)].collect().toSeq
    val nTest = Tables.table(spark, sf0001, "documents")
      .filter($"doc_id" % 2 === 1).count()
    assert(rows.map(_._3).sum === nTest, "census must cover the test half")
    val correct = rows.collect { case (a, p, n, _) if a == p => n }.sum
    val majority = math.max(
      rows.collect { case (true, _, n, _) => n }.sum,
      rows.collect { case (false, _, n, _) => n }.sum)
    assert(correct >= majority,
      s"NB accuracy $correct/$nTest below majority $majority")
  }

  test("q255 credit conserves to 1e6 ppm per purchase (floor loss <4)") {
    val rows = SparkEntry.queries("q255_linear_attribution")(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    val np = Tables.table(spark, sf0001, "events")
      .filter($"event_type" === "purchase").count()
    val total = rows.map(_._3).sum
    assert(total <= 1000000L * np, "credit exceeds the purchase mass")
    assert(total >= (1000000L - 4L) * np,
      s"floor loss too large: $total vs ${1000000L * np}")
    // every touch type is one of the known five
    assert(rows.map(_._1).toSet.subsetOf(
      Set("click", "view", "signup", "error", "direct")))
  }

  test("q256 sample membership equals a driver-side recompute") {
    val got = SparkEntry.queries("q256_seq_poisson_sample")(spark, sf0001)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size === 25)
    val docs = Tables.table(spark, sf0001, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toSeq
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = docs
      .map { case (id, w) => (h60(s"${id}_sps").toDouble / w.toDouble, id) }
      .sorted.take(25).map(_._2)
    assert(got.map(_._1) === expect,
      "sample must be the 25 smallest h/w priorities in order")
    got.foreach { case (_, _, ppm) =>
      assert(ppm > 0.0 && ppm <= 1000000.0) }
  }

  test("q257 changepoint matches a driver-side CUSUM recompute") {
    val daily = Tables.table(spark, sf0001, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor($"value" * 100.0)
          .cast("long")).as("x"))
      .as[(String, java.sql.Date, Long)].collect().toSeq
    val rows = SparkEntry.queries("q257_cusum_changepoint")(spark, sf0001)
      .as[(String, Long, java.sql.Date, Double, Int)].collect().toSeq
    rows.foreach { case (tpe, nDays, cpDay, _, _) =>
      val series = daily.filter(_._1 == tpe).sortBy(_._2.toString)
      assert(nDays === series.size.toLong)
      val s = series.map(_._3).sum
      val n = series.size.toLong
      val cs = series.scanLeft(0L)(_ + _._3).tail
        .zipWithIndex.map { case (pref, i) =>
          (BigInt(n) * BigInt(pref) - BigInt(i + 1) * BigInt(s),
            series(i)._2) }
      val cmax = cs.map(_._1.abs).max
      val cpExpect = cs.filter(_._1.abs == cmax).map(_._2.toString).min
      assert(cpDay.toString === cpExpect, s"$tpe changepoint mismatch")
      // telescoping identity: the final cumulative deviation is zero
      assert(cs.last._1 === BigInt(0))
    }
  }

  test("q258 calibration buckets cover the test half; gap identity") {
    val rows = SparkEntry.queries("q258_nb_calibration")(spark, sf0001)
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    val nTest = Tables.table(spark, sf0001, "documents")
      .filter($"doc_id" % 2 === 1).count()
    assert(rows.map(_._2).sum === nTest)
    rows.foreach { case (b, _, conf, frac, gap) =>
      assert(b >= 0 && b <= 9)
      assert(conf >= 0.0 && conf <= 1.0 && frac >= 0.0 && frac <= 1.0)
      assert(math.abs(gap - math.abs(
        BigDecimal(conf - frac).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)) < 1e-9)
    }
  }

  test("q259 gap count identity: n_events minus one per timeline") {
    val rows = SparkEntry.queries("q259_interarrival")(spark, sf0001)
      .as[(String, Long, Double, Double, Long, Long, Long, Long)]
      .collect().toSeq
    val ev = Tables.table(spark, sf0001, "events")
    rows.foreach { case (tpe, nGaps, mean, rate, a, b, c, d) =>
      val n = ev.filter($"event_type" === tpe).count()
      val timelines = ev.filter($"event_type" === tpe)
        .select($"user_id").distinct().count()
      assert(nGaps === n - timelines,
        s"$tpe: each (user,type) timeline loses exactly its first event")
      assert(a + b + c + d === nGaps, s"$tpe: census must cover gaps")
      assert(mean > 0.0 && rate > 0.0)
    }
  }

  test("q260 estimate inputs are exact; actual equals a real join") {
    val r = SparkEntry.queries("q260_join_card_estimate")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double, Double)]
      .head()
    val (nA, dA, nB, dB, actual, estN, estM, qN, qM) = r
    val ev = Tables.table(spark, sf0001, "events")
    val os = Tables.table(spark, sf0001, "orders")
    assert(nA === ev.count() && nB === os.count())
    assert(dA === ev.select($"user_id").distinct().count())
    assert(dB === os.select($"o_custkey").distinct().count())
    assert(actual ===
      ev.join(os, $"user_id" === $"o_custkey").count())
    assert(estN > 0.0 && estM > 0.0)
    // the reported q-errors are the estimates over the actual
    assert(math.abs(qN - BigDecimal(estN / actual).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-4)
    assert(math.abs(qM - BigDecimal(estM / actual).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-4)
  }
}
