package graft

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class OpsQueriesSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic events table dir: `n` events in arrival order
    * (event_id), event time mostly increasing but pulled back by a
    * seeded pseudo-random lateness so every delay bucket is hit. */
  private def eventsDir(n: Int): String = {
    val rnd = new scala.util.Random(42)
    val base = 1700000000000000L // µs
    val rows = (0 until n).map { i =>
      val lateUs = rnd.nextInt(10) match {
        case 0 => rnd.nextInt(90) * 1000000L            // < 90 s
        case 1 => (60 + rnd.nextInt(900)) * 1000000L    // 1-16 min
        case 2 => (900 + rnd.nextInt(4000)) * 1000000L  // 15 min - 1.3 h
        case _ => 0L
      }
      (i.toLong, new Timestamp((base + i * 5000000L - lateUs) / 1000),
        i.toLong % 7, "view", 1.0, "{}")
    }
    val dir = tmpDir("ops_events_").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q147 two-phase prefix max == naive global window, all delays") {
    val dir = eventsDir(5000)
    val got = SparkEntry.queries("q147_watermark_advisor")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq

    // naive single-window rendering (the scale-hostile form the
    // two-phase plan must reproduce exactly)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val prevMax = max($"ts").over(Window.orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1))
    val late = ev.withColumn("late_us",
      when(prevMax.isNull, 0L).otherwise(
        greatest(lit(0L), unix_micros(prevMax) - unix_micros($"ts"))))
      .select($"late_us").as[Long].collect()
    val n = late.length.toLong
    val want = Seq(0L, 60L, 300L, 900L, 3600L).map { d =>
      val nl = late.count(_ > d * 1000000L).toLong
      (d, nl, nl * 1000 / n)
    }
    assert(got == want)
    // the synthetic log must exercise real out-of-orderness at
    // several delays, or this test proves nothing
    val byDelay = got.map(r => r._1 -> r._2).toMap
    assert(byDelay(0L) > byDelay(60L))
    assert(byDelay(60L) > byDelay(900L))
    assert(byDelay(900L) > 0L)
  }

  test("q147 in-order log reports zero late events at every delay") {
    val dir = tmpDir("ops_inorder_").toString
    val base = 1700000000000L
    (0 until 500).map(i =>
        (i.toLong, new Timestamp(base + i * 1000L), i.toLong % 3,
          "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q147_watermark_advisor")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("q153 flags a planted hot key and sizes its salt count") {
    // events: 1000 rows for user 0, 10 each for users 1..50 → mean
    // rows/key = 1500/51 ≈ 29.4; orders/lineitem: uniform stand-ins
    val base = 1700000000000L
    val ev = (0 until 1000).map(i => (i.toLong, 0L)) ++
      (0 until 500).map(i => (1000L + i, 1L + i % 50))
    val dir = tmpDir("ops_skew_").toString
    ev.map { case (id, u) =>
        (id, new Timestamp(base + id), u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    (0 until 100).map(i => (i.toLong, i.toLong % 20))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (0 until 100).map(i => (i.toLong, i.toLong % 25))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q153_skew_report")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // hot key 0 with 1000 rows; skew = 1000·51·1000 div 1500 = 34000;
    // salts = ceil(1000·51 / 1500) = 34
    assert(rows("events.user_id") == ((1500L, 51L, 1000L, 0L, 34000L, 34L)))
    // uniform tables sit at exactly the uniform share (1000‰, 1 salt)
    assert(rows("orders.o_custkey")._5 == 1000L)
    assert(rows("orders.o_custkey")._6 == 1L)
  }

  test("q149 as-of-v2 state equals the batch fold of the raw log") {
    val dir = eventsDir(900)
    val got = SparkEntry.queries("q149_time_travel")(spark, dir)
    // reconstruct version 2 directly from the log (batches 0 and 1)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .filter($"event_id" % 3 =!= 2)
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val want = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .orderBy($"user_id")
    assert(got.collect().toSeq == want.collect().toSeq)
    // one state row per user seen in the first two batches
    assert(got.count() ==
      ev.select($"user_id").distinct().count())
  }

  /** Synthetic lineitem/orders/customer dir with a PLANTED heavy
    * hitter: part 7 on 1000 of 3000 lines, the rest uniform over 200
    * parts — so the top-10 census has one unambiguous head and a
    * known exact count for it. */
  private def cmsDir(): String = {
    val dir = tmpDir("ops_cms_").toString
    val lines = (0 until 1000).map(i => (i.toLong, 7L)) ++
      (0 until 2000).map(i => (1000L + i, (i % 200).toLong + 100L))
    lines.toDF("l_orderkey", "l_partkey").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0 until 500).map(i => (i.toLong, (i % 50).toLong))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (0 until 50).map(i => Tuple1(i.toLong)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("q157 CMS estimates never underestimate and find the planted head") {
    val dir = cmsDir()
    val rows = SparkEntry.queries("q157_cms_heavy_hitters")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.size == 10)
    // one-sided error: est >= exact for EVERY probed key (the CMS
    // hard guarantee — a single violation means a broken hash/bucket)
    rows.foreach { case (k, exact, est, over) =>
      assert(est >= exact, s"key $k underestimated: $est < $exact")
      assert(over == est - exact)
    }
    // the planted head surfaces first with its exact count intact
    val (headKey, headExact, headEst, _) = rows.head
    assert(headKey == 7L && headExact == 1000L)
    // eps*N overestimate bound (e/w * N, doubled for slack): with
    // N=3000, w=512 the bound is ~32; a blowout means bucket skew
    assert(headEst - headExact <= 2 * 3 * 3000 / 512,
      s"head overestimate ${headEst - headExact} blows the eps*N bound")
  }

  test("q185 merged read carries both generations; old rows get null lang") {
    val out = tmpDir("schemaevo_direct_").toString
    val docs = Tables.table(spark, sf0001, "documents")
    docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"source", $"n_chars")
      .write.mode("overwrite").parquet(s"$out/gen=1")
    docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"source", $"n_chars", $"lang")
      .write.mode("overwrite").parquet(s"$out/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.contains("lang"))
    // every old-generation row reads as null lang; every new one is set
    assert(merged.filter($"gen" === 1 && $"lang".isNotNull).count() == 0)
    assert(merged.filter($"gen" === 2 && $"lang".isNull).count() == 0)
    // nothing dropped across the schema gap
    assert(merged.count() == docs.count())
  }

  test("q186 identical snapshots measure zero drift") {
    // a corpus where both parity halves have IDENTICAL (source,
    // bucket) histograms: every doc exists as an even and an odd id
    // with the same source and length → chi2 must be exactly 0
    val dir = tmpDir("drift_zero_").toString
    val rows = (0 until 200).flatMap { i =>
      val src = s"s${i % 4}"
      val n = 50L + (i % 7) * 60L
      Seq((i.toLong * 2, "t", "en", src, n),
        (i.toLong * 2 + 1, "t", "en", src, n))
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q186_chi2_drift")(spark, dir)
      .select($"source", $"chi2_ppb").as[(String, Long)].collect().toSeq
    assert(got.size == 4)
    got.foreach { case (s, chi2) =>
      assert(chi2 == 0L, s"source $s drifted: $chi2 ppb") }
    // and the real corpus yields finite, non-negative drift per source
    SparkEntry.queries("q186_chi2_drift")(spark, sf0001)
      .select($"chi2_ppb").as[Long].collect()
      .foreach(c => assert(c >= 0L))
  }

  test("q187 interior windows span 7 days; estimate is in KMV bounds") {
    val rows = SparkEntry.queries("q187_sliding_distinct_kmv")(
      spark, "/root/testdata/sf0.01")
      .as[(java.sql.Date, Long, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // after the 6-day ramp every window merges exactly 7 daily sketches
    val interior = rows.drop(6)
    assert(interior.nonEmpty && interior.forall(_._2 == 7L))
    rows.foreach { case (d, _, exact, est, err) =>
      assert(err == est - exact.toDouble)
      // saturated KMV standard error is ~1/sqrt(k-2) ≈ 12.7% at k=64;
      // 5 sigma is a deterministic-failure bound, not a flaky one
      assert(math.abs(err) <= math.max(5.0, 0.64 * exact),
        s"$d: est $est vs exact $exact out of bounds")
    }
  }

  test("q191 fact scan is runtime-pruned to the campaign partitions") {
    val df = SparkEntry.queries("q191_dynamic_partition_pruning")(
      spark, sf0001)
    df.collect() // execute THIS plan so its scan metrics fill in
    // (count() would build a separate agg plan, leaving these at 0)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"no DPP subquery in the fact scan:\n$planStr")
    // and the pruning BITES: the partitioned scan reads fewer files
    // than the day-partition count (sf0.001 spans a full month but
    // only ~4 days match dayofmonth%7==3)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE materializes stages as LEAF nodes — unwrap both the adaptive
    // root and every stage to reach the real scans
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.flatMap {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case _ => Nil
    }
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.metrics.contains("numFiles"))
    val partitioned = scans.filter(_.relation.partitionSchema.nonEmpty)
    assert(partitioned.nonEmpty)
    val read = partitioned.map(_.metrics("numFiles").value).min
    val totalDays = Tables.table(spark, sf0001, "events")
      .select(to_date($"ts")).distinct().count()
    assert(read > 0 && read < totalDays,
      s"DPP did not prune: read $read files of $totalDays partitions")
  }

  test("q193's hot partition is split by AQE at bench bytes") {
    val scoped = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fanout is load-bearing: skew splits are map-block-granular —
      // see the q193 body comment
      val fact = graft.queries.Q.fanout(
        Tables.table(spark, "/root/testdata/sf0.01", "lineitem"))
        .select(when($"l_orderkey" % 3 === 0, 0L)
          .otherwise($"l_orderkey" % 997).as("k"), $"l_quantity")
      val dim = spark.range(0, 997).select($"id".as("k"),
        ($"id" % 7).as("grp"))
      // keep l_quantity in the aggregate: count-only would prune the
      // column and halve the hot partition below the skew threshold
      val joined = fact.join(dim.hint("merge"), "k")
        .groupBy($"grp").agg(count(lit(1)).as("n_rows"),
          sum($"l_quantity").as("qty"))
      joined.collect()
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"AQE did not split the hot partition:\n$planStr")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q192 metrics come from an in-plan CollectMetrics, and agree") {
    val got = SparkEntry.queries("q192_observed_metrics")(spark, sf0001)
      .as[(String, Long, Long)].collect().toMap2
    val docs = Tables.table(spark, sf0001, "documents")
    val kept = docs.filter($"lang" === "en" && $"n_chars" >= 100)
    assert(got("ingested") ==
      ((docs.count(), docs.agg(sum($"n_chars")).as[Long].head())))
    assert(got("kept") ==
      ((kept.count(), kept.agg(sum($"n_chars")).as[Long].head())))
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("q158 join-size estimate is one-sided and exact baseline is right") {
    val dir = cmsDir()
    val rows = SparkEntry.queries("q158_cms_join_size")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // closed-form exact: lineitem x orders on orderkey — line ids
    // 0..999 match order ids 0..499 once each... orderkeys 0..999 on
    // the line side appear once; orders side ids 0..499 once -> 500
    assert(rows("lineitem_orders")._1 == 500L)
    // orders x customer on custkey: 500 orders, every custkey matches
    assert(rows("orders_customer")._1 == 500L)
    rows.foreach { case (name, (exact, est, overPm)) =>
      assert(est >= exact, s"$name underestimated: $est < $exact")
      assert(overPm == (est - exact) * 1000 / exact)
    }
  }
}
