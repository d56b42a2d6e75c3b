package graft

import org.apache.spark.sql.functions._

/** Semantic contracts for the round-5 operators (q125–q130) beyond
  * the DuckDB hash gate: invariants a refactor must not break even if
  * it changed the (also-pinned) exact output.
  */
class RetentionSplitSpec extends SparkSuite {
  import spark.implicits._

  test("q125: exactly one kept doc per cluster, and it has max quality") {
    val rows = SparkEntry.queries("q125_canonical_keep")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.count(_._5) == 1, s"cluster $c kept != 1")
      val kept = members.find(_._5).get
      assert(kept._4 == members.map(_._4).max,
        s"cluster $c kept a non-max-quality doc")
      assert(members.forall(_._3 == members.length),
        s"cluster $c size column disagrees with membership")
    }
    // retention really drops something on this corpus (clusters exist)
    assert(rows.exists(!_._5), "no doc was dropped — no clusters formed?")
  }

  test("q129: splits partition the corpus with the hash ratios") {
    val m = SparkEntry.queries("q129_split_manifest")(spark, sf0001)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val total = m.map(_._2).sum
    val nDocs = Tables.table(spark, sf0001, "documents").count()
    assert(total == nDocs, s"manifest covers $total of $nDocs docs")
    val train = m.filter(_._1 == "train").map(_._2).sum
    // 98% expected; wide tolerance at 500 docs
    assert(train.toDouble / total > 0.9, s"train fraction ${train}/$total")
  }

  test("q164: splits partition the corpus and no near-dup pair crosses") {
    val rows = SparkEntry.queries("q164_leakage_safe_splits")(spark, sf0001)
      .collect()
    assert(rows.forall(_.getAs[Long]("cross_pairs") == 0L),
      "a near-dup pair crossed the split boundary")
    val nDocs = Tables.table(spark, sf0001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // groups never straddle splits, so n_groups sums to the number of
    // distinct cluster representatives
    assert(rows.map(_.getAs[Long]("n_groups")).sum <= nDocs)
  }

  test("q164 policy: doc-keyed hashing CAN split a pair; group-keyed cannot") {
    // the failure mode the operator exists to close, demonstrated on
    // a planted pair list (i, i+1000): under the naive per-DOC salted
    // hash some pair lands in two different splits (≈4% of pairs at
    // a 98/1/1 cut), while keying both endpoints on the group
    // representative makes a crossing structurally impossible
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.text.TextFunctions.hash60
    def split(key: org.apache.spark.sql.Column) = {
      val h = hash60(concat(key.cast("string"), lit("_gsplit"))) % 100
      when(h < 98, "train").when(h === 98, "val").otherwise("test")
    }
    val pairs = (0L until 1000L).map(i => (i, i + 1000L)).toDF("a", "b")
    val naiveCross = pairs
      .filter(split($"a") =!= split($"b")).count()
    assert(naiveCross > 0, "expected the naive policy to split some pair")
    // group policy, through the operator's own join shape: each doc
    // row carries its group representative (min id of its pair) and
    // is split on THAT; the pair audit then joins each endpoint's
    // assignment independently
    val docs = (0L until 2000L).map(i => (i, i % 1000L)).toDF("id", "gid")
      .withColumn("split", split($"gid"))
    val groupCross = pairs
      .join(docs.select($"id".as("a"), $"split".as("sa")), "a")
      .join(docs.select($"id".as("b"), $"split".as("sb")), "b")
      .filter($"sa" =!= $"sb").count()
    assert(groupCross == 0)
  }

  test("q128: overlap counts are within [0, 10]") {
    val o = SparkEntry.queries("q128_matryoshka_recall")(spark, sf0001)
      .collect().map(_.getLong(1))
    assert(o.nonEmpty && o.forall(v => v >= 0 && v <= 10))
  }

  test("q126: three ranked hits per query asset, cosine in [-1, 1]") {
    val rows = SparkEntry.queries("q126_crossmodal_topk")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (a, hits) =>
      assert(hits.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L), s"asset $a ranks")
    }
    assert(rows.forall(r => r._3 >= -1.0001 && r._3 <= 1.0001))
  }

  test("q127: bins conserve bytes and start under the target boundary") {
    val docs = Tables.table(spark, sf0001, "documents")
    val totalBytes = docs.agg(sum($"n_chars")).head.getLong(0)
    val bins = SparkEntry.queries("q127_compaction_plan")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(bins.map(_._3).sum == totalBytes, "bin bytes != corpus bytes")
    // next-fit-by-start-offset: bin b of a source only exists if the
    // source's cumulative size reaches past b * target
    bins.groupBy(_._1).foreach { case (src, bs) =>
      val ids = bs.map(_._2).sorted.toList
      assert(ids == (0L until ids.length).toList,
        s"$src bins not contiguous from 0: $ids")
    }
  }

  test("q131: confidence in (0,1], lift positive, support ordered") {
    val rows = SparkEntry.queries("q131_assoc_rules")(spark, sf0001)
      .collect().map(r => (r.getLong(2), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (s, c, l) => s >= 1 && c > 0 && c <= 1 && l > 0 })
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq,
      "not ordered by support desc")
  }

  test("q132: anomalies flagged, median inside the value range") {
    val rows = SparkEntry.queries("q132_rolling_anomaly")(spark, sf0001)
      .collect()
    val flags = rows.map(_.getBoolean(4))
    assert(flags.exists(identity) && !flags.forall(identity),
      "anomaly flag is degenerate (all or none)")
  }

  test("q133: drift cosine in [-1,1], every label covered") {
    val rows = SparkEntry.queries("q133_embedding_drift")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val total = Tables.table(spark, sf0001, "embeddings").count()
    assert(rows.map(_._2).sum == total, "label counts don't cover corpus")
    assert(rows.forall(r => r._3 >= -1.0001 && r._3 <= 1.0001))
  }

  test("q134: per-day leaderboard is ranked 1..k with descending counts") {
    val rows = SparkEntry.queries("q134_stream_topk")(spark, sf0001)
      .collect().map(r => (r.getDate(0).toString, r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (day, hits) =>
      val sorted = hits.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq,
        s"$day ranks not 1..k")
      assert(sorted.map(_._2).toSeq == sorted.map(_._2).sortBy(-_).toSeq,
        s"$day counts not descending")
    }
  }

  test("q130: smoothed bigram probabilities are in (0, 1]") {
    val p = SparkEntry.queries("q130_bigram_lm_gate")(spark, sf0001)
      .collect().map(_.getDouble(2))
    assert(p.nonEmpty && p.forall(v => v > 0.0 && v <= 1.0))
  }
}
