package graft

import org.apache.spark.sql.functions.{concat, count, lit, max, min}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.text.{Sampling, TextFunctions}

/** Deterministic hash sampling: partition-stable membership, nesting
  * across rates, stratum rate targeting. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  test("membership is a pure function of id: stable under repartition") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    val a = ids(Sampling.hashSample(docs, "doc_id", 0.3))
    val b = ids(Sampling.hashSample(docs.repartition(13), "doc_id", 0.3))
    val c = ids(Sampling.hashSample(docs.coalesce(1), "doc_id", 0.3))
    assert(a === b && a === c)
  }

  test("samples nest: rate 0.1 is a subset of rate 0.3 at one salt") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(rate: Double) =
      Sampling.hashSample(docs, "doc_id", rate)
        .select($"doc_id").as[Long].collect().toSet
    assert(ids(0.1).subsetOf(ids(0.3)))
    assert(ids(0.3).subsetOf(ids(1.0)))
    assert(ids(0.0).isEmpty)
  }

  test("different salts decorrelate draws") {
    val docs = Tables.table(spark, sf0001, "documents")
    def ids(salt: String) =
      Sampling.hashSample(docs, "doc_id", 0.5, salt)
        .select($"doc_id").as[Long].collect().toSet
    val x = ids("a"); val y = ids("b")
    assert(x !== y, "two salts should not select the same sample")
  }

  test("hashSplit partitions the corpus: disjoint, exhaustive, stable") {
    val docs = Tables.table(spark, sf0001, "documents")
    val (train, holdout) = Sampling.hashSplit(docs, "doc_id", 0.2)
    val t = train.select($"doc_id").as[Long].collect().toSet
    val h = holdout.select($"doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id").as[Long].collect().toSet
    assert((t & h).isEmpty, "disjoint")
    assert((t | h) === all, "exhaustive")
    val (t2, _) = Sampling.hashSplit(docs.repartition(7), "doc_id", 0.2)
    assert(t2.select($"doc_id").as[Long].collect().toSet === t, "stable")
  }

  test("stratified rates land near their targets") {
    val docs = Tables.table(spark, sf0001, "documents")
    val total = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedHashSample(
      docs, "doc_id", "source",
      rates = Map("src0" -> 0.9), defaultRate = 0.2)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val src0Rate = sampled.getOrElse("src0", 0L).toDouble / total("src0")
    val restRate = (sampled - "src0").values.sum.toDouble /
      (total - "src0").values.sum
    assert(src0Rate > 0.6, s"src0 sampled at $src0Rate, want ≈0.9")
    assert(restRate > 0.05 && restRate < 0.4,
      s"default strata sampled at $restRate, want ≈0.2")
  }

  /** Randomized docs: word pools are tiny so distinct docs often share
    * the exact same text (⇒ identical quality AND token count — the
    * tie the id ordering must break deterministically). */
  private val docsGen: Gen[List[(String, String, String)]] = for {
    n <- Gen.chooseNum(8, 40)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("sA", "sB", "sC")
      len <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(len, Gen.oneOf("the", "cat", "sat", "on", "a", "mat"))
    } yield (src, ws.mkString(" ")))
  } yield rows.zipWithIndex.map { case ((s, t), i) => (f"d$i%03d", s, t) }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(11L + i)))

  test("tokenBudgetCap: survivors are exactly the maximal budget-fitting prefix per source") {
    samples(docsGen, 6).foreach { rows =>
      val df = rows.toDF("doc_id", "source", "text")
      // model inputs: the same quality/token primitives the operator
      // uses, materialized once — the property under test is the
      // ranking + prefix + boundary logic, not the scoring
      val scored = df.select($"doc_id", $"source",
        TextFunctions.qualityScore($"text").as("q"),
        TextFunctions.tokenCount($"text").cast("long").as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      def model(budget: Long): Map[String, Long] =
        scored.groupBy(_._2).flatMap { case (_, ds) =>
          val ranked = ds.sortBy(d => (-d._3, d._1)) // quality desc, id asc
          val cums = ranked.scanLeft(0L)(_ + _._4).tail
          ranked.zip(cums).takeWhile(_._2 <= budget)
            .map { case (d, c) => d._1 -> c }
        }
      val totalTokens = scored.map(_._4).sum
      // budgets: zero, random mid, total (everything fits), and an
      // EXACT cumulative boundary (the ≤ edge case)
      val boundary = {
        val m = model(totalTokens)
        if (m.nonEmpty) m.values.toSeq.sorted.apply(m.size / 2) else 0L
      }
      Seq(0L, totalTokens / 3 max 1L, totalTokens max 1L, boundary max 1L)
        .distinct.foreach { budget =>
          val got = Sampling.tokenBudgetCap(df, "doc_id", "source", "text", budget)
            .select($"doc_id", $"cum_tokens")
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          assert(got === model(budget), s"budget=$budget")
        }
    }
  }

  test("tokenBudgetCap: a doc landing exactly on the budget survives") {
    val df = Seq(
      ("d1", "s", "w w w w"),   // 4 tokens
      ("d2", "s", "x x x x"),   // 4 tokens
      ("d3", "s", "y y y y")    // 4 tokens
    ).toDF("doc_id", "source", "text")
    val got = Sampling.tokenBudgetCap(df, "doc_id", "source", "text", 8L)
      .select($"doc_id").as[String].collect().toSet
    assert(got.size === 2, s"exactly two 4-token docs fit an 8-token budget, got $got")
  }

  test("temperatureSample: smallest language kept whole, big ones flattened toward √n") {
    val docs = Tables.table(spark, sf0001, "documents")
    val before = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    assert(before.values.max > before.values.min * 2,
      "fixture must be skewed or the op is untested")
    val after = Sampling.temperatureSample(docs, "doc_id", "lang")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val minLang = before.minBy(_._2)._1
    assert(after(minLang) === before(minLang), "rate 1 for the smallest language")
    // the dominant language is genuinely downsampled
    val maxLang = before.maxBy(_._2)._1
    assert(after(maxLang) < before(maxLang), "the head language must shrink")
    before.foreach { case (lang, n) =>
      val expected = math.sqrt(before(minLang).toDouble * n)
      val got = after.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expected) <= 0.5 * expected + 5,
        s"$lang: got $got want ≈ $expected (of $n)")
    }
    // membership is partition-stable like every hash sample here
    val a = Sampling.temperatureSample(docs, "doc_id", "lang")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureSample(docs.repartition(13), "doc_id", "lang")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("stratifiedKSample: exact size, prefix property, partition stability") {
    val docs = Tables.table(spark, sf0001, "documents")
    val sizes = docs.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    def ids(k: Int, df: org.apache.spark.sql.DataFrame = docs) =
      Sampling.stratifiedKSample(df, "doc_id", "source", k)
        .select($"doc_id", $"source").as[(Long, String)].collect().toSet
    val k20 = ids(20)
    sizes.foreach { case (src, n) =>
      assert(k20.count(_._2 == src) === math.min(20L, n), src)
    }
    assert(ids(10).subsetOf(k20), "growing k keeps everything chosen")
    assert(ids(20, docs.repartition(13)) === k20, "partition-stable")
    assert(ids(0).isEmpty)
  }

  test("epochMixture: floor(f) guaranteed passes plus a hash-sampled frac(f) slice") {
    val docs = Tables.table(spark, sf0001, "documents")
    val counts = Sampling.epochMixture(docs, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
      .groupBy($"doc_id", $"source").count()
      .as[(Long, String, Long)].collect()
    val bySrc = counts.groupBy(_._2)
    // src0 docs appear 2 or 3 times; the 3rd epoch covers ≈half of src0
    val src0 = bySrc("src0").map(_._3)
    assert(src0.forall(c => c == 2L || c == 3L), "src0 counts ∈ {2,3}")
    val thirds = src0.count(_ == 3L).toDouble / src0.length
    assert(thirds > 0.25 && thirds < 0.75, s"frac(2.5) slice at $thirds, want ≈0.5")
    // src1 (and default-factor sources) appear exactly once
    assert(bySrc("src1").forall(_._3 == 1L))
    // src2 rows in the output appear once; the slice is ≈0.25 of src2
    assert(bySrc.get("src2").forall(_.forall(_._3 == 1L)))
    val src2Total = docs.filter($"source" === "src2").count()
    val src2Kept = bySrc.get("src2").map(_.length).getOrElse(0)
    assert(src2Kept < src2Total, "factor 0.25 must drop most of src2")
    // epochs are 1..n per doc (dense, starting at 1)
    val epochs = Sampling.epochMixture(docs, "doc_id", "source",
      Map("src0" -> 2.5)).groupBy($"doc_id")
      .agg(min($"epoch").as("mn"), max($"epoch").as("mx"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(epochs.forall { case (_, mn, mx, n) => mn == 1L && mx == n })
  }

  test("epochMixture: factor 0 drops the source; fractional slice matches hashSample's bucket") {
    val docs = Tables.table(spark, sf0001, "documents")
    val out = Sampling.epochMixture(docs, "doc_id", "source",
      Map("src0" -> 0.0, "src1" -> 1.75), defaultFactor = 0.0)
    assert(out.filter($"source" =!= "src1").count() === 0L)
    // the docs drawn for src1's 2nd epoch = hashSample at rate .75, salt "ep"
    val twice = out.groupBy($"doc_id").count()
      .filter($"count" === 2L).select($"doc_id").as[Long].collect().toSet
    val expected = Sampling.hashSample(
      docs.filter($"source" === "src1"), "doc_id", 0.75, "ep")
      .select($"doc_id").as[Long].collect().toSet
    assert(twice === expected)
    // stability under repartitioning
    val a = Sampling.epochMixture(docs, "doc_id", "source", Map("src0" -> 1.5))
      .select($"doc_id", $"epoch").as[(Long, Long)].collect().sorted.toSeq
    val b = Sampling.epochMixture(docs.repartition(13), "doc_id", "source",
      Map("src0" -> 1.5))
      .select($"doc_id", $"epoch").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
  }

  test("packSequences: offsets are the exclusive prefix sums of the " +
    "deterministic order, invariant under input partitioning") {
    val docs = Tables.table(spark, sf0001, "documents")
    def packed(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, "doc_id", "text", 128L)
        .select($"doc_id", $"n_tokens", $"start_offset", $"first_bin",
          $"last_bin")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val a = packed(docs)
    val b = packed(docs.repartition(13))
    assert(a.sameElements(b), "partitioning must not change the tape")

    // driver-side model: sort by (hash key, id), running exclusive sum
    val keyed = docs.select($"doc_id",
      TextFunctions.tokenCount($"text").cast("long").as("n"),
      TextFunctions.hash60(concat($"doc_id".cast("string"), lit("_pack")))
        .as("k")).as[(Long, Long, Long)].collect().sortBy(t => (t._3, t._1))
    var off = 0L
    val model = keyed.map { case (id, n, _) =>
      val s = off; off += n
      (id, n, s, s / 128L, (s + n - 1) / 128L)
    }.sortBy(_._1)
    assert(a.sameElements(model), "two-phase sum must equal the model")
    // the tape is gapless: total span equals total tokens
    assert(a.map(_._2).sum === off)
  }
}
