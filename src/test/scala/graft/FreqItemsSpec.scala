package graft

import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Misra-Gries invariant for FreqItemsAgg: for EVERY term,
  * trueCount − N/(capacity+1) ≤ sketchCount ≤ trueCount, and any term
  * with frequency above N/(capacity+1) is guaranteed present. Checked
  * on a planted-heavy-hitter stream (across partitionings, so the
  * merge path is exercised) and on real bigrams.
  */
class FreqItemsSpec extends SparkSuite {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, col0: String,
      cap: Int): Map[String, Long] =
    df.agg(call_function("graft_freq_items", col(col0), lit(cap)).as("s"))
      .select(explode($"s").as("e"))
      .select($"e.term", $"e.cnt").as[(String, Long)].collect().toMap

  test("MG bound holds on a planted-heavy-hitter stream, any partitioning") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val terms = Seq.fill(400)("hh") ++ Seq.fill(150)("warm") ++
      Seq.fill(2000)("r" + rnd.nextInt(1500))
    val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = terms.size.toLong
    val cap = 64
    val slack = n / (cap + 1) // 2655/65 = 40
    Seq(1, 4, 13).foreach { parts =>
      val df = rnd.shuffle(terms).toDF("t").repartition(parts)
      val est = sketch(df, "t", cap)
      assert(est.size <= cap)
      est.foreach { case (t, c) =>
        assert(c <= truth(t), s"overcount for $t: $c > ${truth(t)}")
        assert(truth(t) - c <= slack,
          s"undercount beyond bound for $t: ${truth(t)} - $c > $slack")
      }
      // guaranteed presence above the frequency threshold
      truth.filter(_._2 > slack).keys.foreach { t =>
        assert(est.contains(t), s"heavy hitter $t (n=${truth(t)}) missing")
      }
      assert(est("hh") >= 400L - slack && est("hh") <= 400L)
    }
  }

  test("q68 sketch counts are within the MG bound of q67-exact on sf0.001 bigrams") {
    graft.functions.GraftFunctions.register(spark)
    val grams = Tables.table(spark, sf0001, "documents")
      .select(explode(TextFunctions.ngrams($"text", 2)).as("ngram"))
    val exact = grams.groupBy($"ngram").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val cap = 1024
    val slack = n / (cap + 1)
    val est = sketch(grams, "ngram", cap)
    assert(est.nonEmpty)
    est.foreach { case (t, c) =>
      assert(c <= exact(t) && exact(t) - c <= slack,
        s"$t: est=$c true=${exact(t)} slack=$slack")
    }
  }
}
