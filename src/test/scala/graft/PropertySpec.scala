package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dedup.Dedup
import graft.store.Merge

/** Property-based contracts (SURVEY.md §5.2) over ScalaCheck
  * generators with pinned seeds (deterministic — no scalatestplus
  * bridge on the offline classpath, so sampling is driven manually).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val kvBatch: Gen[List[(String, Int)]] = Gen.listOfN(
    20, Gen.zip(Gen.oneOf((1 to 8).map("k" + _)), Gen.chooseNum(0, 999)))

  test("merge: keys unique, every batch key present, latest batch wins") {
    samples(Gen.zip(kvBatch, kvBatch), 8).foreach { case (t, b) =>
      val target = t.toDF("id", "v").dropDuplicates("id")
      val batch = b.toDF("id", "v")
      val out = Merge.merge(target, batch, Seq("id"))
        .as[(String, Int)].collect()
      val keys = out.map(_._1)
      assert(keys.distinct.length === keys.length, "keys unique")
      val batchKeys = b.map(_._1).toSet
      val targetKeys = t.map(_._1).toSet
      assert(batchKeys.subsetOf(keys.toSet), "every batch key present")
      assert((targetKeys -- batchKeys).subsetOf(keys.toSet),
        "unmatched target keys survive")
      val fromBatch = out.filter(r => batchKeys.contains(r._1)).toMap
      fromBatch.foreach { case (k, v) =>
        assert(b.filter(_._1 == k).map(_._2).contains(v), s"$k: batch wins")
      }
    }
  }

  test("merge is idempotent: re-merging the same batch changes nothing") {
    samples(kvBatch, 4).foreach { b =>
      val batch = b.toDF("id", "v")
      val once = Merge.merge(batch.dropDuplicates("id"), batch, Seq("id"))
      val twice = Merge.merge(once, batch, Seq("id"))
      assert(twice.as[(String, Int)].collect().sorted.toSeq ===
        once.as[(String, Int)].collect().sorted.toSeq)
    }
  }

  private val wordList: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e"))

  test("jaccard: bounded [0,1], symmetric, 1 iff equal sets") {
    samples(Gen.zip(wordList, wordList), 8).foreach { case (w1, w2) =>
      val a = Seq(Tuple1(w1.distinct)).toDF("sa")
      val b = Seq(Tuple1(w2.distinct)).toDF("sb")
      val j = a.crossJoin(b)
        .select(Dedup.jaccard($"sa", $"sb").as("j"))
        .as[Double].head()
      assert(j >= 0.0 && j <= 1.0)
      if (w1.distinct.sorted == w2.distinct.sorted) assert(j === 1.0)
      val jSym = b.crossJoin(a)
        .select(Dedup.jaccard($"sb", $"sa").as("j")).as[Double].head()
      assert(j === jSym)
    }
  }
}
