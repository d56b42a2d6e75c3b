package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Pins the boundedness the q68 merge stage RELIES on: the per-block
  * Misra-Gries compress keeps ≤ cap survivors per block, so the merge
  * stage's global window (Window.partitionBy() over the pointwise
  * sum) sees ≤ nBlocks·cap rows by construction. If a future change
  * to the compress filter, the cap, or the block count broke that,
  * q68's final window would silently become an unbounded global sort
  * — this spec is the tripwire.
  */
class MgBoundSpec extends SparkSuite {
  import spark.implicits._

  test("per-block MG compress keeps at most cap survivors per block") {
    val docs = Tables.table(spark, sf0001, "documents")
    // a cap small enough that sf0.001's bigram vocabulary exceeds it
    // in every block — the compress must actually cut, not pass
    // through an under-cap vocabulary
    val cap = 16
    val nBlocks = 8
    val perBlock = TextQueries.mgBlockCompressed(docs, cap, nBlocks)
      .groupBy($"blk").agg(count(lit(1)).as("n"),
        countDistinct($"ngram").as("distinct_ngrams"))
      .as[(Long, Long, Long)].collect()
    assert(perBlock.nonEmpty)
    perBlock.foreach { case (blk, n, _) =>
      assert(n <= cap, s"block $blk kept $n > cap=$cap survivors")
    }
    assert(perBlock.map(_._2).sum <= cap.toLong * nBlocks,
      "merge-stage input must be <= nBlocks*cap rows")
    // and the compress genuinely had something to cut: pre-compress
    // per-block vocabulary must exceed cap. (Asserting an exact-cap
    // survivor count instead would be tiebreak-fragile: a count tie
    // spanning the cap boundary keeps strictly fewer than cap
    // survivors in a block even when the compress cut.)
    val preVocab = TextQueries.mgBlockCounts(docs, nBlocks)
      .groupBy($"blk").agg(countDistinct($"ngram").as("v"))
      .as[(Long, Long)].collect()
    preVocab.foreach { case (blk, v) =>
      assert(v > cap,
        s"block $blk pre-compress vocab $v <= cap=$cap — corpus too " +
          "small to exercise the compress; raise sf or lower cap")
    }
  }

  test("streaming MG sketch (q138) honors the MG invariant vs exact counts") {
    import graft.text.TextFunctions.ngrams
    val docs = Tables.table(spark, sf0001, "documents")
    // cap small enough that the fold genuinely decrements on sf0.001
    val cap = 64
    val sketch = TextQueries.mgStreamSketch(docs, cap)
      .as[(String, Long)].collect().toMap
    assert(sketch.nonEmpty && sketch.size <= cap,
      s"sketch kept ${sketch.size} > cap=$cap counters")
    val exact = docs.select(explode(ngrams($"text", 2)).as("ngram"))
      .groupBy($"ngram").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val slack = n / (cap + 1)
    sketch.foreach { case (t, est) =>
      val tru = exact.getOrElse(t, 0L)
      assert(est <= tru, s"$t: est $est above true $tru")
      assert(tru - est <= slack, s"$t: est $est below true $tru by more than N/(cap+1)=$slack")
    }
    // the MG guarantee: anything above the error bound MUST survive
    exact.foreach { case (t, tru) =>
      if (tru > slack)
        assert(sketch.contains(t), s"heavy hitter $t (n=$tru > $slack) missing")
    }
  }

  test("production constants: merge input bounded at mgBlocks*mgCap on sf0.001") {
    val docs = Tables.table(spark, sf0001, "documents")
    val n = TextQueries.mgBlockCompressed(docs).count()
    assert(n <= TextQueries.mgBlocks.toLong * TextQueries.mgCap,
      s"merge-stage input $n exceeds mgBlocks*mgCap bound")
  }
}
