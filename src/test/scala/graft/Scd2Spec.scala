package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.store.Scd2

/** The SCD2 incremental contract: folding increments batch-by-batch
  * through [[Scd2.mergeIncrement]] must equal the one-shot
  * [[Scd2.fromChangeLog]] rebuild over the concatenated log, under the
  * append-only contract (every increment timestamp ≥ every timestamp
  * already folded). Random seeded logs with few keys and a tiny
  * attribute alphabet force every boundary case: same-attr boundary
  * collapse, open-version close, first-incoming drop, keys absent
  * from an increment, duplicate (key, ts) rows resolved by tieBreak.
  */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def canon(df: DataFrame): Set[(String, String, Int, Option[Int], Boolean)] =
    df.select("k", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)), r.getBoolean(4)))
      .toSet

  /** (key, ts, attr, seq): 8 keys × 30 timestamps × 3 attr values,
    * with duplicate (key, ts) pairs likely at this density. */
  private def randomLog(seed: Int, n: Int): Seq[(String, Int, String, Int)] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      (s"k${rnd.nextInt(8)}", 1 + rnd.nextInt(30), s"v${rnd.nextInt(3)}", i)
    }
  }

  private def check(seed: Int, tsBatches: Seq[Range]): Unit = {
    val log = randomLog(seed, 120)
    val oneShot = Scd2.fromChangeLog(
      log.toDF("k", "ts", "attr", "seq"), Seq("k"), "ts", "attr", "seq")
    val batches = tsBatches.map(r => log.filter(t => r.contains(t._2)))
    // localCheckpoint after each fold: in production the state table
    // is PERSISTED between daily refreshes, so each merge plans
    // against materialized state — without it the lazy plan references
    // `state` ~6× per fold and grows exponentially with the batch
    // count (10 folds aborted the suite on analysis alone)
    val folded = batches.tail.foldLeft(
      Scd2.fromChangeLog(batches.head.toDF("k", "ts", "attr", "seq"),
        Seq("k"), "ts", "attr", "seq").localCheckpoint()) { (state, b) =>
      Scd2.mergeIncrement(state, b.toDF("k", "ts", "attr", "seq"),
        Seq("k"), "ts", "attr", "seq").localCheckpoint()
    }
    assert(canon(folded) === canon(oneShot), s"seed=$seed")
  }

  test("3 coarse increments fold to the one-shot rebuild") {
    for (seed <- 1 to 3) check(seed, Seq(1 to 10, 11 to 20, 21 to 30))
  }

  test("10 fine increments (some key-sparse) fold to the rebuild") {
    for (seed <- 4 to 5)
      check(seed, (0 until 10).map(i => (3 * i + 1) to (3 * i + 3)))
  }

  test("property: random batch cuts fold to the rebuild (8 seeds)") {
    // randomized increment boundaries (the r4 VERDICT hardening ask):
    // random batch count, random uneven cut points over the ts range
    // — so batches can be empty, singleton, key-sparse, or span an
    // attr flip — while honoring mergeIncrement's documented
    // append-only contract (ts-range cuts keep every increment ts ≥
    // all folded ts). Each seed is a fresh log AND a fresh partition.
    for (seed <- 10 to 17) {
      val rnd = new Random(seed)
      val nBatches = 2 + rnd.nextInt(6)
      val cuts = (Seq(0, 30) ++ Seq.fill(nBatches - 1)(rnd.nextInt(30)))
        .distinct.sorted
      val ranges = cuts.zip(cuts.tail).map { case (a, b) => (a + 1) to b }
      check(seed, ranges)
    }
  }

  test("an empty increment leaves the state unchanged") {
    val log = randomLog(7, 60)
    val state = Scd2.fromChangeLog(
      log.toDF("k", "ts", "attr", "seq"), Seq("k"), "ts", "attr", "seq")
    val after = Scd2.mergeIncrement(state,
      Seq.empty[(String, Int, String, Int)].toDF("k", "ts", "attr", "seq"),
      Seq("k"), "ts", "attr", "seq")
    assert(canon(after) === canon(state))
  }
}
