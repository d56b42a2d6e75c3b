package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions._

/** End-to-end corpus curation — the composed pipeline an LLM
  * training-data run actually executes, built from the verified
  * stages: quality gate → exact dedup → near-dup removal → per-source
  * accounting. Everything is deterministic, so the whole chain is
  * DuckDB-oracle-checkable (q55).
  *
  * Stage shapes at 100 TB (each argued individually in SCALE.md):
  * quality gate is scan-parallel expressions; exact dedup is one hash
  * aggregate + a broadcast-able canonical-id semi join; near-dup drop
  * is MinHash LSH candidates (equi-join, never O(n²)) verified with
  * exact jaccard; the final accounting is one aggregate. The
  * drop rule is pairwise-greedy — for every verified pair (a < b),
  * b is dropped — deterministic regardless of partitioning, and the
  * standard curation choice (keeps the smallest id of every
  * near-dup cluster that is itself connected through its smallest
  * member; no transitive chasing, which would need an iterative
  * connected-components pass).
  */
object Curation {

  /** Survivor doc rows (full input columns) after the three gates. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double, nearDupThreshold: Double = 0.8): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession) // idempotent
    val id = col(idCol)

    // 1. quality gate: rounded score (oracle-identical arithmetic);
    //    fanout first so scoring/hashing parallelize off a small scan
    val qualified = graft.queries.Q.fanout(docs)
      .filter(qualityScore(col(textCol)) >= minQuality)

    // 2. exact dedup on the canonicalized hash: keep each group's min
    //    id. The canonical-id set is one row per distinct content —
    //    bounded by content diversity, joined back as a semi join.
    val canonical = qualified
      .groupBy(normalizedHash(col(textCol)).as("__h"))
      .agg(min(id).as(idCol))
      .select(idCol)
    // materialized once: feeds pair generation AND the final anti join
    val exactKept = qualified.join(canonical, Seq(idCol), "left_semi")
      .localCheckpoint()

    // 3. near-dup removal among survivors: LSH candidates verified at
    //    the exact jaccard threshold; drop the larger id of each pair.
    val drops = Dedup
      .minhashNearDupPairs(exactKept, idCol, textCol, nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    exactKept.join(drops, Seq(idCol), "left_anti")
  }

  /** Per-source accounting over the survivors: docs, exact tokens,
    * BPE-ish tokens — the numbers a data-mixture plan is built from. */
  def sourceStats(survivors: DataFrame, sourceCol: String,
      textCol: String): DataFrame =
    survivors.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(bpeTokenCount(col(textCol))).as("n_bpe_tokens"))
}
