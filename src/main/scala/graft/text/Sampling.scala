package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the data-mixture primitive. A row
  * survives iff a portable 60-bit hash of (id, salt) falls below
  * rate × 2⁶⁰. Unlike `df.sample`/`sampleBy` (Bernoulli on a per-task
  * RNG stream, so membership depends on partitioning and row order),
  * the decision here is a pure function of the row's id: stable
  * across runs, partitionings, cluster sizes, and engines — re-runs
  * of a 100 TB mixture job sample the SAME documents, and two
  * overlapping rates nest (rate 0.1 ⊂ rate 0.2 at the same salt —
  * growing a mixture keeps everything already sampled). The salt
  * decorrelates independent draws.
  *
  * The hash is md5-derived (see TextFunctions.hash60), so the exact
  * sample is reproducible in SQL on any engine for auditing — the
  * q57 oracle does.
  */
object Sampling {

  private def bucket(id: Column, salt: String): Column =
    TextFunctions.hash60(concat(id.cast("string"), lit("_"), lit(salt)))

  /** Engine-reproducible global shuffle — the training-order
    * primitive. Rows get a portable salted hash key; consuming them
    * ordered by (shuffle_key, id) yields the SAME pseudo-random
    * permutation on any engine, cluster size, or re-run (unlike
    * orderBy(rand()), whose order is a per-task RNG artifact).
    * Changing the salt draws an independent permutation (epoch
    * reshuffling). At scale the ORDER BY plans as one range exchange:
    * sampled range bounds, then parallel per-partition sorts —
    * parallel write of a totally-ordered corpus. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      salt: String = "shuffle"): DataFrame =
    df.withColumn("shuffle_key", bucket(col(idCol), salt))
      .orderBy(col("shuffle_key"), col(idCol))

  /** threshold = rate × 2⁶⁰, exact in Long for rate ∈ [0,1]. Public
    * so oracles/audits can reproduce the cut in SQL. */
  def thresholdFor(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate outside [0,1]")
    math.round(rate * (1L << 60).toDouble)
  }

  /** Uniform deterministic sample at `rate`. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "s0"): DataFrame =
    df.filter(bucket(col(idCol), salt) < lit(thresholdFor(rate)))

  /** Deterministic (train, holdout) split: holdout = the rows whose
    * hash falls below `holdoutRate`, train = the exact complement —
    * disjoint and exhaustive by construction, stable across runs and
    * partitionings, and a document can never leak from holdout into
    * train on a re-run (the eval-contamination guarantee a random
    * split lacks). */
  def hashSplit(df: DataFrame, idCol: String, holdoutRate: Double,
      salt: String = "holdout"): (DataFrame, DataFrame) = {
    val cut = lit(thresholdFor(holdoutRate))
    val b = bucket(col(idCol), salt)
    (df.filter(b >= cut), df.filter(b < cut))
  }

  /** Token-budget capping — the other half of a mixture plan: fill
    * each source's token quota with its BEST documents. Docs rank per
    * source by (quality desc, id); a doc survives while the running
    * token total through it stays within the budget. One shuffle on
    * the source key + an ordered window — the same cost class as any
    * per-key ranking, deterministic (quality ties break on id), and
    * exact (integer token counts).
    *
    * Output adds `n_tokens` and `cum_tokens` (the running total
    * through the row) to the surviving rows. */
  def tokenBudgetCap(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(TextFunctions.qualityScore(col(textCol)).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  /** Temperature-flattened mixture sampling at α = 0.5 — the
    * multilingual/multi-source balancing op: source s is kept at rate
    * √(min_count / n_s), so expected post-sample counts go as √n_s —
    * large sources are flattened toward the small ones (the
    * "temperature" resampling of multilingual pretraining) while the
    * smallest source keeps everything. Membership stays the portable
    * (id, salt) hash primitive.
    *
    * α is FIXED at 0.5 by design: rates are data-dependent (computed
    * from live source counts), and sqrt is correctly rounded in IEEE
    * 754 on every engine — so the oracle recomputes the exact same
    * rate and threshold from SQL, bit for bit. A general n^α needs
    * pow(), whose last ulp is NOT portable; thresholds use floor()
    * (not round — half-up vs half-even differs across engines).
    *
    * One tiny aggregate (per-source counts — bounded config-sized
    * metadata) broadcast back onto the scan; the filter itself stays
    * scan-parallel and partition-stable. */
  def temperatureSample(docs: DataFrame, idCol: String,
      sourceCol: String, salt: String = "temp"): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .localCheckpoint() // counted once: feeds the min AND the rates
    // one scalar of bounded metadata (strata are configuration-sized)
    val minN = counts.agg(min(col("__n"))).head.getLong(0)
    val rates = counts.select(col(sourceCol),
      sqrt(lit(minN.toDouble) / col("__n").cast("double")).as("__rate"))
    docs.join(broadcast(rates), sourceCol)
      .filter(bucket(col(idCol), salt) <
        floor(col("__rate") * lit((1L << 60).toDouble)).cast("long"))
      .drop("__rate")
  }

  /** Deterministic per-stratum k-sample — "exactly k docs per
    * source", the fixed-SIZE counterpart of [[stratifiedHashSample]]'s
    * rate (which only hits k in expectation). Docs rank within their
    * stratum by the portable (id, salt) bucket; the k smallest win.
    * Still a pure function of ids: engine-reproducible, stable under
    * partitioning, and growing k keeps every doc already chosen (the
    * ranking never changes — the prefix property). One shuffle on the
    * stratum key + one window; at 100 TB that is the same cost class
    * as any per-key top-k. */
  def stratifiedKSample(df: DataFrame, idCol: String, strataCol: String,
      k: Int, salt: String = "ks"): DataFrame = {
    require(k >= 0, s"k=$k")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(bucket(col(idCol), salt), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** Per-source quality quantile trim — keep the top `keepFrac`
    * fraction of each source's documents by quality score (⌈frac·n⌉
    * docs, quality ties broken by id so the cut is deterministic on
    * any engine/partitioning). The relative-rank dual of
    * [[tokenBudgetCap]]'s absolute token quota: "best 30% of every
    * source" survives a 100× corpus growth unchanged, where a fixed
    * token budget would need retuning. One shuffle on the source key
    * + two windows over the same partitioning (rank and count share
    * one exchange). */
  def qualityTopFraction(docs: DataFrame, idCol: String,
      sourceCol: String, textCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac >= 0.0 && keepFrac <= 1.0, s"keepFrac=$keepFrac")
    val byQuality = Window.partitionBy(col(sourceCol))
      .orderBy(col("quality_score").desc, col(idCol))
    val bySource = Window.partitionBy(col(sourceCol))
    docs
      .withColumn("quality_score", TextFunctions.qualityScore(col(textCol)))
      .withColumn("q_rank", row_number().over(byQuality).cast("long"))
      .withColumn("src_docs", count(lit(1)).over(bySource))
      .filter(col("q_rank") <=
        ceil(col("src_docs").cast("double") * lit(keepFrac)).cast("long"))
      .drop("src_docs") // window helper, not part of the output contract
  }

  /** Sequence packing — concat-and-chunk: lay all documents out on one
    * global token tape in deterministic training order (the q65
    * shuffle-key permutation), then cut the tape every `seqLen`
    * tokens. Each doc gets its absolute start offset and the range of
    * training sequences it lands in — what a loader needs to emit
    * fixed-length windows with zero padding waste.
    *
    * The global prefix sum is the scale problem: a naive
    * `SUM OVER (ORDER BY …)` window with no partition key plans as a
    * SINGLE partition — the whole corpus through one task. This is
    * the classic two-phase rendering instead: range-partition by the
    * order key, per-partition running totals (parallel window keyed
    * by partition id), then one bounded collect of per-partition
    * totals (numShufflePartitions scalars — driver METADATA, not
    * data) whose exclusive prefix sums are broadcast back as each
    * partition's base offset. Identical values to the one-task
    * window, full parallelism; the oracle checks it against DuckDB's
    * global window. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Long, salt: String = "pack"): DataFrame =
    packSequencesCounted(docs, idCol,
      TextFunctions.tokenCount(col(textCol)).cast("long"), seqLen, salt)

  /** [[packSequences]] with a PRECOMPUTED token-count column — for
    * inputs that already carry exact counts (e.g. Chunking.chunk's
    * n_tokens), so the tape doesn't re-tokenize every row and doesn't
    * couple to a text round-trip staying lossless. */
  def packSequencesCounted(docs: DataFrame, idCol: String,
      nTokens: Column, seqLen: Long, salt: String = "pack"): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen")
    val spark = docs.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val sorted = docs.select(col(idCol),
        nTokens.cast("long").as("n_tokens"),
        bucket(col(idCol), salt).as("pack_key"))
      .repartitionByRange(nParts, col("pack_key"), col(idCol))
      .sortWithinPartitions(col("pack_key"), col(idCol))
      .withColumn("pid", spark_partition_id())
      // pin partition ids: totals and the window below must see the
      // same placement
      .localCheckpoint()
    val totals = sorted.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var running = 0L
    val offsetRows = totals.keys.toSeq.sorted.map { pid =>
      val base = running; running += totals(pid); (pid, base)
    }
    val offsets = spark.createDataFrame(offsetRows)
      .toDF("pid", "part_offset")
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("pack_key"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted
      .withColumn("local_end", sum(col("n_tokens")).over(w))
      .join(broadcast(offsets), "pid")
      .withColumn("start_offset",
        col("part_offset") + col("local_end") - col("n_tokens"))
      .withColumn("first_bin", expr(s"start_offset div $seqLen"))
      .withColumn("last_bin",
        expr(s"(start_offset + n_tokens - 1) div $seqLen"))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        col("first_bin"), col("last_bin"))
  }

  /** Epoch-mixture repeats — "source X is seen 2.5 times per
    * training run". Every doc of a source with factor f appears
    * floor(f) times for sure, plus once more for the deterministic
    * hash-sampled frac(f) fraction of the source (same portable
    * bucket as [[hashSample]], so the fractional epoch is stable
    * across runs/partitionings/engines and nests as factors grow).
    * Factor 0.25 means a quarter of the source appears once; factor 0
    * drops the source. One generator expression per row — no shuffle,
    * no join; the factor table is configuration, rendered as a
    * literal CASE chain. */
  def epochMixture(docs: DataFrame, idCol: String, sourceCol: String,
      factors: Map[String, Double], defaultFactor: Double = 1.0,
      salt: String = "ep"): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(_ >= 0.0),
      "epoch factors must be >= 0")
    def chain(f: Double => Long): Column =
      factors.toSeq.sortBy(_._1)
        .foldRight(lit(f(defaultFactor)): Column) { case ((src, v), acc) =>
          when(col(sourceCol) === src, lit(f(v))).otherwise(acc)
        }
    val full = chain(v => math.floor(v).toLong)
    val thr = chain(v => thresholdFor(v - math.floor(v)))
    val extra = when(bucket(col(idCol), salt) < thr, 1L).otherwise(0L)
    val n = full + extra
    // guard: Spark's sequence DESCENDS when start > stop (sequence(1,0)
    // = [1,0]) — an n=0 doc must yield an empty array, not two epochs
    docs.withColumn("epoch",
      explode(when(n >= 1L, sequence(lit(1L), n))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Per-stratum rates (e.g. per source), `defaultRate` elsewhere —
    * the mixture table of a training-data run. The rate map is
    * bounded (it is configuration), rendered as a literal CASE chain
    * so the filter stays codegen'd and pushdown-friendly. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = "s0"): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(lit(thresholdFor(defaultRate)): Column) {
        case ((stratum, rate), acc) =>
          when(col(strataCol) === stratum, lit(thresholdFor(rate)))
            .otherwise(acc)
      }
    df.filter(bucket(col(idCol), salt) < threshold)
  }
}
