package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Deduplication operators for LLM corpus curation: exact, MinHash+LSH
  * near-dup, SimHash near-dup — each designed so the expensive
  * all-pairs comparison never materializes: candidates come from
  * hash-bucket equi-joins (shuffle on the bucket key), and only
  * candidates are exactly verified.
  *
  * Scale story (100 TB): exact dedup is one hash aggregate; MinHash
  * LSH is O(docs × bands) rows shuffled on (band, bucket) — never
  * O(docs²); SimHash candidates come from a pigeonhole chunk join.
  * The verify step touches only candidate pairs, which for a
  * sensible threshold is a vanishing fraction of the corpus.
  */
object Dedup {

  /** Exact dedup groups by a content hash: one row per group with the
    * canonical (min) id and member count. `keep=false` rows are what a
    * curation pipeline would drop. */
  def exactGroups(df: DataFrame, idCol: String, hashExpr: Column): DataFrame =
    df.select(col(idCol), hashExpr.as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_members"))

  /** MinHash signatures for all docs at once: explode shingles and
    * fold them with the MinHashSigAgg TypedImperativeAggregate — one
    * aggregate with a constant k-long mergeable buffer (each shingle
    * is hashed once, the k "permutations" derive by splitmix64
    * finalization inside the update). The previous spelling — k
    * separate min(xxhash64(h, i)) columns — produced equivalent
    * signatures but compiled a huge whole-stage-codegen class
    * (seconds of janino per plan) and shipped k-column intermediate
    * rows. One shuffle of (doc, shingle) rows either way.
    * Engine-internal hashing (never oracle-compared; near-dup output
    * is exact because LSH candidates are verified with true jaccard).
    * Docs with no shingles simply have no signature row (no LSH
    * candidates — correct: an empty set has jaccard 0 with
    * everything). */
  def minhashSignatures(docs: DataFrame, idCol: String, shingleCol: Column,
      k: Int = 64): DataFrame =
    docs.select(col(idCol), explode(shingleCol).as("s"))
      .groupBy(col(idCol))
      .agg(call_function("graft_minhash_sig", col("s"), lit(k)).as("sig"))

  /** LSH banding: b band-hashes over an r-row signature slice each.
    * With k=64, b=16, r=4 the candidate-recall at jaccard 0.8 is
    * 1-(1-0.8^4)^16 ≈ 0.9998, and ≈ 1-1e-18 at 0.98. */
  def bandHashes(sigCol: String, bands: Int = 16, rows: Int = 4): Column =
    expr(s"""transform(sequence(0, ${bands - 1}), b ->
               xxhash64(${(0 until rows).map(r => s"$sigCol[b * $rows + $r]").mkString(", ")}))""")

  /** Candidate pairs (idA < idB) that collide in at least one band.
    * The equi-join on (band index, band hash) is the only shuffle. */
  def lshCandidates(docs: DataFrame, idCol: String, sigCol: String,
      bands: Int = 16, rows: Int = 4): DataFrame = {
    val buckets = docs
      .select(col(idCol), posexplode(bandHashes(sigCol, bands, rows)))
      .toDF(idCol, "band", "bucket")
    val a = buckets.toDF("id_a", "band", "bucket")
    val b = buckets.toDF("id_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact jaccard between two (distinct-element) array columns —
    * integer set sizes divided in double: bit-identical on both
    * engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  /** jaccard for SORTED distinct arrays using the codegen merge-scan
    * intersection (no per-pair hash set) — same value as [[jaccard]],
    * much faster in pair joins. Requires GraftFunctions.register. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = call_function("graft_sorted_intersect", a, b).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  /** MinHash-LSH near-duplicate pairs, exactly verified: candidates
    * from banding, then true shingle jaccard ≥ threshold. Output is
    * therefore exact (LSH only affects recall, which at the planted
    * similarity levels is 1 up to ~1e-18). */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    // materialize the shingle sets once: they feed the signature
    // computation and both sides of the verify join (3 uses); fanout
    // first so shingling isn't serialized onto a small scan's single
    // partition (see Q.fanout). SORTED (r16): the verify step then
    // uses the codegen merge-scan intersection (jaccardSorted — the
    // form incrementalNearDupPairs always used) instead of building a
    // per-pair hash set; identical jaccard on the same distinct
    // element sets (sorting changes representation, not the set), and
    // the signature fold below explodes the array, so element order
    // never reaches it.
    val sets = graft.queries.Q.fanout(docs)
      .select(col(idCol),
        sort_array(shingles(col(textCol), shingleN)).as("sh"))
      .localCheckpoint()
    val sigs = minhashSignatures(sets, idCol, col("sh"), numHashes)
    val cands = lshCandidates(sigs, idCol, "sig", bands, numHashes / bands)
    cands
      .join(sets.toDF("id_a", "sh_a"), "id_a")
      .join(sets.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Incremental near-dup — the production shape: flag docs of a NEW
    * batch that near-duplicate an EXISTING corpus, never comparing
    * corpus-vs-corpus (already deduped upstream) or batch-vs-batch
    * (run [[minhashNearDupPairs]] on the batch for that). Candidates
    * come from the same (band, bucket) equi-join, but across sides:
    * batch bands probe corpus bands. At 100 TB the corpus side is the
    * big one and can be persisted pre-bucketed (a band table
    * partitioned by band — the dedup analogue of the IVF index), so
    * a daily batch costs one shuffle of the BATCH plus a pruned probe,
    * not a corpus rescan. Output is exact: candidates are verified
    * with true shingle jaccard (`jaccardSorted` — candidate pair
    * volume makes the per-pair merge scan matter). */
  def incrementalNearDupPairs(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    def sets(df: DataFrame, side: String) =
      graft.queries.Q.fanout(df)
        .select(col(idCol).as(s"${side}_id"),
          sort_array(shingles(col(textCol), shingleN)).as(s"sh_$side"))
        .localCheckpoint()
    def buckets(s: DataFrame, side: String) =
      minhashSignatures(s, s"${side}_id", col(s"sh_$side"), numHashes)
        .select(col(s"${side}_id"),
          posexplode(bandHashes("sig", bands, rows)))
        .toDF(s"${side}_id", "band", "bucket")
    val cSets = sets(corpus, "corpus")
    val bSets = sets(batch, "batch")
    val cands = buckets(bSets, "batch")
      .join(buckets(cSets, "corpus"), Seq("band", "bucket"))
      .select("batch_id", "corpus_id").distinct()
    cands
      .join(bSets, "batch_id")
      .join(cSets, "corpus_id")
      .withColumn("jaccard", jaccardSorted(col("sh_batch"), col("sh_corpus")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jaccard"))
  }

  /** Per-doc 60-bit SimHash fingerprints (md5-portable). Computed by
    * exploding shingles and folding the per-shingle hashes with the
    * SimHashBitsAgg TypedImperativeAggregate — one aggregate with a
    * constant 60-int mergeable buffer instead of 60 codegen'd sum
    * columns (same value; the 60-column form compiled a huge
    * whole-stage class, seconds of janino per plan). Docs with no
    * shingles keep fingerprint 0 via the left join, matching the
    * empty-fold semantics. */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    // fanout: the explode + per-shingle md5 is the heavy stage and
    // must not run on a small scan's single partition (see Q.fanout)
    val hashed = graft.queries.Q.fanout(docs)
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("s"))
      .select(col(idCol), hash60(col("s")).as("h"))
    val fps = hashed.groupBy(col(idCol))
      .agg(call_function("graft_simhash_bits", col("h")).as("simhash"))
    docs.select(col(idCol))
      .join(fps, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist: all-pairs
    * xor+popcount over the 8-byte fingerprints. After fingerprinting,
    * a "pair" is two longs — a broadcast nested-loop over n
    * fingerprints does n²/2 popcounts in tight codegen (~25M for 5000
    * docs: trivially fast), with none of the bucket-skew risk a chunk
    * join has when fingerprints cluster (similar-vocabulary corpora
    * cluster HARD — measured 800s vs ~2s on the sf0.1 word-soup
    * docs). Use [[simhashNearDupPairsBanded]] when n² longs stops
    * fitting (≳10⁶ docs per executor group). */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 6, shingleN: Int = 3): DataFrame = {
    // materialize fingerprints once instead of recomputing the
    // explode+60-aggregate pipeline on both sides of the self-join
    val fp = simhashFingerprints(docs, idCol, textCol, shingleN)
      .localCheckpoint()
    val a = fp.toDF("id_a", "sim_a")
    val b = fp.toDF("id_b", "sim_b")
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(expr("sim_a ^ sim_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Adaptive SimHash near-dup: all-pairs popcount while the corpus
    * is small enough that n² 8-byte comparisons are trivial (codegen
    * xor+bit_count, no bucket-skew risk), the pigeonhole-banded
    * equi-join beyond. The count is a one-scalar aggregate — bounded
    * driver-side metadata, the legitimate collect exception. The
    * default cutoff (10⁶ docs ⇒ ≤5·10¹¹ popcounts across a cluster)
    * marks where the banded join's candidate generation starts to
    * win DESPITE its bucket-collapse caveat (see
    * [[simhashNearDupPairsBanded]]). */
  def simhashNearDupPairsAdaptive(docs: DataFrame, idCol: String,
      textCol: String, maxDist: Int = 6, shingleN: Int = 3,
      allPairsLimit: Long = 1000000L): DataFrame =
    if (docs.select(col(idCol)).count() <= allPairsLimit)
      simhashNearDupPairs(docs, idCol, textCol, maxDist, shingleN)
    else
      simhashNearDupPairsBanded(docs, idCol, textCol, maxDist,
        chunks = maxDist + 4, shingleN = shingleN)

  /** Pigeonhole-banded variant for corpora too large for all-pairs
    * popcounts: split the 60-bit fingerprint into `chunks` pieces; a
    * pair within maxDist ≤ chunks-1 must agree on ≥1 chunk, so the
    * (chunk_idx, chunk_val) equi-join generates candidates with
    * guaranteed recall. CAVEAT: requires well-spread fingerprints —
    * on a near-duplicate-heavy or shared-vocabulary corpus the
    * buckets collapse and the join degenerates toward all-pairs with
    * far higher constants; salt or pre-partition by a second key
    * before using at scale. */
  def simhashNearDupPairsBanded(docs: DataFrame, idCol: String,
      textCol: String, maxDist: Int = 6, chunks: Int = 10,
      shingleN: Int = 3): DataFrame = {
    require(maxDist < chunks, "pigeonhole needs maxDist < chunks")
    val bits = 60 / chunks
    val fp = simhashFingerprints(docs, idCol, textCol, shingleN)
    val chunked = fp.select(
      col(idCol), col("simhash"),
      posexplode(expr(
        s"transform(sequence(0, ${chunks - 1}), c -> (shiftright(simhash, c * $bits) & ${(1L << bits) - 1}))")))
      .toDF(idCol, "simhash", "chunk_idx", "chunk_val")
    val a = chunked.toDF("id_a", "sim_a", "chunk_idx", "chunk_val")
    val b = chunked.toDF("id_b", "sim_b", "chunk_idx", "chunk_val")
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(expr("sim_a ^ sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
