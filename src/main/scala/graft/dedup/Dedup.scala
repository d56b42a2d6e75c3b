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

  /** MinHash signature as an array of k minima over xxhash64(seed,
    * shingle). Engine-internal hashing (never oracle-compared). */
  def minhashSignature(shingleCol: Column, k: Int = 64): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(i, s))))

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

  /** MinHash-LSH near-duplicate pairs, exactly verified: candidates
    * from banding, then true shingle jaccard ≥ threshold. Output is
    * therefore exact (LSH only affects recall, which at the planted
    * similarity levels is 1 up to ~1e-18). */
  def minhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    val withSets = docs.select(
      col(idCol),
      shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val cands = lshCandidates(withSets, idCol, "sig", bands, numHashes / bands)
    val sets = withSets.select(col(idCol), col("sh"))
    cands
      .join(sets.toDF("id_a", "sh_a"), "id_a")
      .join(sets.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Per-doc 60-bit SimHash fingerprints (md5-portable). */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame =
    docs.select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sh_h", transform(col("sh"), s => hash60(s)))
      .select(col(idCol), simhash60("sh_h").as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found by
    * the pigeonhole chunk join: split the 60-bit fingerprint into
    * `chunks` pieces; any pair within maxDist ≤ chunks-1 must agree on
    * at least one chunk. Candidates share a chunk; exact popcount
    * verifies. */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 6, chunks: Int = 10, shingleN: Int = 3): DataFrame = {
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
