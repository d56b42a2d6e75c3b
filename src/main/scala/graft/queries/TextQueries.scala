package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextFunctions._

/** Text-analysis + document-dedup query surface over the documents
  * table (LLM-pipeline extensions; SURVEY.md §7.2 step 8).
  */
object TextQueries {

  /** q68 sketch parameters: per-block counter cap and block count.
    * The merge stage's global window input is ≤ mgBlocks·mgCap rows
    * BY CONSTRUCTION (each block keeps ≤ mgCap survivors);
    * MgBoundSpec asserts the bound so a future change to either
    * constant (or to the compress filter) can't silently unbound the
    * Window.partitionBy() in the merge. */
  private[graft] val mgCap = 1024
  private[graft] val mgBlocks = 32

  /** q68's pre-compress stage, factored separately so MgBoundSpec can
    * verify the compress had something to cut (per-block vocabulary
    * above cap) without duplicating the block-assignment expression:
    * docs → nBlocks hash blocks → exact (blk, ngram) counts. */
  private[graft] def mgBlockCounts(
      docs: org.apache.spark.sql.DataFrame,
      nBlocks: Int = mgBlocks): org.apache.spark.sql.DataFrame =
    Q.fanout(docs)
      .select(
        pmod(hash60(concat(col("doc_id").cast("string"), lit("_mg"))),
          lit(nBlocks.toLong)).as("blk"),
        explode(ngrams(col("text"), 2)).as("ngram"))
      .groupBy(col("blk"), col("ngram")).agg(count(lit(1)).as("c"))

  /** q68's per-block stage, factored for the bound spec: docs → 32
    * hash blocks → exact (blk, ngram) counts → MG compress to ≤ cap
    * survivors per block (subtract the (cap+1)-th largest count,
    * drop non-positive). Output columns: blk, ngram, c2. */
  private[graft] def mgBlockCompressed(
      docs: org.apache.spark.sql.DataFrame,
      cap: Int = mgCap,
      nBlocks: Int = mgBlocks): org.apache.spark.sql.DataFrame = {
    val perBlk = mgBlockCounts(docs, nBlocks)
    // MG compress per block: the (cap+1)-th largest count value is
    // well-defined under any tiebreak among equal counts.
    val wBlk = Window.partitionBy(col("blk"))
      .orderBy(col("c").desc, col("ngram"))
    perBlk
      .withColumn("sub", coalesce(
        max(when(row_number().over(wBlk) === cap + 1, col("c")))
          .over(Window.partitionBy(col("blk"))), lit(0L)))
      .withColumn("c2", col("c") - col("sub"))
      .filter(col("c2") > 0)
  }
  /** q138's constant-memory sketch, factored for MgBoundSpec: bigrams
    * → one graft_freq_items aggregate (≤ cap counters per partition
    * during the fold, PODS-2012 merge) → (ngram, est_n) rows. The
    * full ≤ cap-entry summary, before any top-k cut, so the spec can
    * check the MG invariant over every survivor. */
  private[graft] def mgStreamSketch(
      docs: org.apache.spark.sql.DataFrame,
      cap: Int = mgCap): org.apache.spark.sql.DataFrame =
    Q.fanout(docs)
      .select(explode(ngrams(col("text"), 2)).as("ngram"))
      .agg(call_function("graft_freq_items", col("ngram"), lit(cap))
        .as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term").as("ngram"), col("e.cnt").as("est_n"))

  import Q._

  /** Shared oracle CTE: tokenized docs with distinct 3-gram shingles.
    * generate_series(1, n-2) is empty for short docs, matching the
    * Spark-side guard in TextFunctions.shingles. */
  /** Oracle rendering of TextFunctions.qualityScore over a word list
    * column `w` — ONE text shared by every oracle that scores quality
    * (q80, q89), so a weight change can't drift between them. */
  /** q202's content-defined chunker: (doc_id, source, text) →
    * (doc_id, source, chunk_seq, ch = md5 of the chunk text,
    * chunk_words). Boundary = salted hash60 of the 4-word window ≡ 0
    * (mod 16); one doc-partition window pass. Factored out so
    * CdcChunkSpec can pin the CDC stability property (an insertion
    * perturbs O(1) chunks) on synthetic edits. */
  private[graft] def cdcChunks(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val dw = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .withColumn("w1", lead(col("w"), 1).over(dw))
      .withColumn("w2", lead(col("w"), 2).over(dw))
      .withColumn("w3", lead(col("w"), 3).over(dw))
      .withColumn("boundary", when(col("pos") === 0, 1L).otherwise(
        when(col("w3").isNotNull && pmod(hash60(concat(
          concat_ws(" ", col("w"), col("w1"), col("w2"), col("w3")),
          lit("_cdc"))), lit(16L)) === 0L, 1L).otherwise(0L)))
      .withColumn("chunk_seq", sum(col("boundary")).over(
        dw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("source"), col("chunk_seq"))
      .agg(md5(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")))).as("ch"),
        count(lit(1)).as("chunk_words"))
  }

  private[queries] def qualitySql(w: String): String =
    s"""round(least(1.0, len($w)::DOUBLE / 100.0) * 0.4 +
          (len(list_distinct($w))::DOUBLE / len($w)::DOUBLE) * 0.4 +
          least(1.0, len(list_filter($w, x ->
            x IN ('the','a','of','and','to','in','is')))::DOUBLE
            * 5.0 / len($w)::DOUBLE) * 0.2,
          6)"""

  /** q124's pinned BPE merge table, in rank order. Chosen so merged
    * symbols merge further (th→the, in→ing, er→ers, th+er→ther) —
    * the multi-level case the encode loop must get right. Shared by
    * the Spark body and the generated oracle SQL. */
  private val pinnedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("o", "f"),
    ("t", "o"), ("e", "d"), ("o", "u"), ("a", "t"), ("e", "s"),
    ("er", "s"), ("th", "er"))

  /** DuckDB replay of greedy BPE encode with [[pinnedMerges]]: each
    * symbol rides as chr(2)‖sym‖chr(3); rule (a,b) is one
    * left-to-right `replace` of the marked pair with the marked join
    * — replace's non-overlapping LTR scan is exactly the BPE merge
    * scan. Rules nest innermost-first (= rank order). */
  /** The per-word greedy-encode expression (input variable `x`),
    * shared by the q124 and q151 oracles. */
  /** [[bpeWordSql]] at a merge-table PREFIX (q205's vocab ablation:
    * rank-ordered merges mean `take(k)` IS the k-vocab tokenizer). */
  private def bpeWordSqlAt(k: Int): String = {
    val marked =
      "array_to_string(list_transform(string_split(x, ''), " +
        "c -> chr(2)||c||chr(3)), '')"
    val applied = pinnedMerges.take(k).foldLeft(marked) { case (e, (a, b)) =>
      s"replace($e, chr(2)||'$a'||chr(3)||chr(2)||'$b'||chr(3), " +
        s"chr(2)||'$a$b'||chr(3))"
    }
    s"replace(replace(replace($applied, chr(3)||chr(2), '|'), " +
      "chr(2), ''), chr(3), '')"
  }

  private val bpeWordSql: String = bpeWordSqlAt(pinnedMerges.size)

  private val bpeEncodeSql: String = {
    val word = bpeWordSql
    s"""WITH w AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      x -> x <> '') AS ws
                   FROM documents),
        t AS (SELECT doc_id,
                     array_to_string(list_transform(ws, x -> $word), '|')
                       AS tokens
              FROM w)
        SELECT doc_id, tokens,
               CASE WHEN tokens = '' THEN 0
                    ELSE len(string_split(tokens, '|')) END::BIGINT
                 AS n_tokens
        FROM t ORDER BY doc_id"""
  }

  private val docSets =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       d AS (SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
             FROM w)"""

  val queries: Map[String, Fn] = Map(
    // Token counting + quality scoring: whitespace tokens, BPE-ish
    // subword count, lexical diversity, stopword ratio → [0,1] score.
    // Pure per-row expressions — scan-parallel, no shuffle.
    "q24_text_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(
          $"doc_id",
          tokenCount($"text").as("n_tokens"),
          size(array_distinct(words($"text"))).as("n_uniq_tokens"),
          bpeTokenCount($"text").as("n_bpe_tokens"),
          stopwordHits($"text").as("n_stopwords"),
          qualityScore($"text").as("quality_score"))
        .orderBy($"doc_id")
    }),

    // Language-ID heuristic: per-language stopword hit counts, argmax
    // with deterministic tiebreak.
    "q25_langid" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.table(s, dir, "documents")
      val scores = langStopwords.map { case (lang, stops) =>
        stopwordHits($"text", stops).as(s"hits_$lang")
      }
      d.select(($"doc_id" +: scores :+
        predictLang($"text").as("predicted_lang")): _*)
        .orderBy($"doc_id")
    }),

    // Document fingerprints: exact sha256, canonicalized (sorted
    // distinct words) sha256, winnowing-style min-shingle md5.
    "q26_doc_fingerprints" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(
          $"doc_id",
          contentHash($"text").as("content_sha"),
          normalizedHash($"text").as("normalized_sha"),
          minShingleFingerprint($"text").as("min_shingle_md5"))
        .orderBy($"doc_id")
    }),

    // Exact dedup groups over the canonicalized hash: one hash
    // aggregate (the 100 TB-safe shape — no pairwise work at all).
    "q27_exact_dedup_groups" -> ((s, dir) => {
      import s.implicits._
      Dedup.exactGroups(
        Tables.table(s, dir, "documents"), "doc_id",
        normalizedHash($"text"))
        .orderBy($"content_hash")
    }),

    // MinHash + LSH near-dup pairs, exactly verified at jaccard ≥ 0.8.
    // The oracle brute-forces all pairs; the engine only ever touches
    // LSH candidates (recall ≈ 1 - 1e-18 at the planted 0.98 level).
    "q28_minhash_neardup" -> ((s, dir) => {
      import s.implicits._
      Dedup.minhashNearDupPairs(
        Tables.table(s, dir, "documents"), "doc_id", "text", 0.8)
        .orderBy($"id_a", $"id_b")
    }),

    // Corpus-level overlap: exact jaccard of per-source 2-gram shingle
    // SETS for every source pair — group set-union then pairwise
    // intersect (400 group pairs, not 125k doc pairs). The custom
    // MinHashSigAgg (TypedImperativeAggregate) is the constant-memory
    // estimate of exactly this quantity (bounded in ScalaTest).
    "q54_source_overlap" -> ((s, dir) => {
      import s.implicits._
      // per-source sets sorted ONCE at aggregation time so each of the
      // O(sources²) pair comparisons is a codegen merge scan
      // (graft_sorted_intersect) instead of rebuilding a hash set over
      // ~10⁵-element arrays per pair
      val bySource = fanout(Tables.table(s, dir, "documents"))
        .select($"source", explode(shingles($"text", 2)).as("sh"))
        .groupBy($"source")
        .agg(sort_array(collect_set($"sh")).as("shs"))
      val a = bySource.toDF("src_a", "shs_a")
      val b = bySource.toDF("src_b", "shs_b")
      a.crossJoin(b).filter($"src_a" < $"src_b")
        .withColumn("jaccard",
          graft.dedup.Dedup.jaccardSorted($"shs_a", $"shs_b"))
        .select($"src_a", $"src_b", $"jaccard")
        .orderBy($"src_a", $"src_b")
    }),

    // Exact n-gram jaccard within blocking groups: all-pairs is only
    // computed inside (lang, source) blocks — the classic blocking
    // technique that keeps exact pairwise dedup tractable (O(Σ
    // block²) instead of O(n²)); MinHash (q28) is the unblocked
    // scale path.
    "q49_ngram_jaccard_blocked" -> ((s, dir) => {
      import s.implicits._
      // materialized once (both join sides), sorted once per doc so
      // the per-pair intersection is a codegen merge scan; fanout so
      // shingling AND the probe side of the pair join use all cores
      val d = fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"lang", $"source",
          sort_array(shingles($"text", 2)).as("sh"))
        .localCheckpoint()
      val a = d.toDF("id_a", "lang", "source", "sh_a")
      val b = d.toDF("id_b", "lang", "source", "sh_b")
      a.join(b, Seq("lang", "source"))
        .filter($"id_a" < $"id_b")
        // size-ratio prune: jaccard >= t needs |A| and |B| within 1/t
        // of each other (|A∩B| ≤ min(|A|,|B|)) — cheap codegen filter
        // before the expensive set intersection, exact-preserving
        .filter(size($"sh_a") * 2 >= size($"sh_b") &&
          size($"sh_b") * 2 >= size($"sh_a"))
        .withColumn("jaccard", Dedup.jaccardSorted($"sh_a", $"sh_b"))
        .filter($"jaccard" >= 0.5)
        .select($"lang", $"source", $"id_a", $"id_b", $"jaccard")
        .orderBy($"id_a", $"id_b")
    }),

    // End-to-end curation pipeline: quality gate (≥0.45) → exact
    // dedup (canonical min-id per normalized hash) → near-dup removal
    // (LSH candidates, exact jaccard ≥0.8, drop the larger id of each
    // pair) → per-source doc/token accounting. The composed flow a
    // training-data run executes, verified end to end.
    "q55_curation_pipeline" -> ((s, dir) => {
      import s.implicits._
      val survivors = graft.text.Curation.curate(
        Tables.table(s, dir, "documents"), "doc_id", "text",
        minQuality = 0.45, nearDupThreshold = 0.8)
      graft.text.Curation.sourceStats(survivors, "source", "text")
        .orderBy($"source")
    }),

    // Deterministic stratified hash sample — the data-mixture
    // primitive: membership is a pure function of (doc_id, salt), so
    // the sample is identical across runs/partitionings/engines
    // (unlike Bernoulli df.sample) and the oracle reproduces it
    // exactly from the same md5 arithmetic.
    "q57_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.stratifiedHashSample(
        Tables.table(s, dir, "documents"), "doc_id", "source",
        rates = Map("src0" -> 0.8, "src1" -> 0.1, "src2" -> 0.5),
        defaultRate = 0.25, salt = "mix1")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }),

    // Capstone #2 — the context-window build: quality-trim each
    // source to its best half (q80 op) → chunk survivors into
    // 64/48-token windows (q79 op) → pack the chunks onto the global
    // training tape in deterministic order (q76 op, keyed by the
    // composite (doc,chunk) key). Every stage keeps its scale shape
    // (one window shuffle; generator explode; two-phase prefix sum);
    // ONE composed DuckDB oracle hash-checks the whole flow.
    "q89_chunked_context_build" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
      val kept = graft.text.Sampling.qualityTopFraction(
        docs, "doc_id", "source", "text", 0.5)
        .select($"doc_id", $"text")
      // composite key: 2^20 chunk slots per doc (a doc would need
      // ~50M tokens to overflow at stride 48) — collision-free, and
      // doc_id up to ~8.8e12 still fits a long
      val chunks = graft.text.Chunking.chunk(kept, "doc_id", "text", 64, 48)
        .withColumn("chunk_key", $"doc_id" * (1L << 20) + $"chunk_id")
      graft.text.Sampling.packSequencesCounted(
        chunks, "chunk_key", $"n_tokens", 128L, salt = "cpack")
        .select($"chunk_key",
          expr("chunk_key div 1048576").as("doc_id"),
          ($"chunk_key" % (1L << 20)).as("chunk_id"),
          $"n_tokens", $"start_offset", $"first_bin", $"last_bin")
        .orderBy($"chunk_key")
    }),

    // Real BPE tokenization: learn 64 merges from the corpus' word
    // frequencies (one word-count shuffle + a bounded driver-side
    // merge loop — the IVF-centroid model class), then tokenize every
    // doc scan-parallel via the graft_bpe_encode expression (merge
    // table as a codegen reference object). The iterative merge loop
    // itself is not SQL-expressible, so the driver gate is the
    // q17/q50/q316 contract-boolean form: every row carries exact
    // replayable anchors (word count, non-space code points) plus the
    // LIVE tokenizer's invariants as booleans the oracle expects
    // TRUE — round-trip identity (concatenated tokens reproduce the
    // text minus separators: tokenization must never lose or invent
    // a character) and the compression bounds (each word ≥ 1 token,
    // each token ≥ 1 code point), plus the learned merge-table size
    // as a constant (a degenerate training run that learns < 64
    // rules flips it). A broken train OR encode violates one of
    // these and the driver row goes red; BpeSpec keeps the raw
    // token-level assertions (hand-worked merges, independent model,
    // repartition determinism).
    "q88_bpe_tokens" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
      val merges = graft.text.Bpe.train(docs, "text", numMerges = 64)
      docs.select($"doc_id", $"text",
          graft.text.Bpe.encode($"text", merges).as("toks"))
        .select($"doc_id",
          size(filter(split($"text", " "), w => length(w) > 0))
            .cast("long").as("n_words"),
          length(replace($"text", lit(" "), lit(""))).cast("long")
            .as("n_chars_nonspace"),
          (array_join($"toks", "") === replace($"text", lit(" "), lit("")))
            .as("roundtrip_ok"),
          (size($"toks").cast("long")
            .between(size(filter(split($"text", " "), w => length(w) > 0))
              .cast("long"),
              length(replace($"text", lit(" "), lit(""))).cast("long")))
            .as("toks_in_bounds"),
          lit(merges.size.toLong).as("n_merges_learned"))
        .orderBy($"doc_id")
    }),

    // The ENCODE stage alone, under the driver's hash gate: tokenize
    // with a PINNED merge table (the production shape — a learned
    // table is broadcast as a literal into graft_bpe_encode exactly
    // like this). Min-rank greedy encode ≡ applying merges once each
    // in rank order (a later rule's joined symbol cannot form an
    // earlier-rank pair, since both sides of rank k must exist before
    // rank k is learnable), which the DuckDB oracle replays as a
    // nested left-to-right replace chain over a marker-delimited
    // symbol string. Train stays exempt (q88/BpeSpec).
    "q124_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select($"doc_id",
          graft.text.Bpe.encode($"text", pinnedMerges).as("toks"))
        .select($"doc_id",
          array_join($"toks", "|").as("tokens"),
          size($"toks").cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    }),

    // Tokenizer fertility by language — the standard multilingual
    // tokenizer eval: characters per BPE token (higher = the merge
    // table serves that language worse, so its docs cost more tokens
    // per unit text — the signal behind per-language token-budget
    // adjustments and tokenizer retraining). Integer-exact as
    // chars·1000 div tokens; one scan + one partial-aggregable
    // GROUP BY lang (5 rows out), the q92 scale shape. The encode is
    // the pinned-merge production form (q124's broadcast-table
    // pattern), replayed symbol-exact by the oracle's nested-replace
    // fold.
    "q151_bpe_fertility" -> ((s, dir) => {
      import s.implicits._
      Q.fanout(Tables.table(s, dir, "documents"))
        .select($"lang", length($"text").cast("long").as("c"),
          size(graft.text.Bpe.encode($"text", pinnedMerges)).cast("long")
            .as("t"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"c").as("n_chars"),
          sum($"t").as("n_bpe_tokens"))
        .withColumn("fertility_ppk",
          expr("n_chars * 1000 div n_bpe_tokens"))
        .orderBy($"lang")
    }),

    // Corpus report — the dataset-card summary every training-data
    // pipeline emits: per source, doc/token/BPE-token counts, distinct
    // languages, exact-dup fraction (1 − distinct hashes/docs), mean
    // quality, and a 4-bucket quality histogram. ONE scan + one
    // aggregate; every stat is a partial-aggregable expression, so the
    // report costs the same shuffle as a plain GROUP BY at any scale.
    "q92_corpus_report" -> ((s, dir) => {
      import s.implicits._
      import graft.text.TextFunctions
      val stats = TextFunctions.textStats($"text")
      Tables.table(s, dir, "documents")
        .select($"source", $"lang",
          TextFunctions.contentHash($"text").as("h"),
          stats.getField("n_tokens").as("nt"),
          stats.getField("n_bpe_tokens").as("nb"),
          stats.getField("quality_score").as("q"))
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"nt").cast("long").as("n_tokens"),
          sum($"nb").cast("long").as("n_bpe_tokens"),
          countDistinct($"lang").as("n_langs"),
          countDistinct($"h").as("n_distinct"),
          dsumAt($"q", 8).as("quality_sum"),
          count(when($"q" < 0.25, 1)).as("q_lo"),
          count(when($"q" >= 0.25 && $"q" < 0.5, 1)).as("q_mid_lo"),
          count(when($"q" >= 0.5 && $"q" < 0.75, 1)).as("q_mid_hi"),
          count(when($"q" >= 0.75, 1)).as("q_hi"))
        .orderBy($"source")
    }),

    // Temperature-flattened mixture at α=0.5 over LANGUAGES (the
    // skewed stratum: en dominates): language L kept at rate
    // √(min_count/n_L) — expected counts go as √n_L, flattening big
    // languages toward small ones (the multilingual resampling of
    // pretraining mixtures). Rates are DATA-dependent; sqrt is
    // IEEE-correctly-rounded on every engine, so the oracle
    // recomputes them exactly.
    "q91_temperature_sample" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.temperatureSample(
        Tables.table(s, dir, "documents"), "doc_id", "lang")
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Deterministic per-source k-sample: exactly 20 docs per source
    // (fixed SIZE, where q57's rate only hits the size in
    // expectation) — rank by the portable hash bucket, keep the k
    // smallest; the prefix property means growing k never drops a
    // chosen doc.
    "q86_stratified_ksample" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.stratifiedKSample(
        Tables.table(s, dir, "documents"), "doc_id", "source", k = 20)
        .select($"doc_id", $"source", $"sample_rank")
        .orderBy($"doc_id")
    }),

    // Per-source token-budget cap: each source's quota (800 tokens)
    // filled by its highest-quality docs — the other half of a data
    // mixture plan, verified including the running totals.
    "q62_token_budget" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.tokenBudgetCap(
        Tables.table(s, dir, "documents"), "doc_id", "source", "text",
        budgetTokens = 800L)
        .select($"doc_id", $"source", $"n_tokens", $"cum_tokens")
        .orderBy($"doc_id")
    }),

    // Per-doc SimHash fingerprints (md5-portable bit math).
    "q29_simhash_fingerprints" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashFingerprints(
        Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }),

    // Gopher-style repetition/shape filters (Rae et al. 2021 §A1.1):
    // duplicate-word fraction, top-2/3-gram fraction (max multiplicity
    // via a sorted per-row fold — NOT an explode+groupBy, so the whole
    // query is scan-parallel with zero shuffles), mean word length,
    // and the composite gate at the published thresholds.
    "q64_repetition_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(
          $"doc_id",
          tokenCount($"text").cast("long").as("n_words"),
          meanWordLen($"text").as("mean_word_len"),
          dupWordFrac($"text").as("dup_word_frac"),
          topNgramFrac($"text", 2).as("top_bigram_frac"),
          topNgramFrac($"text", 3).as("top_trigram_frac"),
          passesGopher($"text").as("passes_gopher"))
        .orderBy($"doc_id")
    }),

    // The capstone: a COMPLETE training-data build, every stage a
    // verified primitive — normalize (q69) → Gopher gate (q64) →
    // exact dedup keep-min (q27/q61 semantics) → 10% holdout split
    // (q57 primitive, train side) → per-source 600-token budget (q62)
    // → deterministic shuffle order (q65). Output is the final
    // mixture in training order. Scale shape: scan-parallel gates,
    // one dedup hash-aggregate + keyed join, codegen'd split filter,
    // one budget shuffle + window, one range exchange for the order —
    // nothing pairwise, nothing driver-side.
    "q72_training_build" -> ((s, dir) => {
      import s.implicits._
      // fanout: the gate's per-row n-gram folds must not run on a
      // small scan's single partition (see Q.fanout); localCheckpoint:
      // the gated set is read by FOUR downstream passes (dedup
      // aggregate, dedup join probe, budget window, range-sort
      // sampling + final) — materialize it once instead of
      // re-evaluating the normalize+gate chain per pass (22.5 s →
      // ~2 s at sf0.1). At 100 TB the same holds: checkpoint/persist
      // the curated set before fan-in stages.
      val normed = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"source",
          normalizeText($"text").as("norm_text"))
      val gated = normed.filter(passesGopher($"norm_text"))
        .localCheckpoint()
      val hashed = gated.withColumn("h", normalizedHash($"norm_text"))
      val canon = hashed.groupBy($"h").agg(min($"doc_id").as("doc_id"))
      val kept = hashed.join(canon, Seq("h", "doc_id")).drop("h")
      val train = graft.text.Sampling.hashSplit(kept, "doc_id", 0.1)._1
      val capped = graft.text.Sampling.tokenBudgetCap(
        train, "doc_id", "source", "norm_text", budgetTokens = 600L)
      graft.text.Sampling.deterministicShuffle(capped, "doc_id")
        .select($"doc_id", $"source", $"n_tokens", $"cum_tokens",
          $"shuffle_key")
    }),

    // Sequence packing (concat-and-chunk): every doc's absolute
    // offset on the global training-token tape and the 2048-token
    // sequence range it spans. The global prefix sum runs as the
    // two-phase range-partition + broadcast-offsets rendering —
    // full parallelism, never a one-task window (see
    // Sampling.packSequences); the oracle is DuckDB's global window.
    "q76_sequence_packing" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.packSequences(
        Tables.table(s, dir, "documents"), "doc_id", "text", 2048L)
        .orderBy($"doc_id")
    }),

    // Epoch-mixture repeats: per-source fractional epoch factors
    // (src0 2.5×, src1 1×, src2 0.25×, rest 1×) — floor(f) full
    // passes plus a deterministic hash-sampled frac(f) slice. One
    // generator per row, factors as a literal CASE chain: no
    // shuffle, no join, engine-reproducible.
    "q78_epoch_mixture" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.epochMixture(
        Tables.table(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
        .select($"doc_id", $"source", $"epoch")
        .orderBy($"doc_id", $"epoch")
    }),

    // Incremental near-dup: flag NEW-batch docs (non-src0) that
    // near-duplicate the EXISTING corpus (src0) — cross-side LSH
    // candidates only (batch bands probe corpus bands; no
    // corpus-vs-corpus or batch-vs-batch pairs), exact-verified.
    "q83_incremental_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
      graft.dedup.Dedup.incrementalNearDupPairs(
        docs.filter($"source" === "src0"),
        docs.filter($"source" =!= "src0"),
        "doc_id", "text", 0.8)
        .orderBy($"batch_id", $"corpus_id")
    }),

    // Context-window chunking: 64-token windows advancing by 48
    // (16-token overlap) — one generator + narrow posexplode per row,
    // zero shuffles; (doc_id, chunk_id) is a stable global chunk key.
    "q79_chunk_windows" -> ((s, dir) => {
      import s.implicits._
      graft.text.Chunking.chunk(
        Tables.table(s, dir, "documents"), "doc_id", "text", 64, 48)
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Per-source quality quantile trim: keep the best 30% of every
    // source by quality (ties broken by id). Relative-rank dual of
    // q62's absolute token budget — scale-invariant policy.
    "q80_quality_trim" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.qualityTopFraction(
        Tables.table(s, dir, "documents"), "doc_id", "source", "text", 0.3)
        .select($"doc_id", $"source", $"quality_score", $"q_rank")
        .orderBy($"doc_id")
    }),

    // Preference-pair builder — the DPO/RLHF dataset shape: within
    // every (lang, source) group, pair the highest-quality document
    // (chosen) with the lowest (rejected), with deterministic
    // tiebreaks (chosen: max score then MIN id; rejected: min score
    // then MAX id — so a 2-doc tie still yields a distinct pair).
    // One exchange on the group key carries both window passes AND
    // the final aggregate (same partitioning, Catalyst reuses it);
    // group sizes bound the windows, so no task ever sees more than
    // one group's rows. At 100 TB the group key would be the prompt
    // id — same plan, more groups.
    "q182_preference_pairs" -> ((s, dir) => {
      import s.implicits._
      val g = Window.partitionBy($"lang", $"source")
      Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"lang", $"source", qualityScore($"text").as("q"))
        .withColumn("rn_top",
          row_number().over(g.orderBy($"q".desc, $"doc_id")))
        .withColumn("rn_bot",
          row_number().over(g.orderBy($"q".asc, $"doc_id".desc)))
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"),
          max(when($"rn_top" === 1, $"doc_id")).as("chosen_id"),
          max(when($"rn_top" === 1, $"q")).as("chosen_score"),
          max(when($"rn_bot" === 1, $"doc_id")).as("rejected_id"),
          max(when($"rn_bot" === 1, $"q")).as("rejected_score"))
        .filter($"n_docs" >= 2)
        .withColumn("margin", $"chosen_score" - $"rejected_score")
        .orderBy($"lang", $"source")
    }),

    // Length-matched importance resampling — flatten the corpus's
    // length distribution by downsampling every 100-char length
    // bucket to the rarest bucket's mass. Acceptance is a
    // deterministic integer test (salted hash60 per-mille vs the
    // m/n_bucket acceptance ratio cross-multiplied — no float
    // compare), so membership is reproducible on any engine and
    // stable under partitioning. Plan: one scan + a ≤6-row bucket
    // census broadcast back + a 1-ROW min frame riding the plan (the
    // q103/q104 scalar-stats pattern) — nothing here scales with n
    // except the scan itself.
    "q183_length_matched_resample" -> ((s, dir) => {
      import s.implicits._
      val bucketed = Tables.table(s, dir, "documents")
        .select($"doc_id", $"source", $"n_chars")
        .withColumn("len_bucket", expr("n_chars div 100"))
      val counts = bucketed.groupBy($"len_bucket")
        .agg(count(lit(1)).as("n_bucket"))
      val minCount = counts.agg(min($"n_bucket").as("m"))
      bucketed.join(broadcast(counts), "len_bucket")
        .crossJoin(broadcast(minCount))
        .withColumn("h", pmod(
          hash60(concat($"doc_id".cast("string"), lit("_lmr"))),
          lit(1000000L)))
        .filter($"h" * $"n_bucket" < $"m" * lit(1000000L))
        .select($"doc_id", $"source", $"len_bucket", $"n_bucket")
        .orderBy($"doc_id")
    }),

    // Attention-cost pricing of packing strategies — the quadratic
    // complement to q175's token-fill report: a training batch pays
    // attention FLOPs ∝ Σ len², so two packings with equal token fill
    // can differ materially in compute. Prices three layouts at
    // L=2048: (a) concat-and-split — dense fill but every block costs
    // L² (documents attend across boundaries), (b) pad-to-L per doc —
    // each doc's rows attend over the padded width (len·L), (c)
    // block-diagonal masking — the Σ len² lower bound any
    // mask-respecting packing achieves. Integer arithmetic, one scan,
    // one 1-row aggregate.
    "q203_attention_cost" -> ((s, dir) => {
      import s.implicits._
      val L = 2048L
      Tables.table(s, dir, "documents")
        .select(tokenCount($"text").cast("long").as("len"))
        .agg(sum($"len").as("tokens"),
          count(lit(1)).as("n_docs"),
          (ceil(sum($"len") / lit(L.toDouble)).cast("long") * L * L)
            .as("concat_cost"),
          sum($"len" * L).as("pad_cost"),
          sum($"len" * $"len").as("masked_cost"))
        .withColumn("masked_vs_concat_pm",
          expr("1000 * masked_cost div concat_cost"))
        .withColumn("masked_vs_pad_pm",
          expr("1000 * masked_cost div pad_cost"))
    }),

    // Needle-in-a-haystack eval-set builder — the long-context eval
    // construction pipeline (Kamradt's NIAH; RULER): documents
    // concatenate into fixed haystacks (10 docs, id-ordered) and a
    // needle sentence is planted at a DETERMINISTIC per-haystack
    // depth (salted hash per-mille of the token stream), so
    // recall-at-depth curves are reproducible across runs and
    // engines. Output is the manifest an eval harness consumes —
    // including the md5 of the ASSEMBLED text, so the hash gate pins
    // the assembly itself, not just the bookkeeping. One group-key
    // exchange + per-haystack projections.
    "q204_needle_haystack" -> ((s, dir) => {
      import s.implicits._
      val needle = "The secret ingredient is graft number FORTYTWO ."
      Q.fanout(Tables.table(s, dir, "documents"))
        .select(($"doc_id" / 10).cast("long").as("hid"), $"doc_id",
          $"text")
        .groupBy($"hid")
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct($"doc_id", $"text"))),
            x => x.getField("text"))).as("htext"))
        .select($"hid", $"n_docs", split($"htext", " ").as("ws"))
        .withColumn("n_tokens", size($"ws").cast("long"))
        .withColumn("depth_pm",
          pmod(hash60(concat($"hid".cast("string"), lit("_needle"))),
            lit(1000L)))
        .withColumn("k", expr("n_tokens * depth_pm div 1000").cast("int"))
        .withColumn("assembled_md5", md5(concat_ws(" ",
          array_join(slice($"ws", lit(1), $"k"), " "),
          lit(needle),
          array_join(slice($"ws", $"k" + lit(1),
            greatest($"n_tokens".cast("int") - $"k", lit(0))), " "))))
        .select($"hid", $"n_docs", $"n_tokens", $"depth_pm",
          $"k".cast("long").as("needle_word_pos"), $"assembled_md5")
        .orderBy($"hid")
    }),

    // Tokenizer vocab-size ablation — fertility at nested merge-table
    // prefixes (0 = character-level, 8 = half the table, 17 = full):
    // the "how big should the vocab be" curve a tokenizer team reads,
    // here over the q124 pinned-merge tokenizer whose encode loop is
    // oracle-replayable at EVERY prefix (BPE merge tables are
    // rank-ordered, so a prefix IS a smaller trained vocab — the
    // ablation costs one scan with three encode expressions, not
    // three training runs).
    "q205_bpe_vocab_ablation" -> ((s, dir) => {
      import s.implicits._
      val ks = Seq(0, 8, 17)
      val perDoc = Q.fanout(Tables.table(s, dir, "documents"))
        .select(length($"text").cast("long").as("c"),
          explode(array(ks.map(k => struct(lit(k).as("k"),
            size(graft.text.Bpe.encode($"text",
              pinnedMerges.take(k))).cast("long").as("t"))): _*))
            .as("e"))
      perDoc.select($"c", $"e.k".as("k"), $"e.t".as("t"))
        .groupBy($"k")
        .agg(count(lit(1)).as("n_docs"), sum($"c").as("n_chars"),
          sum($"t").as("n_bpe_tokens"))
        .withColumn("fertility_ppk",
          expr("n_chars * 1000 div n_bpe_tokens"))
        .orderBy($"k")
    }),

    // Classifier-eval AUC — the filter-quality eval harness as a
    // verified operator (q144's move, applied to the quality scorer
    // instead of the ANN index): ROC-AUC of the q24 quality score as
    // a ranker for the `lang = 'en'` label, via the Mann-Whitney U
    // identity AUC = (concordant + ties/2) / (n₊·n₋) — entirely from
    // per-distinct-score (n₊, n₋) counts, so no per-PAIR work ever
    // materializes (the naive rendering is an n² self-join). The
    // running negatives-below-this-score count is the distributed
    // prefix sum (GlobalIndex.withGlobalCumSum — one range exchange +
    // parallel per-partition windows; never a single-task global
    // window), then ONE 1-row aggregate. Integer cross-multiply
    // (·500000, floor-div) keeps the released number engine-exact.
    "q208_quality_auc" -> ((s, dir) => {
      import s.implicits._
      val byScore = Tables.table(s, dir, "documents")
        .select(when($"lang" === "en", 1L).otherwise(0L).as("pos"),
          qualityScore($"text").as("score"))
        .groupBy($"score")
        .agg(sum($"pos").as("np"),
          (count(lit(1)) - sum($"pos")).as("nn"))
      graft.operators.GlobalIndex.withGlobalCumSum(
        byScore, Seq($"score"), $"nn", sumCol = "cum_nn")
        .agg(sum($"np").as("n_pos"), sum($"nn").as("n_neg"),
          sum($"np" * ($"cum_nn" - $"nn")).as("concordant"),
          sum($"np" * $"nn").as("tied"))
        .withColumn("auc_ppm",
          expr("(2 * concordant + tied) * 500000" +
            " div (n_pos * n_neg)"))
    }),

    // Vocabulary-growth curve (Heaps' law measurement): cumulative
    // distinct token types vs cumulative tokens over the corpus
    // prefix, at 10 doc-id-decile checkpoints — the "is the corpus
    // still yielding new vocabulary?" saturation read behind
    // tokenizer retraining and dedup-effectiveness calls.
    // Distinct-so-far is NOT partial-aggregable, so the naive
    // rendering (10 growing DISTINCT scans) re-reads the corpus 10×;
    // this is ONE scan: a token's FIRST decile is min(bucket) per
    // type (one hash aggregate over the exploded stream), the curve
    // is then two bounded 10-row prefix sums. Deciles come from the
    // broadcast (min,max) id range, not a global rank — no total
    // order ever materializes.
    "q214_vocab_growth" -> ((s, dir) => {
      import s.implicits._
      val range = Tables.table(s, dir, "documents")
        .agg(min($"doc_id").as("mn"),
          (max($"doc_id") - min($"doc_id") + 1L).as("span"))
      val docs = Q.fanout(Tables.table(s, dir, "documents"))
        .crossJoin(broadcast(range))
        .withColumn("bucket",
          expr("(doc_id - mn) * 10 div span").cast("int"))
      val toks = docs
        .select($"bucket", explode(split($"text", " ")).as("tok"))
        .filter($"tok" =!= "")
      val bis = docs
        .select($"bucket", explode(shingles($"text", 2)).as("bg"))
      def firstSeen(df: org.apache.spark.sql.DataFrame, c: String,
          out: String) = df
        .groupBy(col(c)).agg(min($"bucket").as("b"))
        .groupBy($"b".as("bucket")).agg(count(lit(1)).as(out))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks.groupBy($"bucket").agg(count(lit(1)).as("n_tokens"))
        .join(firstSeen(toks, "tok", "new_uni"), Seq("bucket"), "left_outer")
        .join(firstSeen(bis, "bg", "new_bi"), Seq("bucket"), "left_outer")
        .select($"bucket", $"n_tokens",
          coalesce($"new_uni", lit(0L)).as("new_uni"),
          coalesce($"new_bi", lit(0L)).as("new_bi"))
        // 10-row frame: the single-partition window is the bounded
        // model class, not a data-sized sort
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .withColumn("cum_uni_types", sum($"new_uni").over(w))
        .withColumn("cum_bi_types", sum($"new_bi").over(w))
        .orderBy($"bucket")
    }),

    // Chunk-granularity retrieval agreement — the RAG design question
    // "does chunking change what retrieval returns?" as a verified
    // artifact: for each probe term, BM25 top-5 over WHOLE documents
    // vs top-5 documents by best-CHUNK score (64/48 windows — q79's
    // chunker), with the top-1 of each side and the overlap count
    // in-row. Chunk-level idf/avgdl come from the CHUNK corpus (the
    // index a chunked RAG store actually has). Corpus stats ride as
    // broadcast 1-row frames (q103's pattern); every top-k is a
    // TakeOrdered limit, never a global window; the per-doc best
    // chunk is one hash aggregate. 3 bounded legs = 3 rows.
    "q217_chunk_retrieval_agreement" -> ((s, dir) => {
      import s.implicits._
      val terms = Seq("hash", "spark", "window")
      val docs = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"text")
      def prep(df: org.apache.spark.sql.DataFrame, textCol: String) = df
        .withColumn("w", split(col(textCol), " "))
        .withColumn("dl", size($"w").cast("long"))
      def stats(df: org.apache.spark.sql.DataFrame) = {
        val dfCols = terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains($"w", t), 1L).otherwise(0L)).as(s"df_$i")
        }
        df.agg(count(lit(1)).as("n_docs"),
          ((sum($"dl".cast("decimal(18,0)")).cast("double") /
            count(lit(1))).as("avgdl") +: dfCols): _*)
      }
      def score(t: String, i: Int) = {
        val tf = size(filter($"w", x => x === lit(t))).cast("double")
        val idf = ($"n_docs" - col(s"df_$i") + lit(0.5)) /
          (col(s"df_$i") + lit(0.5))
        idf * (tf * lit(2.2)) / (tf + lit(1.2) *
          (lit(0.25) + lit(0.75) * $"dl".cast("double") / $"avgdl"))
      }
      // r16: the scored corpora are term-INDEPENDENT (per-term tf/idf
      // read the pinned `w`/`dl`/stats columns), but each of the 3
      // term legs re-derived the whole doc-prep and chunk-prep
      // pipelines (the 64/48 chunker ran 3×, its BM25 stats 3× —
      // ProfileQ: 47 jobs). Pin each scored corpus once; every leg is
      // then a TakeOrdered scan over cached blocks. Scores and
      // winners are unchanged — the same expressions over the same
      // rows, only derived once.
      val dprep = prep(docs, "text")
      val dscored = dprep.crossJoin(broadcast(stats(dprep)))
        .localCheckpoint()
      val cprep = prep(
        graft.text.Chunking.chunk(docs, "doc_id", "text", 64, 48),
        "chunk_text")
      val cscored = cprep.crossJoin(broadcast(stats(cprep)))
        .localCheckpoint()
      val legs = terms.zipWithIndex.map { case (t, i) =>
        val dTop = dscored.select($"doc_id", score(t, i).as("sc"))
          .orderBy($"sc".desc, $"doc_id").limit(5).localCheckpoint()
        val cTop = cscored.select($"doc_id", score(t, i).as("sc"))
          .groupBy($"doc_id").agg(max($"sc").as("sc"))
          .orderBy($"sc".desc, $"doc_id").limit(5).localCheckpoint()
        val overlap = dTop.select($"doc_id")
          .join(cTop.select($"doc_id"), "doc_id")
          .agg(count(lit(1)).as("n_overlap"))
        dTop.orderBy($"sc".desc, $"doc_id").limit(1)
          .select($"doc_id".as("doc_top1"))
          .crossJoin(cTop.orderBy($"sc".desc, $"doc_id").limit(1)
            .select($"doc_id".as("chunk_top1")))
          .crossJoin(overlap)
          .select(lit(t).as("term"), $"doc_top1", $"chunk_top1",
            $"n_overlap")
      }
      legs.reduce(_ unionByName _).orderBy($"term")
    }),

    // (q202's chunker lives in [[cdcChunks]] so CdcChunkSpec can pin
    // the boundary-stability property on synthetic edits.)
    // Content-defined chunking — the CDC boundary rule (Rabin-style:
    // a window's hash selects boundaries, so a one-word insertion
    // shifts ONE chunk, not every fixed-stride chunk after it — the
    // property that makes chunk-hash dedup storage-stable across
    // near-identical documents; cf. LBFS/restic/borg). Boundary:
    // salted hash60 of the 4-word window ≡ 0 (mod 16) → mean chunk
    // ≈ 16 words. Per-source census: chunks, distinct chunk hashes,
    // chunk instances shared across docs, words. One doc-partition
    // window pass (3 leads + the running boundary sum share a sort),
    // then chunk-hash aggregates. Complements q79 (fixed-stride
    // windows) and q161 (natural paragraph breaks).
    "q202_cdc_chunking" -> ((s, dir) => {
      import s.implicits._
      val chunks = cdcChunks(Q.fanout(Tables.table(s, dir, "documents")))
      val dd = chunks.groupBy($"ch")
        .agg(countDistinct($"doc_id").as("nd"))
      chunks.join(dd, "ch")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct($"ch").as("n_distinct"),
          sum(when($"nd" > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
          sum($"chunk_words").as("n_words"))
        .orderBy($"source")
    }),

    // Benchmark decontamination (the GPT-3/Llama 13-gram protocol):
    // flag training docs sharing any 13-gram with the held-out
    // benchmark corpus (source src0 here). Grams join on their md5 —
    // a fixed 32-char key instead of 13-word strings — and the
    // benchmark side is BROADCAST: real benchmark suites are tiny
    // next to a 100 TB train corpus, so the train side never
    // shuffles; the whole query is scan → broadcast-hash-join →
    // partial agg.
    "q73_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val grams = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"source",
          explode(shingles($"text", 13)).as("g"))
        .select($"doc_id", $"source", md5($"g").as("gh"))
      val bench = grams.filter($"source" === "src0")
        .select($"gh").distinct()
      grams.filter($"source" =!= "src0")
        .join(broadcast(bench), "gh")
        .groupBy($"doc_id", $"source")
        .agg(count(lit(1)).as("n_contaminated_grams"))
        .orderBy($"doc_id")
    }),

    // PII redaction — the curation scrub stage: phone patterns then
    // long digit runs (account numbers) replaced in a profile text,
    // with a match count kept for auditing. The contact field is a
    // deterministic derivation of c_custkey (this corpus carries no
    // natural phone column) so the phone pattern genuinely fires on
    // 1/3 of rows. Pure codegen regexp expressions (Java regex here,
    // RE2 in the oracle — patterns chosen dialect-portable);
    // scan-parallel, no shuffle.
    "q74_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val phone = format_string("%02d-%03d-%03d-%04d",
        $"c_custkey" % 90 + 10, ($"c_custkey" * 7) % 900 + 100,
        ($"c_custkey" * 13) % 900 + 100, ($"c_custkey" * 31) % 9000 + 1000)
      val contact = when($"c_custkey" % 3 === 0, phone)
        .otherwise(lit("unlisted"))
      val profile = concat_ws(" ", $"c_name", contact, $"c_mktsegment")
      Tables.table(s, dir, "customer")
        .select($"c_custkey",
          regexp_count(profile,
            lit("[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}")).cast("long")
            .as("n_phones"),
          regexp_replace(
            regexp_replace(profile,
              lit("[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"), lit("[PHONE]")),
            lit("[0-9]{4,}"), lit("[NUM]")).as("redacted"))
        .orderBy($"c_custkey")
    }),

    // Near-dup CLUSTERS: MinHash-LSH verified pairs (q28) closed
    // under transitivity by iterative min-label propagation — the
    // step pair-dropping gets wrong (a~b, b~c must keep ONE of
    // {a,b,c}). Each round is one edge-list join + min-aggregate;
    // rounds bounded by component diameter (band cliques: 2-3).
    // Oracle is a DuckDB recursive-CTE closure over the same exact
    // pairs.
    "q75_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.ConnectedComponents.nearDupClusters(
        Tables.table(s, dir, "documents"), "doc_id", "text", 0.8)
        .orderBy($"doc_id")
    }),

    // The RETENTION half of near-dup clustering (q75 labels, this
    // chooses): every cluster keeps exactly its best-quality member
    // (ties → min doc_id), singletons keep themselves — the
    // "canonical document" policy every dedup pipeline ends with.
    // One left join onto the cluster labels + one per-cluster window
    // (clusters are near-dup groups — small by construction; the
    // window partitions by cluster_id, never globally).
    // Oracle note: cluster labels come from minhash-LSH banding while
    // the oracle closes over the exact all-pairs jaccard ≥ 0.8 set —
    // the SAME corpus-dependent banding-recall assumption q116
    // documents and MinHashSpec pins (on this corpus the bands miss
    // no qualifying pair; a corpus where they did would fail the gate
    // without a code bug).
    "q125_canonical_keep" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
      val clustered = graft.dedup.ConnectedComponents
        .nearDupClusters(docs, "doc_id", "text", 0.8)
      val full = docs
        .select($"doc_id", qualityScore($"text").as("quality"))
        .join(clustered, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"cluster_id", $"doc_id").as("cluster_id"),
          coalesce($"cluster_size", lit(1L)).as("cluster_size"),
          $"quality")
      val w = Window.partitionBy($"cluster_id")
        .orderBy($"quality".desc, $"doc_id")
      full.withColumn("kept", row_number().over(w) === 1)
        .orderBy($"doc_id")
    }),

    // Deterministic train/val/test split manifest: the 98/1/1 cut by
    // portable salted hash of doc_id — reproducible on any engine,
    // stable under corpus growth (a doc's split never changes when
    // neighbors arrive, unlike percentile cuts). Scan-parallel
    // classify + one aggregate; the manifest is what a training run
    // records for provenance.
    "q129_split_manifest" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select($"source",
          (hash60(concat($"doc_id".cast("string"), lit("_split"))) % 100)
            .as("h"),
          tokenCount($"text").cast("long").as("n_tokens"))
        .withColumn("split",
          when($"h" < 98, "train").when($"h" === 98, "val")
            .otherwise("test"))
        .groupBy($"source", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
        .orderBy($"source", $"split")
    }),

    // Leakage-safe train/val/test splits: q129's deterministic salted
    // cut, keyed by the near-dup CLUSTER instead of the document — a
    // near-duplicate of a training doc landing in val/test is
    // memorization leakage that inflates eval (the q72/q73
    // decontamination failure mode arising from the split itself).
    // Every doc's split key is its cluster representative
    // (coalesce(cluster_id, doc_id): singletons key on themselves),
    // so a whole near-dup cluster moves as one unit and a crossing
    // pair is IMPOSSIBLE by construction — and the output proves it:
    // cross_pairs (near-dup pairs whose endpoints landed in different
    // splits) is computed from the verified pair list and sits in the
    // hash-gated row as 0. Plan: the q75 label propagation + one
    // hash-classify projection + one aggregate; the pair list is
    // localCheckpointed once and reused for labels and the audit.
    // Oracle note: same banding-recall assumption as q75/q125 (LSH
    // pairs vs the oracle's exact all-pairs closure — equal on this
    // corpus, pinned in MinHashSpec).
    "q164_leakage_safe_splits" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
      val edges = graft.dedup.Dedup
        .minhashNearDupPairs(docs, "doc_id", "text", 0.8)
        .select($"id_a", $"id_b").localCheckpoint()
      val labeled = graft.dedup.ConnectedComponents.label(edges)
        .withColumnRenamed("id", "doc_id")
      // r16: `assigned` is consumed THREE times (both sides of the
      // cross-pair audit + the final census) — pin the narrow
      // (doc_id, gid, split) frame once instead of re-deriving the
      // docs⋈labels join per consumer (the before-plan rebuilt it as
      // three SortMergeJoin subtrees, 26 Exchanges total). The pair
      // list is the small side of both audit joins (verified near-dup
      // pairs ≪ docs) — broadcast it under a measured gate (counting
      // the just-checkpointed edges is a cached-block scan), so the
      // pinned assigned frame never exchanges. Past the gate the
      // joins shuffle as before; same rows either way.
      val assigned = docs.select($"doc_id")
        .join(labeled, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("gid"))
        .withColumn("h",
          hash60(concat($"gid".cast("string"), lit("_gsplit"))) % 100)
        .withColumn("split", when($"h" < 98, "train")
          .when($"h" === 98, "val").otherwise("test"))
        .localCheckpoint()
      val pairsSmall = edges.count() <= 2000000L
      def pairSide(d: org.apache.spark.sql.DataFrame) =
        if (pairsSmall) broadcast(d) else d
      val cross = pairSide(pairSide(edges)
        .join(assigned.select($"doc_id".as("id_a"), $"split".as("split_a")),
          "id_a"))
        .join(assigned.select($"doc_id".as("id_b"), $"split".as("split_b")),
          "id_b")
        .filter($"split_a" =!= $"split_b")
        .agg(count(lit(1)).as("cross_pairs"))
      assigned.groupBy($"split")
        .agg(countDistinct($"gid").as("n_groups"),
          count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(cross))
        .orderBy($"split")
    }),

    // Bigram language-model quality gate: mean Laplace-smoothed
    // bigram probability P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) under the
    // corpus's own LM — the perplexity-style fluency signal, kept in
    // RATIONAL form (the q103 discipline: counts and divisions only,
    // never ln — libm transcendentals differ across engines in the
    // last ulp). Per-doc mean uses the q109 fixed-point sum
    // (floor(p·10¹²) → exact decimal sum) so summation order can't
    // move the hash. Two hash aggregates over the bigram vocabulary +
    // joins back on the bigram key — the same shuffle class as BM25.
    "q130_bigram_lm_gate" -> ((s, dir) => {
      import s.implicits._
      val pairs = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", explode(ngrams($"text", 2)).as("g"))
        .select($"doc_id",
          substring_index($"g", " ", 1).as("w1"),
          substring_index($"g", " ", -1).as("w2"))
      val bc = pairs.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val uc = bc.groupBy($"w1").agg(sum($"c2").as("c1"))
      val vv = bc.agg(countDistinct($"w2").as("v"))
      pairs
        .join(bc, Seq("w1", "w2"))
        .join(uc, Seq("w1"))
        .crossJoin(broadcast(vv))
        .withColumn("prob",
          ($"c2" + 1).cast("double") / ($"c1" + $"v").cast("double"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(
            sum(floor($"prob" * lit(1e12))
              .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
              .cast("double") / lit(1e12) / count(lit(1)),
            6).as("mean_prob"))
        .orderBy($"doc_id")
    }),

    // Canonical normalization (NFC → lower → whitespace collapse →
    // trim): per-row codegen expressions only — scan-parallel. The
    // NFC step is the graft_nfc custom Expression (no Spark
    // built-in; a UDF would break whole-stage codegen).
    "q69_normalize_text" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select(
          $"doc_id",
          normalizeText($"text").as("norm_text"),
          length(normalizeText($"text")).as("norm_chars"))
        .orderBy($"doc_id")
    }),

    // Corpus-wide heavy hitters, exact: explode bigrams → one hash
    // aggregate (map-side partial combine shrinks the shuffle to the
    // vocabulary) → TakeOrdered top-k with a deterministic tiebreak.
    "q67_top_ngrams" -> ((s, dir) => {
      import s.implicits._
      Q.fanout(Tables.table(s, dir, "documents"))
        .select(explode(ngrams($"text", 2)).as("ngram"))
        .groupBy($"ngram").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"ngram")
        .limit(20)
    }),

    // The same question through the BLOCKWISE Misra-Gries mergeable
    // summary (Agarwal et al., "Mergeable Summaries", PODS 2012):
    // docs land in one of 32 blocks by a portable hash; each block
    // builds an exact local count table and compresses it to ≤ cap
    // entries with the MG merge rule (subtract the (cap+1)-th largest
    // count, drop non-positive). NB the first aggregate still groups
    // the full (blk, ngram) vocabulary — a vocabulary-sized shuffle,
    // NOT constant memory; what this form buys is a replayable
    // (partition-deterministic) MG so the DuckDB oracle can verify
    // the merge rule. The constant-memory path — counters bounded at
    // cap DURING the fold, arrival-order dependent and hence
    // unoracled — is the streaming FreqItemsAgg (FreqItemsSpec).
    // The ≤ 32·cap surviving counters here are
    // pointwise-summed and compressed once more. Every counter is a
    // lower bound within N/(cap+1) of truth — the MG invariant — and,
    // unlike the single-pass streaming fold (FreqItemsAgg, whose
    // decrement step depends on arrival order), the blockwise form is
    // a pure function of the block PARTITION of the corpus, so the
    // DuckDB oracle replays it exactly. The final compress windows
    // over ≤ 32·cap rows by construction (bounded, like q121). The
    // streaming constant-memory fold remains FreqItemsSpec's contract.
    "q68_top_ngrams_sketch" -> ((s, dir) => {
      import s.implicits._
      val compressed =
        mgBlockCompressed(Tables.table(s, dir, "documents"))
      // Merge: pointwise sum of ≤ 32·cap counters, one final compress.
      // The global window's input is bounded by construction
      // (MgBoundSpec pins it), so Window.partitionBy() here is a
      // bounded single-partition pass, not a global-sort smell.
      val cap = mgCap
      val wAll = Window.orderBy($"mc".desc, $"ngram")
      compressed.groupBy($"ngram").agg(sum($"c2").as("mc"))
        .withColumn("sub", coalesce(
          max(when(row_number().over(wAll) === cap + 1, $"mc"))
            .over(Window.partitionBy()), lit(0L)))
        .select($"ngram", ($"mc" - $"sub").as("est_n"))
        .filter($"est_n" > 0)
        .orderBy($"est_n".desc, $"ngram")
        .limit(20)
    }),

    // q68's CONSTANT-MEMORY companion: the same top-bigrams question
    // through the streaming Misra-Gries fold (FreqItemsAgg) — per-
    // partition buffers bounded at cap DURING the fold (map-side
    // partial aggregation ships ≤ cap counters per partition), merged
    // with the PODS-2012 rule. This is the form that never
    // materializes the vocabulary: q68's blockwise baseline still
    // groups the full (blk, ngram) table before compressing (a
    // vocabulary-sized shuffle) to stay replayable in the oracle;
    // this one holds ≤ cap counters per partition at every moment.
    // The price is arrival-order dependence (the MG decrement step) —
    // estimates are a pure function of the PARTITIONING, not the SET,
    // so the estimates themselves admit no engine-independent oracle.
    // Driver gate (the q17/q50 contract-boolean form, retiring the
    // r1–r10 oracle exemption): rows are the EXACT top-20 bigrams
    // (replayable — count desc, ngram tiebreak), each carrying the
    // LIVE sketch's Misra-Gries invariant est ≤ true ≤ est + N/(cap+1)
    // as a boolean the oracle expects TRUE, checked in exact integer
    // arithmetic ((true−est)·(cap+1) ≤ N). An absent survivor counts
    // as est = 0 — exactly what MG guarantees may only happen when
    // true ≤ N/(cap+1). A sketch drift (fold bug, merge bug, Spark
    // upgrade) flips the boolean and the driver row goes red;
    // MgBoundSpec keeps the invariant pinned over EVERY survivor,
    // not just the top-20. The exact companion is a test-scale audit
    // leg gated on spark.graft.sketchAudit (Bench turns it off so
    // the timed body stays the constant-memory sketch alone).
    "q138_top_ngrams_stream" -> ((s, dir) => {
      import s.implicits._
      val audit = s.conf.get("spark.graft.sketchAudit", "true").toBoolean
      val docs = Tables.table(s, dir, "documents")
      if (!audit)
        mgStreamSketch(docs)
          .orderBy($"est_n".desc, $"ngram")
          .limit(20)
      else {
        val grams = Q.fanout(docs)
          .select(explode(ngrams($"text", 2)).as("ngram"))
        val exactTop = grams.groupBy($"ngram")
          .agg(count(lit(1)).as("exact_n"))
          .orderBy($"exact_n".desc, $"ngram")
          .limit(20)
        val total = grams.agg(count(lit(1)).as("nn"))
        exactTop
          .join(mgStreamSketch(docs), Seq("ngram"), "left")
          .crossJoin(broadcast(total)) // 1-row total, bounded by design
          .select($"ngram", $"exact_n",
            ((coalesce($"est_n", lit(0L)) <= $"exact_n") &&
              (($"exact_n" - coalesce($"est_n", lit(0L))) *
                lit((mgCap + 1).toLong) <= $"nn"))
              .as("mg_within_bound"))
          .orderBy($"exact_n".desc, $"ngram")
      }
    }),

    // Paragraph-level corpus dedup (the Dolma/RefinedWeb passage
    // pass — a different operator from every doc-level dedup above:
    // the unit of removal is the PASSAGE, the document survives with
    // its boilerplate stripped). Paragraphs here are fixed 8-word
    // windows of the normalized text (the corpus has no newline
    // structure; a real feed would split on '\n\n' at the same
    // seam). Pipeline: explode windows with their in-doc position →
    // corpus-wide occurrence count (one partial-aggregable GROUP BY)
    // → drop windows occurring ≥ 3 times (cross-doc boilerplate) →
    // reassemble each doc ORDER-PRESERVINGLY (array_sort on the
    // (pno, para) structs — collect_list order is free to vary across
    // partitionings; the sort, not luck, pins the text). Scale shape:
    // explode is n_words/8 rows, both aggregates are partial, the
    // count join is an equi-join on the paragraph — no window over
    // the corpus, no driver state; at 100 TB the join key would be
    // the paragraph's 128-bit hash rather than its text, same plan.
    "q161_paragraph_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", words(normalizeText($"text")).as("ws"))
      val paras = docs.selectExpr("doc_id",
        """posexplode(transform(
             sequence(0, greatest(cast(ceil(size(ws)/8.0) as int), 1) - 1),
             i -> array_join(slice(ws, i*8+1, 8), ' '))) AS (pno, para)""")
      val counts = paras.groupBy($"para").agg(count(lit(1)).as("n_occ"))
      val kept = paras.join(counts, "para").filter($"n_occ" < 3)
      val total = paras.groupBy($"doc_id").agg(count(lit(1)).as("n_paras"))
      val rebuilt = kept.groupBy($"doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct($"pno", $"para"))),
          x => x.getField("para")), " ").as("clean_text"))
      total.join(rebuilt, Seq("doc_id"), "left")
        .select($"doc_id", $"n_paras",
          coalesce($"n_kept", lit(0L)).as("n_kept"),
          coalesce($"clean_text", lit("")).as("clean_text"))
        .orderBy($"doc_id")
    }),

    // Vocabulary coverage curve — the tokenizer-sizing question: the
    // smallest frequency-ranked vocabulary covering X‰ of all corpus
    // token occurrences, for X ∈ {500, 900, 950, 990} (Zipf's tail is
    // where BPE budgets go; this is the curve a vocab-size decision
    // reads off). The global cumulative frequency over the (count
    // DESC, token) order is a prefix sum NO single window can do at
    // scale — GlobalIndex.withGlobalCumSum runs it as one range
    // exchange + parallel per-partition running sums + a bounded
    // per-partition offset table (the q93 zipWithIndex shape extended
    // to sums). The per-target minimum is 4 conditional aggregates
    // (no inequality join), unpivoted with stack and equi-joined back
    // for the achieved coverage. Scale shape: token counts are one
    // partial-aggregable GROUP BY; everything after runs on the
    // VOCABULARY (≪ corpus, Heaps' law), and nothing touches a
    // single-task window.
    "q167_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val targets = Seq(500L, 900L, 950L, 990L)
      val counts = Q.fanout(Tables.table(s, dir, "documents"))
        .select(explode(words(normalizeText($"text"))).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("n"))
      val ranked = graft.operators.GlobalIndex.withGlobalCumSum(
        counts, Seq($"n".desc, $"tok"), $"n",
        sumCol = "csum", seqCol = "vocab_size")
      // 1-row bounded aggregate: the corpus token total
      val total = counts.agg(sum($"n")).as[Long].head()
      val minCols = targets.map(t =>
        min(when($"csum" * 1000 >= lit(t) * lit(total),
          $"vocab_size")).as(s"v$t"))
      val mins = ranked.agg(minCols.head, minCols.tail: _*)
      val vs = mins.selectExpr(
        s"stack(${targets.size}, " +
          targets.map(t => s"${t}L, v$t").mkString(", ") +
          ") AS (target_pm, vocab_size)")
      vs.join(ranked.select($"vocab_size", $"csum"), "vocab_size")
        .select($"target_pm", $"vocab_size",
          expr(s"csum * 1000 div ${total}L").as("covered_pm"))
        .orderBy($"target_pm")
    }),

    // Prefix-cache sharing report — the inference-serving question:
    // how much prompt-prefix KV-cache could be shared if requests
    // were routed by common prefix (vLLM/SGLang prefix caching). Per
    // source: docs whose first-P tokens coincide with another doc's,
    // the shared-prefix groups, and the token savings a prefix cache
    // banks ((group_size − 1) · prefix_len, summed). P=2 on this
    // synthetic word-soup corpus (collisions exist at sf0.01; a real
    // prompt log uses 64+ — the plan is P-independent). Two
    // partial-aggregable GROUP BYs, nothing pairwise; at 100 TB the
    // prefix column would be a 128-bit hash, same plan.
    "q178_prefix_cache_report" -> ((s, dir) => {
      import s.implicits._
      val P = 2
      val pre = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"source",
          words(normalizeText($"text")).as("ws"))
        .select($"source", least(size($"ws"), lit(P)).cast("long").as("plen"),
          array_join(slice($"ws", 1, P), " ").as("prefix"))
      pre.groupBy($"source", $"prefix", $"plen")
        .agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(sum($"c").as("n_docs"),
          sum(when($"c" >= 2, $"c").otherwise(0L)).as("n_shared_docs"),
          sum(when($"c" >= 2, 1L).otherwise(0L)).as("n_shared_groups"),
          sum(when($"c" >= 2, ($"c" - 1) * $"plen").otherwise(0L))
            .as("saved_tokens"))
        .orderBy($"source")
    }),

    // Packing-efficiency report — the evaluation BESIDE q76's packer:
    // for context length L=2048, what three packing policies cost in
    // sequences, fill rate, and document splits. 'concat' (q76's
    // tape: split-anywhere, ~100% fill, docs cross boundaries —
    // boundary crossings read off the tape offsets), 'pad' (one doc
    // per sequence, pad to L; >L docs chunk), 'shelf' (size-class
    // shelves: docs slot into 2^bitlen(n) cells, L div slot per
    // sequence — no splits, bounded padding; the first-fit-decreasing
    // family's parallelizable member, since FFD itself is inherently
    // sequential). All integer arithmetic (length(bin(n)) for the
    // size class — no float log, both engines agree bit-for-bit);
    // totals are bounded 1-row aggregates. The numbers a data-prep
    // team reads before choosing its packer.
    "q175_packing_efficiency" -> ((s, dir) => {
      import s.implicits._
      val L = 2048L
      val docs = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"text")
      val packed = graft.text.Sampling
        .packSequences(docs, "doc_id", "text", L)
        .select($"doc_id", $"n_tokens", $"start_offset")
      val base = packed.agg(
        sum($"n_tokens").as("total"),
        sum(when($"n_tokens" > 0 &&
            expr(s"start_offset div $L") =!=
              expr(s"(start_offset + n_tokens - 1) div $L"), 1L)
          .otherwise(0L)).as("concat_split"),
        sum(expr(s"(n_tokens + $L - 1) div $L")).as("pad_seq"),
        sum(when($"n_tokens" > L, 1L).otherwise(0L)).as("chunked")).head()
      val total = base.getAs[Long]("total")
      val concatSplit = base.getAs[Long]("concat_split")
      val padSeq = base.getAs[Long]("pad_seq")
      val chunked = base.getAs[Long]("chunked")
      val shelfSmall = packed.filter($"n_tokens" > 0 && $"n_tokens" <= L)
        .groupBy(length(bin($"n_tokens")).as("b"))
        .agg(count(lit(1)).as("cnt"))
        .select(expr(
          s"""(cnt + ($L div least(shiftleft(1L, b), $L)) - 1)
              div ($L div least(shiftleft(1L, b), $L))""").as("nsq"))
        .agg(coalesce(sum($"nsq"), lit(0L))).as[Long].head()
      val shelfBig = packed.filter($"n_tokens" > L)
        .agg(coalesce(sum(expr(s"(n_tokens + $L - 1) div $L")), lit(0L)))
        .as[Long].head()
      val concatSeq = (total + L - 1) / L
      def fill(nseq: Long): Long = 1000L * total / (nseq * L)
      Seq(
        ("concat", concatSeq, fill(concatSeq), concatSplit),
        ("pad", padSeq, fill(padSeq), chunked),
        ("shelf", shelfSmall + shelfBig, fill(shelfSmall + shelfBig),
          chunked))
        .toDF("strategy", "n_seq", "fill_pm", "n_docs_split")
        .orderBy($"strategy")
    }),

    // Positional phrase search — the exact-phrase capability a
    // bag-of-words index (q102 inverted index, q103 BM25) cannot
    // answer: occurrences of a multi-word phrase located by POSITION
    // ALIGNMENT over per-term postings (doc_id, pos), the classic
    // positional-index intersection: the k-term phrase is a chain of
    // k−1 equi-joins on (doc_id, pos + offset). Candidate docs are
    // pre-filtered with array_contains on ALL terms BEFORE the
    // explode, so postings materialize only for docs that could
    // match — the selective-term pushdown a phrase query lives on.
    // At 100 TB the per-query explode is replaced by a PRE-BUILT
    // postings table (q102's layout + a pos column); the join chain
    // is unchanged and each term's postings list is the bounded side.
    "q173_phrase_search" -> ((s, dir) => {
      import s.implicits._
      val phrases = Seq("table hash", "slow hash batch")
      val docs = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", words(normalizeText($"text")).as("ws"))
      val hits = phrases.map { p =>
        val terms = p.split(' ')
        val cand = docs.filter(
          terms.map(t => array_contains($"ws", t)).reduce(_ && _))
        val post = cand.select($"doc_id",
          posexplode($"ws").as(Seq("pos", "w")))
        val first = post.filter($"w" === terms.head)
          .select($"doc_id", $"pos".as("p0"))
        val aligned = terms.zipWithIndex.drop(1)
          .foldLeft(first) { case (acc, (t, i)) =>
            acc.join(
              post.filter($"w" === t)
                .select($"doc_id", ($"pos" - i).as("p0")),
              Seq("doc_id", "p0"))
          }
        aligned.agg(
            countDistinct($"doc_id").as("n_docs"),
            count(lit(1)).as("n_occ"))
          .select(lit(p).as("phrase"), $"n_docs", $"n_occ")
      }
      hits.reduce(_ unionByName _).orderBy($"phrase")
    }),

    // Engine-reproducible global shuffle: rows ordered by a salted
    // portable hash — the same pseudo-random training order on any
    // engine/cluster/re-run, unlike orderBy(rand()). One range
    // exchange at scale.
    "q65_deterministic_shuffle" -> ((s, dir) => {
      import s.implicits._
      graft.text.Sampling.deterministicShuffle(
        Tables.table(s, dir, "documents").select($"doc_id", $"source"),
        "doc_id")
    }),

    // SimHash near-dup pairs (hamming ≤ 6), adaptively: all-pairs
    // codegen popcount while the corpus fits the n² budget, the
    // pigeonhole chunk equi-join (guaranteed recall) beyond the
    // cutoff — so the registered plan is never O(n²) at scale.
    "q30_simhash_neardup" -> ((s, dir) => {
      import s.implicits._
      Dedup.simhashNearDupPairsAdaptive(
        Tables.table(s, dir, "documents"), "doc_id", "text", maxDist = 6)
        .orderBy($"id_a", $"id_b")
    }),

    // Blocked edit-distance near-dup via the chunk PIGEONHOLE (the
    // Ed-Join family's guaranteed-recall filter, and the edit-distance
    // dual of q30's simhash banding): if ed(a, b) ≤ 5, at most 5 of
    // a's 6 contiguous prefix chunks are touched by an edit, so at
    // least one occurs in b VERBATIM, shifted by at most 5 positions.
    // Candidates = equi-join on (lang, chunk content, chunk length)
    // with a ±5 position band — a superset of the true pairs, so the
    // exact Levenshtein filter afterwards returns EXACTLY the
    // all-pairs answer (which is what the oracle computes) without
    // ever materializing the O(n²) pair space. (Length-bucket
    // blocking is useless here: every 40-char prefix has the same
    // length; content blocking is what prunes.) levenshtein() is
    // integer-exact on both engines.
    "q98_editdist_neardup" -> ((s, dir) => {
      import s.implicits._
      // rpad to EXACTLY 40 chars (sentinel U+0001): the chunk
      // pigeonhole is only sound over fixed-length strings — with a
      // shorter-than-40 doc the final chunk truncates and a lev≤5
      // pair can miss every block (latent on this corpus, which has
      // no sub-40-char text, but nothing enforced it). The metric is
      // levenshtein over the PADDED prefixes, defined identically in
      // the oracle, so missing tail chars count toward the distance.
      val d = Q.fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"lang",
          rpad(substring($"text", 1, 40), 40, "\u0001").as("prefix"))
      // a-side: the 6 fixed chunks (7,7,7,7,6,6 chars cover 1..40)
      val bounds = Seq((1, 7), (8, 7), (15, 7), (22, 7), (29, 6), (35, 6))
      val aChunks = d.select($"lang", $"doc_id".as("id_a"),
          $"prefix".as("p_a"),
          explode(array(bounds.map { case (st, ln) =>
            struct(substring($"prefix", st, ln).as("chunk"),
              lit(st).as("pos_a"), lit(ln).as("clen"))
          }: _*)).as("c"))
        .select($"lang", $"id_a", $"p_a",
          $"c.chunk", $"c.pos_a", $"c.clen")
      // b-side: every substring of length 6 and 7 with its position
      val bSubs = d.select($"lang", $"doc_id".as("id_b"),
          $"prefix".as("p_b"),
          explode(expr("""flatten(transform(array(6, 7), L ->
              transform(sequence(1, 41 - L), st ->
                struct(substring(prefix, st, L) AS chunk,
                       st AS pos_b, L AS clen))))""")).as("s"))
        .select($"lang", $"id_b", $"p_b",
          $"s.chunk", $"s.pos_b", $"s.clen")
      aChunks.join(bSubs, Seq("lang", "chunk", "clen"))
        .filter($"id_a" < $"id_b" && abs($"pos_a" - $"pos_b") <= 5)
        .select($"lang", $"id_a", $"id_b", $"p_a", $"p_b").distinct()
        // thresholded levenshtein: the banded DP computes an O(len·k)
        // strip and early-exits past the bound, returning -1 — most
        // candidates are far pairs, so the bound is the common path.
        // Values ≤ 5 are the exact distance (threshold 6 > cutoff),
        // so the result set and the dist column are unchanged.
        .withColumn("dist", levenshtein($"p_a", $"p_b", 6))
        .filter($"dist" >= 0 && $"dist" <= 5)
        .select($"id_a", $"id_b", $"lang", $"dist")
        .orderBy($"id_a", $"id_b")
    }),

    // Quality-quartile binning: NTILE over a total per-source order —
    // the standard "bucket the corpus by quality, then sample/trim
    // per bucket" primitive. One window shuffle on source; identical
    // bucket assignment on any engine because the order is total
    // (n_chars, doc_id tiebreak).
    "q99_quality_quartiles" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy($"n_chars", $"doc_id")
      Tables.table(s, dir, "documents")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy($"source", $"quartile")
        .agg(count(lit(1)).as("n_docs"),
          min($"n_chars").as("min_chars"),
          max($"n_chars").as("max_chars"))
        .orderBy($"source", $"quartile")
    }),

    // Exact substring dedup (Lee et al. 2022, arXiv:2107.06499,
    // rendered distributed): every 10-token window of every doc,
    // grouped by the window text; a window occurring in ≥2 distinct
    // docs is a duplicated span, and each doc reports what fraction
    // of its windows is duplicated elsewhere — the signal the paper
    // removes. Two shuffles, both on the span text (group + back-
    // join); window count is ~tokens per doc, so work is linear in
    // corpus size, never pairwise. (The paper's suffix array finds
    // arbitrary-length duplicates; fixed-k windows are the standard
    // map-reduce rendering — any duplicate ≥ k tokens is caught.)
    "q101_substring_dedup" -> ((s, dir) => {
      import s.implicits._
      val k = 10
      val winds = fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", split($"text", " ").as("w"))
        .filter(size($"w") >= k)
        .select($"doc_id", explode(expr(
          s"transform(sequence(1, size(w) - ${k - 1}), " +
            s"i -> concat_ws(' ', slice(w, i, $k)))")).as("span"))
      val dup = winds.groupBy($"span")
        .agg(countDistinct($"doc_id").as("nd"))
        .filter($"nd" >= 2)
        .select($"span", lit(1).as("dup"))
      winds.join(dup, Seq("span"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_windows"), count($"dup").as("n_dup"))
        .withColumn("dup_frac",
          round($"n_dup".cast("double") / $"n_windows".cast("double"), 6))
        .orderBy($"doc_id")
    }),

    // Inverted-index build: per term, document frequency, collection
    // frequency, and the head of the (sorted) posting list — the
    // retrieval-side data structure a corpus-scale search needs. One
    // explode + one hash aggregate; posting heads are bounded (5 ids)
    // so no aggregate grows with corpus size except the count fields.
    "q102_inverted_index" -> ((s, dir) => {
      import s.implicits._
      fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"term")
        .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("cf"),
          array_join(transform(
            slice(sort_array(collect_set($"doc_id")), 1, 5),
            _.cast("string")), ",").as("posting_head"))
        .orderBy($"df".desc, $"term")
        .limit(50)
    }),

    // BM25 retrieval over the inverted-index statistics: score every
    // doc for a fixed 3-term query. Rational idf
    // (N − df + 0.5)/(df + 0.5) instead of its log — same ranking
    // direction, and exactly reproducible across engines (ln is not
    // IEEE-pinned; swap in log for the classic variant when exact
    // replay doesn't matter). Corpus stats (N, avgdl, per-term df)
    // ride in as one broadcast 1-row frame, so scoring is a pure
    // scan: no shuffle until the final top-k.
    "q103_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val terms = Seq("spark", "window", "hash")
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .withColumn("dl", size($"w"))
      val dfCols = terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains($"w", t), 1L).otherwise(0L)).as(s"df_$i")
      }
      val statCols = Seq(
        (sum($"dl".cast("decimal(18,0)")).cast("double") / count(lit(1)))
          .as("avgdl")) ++ dfCols
      val stats = docs.agg(count(lit(1)).as("n_docs"), statCols: _*)
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = size(filter($"w", x => x === lit(t))).cast("double")
        val idf = ($"n_docs" - col(s"df_$i") + lit(0.5)) /
          (col(s"df_$i") + lit(0.5))
        idf * (tf * lit(2.2)) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl".cast("double") / $"avgdl"))
      }.reduce(_ + _)
      docs.crossJoin(broadcast(stats))
        .select($"doc_id", $"dl", round(score, 6).as("bm25"))
        .orderBy($"bm25".desc, $"doc_id")
        .limit(20)
    }),

    // Corpus-statistics quality signal: the fraction of a doc's
    // tokens that are globally RARE — corpus frequency below the
    // vocabulary mean, tested as the exact integer cross-multiply
    // cf · |vocab| < total_tokens (no division, engine-exact). The
    // complement of stopword density: machine-generated/boilerplate
    // text skews common, gibberish skews rare. One term-frequency
    // aggregate + one back-join on term, both linear.
    // Train the quality-gate model IN the engine: a linear regressor
    // distilling the hand-tuned quality heuristic (q24's score) from
    // cheap per-doc stats, fit by 3 full-batch gradient-descent steps.
    // Each step is one scan + 4 decimal-exact gradient sums (the q100
    // PageRank discipline: doubles divide, decimals add), so training
    // is bit-deterministic under any partitioning and the DuckDB
    // oracle replays all 3 steps as chained CTEs. The weight vector is
    // a bounded model artifact (4 doubles) collected per step like the
    // IVF centroids; features come from the one-pass TextStats kernel
    // and are localCheckpoint-pinned so each step re-scans, never
    // re-derives. This is q77's frozen-classifier gate, closed-loop:
    // the engine that applies the gate can also fit it.
    "q109_train_linear_gate" -> ((s, dir) => {
      import s.implicits._
      import graft.text.TextFunctions.textStats
      val st = textStats($"text")
      val feats = fanout(Tables.table(s, dir, "documents"))
        .select(
          (st.getField("n_tokens").cast("double") / lit(100.0)).as("x1"),
          (st.getField("n_uniq_tokens").cast("double") /
            st.getField("n_tokens").cast("double")).as("x2"),
          (st.getField("n_stopwords").cast("double") /
            st.getField("n_tokens").cast("double")).as("x3"),
          st.getField("quality_score").as("y"))
        .localCheckpoint()
      // fixed-point gradient sums: floor(x·10¹²) is pure IEEE double
      // arithmetic (deterministic on every engine), the floored values
      // sum exactly in decimal, and the 1e-12 quantization is noise at
      // gradient scale. A direct double→DECIMAL cast of the products
      // is NOT portable: the two engines round the scaled value
      // differently in the last ulp (observed as a 4e-18 drift in w3).
      // This is the "deterministic fixed-point all-reduce" trick from
      // reproducible distributed training.
      def dec(c: org.apache.spark.sql.Column) =
        sum(floor(c * lit(1.0e12)).cast("decimal(38,0)"))
          .cast("double") / lit(1.0e12)
      val eta = 0.5
      var w = Array(0.0, 0.0, 0.0, 0.0)
      for (_ <- 0 until 3) {
        val pred =
          lit(w(0)) + lit(w(1)) * $"x1" + lit(w(2)) * $"x2" + lit(w(3)) * $"x3"
        val g = feats.select((pred - $"y").as("r"), $"x1", $"x2", $"x3")
          .agg(dec($"r").as("g0"), dec($"r" * $"x1").as("g1"),
            dec($"r" * $"x2").as("g2"), dec($"r" * $"x3").as("g3"),
            count(lit(1)).as("n"))
          .collect()(0)
        val n = g.getLong(4).toDouble
        w = Array.tabulate(4)(j => w(j) - eta * (g.getDouble(j) / n))
      }
      val predF =
        lit(w(0)) + lit(w(1)) * $"x1" + lit(w(2)) * $"x2" + lit(w(3)) * $"x3"
      feats.select(((predF - $"y") * (predF - $"y")).as("r2"))
        .agg((dec($"r2") / count(lit(1))).as("mse"),
          count(lit(1)).as("n_docs"))
        .select(lit(w(0)).as("w0"), lit(w(1)).as("w1"),
          lit(w(2)).as("w2"), lit(w(3)).as("w3"), $"mse", $"n_docs")
    }),

    // Source-relative quality calibration: absolute quality scores
    // are not comparable across domains (a mediocre academic page
    // outscores a great chat log), so curation normalizes per source
    // first — percent_rank of the quality score WITHIN each source
    // (total order via doc_id tiebreak), keep everything above the
    // per-source median. One window shuffle on source; the kept
    // manifest is engine-exact because percent_rank is
    // (rank−1)/(n−1), pure integer→double arithmetic.
    "q123_calibrated_quality_trim" -> ((s, dir) => {
      import s.implicits._
      import graft.text.TextFunctions.qualityScore
      val w = Window.partitionBy($"source")
        .orderBy($"q", $"doc_id")
      fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", $"source", qualityScore($"text").as("q"))
        .withColumn("pr", percent_rank().over(w))
        .filter($"pr" >= 0.5)
        .select($"doc_id", $"source", $"q", round($"pr", 6).as("pr"))
        .orderBy($"doc_id")
    }),

    // Water-filling token-budget allocation: split a global training
    // budget (half the corpus here) across sources, capped by each
    // source's capacity — small sources keep everything, large ones
    // are clipped at a common level L with Σ min(cap, L) = budget.
    // The classic data-mixing allocator, solved in closed form over
    // one sorted window pass: ascending prefix sums give the unique
    // bracket where the level lands (or every source fits). Integer
    // capacities + ONE double division for L → engine-exact.
    "q121_token_waterfill" -> ((s, dir) => {
      import s.implicits._
      val caps = fanout(Tables.table(s, dir, "documents"))
        .select($"source", split($"text", " ").as("w"))
        .groupBy($"source").agg(sum(size($"w").cast("long")).as("cap"))
      val tot = caps.agg(sum($"cap").as("t"), count(lit(1)).as("n"))
      // global window over SOURCES — a bounded model-size frame
      // (domains, not documents), so the single partition is fine at
      // any corpus scale
      val byCap = Window.orderBy($"cap", $"source")
      val ranked = caps.crossJoin(broadcast(tot))
        .withColumn("budget", expr("t div 2"))
        .withColumn("k", row_number().over(byCap))
        .withColumn("pfx", sum($"cap").over(
          byCap.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // candidate level if sources 1..k stay fully kept:
        // L_k = (B − P_k)/(n − k); valid brackets have L_k ≥ cap_k
        .withColumn("lvl", when($"k" < $"n",
          ($"budget" - $"pfx").cast("double") / ($"n" - $"k").cast("double")))
      // the TRUE bracket is the LARGEST valid k (a smaller k's level
      // under-fills: it caps sources that should stay full); when no
      // k is valid the level sits below every cap → B/n
      val bracket = ranked
        .filter($"lvl" >= $"cap".cast("double"))
        .orderBy($"k".desc)
        .limit(1)
        .select($"lvl".as("level"), lit(0).as("prio"))
      val dflt = tot.select(
        (expr("t div 2").cast("double") / $"n".cast("double")).as("level"),
        lit(1).as("prio"))
      val level = bracket.unionByName(dflt)
        .orderBy($"prio").limit(1).select($"level")
      ranked.crossJoin(broadcast(level))
        .select($"source", $"cap",
          round(least($"cap".cast("double"), $"level"), 6).as("allocation"))
        .orderBy($"source")
    }),

    // k-anonymity audit over quasi-identifiers (privacy governance —
    // the release-side companion to q06's masking and q74's
    // redaction): every (nation, segment) group smaller than k is a
    // re-identification risk and gets suppressed before release. One
    // hash aggregate + a windowless self-contained rollup; output is
    // the per-group audit with the suppression verdict.
    "q117_k_anonymity" -> ((s, dir) => {
      import s.implicits._
      val k = 10
      Tables.table(s, dir, "customer")
        .groupBy($"c_nationkey", $"c_mktsegment")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("suppress", $"group_size" < k)
        .orderBy($"c_nationkey", $"c_mktsegment")
    }),

    // Canary injection: plant deterministic synthetic documents in
    // the corpus (1 per source) so a trained model's memorization can
    // be probed later — ids above the real id space, text derived
    // from md5 so the canary set is reproducible from (corpus, salt)
    // alone. Emits the injection manifest; the union with the corpus
    // is the training input. Bounded: one row per source, no shuffle
    // beyond the per-source max-id aggregate.
    "q118_canary_manifest" -> ((s, dir) => {
      import s.implicits._
      import graft.text.TextFunctions.hash60
      val docs = Tables.table(s, dir, "documents")
      val maxId = docs.agg(max($"doc_id").as("max_id"))
      docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(maxId))
        .select($"source",
          ($"max_id" + 1 +
            pmod(hash60(concat($"source", lit("_canary"))), lit(1000000L)))
            .as("canary_id"),
          concat(lit("canary "), md5(concat($"source", lit("_canary_text"))))
            .as("canary_text"),
          $"n_docs")
        .orderBy($"source")
    }),

    // Contrastive-pair mining for embedding-model training: every
    // verified near-dup pair (q28's exact-jaccard machinery) becomes
    // an (anchor, positive) example, and the negative is drawn by
    // PORTABLE salted hash of the pair — deterministic, uniform over
    // the corpus, reproducible on any engine (never rand()). Collision
    // with the anchor/positive bumps at most twice (ids are dense
    // 0..n−1 in this corpus; at scale compose with q93's GlobalIndex
    // to densify first). Corpus size rides as a broadcast 1-row frame.
    // Oracle note: the pair source is minhash-LSH banding while the
    // oracle computes the exact all-pairs jaccard ≥ 0.8 set — the
    // SAME corpus-dependent banding-recall assumption q28 documents
    // and MinHashSpec pins (on this corpus the bands miss no
    // qualifying pair; a corpus where they did would fail the gate
    // without a code bug).
    "q116_contrastive_triplets" -> ((s, dir) => {
      import s.implicits._
      import graft.text.TextFunctions.hash60
      val docs = Tables.table(s, dir, "documents")
      val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.8)
      val nrow = docs.agg(count(lit(1)).as("n"))
      def bump(h: org.apache.spark.sql.Column) = pmod(h, $"n")
      pairs.crossJoin(broadcast(nrow))
        .withColumn("h0", pmod(hash60(concat($"id_a".cast("string"),
          lit("_"), $"id_b".cast("string"), lit("_neg"))), $"n"))
        .withColumn("negative",
          when($"h0" =!= $"id_a" && $"h0" =!= $"id_b", $"h0")
            .otherwise(when(
              bump($"h0" + 1) =!= $"id_a" && bump($"h0" + 1) =!= $"id_b",
              bump($"h0" + 1))
              .otherwise(bump($"h0" + 2))))
        .select($"id_a".as("anchor"), $"id_b".as("positive"),
          $"negative", $"jaccard")
        .orderBy($"anchor", $"positive")
    }),

    // The REMOVAL half of exact substring dedup (q101 measures, this
    // rewrites): every 10-token window duplicated across docs keeps
    // only its canonical occurrence (the min doc_id containing the
    // span); every other doc drops the covered token positions and the
    // text is rebuilt from the survivors — Lee et al. 2022's actual
    // output. Work stays linear: span group + back-join (the q101
    // shuffles), a bounded ×10 position explode on DUPLICATED windows
    // only, one anti-join on (doc, pos), one ordered re-assembly per
    // doc. No step is ever pairwise in the corpus.
    "q115_substring_removal" -> ((s, dir) => {
      import s.implicits._
      val k = 10
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
      val winds = fanout(docs)
        .filter(size($"w") >= k)
        .select($"doc_id", posexplode(expr(
          s"transform(sequence(1, size(w) - ${k - 1}), " +
            s"i -> concat_ws(' ', slice(w, i, $k)))")))
        .select($"doc_id", ($"pos" + 1).as("i"), $"col".as("span"))
      val dup = winds.groupBy($"span")
        .agg(countDistinct($"doc_id").as("nd"), min($"doc_id").as("canon"))
        .filter($"nd" >= 2)
        .select($"span", $"canon")
      val covered = winds.join(dup, "span")
        .filter($"doc_id" =!= $"canon")
        .select($"doc_id", explode(sequence($"i", $"i" + (k - 1))).as("pos"))
        .distinct()
      val toks = docs.select($"doc_id", posexplode($"w"))
        .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("token"))
      val rebuilt = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_after"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct($"pos", $"token"))),
            _.getField("token"))).as("text_clean"))
      docs.select($"doc_id", size($"w").cast("long").as("n_before"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select($"doc_id", $"n_before",
          coalesce($"n_after", lit(0L)).as("n_after"),
          coalesce($"text_clean", lit("")).as("text_clean"))
        .orderBy($"doc_id")
    }),

    "q104_rare_token_score" -> ((s, dir) => {
      import s.implicits._
      val toks = fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", explode(split($"text", " ")).as("term"))
      val cf = toks.groupBy($"term").agg(count(lit(1)).as("cf"))
      val tot = cf.agg(count(lit(1)).as("n_terms"),
        sum($"cf").as("n_total"))
      toks.join(cf, "term").crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when($"cf" * $"n_terms" < $"n_total", 1)).as("n_rare"))
        .withColumn("rare_frac",
          round($"n_rare".cast("double") / $"n_tokens".cast("double"), 6))
        .orderBy($"doc_id")
    }),

    // TF-IDF top-3 terms per document — the classic keyword extractor
    // next to q103's query-time BM25: rational idf (N+1)/(df+1) (the
    // q103 no-transcendentals discipline — same ordering as the log
    // form, bit-replayable in any engine), tf from one token explode,
    // df from one term aggregate. Per-doc top-3 via row_number
    // partitioned by doc_id (never a global window); the corpus size
    // rides as a broadcast 1-row frame. At 100 TB: two hash
    // aggregates + one term-keyed join — all partial-aggregable, and
    // the window state is 3 rows per doc.
    "q228_tfidf_terms" -> ((s, dir) => {
      import s.implicits._
      val toks = fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", explode(split($"text", " ")).as("term"))
      val tf = toks.groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = tf.select($"doc_id").distinct()
        .agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"term".asc)
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score", round($"tf".cast("double") *
          (($"n_docs" + lit(1)).cast("double") /
            ($"df" + lit(1)).cast("double")), 6))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"doc_id", $"rank".cast("long").as("rank"),
          $"term", $"tf", $"df", $"score")
        .orderBy($"doc_id", $"rank")
    }),

    // Rényi-2 lexical diversity per document: collision probability
    // Σc²/n² and effective vocabulary n²/Σc² (= exp of Rényi-2
    // entropy) — the diversity measure that needs NO logarithm, so
    // unlike Shannon entropy it is exactly rational (integer Σc² and
    // n; one IEEE division at the end) and hash-verifiable across
    // engines. Low effective vocab flags boilerplate/template docs
    // the same way low Shannon entropy would, at a fraction of the
    // numeric risk. One tf aggregate + one per-doc aggregate, both
    // partial-aggregable; nothing is corpus-global.
    "q229_renyi_diversity" -> ((s, dir) => {
      import s.implicits._
      fanout(Tables.table(s, dir, "documents"))
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_uniq"),
          sum($"c" * $"c").as("sum_c2"))
        .select($"doc_id", $"n_tokens", $"n_uniq",
          round($"sum_c2".cast("double") /
            ($"n_tokens" * $"n_tokens").cast("double"), 6)
            .as("collision_p"),
          round(($"n_tokens" * $"n_tokens").cast("double") /
            $"sum_c2".cast("double"), 6).as("eff_vocab"))
        .orderBy($"doc_id")
    }),

    // Naive-Bayes long-form gate — the classical counting classifier
    // as a pure aggregation pipeline: train on even doc_ids (label =
    // "long-form" (>300 chars), predicted from three vocabulary
    // signals that carry REAL statistical dependence on length —
    // token repetition (Heaps' law) and two coupon-collector presence
    // features — never from length itself), score the odd half,
    // report the confusion census. The trained model is ONE
    // row of Laplace-smoothed counts (8 longs) cross-joined broadcast
    // into the scoring scan — training is a single conditional-sum
    // aggregate, scoring is a stateless per-row expression, so both
    // halves are one data-sized pass at any scale. Scores multiply
    // class prior × three likelihood ratios as doubles in a fixed
    // expression order (every operand an exactly-representable count,
    // every op IEEE — the q230 discipline), so the argmax decision
    // replays bit-exactly in DuckDB.
    "q254_naive_bayes" -> ((s, dir) => {
      import s.implicits._
      nbScored(s, dir)
        .groupBy($"is_long", ($"s_pos" > $"s_neg").as("pred_long"))
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("min_doc_id"))
        .orderBy($"is_long", $"pred_long")
    }),

    // Calibration census (expected-calibration-error decomposition)
    // for the q254 classifier — the eval a model gate needs BEYOND
    // accuracy: normalize the two class scores to P(long), bucket
    // into confidence deciles, and report per bucket the mean stated
    // confidence next to the empirical long-rate; the gap is the ECE
    // contribution. Mean confidence sums through dsumAt (decimal —
    // order-independent), the bucket index is floor(10p) on doubles
    // both engines compute identically, and the output is the 10-row
    // reliability-diagram table rather than one opaque scalar.
    "q258_nb_calibration" -> ((s, dir) => {
      import s.implicits._
      val p = ($"s_pos" / ($"s_pos" + $"s_neg")).as("p")
      val b = nbScored(s, dir).select($"is_long", p)
        .select($"is_long", $"p",
          least(lit(9), floor($"p" * 10.0).cast("int")).as("bucket"))
      b.groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
          round(Q.dsumAt($"p", 8) / count(lit(1)).cast("double"), 6)
            .as("mean_conf"),
          round(sum(when($"is_long", 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"), 6).as("frac_long"))
        .withColumn("gap", round(abs($"mean_conf" - $"frac_long"), 6))
        .orderBy($"bucket")
    }),

    // nDCG@10 retrieval eval — the rank-quality metric the recall/MRR
    // family (q145/q146) lacks: graded relevance with position
    // discount. Per probe term, the SYSTEM ranking is single-term
    // BM25 (length-normalized), the IDEAL ranks by raw tf — they
    // disagree exactly where length normalization reorders, so the
    // metric is non-trivial. Each top-10 is a TakeOrdered leg (never
    // a per-term global window); the log2 discounts are 12-decimal
    // LITERALS (the q238 Benford move — no libm ln cross-engine
    // risk), so grade×discount is EXACT decimal and the DCG sum is
    // order-independent. One doc scan per term + 10-row frames after.
    "q261_ndcg_at10" -> ((s, dir) => {
      import s.implicits._
      val discounts = Seq("1.000000000000", "0.630929753571",
        "0.500000000000", "0.430676558073", "0.386852807235",
        "0.356207187108", "0.333333333333", "0.315464876786",
        "0.301029995664", "0.289064826318")
        .map(d => lit(new java.math.BigDecimal(d))
          .cast("decimal(14,12)"))
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .withColumn("dl", size($"w"))
        .localCheckpoint() // one scan feeds all 6 top-k legs
      val stats = broadcast(docs.agg(
        (sum($"dl".cast("decimal(18,0)")).cast("double") /
          count(lit(1))).as("avgdl")))
      def dcgOf(top: org.apache.spark.sql.DataFrame, name: String) = {
        val w10 = Window.partitionBy(lit(1))
          .orderBy($"ord".desc, $"doc_id")
        top.withColumn("rank", row_number().over(w10)) // 10-row frame
          .select(($"g".cast("decimal(18,0)") *
            element_at(array(discounts: _*), $"rank")).as("gd"))
          .agg(coalesce(sum($"gd"),
            lit(java.math.BigDecimal.ZERO).cast("decimal(32,12)"))
            .as(name))
      }
      val legs = Seq("spark", "window", "hash").map { t =>
        val scored = docs.crossJoin(stats)
          .select($"doc_id", $"dl", $"avgdl",
            size(filter($"w", x => x === lit(t))).as("g"))
          .withColumn("bm25",
            ($"g".cast("double") * lit(2.2)) /
              ($"g".cast("double") + lit(1.2) *
                (lit(0.25) + lit(0.75) *
                  $"dl".cast("double") / $"avgdl")))
        val sys = scored.orderBy($"bm25".desc, $"doc_id").limit(10)
          .withColumn("ord", $"bm25")
        val ideal = scored.orderBy($"g".desc, $"doc_id").limit(10)
          .withColumn("ord", $"g".cast("double"))
        dcgOf(sys, "dcg").crossJoin(dcgOf(ideal, "idcg"))
          .select(lit(t).as("term"),
            round($"dcg".cast("double"), 6).as("dcg"),
            round($"idcg".cast("double"), 6).as("idcg"),
            round($"dcg".cast("double") / $"idcg".cast("double"), 6)
              .as("ndcg"))
      }
      legs.reduce(_ union _).orderBy($"term")
    }),

    // Isotonic (PAV) score calibration — turn an UNCALIBRATED ranking
    // signal (mean token length, a weak long-form predictor whose
    // per-bucket empirical rate really does violate monotonicity in
    // this corpus) into a monotone probability map, the standard
    // post-hoc calibration move for margin/score outputs. Instead of
    // the sequential pool-adjacent-violators sweep, this uses PAV's
    // closed minimax form iso_i = max_{j≤i} min_{k≥i} mean(y_{j..k})
    // — exact on the ≤20-row reliability frame (≤210 block means from
    // prefix sums, bounded joins; the data-sized work is ONE
    // conditional-sum aggregate over the docs). Block means are
    // quantized to EXACT integer ppm via BIGINT DIV, so min/max
    // selection and the fitted values replay bit-for-bit in DuckDB;
    // the tiny windows are model-frame-sized, never data-sized.
    "q264_isotonic_calibration" -> ((s, dir) => {
      import s.implicits._
      val mtl = length(regexp_replace($"text", " ", ""))
        .cast("double") / size(split($"text", " ")).cast("double")
      val b = Tables.table(s, dir, "documents")
        .select(($"n_chars" > 300).as("is_long"),
          least(lit(19), greatest(lit(0),
            floor(mtl * 10.0).cast("int") - 25)).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sum(when($"is_long", 1L).otherwise(0L)).as("y"))
      val wb = Window.orderBy($"bucket") // 10-row model frame
      val pre = b
        .withColumn("pn", sum($"n").over(wb))
        .withColumn("py", sum($"y").over(wb))
        .localCheckpoint() // 10 rows; feeds blocks twice + output once
      val prefix = pre.select($"bucket".as("bk"), $"pn".as("pnk"),
          $"py".as("pyk"))
        .union(s.range(1).select(lit(-1).cast("int").as("bk"),
          lit(0L).as("pnk"), lit(0L).as("pyk")))
      val blocks = pre.select($"bucket".as("k"), $"pn", $"py")
        .join(prefix, $"bk" < $"k")
        .select(($"bk" + 1).as("j"), $"k",
          expr("(py - pyk) * 1000000 DIV (pn - pnk)").as("ppm"))
      val iso = pre.select($"bucket".as("i"))
        .join(blocks, $"j" <= $"i" && $"i" <= $"k")
        .groupBy($"i", $"j").agg(min($"ppm").as("mn"))
        .groupBy($"i").agg(max($"mn").as("iso_ppm"))
      pre.select($"bucket", $"n".as("n_docs"),
          expr("y * 1000000 DIV n").as("emp_ppm"))
        .join(iso, $"bucket" === $"i")
        .select($"bucket", $"n_docs", $"emp_ppm", $"iso_ppm")
        .orderBy($"bucket")
    }),

    // Feature-ablation importance for the q254 classifier — which
    // signal actually carries the decision? Each ablation drops ONE
    // feature's likelihood ratio from the NB product (the principled
    // NB ablation — retraining is unnecessary because counts are
    // per-feature) and re-measures eval accuracy. ALL four configs
    // score in ONE scan (four fixed-order double products in the same
    // projection against the broadcast 1-row count model), so the
    // importance table costs one aggregate, and every accuracy is an
    // exact ppm DIV the oracle replays.
    "q292_ablation_importance" -> ((s, dir) => {
      import s.implicits._
      val feat = Tables.table(s, dir, "documents")
        .select($"doc_id", ($"n_chars" > 300).as("is_long"),
          ((size(split($"text", " ")) -
            size(array_distinct(split($"text", " ")))) > 5).as("f1"),
          $"text".contains(" the ").as("f2"),
          (size(array_distinct(split($"text", " "))) > 45).as("f3"))
      def cnt(p: org.apache.spark.sql.Column) =
        sum(when(p, 1L).otherwise(0L))
      val train = feat.filter($"doc_id" % 2 === 0).agg(
        cnt($"is_long").as("n_pos"), cnt(!$"is_long").as("n_neg"),
        cnt($"is_long" && $"f1").as("c_pos_1"),
        cnt(!$"is_long" && $"f1").as("c_neg_1"),
        cnt($"is_long" && $"f2").as("c_pos_2"),
        cnt(!$"is_long" && $"f2").as("c_neg_2"),
        cnt($"is_long" && $"f3").as("c_pos_3"),
        cnt(!$"is_long" && $"f3").as("c_neg_3"))
      def term(j: Int, pos: Boolean) = {
        val cls = if (pos) "pos" else "neg"
        val n = col(s"n_$cls"); val c = col(s"c_${cls}_$j")
        when(col(s"f$j"), (c + 1L).cast("double"))
          .otherwise((n - c + 1L).cast("double")) /
          (n + 2L).cast("double")
      }
      def correct(skip: Int) = {
        val kept = Seq(1, 2, 3).filterNot(_ == skip)
        val sp = kept.foldLeft($"n_pos".cast("double"))(
          (e, j) => e * term(j, pos = true))
        val sn = kept.foldLeft($"n_neg".cast("double"))(
          (e, j) => e * term(j, pos = false))
        sum(when((sp > sn) === $"is_long", 1L).otherwise(0L))
      }
      val a = feat.filter($"doc_id" % 2 === 1)
        .crossJoin(broadcast(train)) // 1-row count model
        .agg(count(lit(1)).as("n_eval"), correct(0).as("c0"),
          correct(1).as("c1"), correct(2).as("c2"),
          correct(3).as("c3"))
      a.select($"n_eval", $"c0", explode(array(
          struct(lit("none").as("ablated"), $"c0".as("n_correct")),
          struct(lit("f1_repetition").as("ablated"),
            $"c1".as("n_correct")),
          struct(lit("f2_the").as("ablated"), $"c2".as("n_correct")),
          struct(lit("f3_vocab").as("ablated"),
            $"c3".as("n_correct")))).as("r"))
        .select($"r.ablated".as("ablated"), $"n_eval",
          $"r.n_correct".as("n_correct"),
          expr("r.n_correct * 1000000 DIV n_eval").as("acc_ppm"),
          expr("(c0 - r.n_correct) * 1000000 DIV n_eval")
            .as("drop_ppm"))
        .orderBy($"ablated")
    }),

    // 5-fold cross-validation of the NB gate — as PURE relational
    // algebra: folds by the portable salted hash, ONE per-fold count
    // aggregate (5 rows), and each fold's training model materializes
    // by the leave-one-out identity model_k = totals − fold_k (NB
    // trains on counts, so holding a fold out is a subtraction, not a
    // retrain). Scoring joins every doc to ITS OWN fold's model row
    // (a broadcast 5-row frame) — one data pass for all five folds,
    // per-fold accuracy as exact ppm DIVs; the cross-fold spread is
    // the gate's stability readout.
    "q293_kfold_cv" -> ((s, dir) => {
      import s.implicits._
      val feat = Tables.table(s, dir, "documents")
        .select($"doc_id", ($"n_chars" > 300).as("is_long"),
          ((size(split($"text", " ")) -
            size(array_distinct(split($"text", " ")))) > 5).as("f1"),
          $"text".contains(" the ").as("f2"),
          (size(array_distinct(split($"text", " "))) > 45).as("f3"),
          (graft.text.TextFunctions.hash60(
            concat($"doc_id".cast("string"), lit("_cv"))) % 5)
            .as("fold"))
        .localCheckpoint() // counted once, scored once
      def cnt(p: org.apache.spark.sql.Column) =
        sum(when(p, 1L).otherwise(0L))
      val names = Seq("n_pos", "n_neg", "c_pos_1", "c_neg_1",
        "c_pos_2", "c_neg_2", "c_pos_3", "c_neg_3")
      val perFold = feat.groupBy($"fold").agg(
        cnt($"is_long").as("n_pos"), cnt(!$"is_long").as("n_neg"),
        cnt($"is_long" && $"f1").as("c_pos_1"),
        cnt(!$"is_long" && $"f1").as("c_neg_1"),
        cnt($"is_long" && $"f2").as("c_pos_2"),
        cnt(!$"is_long" && $"f2").as("c_neg_2"),
        cnt($"is_long" && $"f3").as("c_pos_3"),
        cnt(!$"is_long" && $"f3").as("c_neg_3"))
        .localCheckpoint() // 5-row fold census
      val totCols = names.map(n => sum(col(n)).as(s"t_$n"))
      val totals = perFold.agg(totCols.head, totCols.tail: _*)
      // leave-one-out: fold k's TRAINING counts = totals − fold k
      val models = perFold.crossJoin(broadcast(totals))
        .select(($"fold" +: names.map(n =>
          (col(s"t_$n") - col(n)).as(n))): _*)
      def term(j: Int, pos: Boolean) = {
        val cls = if (pos) "pos" else "neg"
        val n = col(s"n_$cls"); val c = col(s"c_${cls}_$j")
        when(col(s"f$j"), (c + 1L).cast("double"))
          .otherwise((n - c + 1L).cast("double")) /
          (n + 2L).cast("double")
      }
      val sp = (1 to 3).foldLeft($"n_pos".cast("double"))(
        (e, j) => e * term(j, pos = true))
      val sn = (1 to 3).foldLeft($"n_neg".cast("double"))(
        (e, j) => e * term(j, pos = false))
      feat.join(broadcast(models), "fold")
        .groupBy($"fold")
        .agg(count(lit(1)).as("n_eval"),
          sum(when((sp > sn) === $"is_long", 1L).otherwise(0L))
            .as("n_correct"))
        .select($"fold", $"n_eval", $"n_correct",
          expr("n_correct * 1000000 DIV n_eval").as("acc_ppm"))
        .orderBy($"fold")
    }),

    // Dedup threshold sweep — the tuning table a dedup pipeline
    // owner reads before committing to a jaccard cutoff: at 0.7 /
    // 0.9 / 0.95, how many docs cluster, how many clusters form, how
    // many docs a keep-one policy would REMOVE, and how big the
    // largest cluster gets (the over-merging smell). Each leg is the
    // q75 LSH-pair + min-label closure at that threshold over a
    // DETERMINISTIC 1/8 salted-hash doc sample taken BEFORE shingling
    // (the q224 Doulion discipline applied to text: the sample
    // decision is a pure function of doc_id, so the DuckDB oracle
    // replays the identical sample) — at 100 TB a tuning table does
    // not need the full corpus, and every downstream cost (shingle
    // kernel, signature shuffle, band join, closure) shrinks with p.
    // est_dup_docs scales the sampled dup census by p⁻¹ = 8 (doc
    // counts are linear in the sample; cluster STRUCTURE is what the
    // sweep ranks, and relative threshold ordering is preserved).
    // The full-corpus sweep is the audit companion, gated on
    // spark.graft.sketchAudit with its signed error in-row — the
    // bench times the sampled path alone, which is the one a 100 TB
    // run executes.
    "q296_dedup_threshold_sweep" -> ((s, dir) => {
      import s.implicits._
      val audit = s.conf.get("spark.graft.sketchAudit", "true").toBoolean
      val docs = Tables.table(s, dir, "documents")
      val p = 8L
      val sample = docs.filter(hash60(
        concat($"doc_id".cast("string"), lit("_q296"))) <
        lit((1L << 60) / p))
      // r15: the MinHash pipeline (shingles → signatures → banding →
      // verify join) is threshold-INDEPENDENT up to the final jaccard
      // filter, so the sweep computes the verified pair list once at
      // the loosest cut (0.70) and re-clusters each tighter threshold
      // as a filter over the pinned pairs — pairs(t) for t ≥ 0.70 is
      // exactly pairs(0.70).filter(jaccard ≥ t), same double literal
      // (pct/100.0) on both paths. Was 3 full pipelines per leg.
      def sweep(d: org.apache.spark.sql.DataFrame, sfx: String) = {
        val pairs = graft.dedup.Dedup.minhashNearDupPairs(
          d, "doc_id", "text", 70 / 100.0).localCheckpoint()
        Seq(70, 90, 95).map { pct =>
          val cl = graft.dedup.ConnectedComponents.clustersFromPairs(
            pairs.filter($"jaccard" >= pct / 100.0), "doc_id")
          cl.agg(count(lit(1)).as(s"n_dup_docs$sfx"),
              countDistinct($"cluster_id").as(s"n_clusters$sfx"),
              max($"cluster_size").as(s"max_cluster_size$sfx"))
            .select(lit(pct).as("threshold_pct"),
              col(s"n_dup_docs$sfx"), col(s"n_clusters$sfx"),
              (col(s"n_dup_docs$sfx") - col(s"n_clusters$sfx"))
                .as(s"docs_removed$sfx"),
              col(s"max_cluster_size$sfx"))
        }.reduce(_ unionByName _)
      }
      val sampled = sweep(sample, "_s")
        .withColumn("est_dup_docs", $"n_dup_docs_s" * p)
      if (!audit) sampled.orderBy($"threshold_pct")
      else sampled.join(sweep(docs, ""), "threshold_pct")
        .select($"threshold_pct", $"n_dup_docs_s", $"n_clusters_s",
          $"docs_removed_s", $"max_cluster_size_s", $"est_dup_docs",
          $"n_dup_docs", $"n_clusters", $"docs_removed",
          $"max_cluster_size",
          ($"est_dup_docs" - $"n_dup_docs").as("err"))
        .orderBy($"threshold_pct")
    }),

    // Decision stump — the best single-feature split, the primitive
    // every tree ensemble greedily stacks: for each candidate
    // threshold on the token count, the weighted Gini impurity of
    // predicting is_long (the q254 label) from "f ≤ c", in EXACT ppm
    // (per-side floors of integer rationals via exactFloorDiv — no
    // float accumulation), rank 1 = the split a stump would take.
    // Candidates are every distinct token count: an integer feature's
    // domain is BOUNDED by construction (documents have ≤ ~100-word
    // counts at any corpus size — the q68 block-summary class), so
    // the cumulative window runs over a census frame, not the corpus;
    // the data-sized work is ONE hash aggregate.
    "q321_decision_stump" -> ((s, dir) => {
      import s.implicits._
      val d38 = "decimal(38,0)"
      val cen = Tables.table(s, dir, "documents")
        .select(size(split($"text", " ")).cast("long").as("f"),
          ($"n_chars" > 300).cast("long").as("y"))
        .groupBy($"f")
        .agg(count(lit(1)).as("n"), sum($"y").as("pos"))
      val w = Window.orderBy($"f") // bounded census (distinct counts)
      val cum = cen
        .withColumn("n_left", sum($"n").over(w))
        .withColumn("pos_left", sum($"pos").over(w))
        .crossJoin(broadcast(cen.agg(sum($"n").as("nt"),
          sum($"pos").as("post")))) // 1-row totals frame
        .withColumn("n_right", $"nt" - $"n_left")
        .withColumn("pos_right", $"post" - $"pos_left")
      def gSide(nS: org.apache.spark.sql.Column,
          pS: org.apache.spark.sql.Column) =
        when(nS === 0L, lit(0L).cast(d38)).otherwise(
          Analytics.exactFloorDiv(
            (nS.cast(d38) * nS - pS.cast(d38) * pS -
              (nS - pS).cast(d38) * (nS - pS)) * lit(1000000L),
            nS.cast(d38) * $"nt"))
      val scored = cum.withColumn("gini_ppm",
          (gSide($"n_left", $"pos_left") +
            gSide($"n_right", $"pos_right")).cast("long"))
      scored
        .withColumn("rank", row_number().over(
          Window.orderBy($"gini_ppm", $"f"))) // same bounded census
        .select($"f".as("threshold_words"), $"n_left", $"pos_left",
          $"n_right", $"pos_right", $"gini_ppm", $"rank")
        .orderBy($"threshold_words")
    }),

    // Flesch reading-ease score — the classical readability gate,
    // made engine-exact: syllables ≈ vowel groups (one regexp_count,
    // the standard heuristic), sentences = terminal-punctuation runs
    // (min 1), words = the token count every other text query uses.
    // The score is one fixed IEEE expression of three exact integer
    // counts, so it replays bit-for-bit; a per-band census rides
    // below the per-doc rows' machinery as the aggregate gate view.
    "q301_flesch_readability" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables.table(s, dir, "documents")
        .select($"doc_id",
          size(split($"text", " ")).cast("long").as("n_words"),
          greatest(lit(1L),
            regexp_count($"text", lit("[.!?]+")).cast("long"))
            .as("n_sentences"),
          regexp_count($"text", lit("[aeiouy]+")).cast("long")
            .as("n_syllables"))
      counts.select($"doc_id", $"n_words", $"n_sentences",
          $"n_syllables",
          round(lit(206.835) -
            lit(1.015) * ($"n_words".cast("double") /
              $"n_sentences".cast("double")) -
            lit(84.6) * ($"n_syllables".cast("double") /
              $"n_words".cast("double")), 3).as("flesch"))
        .orderBy($"doc_id")
    }),

    // Language-ID confusion matrix — the EVAL the q25 heuristic never
    // had: its prediction against the corpus's true `lang` label,
    // per (true, predicted) cell with the within-language share in
    // exact ppm. One conditional aggregate; the heuristic's blind
    // spots (fr/zh → 'und' or 'en') are visible as off-diagonal
    // mass, which is exactly what an eval table is for.
    "q302_langid_confusion" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.table(s, dir, "documents")
        .select($"lang".as("true_lang"),
          predictLang($"text").as("predicted_lang"))
        .groupBy($"true_lang", $"predicted_lang")
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy($"true_lang").agg(sum($"n").as("n_true"))
      c.join(broadcast(t), "true_lang")
        .select($"true_lang", $"predicted_lang", $"n",
          expr("n * 1000000 DIV n_true").as("share_ppm"),
          ($"true_lang" === $"predicted_lang").cast("int")
            .as("is_correct"))
        .orderBy($"true_lang", $"predicted_lang")
    }))

  /** q254/q258's shared scoring frame: binary NB (long-form vs not),
    * three binary vocabulary features, trained on even doc_ids,
    * scored on the odd half. The trained model is ONE row of Laplace counts broadcast
    * into the scoring scan; scores multiply prior × likelihood ratios
    * as doubles in a fixed expression order (IEEE-replayable). */
  private def nbScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val feat = Tables.table(s, dir, "documents")
      .select($"doc_id", ($"n_chars" > 300).as("is_long"),
        ((size(split($"text", " ")) -
          size(array_distinct(split($"text", " ")))) > 5).as("f1"),
        $"text".contains(" the ").as("f2"),
        (size(array_distinct(split($"text", " "))) > 45).as("f3"))
    def cnt(p: org.apache.spark.sql.Column) =
      sum(when(p, 1L).otherwise(0L))
    val train = feat.filter($"doc_id" % 2 === 0).agg(
      cnt($"is_long").as("n_pos"), cnt(!$"is_long").as("n_neg"),
      cnt($"is_long" && $"f1").as("c_pos_1"),
      cnt(!$"is_long" && $"f1").as("c_neg_1"),
      cnt($"is_long" && $"f2").as("c_pos_2"),
      cnt(!$"is_long" && $"f2").as("c_neg_2"),
      cnt($"is_long" && $"f3").as("c_pos_3"),
      cnt(!$"is_long" && $"f3").as("c_neg_3"))
    def term(x: org.apache.spark.sql.Column,
        c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      when(x, (c + 1L).cast("double"))
        .otherwise((n - c + 1L).cast("double")) /
        (n + 2L).cast("double")
    feat.filter($"doc_id" % 2 === 1)
      .crossJoin(broadcast(train)) // 1-row model frame
      .withColumn("s_pos", $"n_pos".cast("double") *
        term($"f1", $"c_pos_1", $"n_pos") *
        term($"f2", $"c_pos_2", $"n_pos") *
        term($"f3", $"c_pos_3", $"n_pos"))
      .withColumn("s_neg", $"n_neg".cast("double") *
        term($"f1", $"c_neg_1", $"n_neg") *
        term($"f2", $"c_neg_2", $"n_neg") *
        term($"f3", $"c_neg_3", $"n_neg"))
  }

  /** Shared WITH-prefix of the q254/q258 oracles: the NB feature,
    * train, and scored frames as SQL, mirroring [[nbScored]]. */
  /** The q25 language-prediction CASE over a split-words column `w`,
    * shared by the q25 and q302 oracles. */
  private val predictLangSqlCase: String =
    """CASE
         WHEN len(list_filter(w, x -> x IN ('the','a','of','and','to'))) > 0
          AND len(list_filter(w, x -> x IN ('the','a','of','and','to')))
            >= greatest(
                 len(list_filter(w, x -> x IN ('el','la','de','los','que'))),
                 len(list_filter(w, x -> x IN ('der','die','das','und','ist'))))
         THEN 'en'
         WHEN len(list_filter(w, x -> x IN ('el','la','de','los','que'))) > 0
          AND len(list_filter(w, x -> x IN ('el','la','de','los','que')))
            >= len(list_filter(w, x -> x IN ('der','die','das','und','ist')))
         THEN 'es'
         WHEN len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) > 0
         THEN 'de'
         ELSE 'und' END"""

  /** The likelihood-ratio factor of feature `x` for a class with
    * positive count `c` out of `n` (Laplace), as oracle SQL. */
  private def nbTermSql(x: String, c: String, n: String) =
    s"(CASE WHEN $x THEN CAST($c + 1 AS DOUBLE) " +
      s"ELSE CAST($n - $c + 1 AS DOUBLE) END " +
      s"/ CAST($n + 2 AS DOUBLE))"

  /** The feat + train CTE prefix shared by the q254/q258/q292
    * oracles (features, labels, the 1-row Laplace count model). */
  private def nbFeatTrainSql: String =
    "WITH feat AS (SELECT doc_id, n_chars > 300 AS is_long, " +
      "(length(string_split(text, ' ')) " +
      "- length(list_distinct(string_split(text, ' ')))) > 5 AS f1, " +
      "contains(text, ' the ') AS f2, " +
      "length(list_distinct(string_split(text, ' '))) > 45 AS f3 " +
      "FROM documents), " +
      "train AS (SELECT " +
      "sum(CASE WHEN is_long THEN 1 ELSE 0 END)::BIGINT AS n_pos, " +
      "sum(CASE WHEN NOT is_long THEN 1 ELSE 0 END)::BIGINT AS n_neg, " +
      "sum(CASE WHEN is_long AND f1 THEN 1 ELSE 0 END)::BIGINT AS c_pos_1, " +
      "sum(CASE WHEN NOT is_long AND f1 THEN 1 ELSE 0 END)::BIGINT AS c_neg_1, " +
      "sum(CASE WHEN is_long AND f2 THEN 1 ELSE 0 END)::BIGINT AS c_pos_2, " +
      "sum(CASE WHEN NOT is_long AND f2 THEN 1 ELSE 0 END)::BIGINT AS c_neg_2, " +
      "sum(CASE WHEN is_long AND f3 THEN 1 ELSE 0 END)::BIGINT AS c_pos_3, " +
      "sum(CASE WHEN NOT is_long AND f3 THEN 1 ELSE 0 END)::BIGINT AS c_neg_3 " +
      "FROM feat WHERE doc_id % 2 = 0)"

  private def nbScoredSql: String =
    nbFeatTrainSql +
      ", scored AS (SELECT is_long, " +
      "CAST(n_pos AS DOUBLE) * " + nbTermSql("f1", "c_pos_1", "n_pos") +
      " * " + nbTermSql("f2", "c_pos_2", "n_pos") +
      " * " + nbTermSql("f3", "c_pos_3", "n_pos") + " AS s_pos, " +
      "CAST(n_neg AS DOUBLE) * " + nbTermSql("f1", "c_neg_1", "n_neg") +
      " * " + nbTermSql("f2", "c_neg_2", "n_neg") +
      " * " + nbTermSql("f3", "c_neg_3", "n_neg") + " AS s_neg, doc_id " +
      "FROM feat CROSS JOIN train WHERE doc_id % 2 = 1)"

  val oracles: Map[String, String] = Map(
    // Contract-boolean form (q17/q50 pattern): the anchors (word
    // count, non-space code points) replay exactly; the tokenizer's
    // round-trip identity, compression bounds, and merge-table size
    // are invariants of a CORRECT train+encode, so the oracle expects
    // them as constants — the live Spark side feeds them from the
    // actual learned tokenizer and any drift flips a boolean red.
    "q88_bpe_tokens" ->
      """SELECT doc_id,
                len(list_filter(string_split(text, ' '),
                                x -> x <> ''))::BIGINT AS n_words,
                length(replace(text, ' ', ''))::BIGINT AS n_chars_nonspace,
                TRUE AS roundtrip_ok,
                TRUE AS toks_in_bounds,
                64::BIGINT AS n_merges_learned
         FROM documents
         ORDER BY doc_id""",
    // Exact top-20 bigrams (replayable) + the live MG sketch's
    // invariant as a boolean expected TRUE (q17/q50 pattern; the
    // estimates themselves are arrival-order-dependent by design).
    "q138_top_ngrams_stream" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         g AS (SELECT unnest([concat_ws(' ', ws[i], ws[i+1])
                              FOR i IN generate_series(1, len(ws) - 1)])
                        AS ngram
               FROM w)
         SELECT ngram, count(1)::BIGINT AS exact_n,
                TRUE AS mg_within_bound
         FROM g GROUP BY ngram
         ORDER BY exact_n DESC, ngram LIMIT 20""",
    // same census, same cumulative walk, HUGEINT-exact per-side
    // Gini floors, same rank tie-break
    "q321_decision_stump" ->
      """WITH cen AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS f,
                  count(*)::BIGINT AS n,
                  CAST(sum(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
                        CAST(sum(pos) AS BIGINT) AS post FROM cen),
         cum AS (
           SELECT f,
                  CAST(sum(n) OVER (ORDER BY f) AS BIGINT) AS n_left,
                  CAST(sum(pos) OVER (ORDER BY f) AS BIGINT)
                    AS pos_left,
                  nt, post
           FROM cen, tot),
         sides AS (
           SELECT f, n_left, pos_left,
                  nt - n_left AS n_right, post - pos_left AS pos_right,
                  nt
           FROM cum),
         scored AS (
           SELECT f, n_left, pos_left, n_right, pos_right,
                  CAST(
                    (CASE WHEN n_left = 0 THEN 0 ELSE
                      (CAST(n_left AS HUGEINT) * n_left
                       - CAST(pos_left AS HUGEINT) * pos_left
                       - CAST(n_left - pos_left AS HUGEINT)
                         * (n_left - pos_left)) * 1000000
                      // (CAST(n_left AS HUGEINT) * nt) END)
                    +
                    (CASE WHEN n_right = 0 THEN 0 ELSE
                      (CAST(n_right AS HUGEINT) * n_right
                       - CAST(pos_right AS HUGEINT) * pos_right
                       - CAST(n_right - pos_right AS HUGEINT)
                         * (n_right - pos_right)) * 1000000
                      // (CAST(n_right AS HUGEINT) * nt) END)
                    AS BIGINT) AS gini_ppm
           FROM sides)
         SELECT f AS threshold_words, n_left, pos_left, n_right,
                pos_right, gini_ppm,
                CAST(row_number() OVER (ORDER BY gini_ppm, f) AS INT)
                  AS rank
         FROM scored
         ORDER BY threshold_words""",

    "q296_dedup_threshold_sweep" -> {
      // Both legs replayed: the SAME deterministic 1/8 doc sample
      // (md5 threshold on doc_id, the q224 discipline) and the full
      // corpus, each through the q75 exact-jaccard closure (the same
      // banding-recall assumption q125 documents) + a 1-row census.
      // `src` = 'd' (full) or 'ds' (sampled); suffixed CTE names keep
      // the six closures apart.
      def census(src: String, tag: String, pct: Int, sfx: String) =
        s"""SELECT
              count(*)::BIGINT AS n_dup_docs$sfx,
              count(DISTINCT cluster_id)::BIGINT AS n_clusters$sfx,
              count(*)::BIGINT - count(DISTINCT cluster_id)::BIGINT
                AS docs_removed$sfx,
              CAST(max(cluster_size) AS BIGINT) AS max_cluster_size$sfx
           FROM (
             SELECT l.id, l.cluster_id,
                    count(*) OVER (PARTITION BY l.cluster_id)
                      AS cluster_size
             FROM (
               SELECT id, least(min(r), id) AS cluster_id
               FROM reach$tag$pct GROUP BY id) l)"""
      def closure(src: String, tag: String, pct: Int) =
        s"""e$tag$pct AS (
             SELECT a.doc_id AS ia, b.doc_id AS ib
             FROM $src a JOIN $src b ON a.doc_id < b.doc_id
             WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                     (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                      - len(list_intersect(a.sh, b.sh))::DOUBLE)
                   >= ${pct / 100.0}),
           sym$tag$pct AS (
             SELECT ia, ib FROM e$tag$pct
             UNION SELECT ib AS ia, ia AS ib FROM e$tag$pct),
           reach$tag$pct(id, r) AS (
             SELECT ia, ib FROM sym$tag$pct
             UNION
             SELECT s.ia, reach$tag$pct.r
             FROM sym$tag$pct s
             JOIN reach$tag$pct ON s.ib = reach$tag$pct.id)"""
      def leg(pct: Int) =
        s"""SELECT $pct AS threshold_pct,
              s.n_dup_docs_s, s.n_clusters_s, s.docs_removed_s,
              s.max_cluster_size_s,
              s.n_dup_docs_s * 8 AS est_dup_docs,
              f.n_dup_docs, f.n_clusters, f.docs_removed,
              f.max_cluster_size,
              s.n_dup_docs_s * 8 - f.n_dup_docs AS err
           FROM (${census("ds", "s", pct, "_s")}) s
           CROSS JOIN (${census("d", "f", pct, "")}) f"""
      val closures = Seq(70, 90, 95).flatMap(pct =>
        Seq(closure("ds", "s", pct), closure("d", "f", pct)))
        .mkString(",\n         ")
      s"""WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
         d AS (SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
               FROM w),
         ds AS (SELECT doc_id, sh FROM d
                WHERE CAST('0x' || substr(md5(doc_id::VARCHAR
                        || '_q296'), 1, 15) AS BIGINT)
                      < ${(1L << 60) / 8L}),
         $closures
         SELECT * FROM (
           ${leg(70)} UNION ALL ${leg(90)} UNION ALL ${leg(95)})
         ORDER BY threshold_pct"""
    },
    "q293_kfold_cv" -> {
      val counts = Seq(
        "n_pos" -> "is_long", "n_neg" -> "NOT is_long",
        "c_pos_1" -> "is_long AND f1", "c_neg_1" -> "NOT is_long AND f1",
        "c_pos_2" -> "is_long AND f2", "c_neg_2" -> "NOT is_long AND f2",
        "c_pos_3" -> "is_long AND f3", "c_neg_3" -> "NOT is_long AND f3")
      val pf = counts.map { case (n, p) =>
        s"sum(CASE WHEN $p THEN 1 ELSE 0 END)::BIGINT AS $n" }
        .mkString(", ")
      val tot = counts.map { case (n, _) =>
        s"CAST(sum($n) AS BIGINT) AS t_$n" }.mkString(", ")
      val loo = counts.map { case (n, _) =>
        s"tot.t_$n - pf.$n AS $n" }.mkString(", ")
      def prod(cls: String) =
        s"CAST(n_$cls AS DOUBLE)" + (1 to 3).map(j =>
          " * " + nbTermSql(s"f$j", s"c_${cls}_$j", s"n_$cls"))
          .mkString
      s"""WITH feat AS (
           SELECT doc_id, n_chars > 300 AS is_long,
                  (length(string_split(text, ' '))
                   - length(list_distinct(string_split(text, ' '))))
                    > 5 AS f1,
                  contains(text, ' the ') AS f2,
                  length(list_distinct(string_split(text, ' ')))
                    > 45 AS f3,
                  CAST('0x' || substr(md5(doc_id::VARCHAR || '_cv'),
                    1, 15) AS BIGINT) % 5 AS fold
           FROM documents),
         pf AS (SELECT fold, $pf FROM feat GROUP BY 1),
         tot AS (SELECT $tot FROM pf),
         models AS (SELECT pf.fold, $loo FROM pf, tot)
         SELECT f.fold, count(*)::BIGINT AS n_eval,
                CAST(sum(CASE WHEN ((${prod("pos")}) >
                    (${prod("neg")})) = f.is_long
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                CAST(sum(CASE WHEN ((${prod("pos")}) >
                    (${prod("neg")})) = f.is_long
                  THEN 1 ELSE 0 END) AS BIGINT) * 1000000
                  // CAST(count(*) AS BIGINT) AS acc_ppm
         FROM feat f JOIN models ON f.fold = models.fold
         GROUP BY f.fold ORDER BY f.fold"""
    },
    "q292_ablation_importance" -> {
      def prod(cls: String, kept: Seq[Int]) =
        s"CAST(n_$cls AS DOUBLE)" + kept.map(j =>
          " * " + nbTermSql(s"f$j", s"c_${cls}_$j", s"n_$cls"))
          .mkString
      def cflag(skip: Int) = {
        val kept = Seq(1, 2, 3).filterNot(_ == skip)
        s"CAST(sum(CASE WHEN ((${prod("pos", kept)}) > " +
          s"(${prod("neg", kept)})) = is_long THEN 1 ELSE 0 END) " +
          "AS BIGINT)"
      }
      def row(name: String, c: String) =
        s"""SELECT '$name' AS ablated, n_eval, $c AS n_correct,
              $c * 1000000 // n_eval AS acc_ppm,
              (c0 - $c) * 1000000 // n_eval AS drop_ppm FROM a"""
      nbFeatTrainSql +
        s""", a AS (
             SELECT count(*)::BIGINT AS n_eval,
                    ${cflag(0)} AS c0, ${cflag(1)} AS c1,
                    ${cflag(2)} AS c2, ${cflag(3)} AS c3
             FROM feat CROSS JOIN train WHERE doc_id % 2 = 1)
           SELECT * FROM (
             ${row("none", "c0")}
             UNION ALL ${row("f1_repetition", "c1")}
             UNION ALL ${row("f2_the", "c2")}
             UNION ALL ${row("f3_vocab", "c3")})
           ORDER BY ablated"""
    },
    "q261_ndcg_at10" -> {
      // same 12-decimal discount literals, same BM25 form as the
      // engine; each leg re-derives sys/ideal top-10 then joins the
      // rank→discount table — decimal products, order-free sum
      val disc = Seq("1.000000000000", "0.630929753571",
        "0.500000000000", "0.430676558073", "0.386852807235",
        "0.356207187108", "0.333333333333", "0.315464876786",
        "0.301029995664", "0.289064826318").zipWithIndex
        .map { case (d, i) =>
          s"(${i + 1}, ${d}::DECIMAL(14,12))" }.mkString(", ")
      def leg(t: String) =
        s"""SELECT '$t' AS term,
              round(CAST((SELECT coalesce(sum(
                  CAST(g AS DECIMAL(18,0)) * d), 0)
                FROM (SELECT g, row_number() OVER
                        (ORDER BY bm25 DESC, doc_id) AS rank
                      FROM (SELECT * FROM sc_$t
                            ORDER BY bm25 DESC, doc_id LIMIT 10))
                JOIN disc USING (rank)) AS DOUBLE), 6) AS dcg,
              round(CAST((SELECT coalesce(sum(
                  CAST(g AS DECIMAL(18,0)) * d), 0)
                FROM (SELECT g, row_number() OVER
                        (ORDER BY g DESC, doc_id) AS rank
                      FROM (SELECT * FROM sc_$t
                            ORDER BY g DESC, doc_id LIMIT 10))
                JOIN disc USING (rank)) AS DOUBLE), 6) AS idcg,
              round(CAST((SELECT coalesce(sum(
                  CAST(g AS DECIMAL(18,0)) * d), 0)
                FROM (SELECT g, row_number() OVER
                        (ORDER BY bm25 DESC, doc_id) AS rank
                      FROM (SELECT * FROM sc_$t
                            ORDER BY bm25 DESC, doc_id LIMIT 10))
                JOIN disc USING (rank)) AS DOUBLE)
              / CAST((SELECT coalesce(sum(
                  CAST(g AS DECIMAL(18,0)) * d), 0)
                FROM (SELECT g, row_number() OVER
                        (ORDER BY g DESC, doc_id) AS rank
                      FROM (SELECT * FROM sc_$t
                            ORDER BY g DESC, doc_id LIMIT 10))
                JOIN disc USING (rank)) AS DOUBLE), 6) AS ndcg"""
      def sc(t: String) =
        s"""sc_$t AS (
              SELECT doc_id,
                len(list_filter(ws, x -> x = '$t'))::BIGINT AS g,
                (len(list_filter(ws, x -> x = '$t'))::DOUBLE
                   * CAST(2.2 AS DOUBLE))
                / (len(list_filter(ws, x -> x = '$t'))::DOUBLE
                   + CAST(1.2 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE)
                          * len(ws)::DOUBLE / avgdl)) AS bm25
              FROM w, st)"""
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
          st AS (SELECT
                   CAST(sum(CAST(len(ws) AS DECIMAL(18,0))) AS DOUBLE)
                     / count(*) AS avgdl
                 FROM w),
          disc(rank, d) AS (SELECT * FROM (VALUES $disc)),
          ${sc("spark")}, ${sc("window")}, ${sc("hash")}
          ${leg("spark")} UNION ALL ${leg("window")}
          UNION ALL ${leg("hash")}
          ORDER BY term"""
    },
    "q254_naive_bayes" -> (nbScoredSql +
      " SELECT is_long, s_pos > s_neg AS pred_long, " +
      "count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc_id " +
      "FROM scored GROUP BY is_long, pred_long ORDER BY is_long, pred_long"),
    "q264_isotonic_calibration" ->
      """WITH scored AS (
           SELECT n_chars > 300 AS is_long,
                  CAST(length(replace(text, ' ', '')) AS DOUBLE)
                    / CAST(length(string_split(text, ' ')) AS DOUBLE)
                    AS mtl
           FROM documents),
         b AS (
           SELECT least(19, greatest(0,
                    CAST(floor(mtl * 10.0) AS INT) - 25)) AS bucket,
                  count(*)::BIGINT AS n,
                  sum(CASE WHEN is_long THEN 1 ELSE 0 END)::BIGINT AS y
           FROM scored GROUP BY 1),
         pre AS (
           SELECT bucket, n, y,
                  CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS pn,
                  CAST(sum(y) OVER (ORDER BY bucket) AS BIGINT) AS py
           FROM b),
         prefix AS (
           SELECT bucket AS bk, pn AS pnk, py AS pyk FROM pre
           UNION ALL SELECT -1, CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
         blocks AS (
           SELECT p.bk + 1 AS j, k.bucket AS k,
                  (k.py - p.pyk) * 1000000 // (k.pn - p.pnk) AS ppm
           FROM pre k JOIN prefix p ON p.bk < k.bucket),
         iso AS (
           SELECT i, max(mn) AS iso_ppm FROM (
             SELECT p.bucket AS i, bl.j, min(bl.ppm) AS mn
             FROM pre p JOIN blocks bl
               ON bl.j <= p.bucket AND p.bucket <= bl.k
             GROUP BY 1, 2) GROUP BY 1)
         SELECT p.bucket, p.n AS n_docs,
                p.y * 1000000 // p.n AS emp_ppm, iso.iso_ppm
         FROM pre p JOIN iso ON iso.i = p.bucket
         ORDER BY p.bucket""",
    "q258_nb_calibration" -> (nbScoredSql +
      ", b AS (SELECT is_long, s_pos / (s_pos + s_neg) AS p, " +
      "least(9, CAST(floor((s_pos / (s_pos + s_neg)) * 10.0) AS INT)) " +
      "AS bucket FROM scored) " +
      "SELECT bucket, count(*)::BIGINT AS n_docs, " +
      "round(" + Q.dsumAtSql("p", 8) +
      " / CAST(count(*) AS DOUBLE), 6) AS mean_conf, " +
      "round(sum(CASE WHEN is_long THEN 1 ELSE 0 END)::BIGINT" +
      "::DOUBLE / CAST(count(*) AS DOUBLE), 6) AS frac_long, " +
      "round(abs(round(" + Q.dsumAtSql("p", 8) +
      " / CAST(count(*) AS DOUBLE), 6) - " +
      "round(sum(CASE WHEN is_long THEN 1 ELSE 0 END)::BIGINT" +
      "::DOUBLE / CAST(count(*) AS DOUBLE), 6)), 6) AS gap " +
      "FROM b GROUP BY bucket ORDER BY bucket"),
    "q228_tfidf_terms" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                FROM toks GROUP BY doc_id, term),
         df AS (SELECT term, count(*)::BIGINT AS df
                FROM tf GROUP BY term),
         n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM tf),
         scored AS (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  round(tf.tf::DOUBLE *
                    ((n.n_docs + 1)::DOUBLE / (df.df + 1)::DOUBLE), 6)
                    AS score
           FROM tf JOIN df USING (term), n)
         SELECT doc_id, rank, term, tf, df, score FROM (
           SELECT doc_id, term, tf, df, score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS rank
           FROM scored)
         WHERE rank <= 3
         ORDER BY doc_id, rank""",
    "q229_renyi_diversity" ->
      """WITH tfq AS (
           SELECT doc_id, term, count(*)::BIGINT AS c FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents)
           GROUP BY doc_id, term)
         SELECT doc_id,
                sum(c)::BIGINT AS n_tokens,
                count(*)::BIGINT AS n_uniq,
                round(sum(c * c)::DOUBLE /
                  (sum(c)::BIGINT * sum(c)::BIGINT)::DOUBLE, 6)
                  AS collision_p,
                round((sum(c)::BIGINT * sum(c)::BIGINT)::DOUBLE /
                  sum(c * c)::DOUBLE, 6) AS eff_vocab
         FROM tfq GROUP BY doc_id ORDER BY doc_id""",
    "q178_prefix_cache_report" ->
      """WITH w AS (
           SELECT source,
                  string_split(trim(regexp_replace(lower(nfc_normalize(text)),
                       '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         p AS (SELECT source,
                      CAST(least(len(ws), 2) AS BIGINT) AS plen,
                      array_to_string(ws[1:2], ' ') AS prefix
               FROM w),
         g AS (SELECT source, prefix, plen, count(*) AS c
               FROM p GROUP BY source, prefix, plen)
         SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
                CAST(COALESCE(sum(c) FILTER (c >= 2), 0) AS BIGINT)
                  AS n_shared_docs,
                CAST(COALESCE(count(*) FILTER (c >= 2), 0) AS BIGINT)
                  AS n_shared_groups,
                CAST(COALESCE(sum((c - 1) * plen) FILTER (c >= 2), 0)
                  AS BIGINT) AS saved_tokens
         FROM g GROUP BY source ORDER BY source""",

    "q175_packing_efficiency" ->
      """WITH t AS (SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS n,
                CAST('0x' || substr(md5(doc_id::VARCHAR || '_pack'), 1, 15)
                     AS BIGINT) AS k
              FROM documents),
         c AS (SELECT n,
                 CAST(COALESCE(SUM(n) OVER (ORDER BY k, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS so
               FROM t),
         agg AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   CAST(count(*) FILTER (n > 0 AND
                     so // 2048 <> (so + n - 1) // 2048) AS BIGINT)
                     AS concat_split,
                   CAST(sum((n + 2047) // 2048) AS BIGINT) AS pad_seq,
                   CAST(count(*) FILTER (n > 2048) AS BIGINT) AS chunked
                 FROM c),
         shelf AS (SELECT CAST(COALESCE(sum(nsq), 0) AS BIGINT) AS s FROM (
             SELECT (count(*) + (2048 // least(1::BIGINT << length(bin(n)),
                       2048)) - 1)
                    // (2048 // least(1::BIGINT << length(bin(n)), 2048))
                    AS nsq
             FROM t WHERE n > 0 AND n <= 2048
             GROUP BY length(bin(n)))),
         big AS (SELECT CAST(COALESCE(sum((n + 2047) // 2048), 0) AS BIGINT)
                   AS s
                 FROM t WHERE n > 2048)
         SELECT strategy, n_seq,
                1000 * total // (n_seq * 2048) AS fill_pm, n_docs_split
         FROM (
           SELECT 'concat' AS strategy, (total + 2047) // 2048 AS n_seq,
                  concat_split AS n_docs_split, total FROM agg
           UNION ALL
           SELECT 'pad', pad_seq, chunked, total FROM agg
           UNION ALL
           SELECT 'shelf', shelf.s + big.s, chunked, total
           FROM agg, shelf, big)
         ORDER BY strategy""",

    "q173_phrase_search" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(nfc_normalize(text)),
                       '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         h2 AS (SELECT doc_id
                FROM w, UNNEST(generate_series(1, len(ws) - 1)) u(i)
                WHERE ws[i] = 'table' AND ws[i+1] = 'hash'),
         h3 AS (SELECT doc_id
                FROM w, UNNEST(generate_series(1, len(ws) - 2)) u(i)
                WHERE ws[i] = 'slow' AND ws[i+1] = 'hash'
                  AND ws[i+2] = 'batch')
         SELECT phrase, n_docs, n_occ FROM (
           SELECT 'table hash' AS phrase,
                  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                  CAST(count(*) AS BIGINT) AS n_occ FROM h2
           UNION ALL
           SELECT 'slow hash batch',
                  CAST(count(DISTINCT doc_id) AS BIGINT),
                  CAST(count(*) AS BIGINT) FROM h3)
         ORDER BY phrase""",

    "q167_vocab_coverage" ->
      """WITH w AS (
           SELECT string_split(trim(regexp_replace(lower(nfc_normalize(text)),
                       '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         t AS (SELECT unnest(ws) AS tok FROM w),
         c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
         g AS (SELECT tok, n,
                      CAST(sum(n) OVER (ORDER BY n DESC, tok) AS BIGINT)
                        AS csum,
                      CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT)
                        AS vocab_size
               FROM c),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
         tg AS (SELECT CAST(unnest([500, 900, 950, 990]) AS BIGINT)
                  AS target_pm),
         vs AS (SELECT target_pm, min(vocab_size) AS vocab_size
                FROM g, tot, tg
                WHERE csum * 1000 >= target_pm * total
                GROUP BY target_pm)
         SELECT vs.target_pm, vs.vocab_size,
                CAST(g.csum * 1000 // tot.total AS BIGINT) AS covered_pm
         FROM vs JOIN g USING (vocab_size), tot
         ORDER BY vs.target_pm""",

    "q161_paragraph_dedup" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(nfc_normalize(text)),
                       '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         p AS (SELECT doc_id, u.i AS pno,
                      array_to_string(ws[u.i*8+1 : u.i*8+8], ' ') AS para
               FROM w, UNNEST(range(greatest(
                      CAST(ceil(len(ws)/8.0) AS BIGINT), 1))) u(i)),
         c AS (SELECT para, count(*) AS n_occ FROM p GROUP BY para),
         k AS (SELECT doc_id, pno, para
               FROM p JOIN c USING (para) WHERE n_occ < 3),
         t AS (SELECT doc_id, count(*) AS n_paras FROM p GROUP BY doc_id),
         o AS (SELECT doc_id, count(*) AS n_kept,
                      string_agg(para, ' ' ORDER BY pno) AS clean_text
               FROM k GROUP BY doc_id)
         SELECT t.doc_id, n_paras,
                coalesce(n_kept, 0) AS n_kept,
                coalesce(clean_text, '') AS clean_text
         FROM t LEFT JOIN o USING (doc_id)
         ORDER BY t.doc_id""",

    "q72_training_build" -> {
      val holdoutCut = graft.text.Sampling.thresholdFor(0.1)
      s"""WITH norm AS (
           SELECT doc_id, source,
                  trim(regexp_replace(lower(nfc_normalize(text)),
                       '\\s+', ' ', 'g')) AS t
           FROM documents),
         w AS (SELECT doc_id, source, t, string_split(t, ' ') AS ws
               FROM norm),
         bg AS (SELECT doc_id,
                  unnest([concat_ws(' ', ws[i], ws[i+1])
                          FOR i IN generate_series(1, len(ws) - 1)]) AS g
                FROM w),
         bgc AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS f
                 FROM (SELECT doc_id, g, count(1) AS c FROM bg
                       GROUP BY doc_id, g) GROUP BY doc_id),
         tg AS (SELECT doc_id,
                  unnest([concat_ws(' ', ws[i], ws[i+1], ws[i+2])
                          FOR i IN generate_series(1, len(ws) - 2)]) AS g
                FROM w),
         tgc AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS f
                 FROM (SELECT doc_id, g, count(1) AS c FROM tg
                       GROUP BY doc_id, g) GROUP BY doc_id),
         gated AS (
           SELECT w.doc_id, w.source, w.ws
           FROM w LEFT JOIN bgc ON w.doc_id = bgc.doc_id
                  LEFT JOIN tgc ON w.doc_id = tgc.doc_id
           WHERE round(list_sum(list_transform(w.ws, x -> len(x)))::DOUBLE
                       / len(w.ws), 6) BETWEEN 3.0 AND 10.0
             AND round(1.0 - len(list_distinct(w.ws))::DOUBLE
                       / len(w.ws), 6) <= 0.5
             AND round(COALESCE(bgc.f, 0), 6) <= 0.18
             AND round(COALESCE(tgc.f, 0), 6) <= 0.16),
         canon AS (
           SELECT min(doc_id) AS doc_id FROM (
             SELECT doc_id,
                    sha256(array_to_string(list_sort(list_distinct(ws)),
                           ' ')) AS h
             FROM gated)
           GROUP BY h),
         train AS (
           SELECT g.* FROM gated g JOIN canon c ON g.doc_id = c.doc_id
           WHERE CAST('0x' || substr(md5(g.doc_id::VARCHAR || '_holdout'),
                      1, 15) AS BIGINT) >= $holdoutCut),
         scored AS (
           SELECT doc_id, source, len(ws)::BIGINT AS n_tokens,
                  round(least(1.0, len(ws)::DOUBLE / 100.0) * 0.4 +
                    (len(list_distinct(ws))::DOUBLE / len(ws)::DOUBLE) * 0.4 +
                    least(1.0, len(list_filter(ws, x ->
                      x IN ('the','a','of','and','to','in','is')))::DOUBLE
                      * 5.0 / len(ws)::DOUBLE) * 0.2,
                    6) AS q
           FROM train),
         cum AS (
           SELECT doc_id, source, n_tokens,
                  SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY q DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_tokens
           FROM scored),
         capped AS (
           SELECT doc_id, source, n_tokens,
                  CAST(cum_tokens AS BIGINT) AS cum_tokens
           FROM cum WHERE cum_tokens <= 600)
         SELECT doc_id, source, n_tokens, cum_tokens,
                CAST('0x' || substr(md5(doc_id::VARCHAR || '_shuffle'),
                     1, 15) AS BIGINT) AS shuffle_key
         FROM capped ORDER BY shuffle_key, doc_id"""
    },
    "q64_repetition_stats" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         base AS (SELECT doc_id, len(ws)::BIGINT AS n_words, ws FROM w),
         bg AS (SELECT doc_id,
                  unnest([concat_ws(' ', ws[i], ws[i+1])
                          FOR i IN generate_series(1, len(ws) - 1)]) AS g
                FROM w),
         bgc AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS f
                 FROM (SELECT doc_id, g, count(1) AS c FROM bg
                       GROUP BY doc_id, g)
                 GROUP BY doc_id),
         tg AS (SELECT doc_id,
                  unnest([concat_ws(' ', ws[i], ws[i+1], ws[i+2])
                          FOR i IN generate_series(1, len(ws) - 2)]) AS g
                FROM w),
         tgc AS (SELECT doc_id, max(c)::DOUBLE / sum(c)::DOUBLE AS f
                 FROM (SELECT doc_id, g, count(1) AS c FROM tg
                       GROUP BY doc_id, g)
                 GROUP BY doc_id),
         stats AS (
           SELECT b.doc_id, b.n_words,
                  round(list_sum(list_transform(b.ws, x -> len(x)))::DOUBLE
                        / b.n_words, 6) AS mean_word_len,
                  round(1.0 - len(list_distinct(b.ws))::DOUBLE / b.n_words, 6)
                    AS dup_word_frac,
                  round(COALESCE(bgc.f, 0), 6) AS top_bigram_frac,
                  round(COALESCE(tgc.f, 0), 6) AS top_trigram_frac
           FROM base b
           LEFT JOIN bgc ON b.doc_id = bgc.doc_id
           LEFT JOIN tgc ON b.doc_id = tgc.doc_id)
         SELECT doc_id, n_words, mean_word_len, dup_word_frac,
                top_bigram_frac, top_trigram_frac,
                (mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 AND dup_word_frac <= 0.5 AND top_bigram_frac <= 0.18
                 AND top_trigram_frac <= 0.16) AS passes_gopher
         FROM stats ORDER BY doc_id""",
    "q69_normalize_text" ->
      """SELECT doc_id,
                trim(regexp_replace(lower(nfc_normalize(text)),
                     '\s+', ' ', 'g')) AS norm_text,
                length(trim(regexp_replace(lower(nfc_normalize(text)),
                     '\s+', ' ', 'g'))) AS norm_chars
         FROM documents ORDER BY doc_id""",
    "q67_top_ngrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         g AS (SELECT unnest([concat_ws(' ', ws[i], ws[i+1])
                              FOR i IN generate_series(1, len(ws) - 1)])
                        AS ngram
               FROM w)
         SELECT ngram, count(1) AS n FROM g
         GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""",
    // Exact replay of the blockwise Misra-Gries summary: same portable
    // block hash, same per-block compress (subtract the 1025-th
    // largest), same single merge-compress. Order-independent by
    // construction, so block partitioning alone pins the result.
    "q68_top_ngrams_sketch" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         g AS (SELECT doc_id,
                      unnest([concat_ws(' ', ws[i], ws[i+1])
                              FOR i IN generate_series(1, len(ws) - 1)])
                        AS ngram
               FROM w),
         pb AS (SELECT CAST('0x' || substr(md5(doc_id::VARCHAR || '_mg'),
                                           1, 15) AS BIGINT) % 32 AS blk,
                       ngram, count(1)::BIGINT AS c
                FROM g GROUP BY 1, 2),
         rk AS (SELECT blk, ngram, c,
                       row_number() OVER (PARTITION BY blk
                                          ORDER BY c DESC, ngram) AS r
                FROM pb),
         sb AS (SELECT blk,
                       coalesce(max(CASE WHEN r = 1025 THEN c END), 0) AS s
                FROM rk GROUP BY blk),
         cp AS (SELECT rk.ngram, rk.c - sb.s AS c2
                FROM rk JOIN sb ON rk.blk = sb.blk
                WHERE rk.c - sb.s > 0),
         mg AS (SELECT ngram, sum(c2)::BIGINT AS mc FROM cp GROUP BY 1),
         mrk AS (SELECT ngram, mc,
                        row_number() OVER (ORDER BY mc DESC, ngram) AS r
                 FROM mg),
         ms AS (SELECT coalesce(max(CASE WHEN r = 1025 THEN mc END), 0) AS s
                FROM mrk)
         SELECT ngram, mc - ms.s AS est_n FROM mrk, ms
         WHERE mc - ms.s > 0
         ORDER BY est_n DESC, ngram LIMIT 20""",
    "q124_bpe_encode" -> bpeEncodeSql,

    "q151_bpe_fertility" ->
      s"""WITH w AS (SELECT lang, len(text)::BIGINT AS n_chars,
                            list_filter(string_split(text, ' '),
                                        x -> x <> '') AS ws
                     FROM documents),
          t AS (SELECT lang, n_chars,
                       array_to_string(list_transform(ws,
                         x -> $bpeWordSql), '|') AS tokens
                FROM w),
          d AS (SELECT lang, n_chars,
                       CASE WHEN tokens = '' THEN 0
                            ELSE len(string_split(tokens, '|'))
                       END::BIGINT AS n_tok
                FROM t)
          SELECT lang, count(*) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS n_chars,
                 CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
                 (CAST(sum(n_chars) AS BIGINT) * 1000)
                   // CAST(sum(n_tok) AS BIGINT) AS fertility_ppk
          FROM d GROUP BY lang ORDER BY lang""",
    // q75's recursive-CTE transitive closure + quality argmax; docs
    // outside any cluster are their own singleton cluster
    "q125_canonical_keep" ->
      s"""WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         d AS (SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
               FROM w),
         e AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM d a JOIN d b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                       (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                        - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.8),
         sym AS (SELECT ia, ib FROM e UNION SELECT ib, ia FROM e),
         reach(id, r) AS (
           SELECT ia, ib FROM sym
           UNION
           SELECT s.ia, reach.r FROM sym s JOIN reach ON s.ib = reach.id),
         lab AS (SELECT id, least(min(r), id) AS cluster_id
                 FROM reach GROUP BY id),
         q AS (SELECT doc_id, ${qualitySql("w")} AS quality FROM w),
         full_lab AS (
           SELECT q.doc_id, coalesce(l.cluster_id, q.doc_id) AS cluster_id,
                  q.quality
           FROM q LEFT JOIN lab l ON q.doc_id = l.id),
         ranked AS (
           SELECT doc_id, cluster_id, quality,
                  row_number() OVER (PARTITION BY cluster_id
                    ORDER BY quality DESC, doc_id) AS rk,
                  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
           FROM full_lab)
         SELECT doc_id, cluster_id, cluster_size::BIGINT AS cluster_size,
                quality, (rk = 1) AS kept
         FROM ranked ORDER BY doc_id""",
    "q129_split_manifest" ->
      """WITH s AS (
           SELECT source,
                  CAST('0x' || substr(md5(doc_id::VARCHAR || '_split'),
                                      1, 15) AS BIGINT) % 100 AS h,
                  len(string_split(text, ' '))::BIGINT AS n_tokens
           FROM documents),
         t AS (SELECT source,
                      CASE WHEN h < 98 THEN 'train'
                           WHEN h = 98 THEN 'val'
                           ELSE 'test' END AS split,
                      n_tokens
               FROM s)
         SELECT source, split, count(*)::BIGINT AS n_docs,
                sum(n_tokens)::BIGINT AS n_tokens
         FROM t GROUP BY source, split ORDER BY source, split""",
    // every literal CAST to DOUBLE; fixed-point mean (q109 pattern)
    "q130_bigram_lm_gate" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         g AS (SELECT doc_id,
                      unnest([{'a': ws[i], 'b': ws[i+1]}
                              FOR i IN generate_series(1, len(ws) - 1)])
                        AS p
               FROM w),
         pairs AS (SELECT doc_id, p.a AS w1, p.b AS w2 FROM g),
         bc AS (SELECT w1, w2, count(*)::BIGINT AS c2
                FROM pairs GROUP BY w1, w2),
         uc AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM bc GROUP BY w1),
         vv AS (SELECT count(DISTINCT w2)::BIGINT AS v FROM bc),
         scored AS (
           SELECT p.doc_id,
                  (bc.c2 + 1)::DOUBLE / (uc.c1 + vv.v)::DOUBLE AS prob
           FROM pairs p
           JOIN bc ON p.w1 = bc.w1 AND p.w2 = bc.w2
           JOIN uc ON p.w1 = uc.w1
           CROSS JOIN vv)
         SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                round(CAST(sum(CAST(floor(prob * CAST(1e12 AS DOUBLE))
                                    AS DECIMAL(38,0))) AS DOUBLE)
                        / CAST(1e12 AS DOUBLE) / count(*),
                      6) AS mean_prob
         FROM scored GROUP BY doc_id ORDER BY doc_id""",
    "q65_deterministic_shuffle" ->
      """SELECT doc_id, source,
                CAST('0x' || substr(md5(doc_id::VARCHAR || '_shuffle'), 1, 15)
                     AS BIGINT) AS shuffle_key
         FROM documents
         ORDER BY shuffle_key, doc_id""",
    "q62_token_budget" ->
      """WITH s AS (SELECT doc_id, source, string_split(text, ' ') AS w
                    FROM documents),
         scored AS (
           SELECT doc_id, source, len(w)::BIGINT AS n_tokens,
                  round(least(1.0, len(w)::DOUBLE / 100.0) * 0.4 +
                    (len(list_distinct(w))::DOUBLE / len(w)::DOUBLE) * 0.4 +
                    least(1.0, len(list_filter(w, x ->
                      x IN ('the','a','of','and','to','in','is')))::DOUBLE
                      * 5.0 / len(w)::DOUBLE) * 0.2,
                    6) AS q
           FROM s),
         cum AS (
           SELECT doc_id, source, n_tokens,
                  SUM(n_tokens) OVER (PARTITION BY source
                    ORDER BY q DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_tokens
           FROM scored)
         SELECT doc_id, source, n_tokens,
                CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM cum WHERE cum_tokens <= 800
         ORDER BY doc_id""",
    "q89_chunked_context_build" ->
      s"""WITH s AS (SELECT doc_id, source, text, string_split(text, ' ') AS w
                    FROM documents),
         scored AS (
           SELECT doc_id, source, text, ${qualitySql("w")} AS q
           FROM s),
         r AS (SELECT doc_id, text,
                      row_number() OVER (PARTITION BY source
                        ORDER BY q DESC, doc_id) AS rk,
                      count(1) OVER (PARTITION BY source) AS n
               FROM scored),
         kept AS (SELECT doc_id, text FROM r
                  WHERE rk <= CAST(ceil(n::DOUBLE * 0.5) AS BIGINT)),
         t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
         c AS (SELECT doc_id, st // 48 AS chunk_id,
                      doc_id * 1048576 + st // 48 AS chunk_key,
                      len(list_slice(ws, st + 1, st + 64))::BIGINT AS n_tokens
               FROM (SELECT doc_id, ws,
                            unnest(generate_series(0,
                              CASE WHEN len(ws) <= 64 THEN 0
                                   ELSE ((len(ws) - 64 + 47) // 48) * 48 END,
                              48)) AS st
                     FROM t WHERE len(ws) >= 1)),
         k AS (SELECT chunk_key, doc_id, chunk_id, n_tokens,
                      CAST('0x' || substr(md5(chunk_key::VARCHAR || '_cpack'),
                        1, 15) AS BIGINT) AS pk
               FROM c),
         o AS (SELECT chunk_key, doc_id, chunk_id, n_tokens,
                      CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY pk, chunk_key
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS start_offset
               FROM k)
         SELECT chunk_key, doc_id, chunk_id, n_tokens, start_offset,
                start_offset // 128 AS first_bin,
                (start_offset + n_tokens - 1) // 128 AS last_bin
         FROM o ORDER BY chunk_key""",
    "q92_corpus_report" ->
      s"""WITH s AS (SELECT source, lang, sha256(text) AS h,
                           string_split(text, ' ') AS w
                     FROM documents),
         t AS (SELECT source, lang, h,
                      len(w)::BIGINT AS nt,
                      list_sum(list_transform(w, x ->
                        (length(x) + 3) // 4))::BIGINT AS nb,
                      ${qualitySql("w")} AS q
               FROM s)
         SELECT source,
                count(1) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS n_tokens,
                CAST(SUM(nb) AS BIGINT) AS n_bpe_tokens,
                count(DISTINCT lang) AS n_langs,
                count(DISTINCT h) AS n_distinct,
                ${graft.queries.Q.dsumAtSql("q", 8)} AS quality_sum,
                count(1) FILTER (q < 0.25) AS q_lo,
                count(1) FILTER (q >= 0.25 AND q < 0.5) AS q_mid_lo,
                count(1) FILTER (q >= 0.5 AND q < 0.75) AS q_mid_hi,
                count(1) FILTER (q >= 0.75) AS q_hi
         FROM t
         GROUP BY source
         ORDER BY source""",
    "q91_temperature_sample" ->
      """WITH c AS (SELECT lang, count(1) AS n FROM documents
                    GROUP BY lang),
         r AS (SELECT lang,
                      sqrt((SELECT min(n) FROM c)::DOUBLE / n::DOUBLE)
                        AS rate
               FROM c)
         SELECT d.doc_id, d.lang
         FROM documents d JOIN r ON d.lang = r.lang
         WHERE CAST('0x' || substr(md5(d.doc_id::VARCHAR || '_temp'), 1, 15)
                    AS BIGINT)
               < CAST(floor(r.rate * 1152921504606846976.0) AS BIGINT)
         ORDER BY d.doc_id""",
    "q86_stratified_ksample" ->
      """SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
         FROM (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source
                        ORDER BY CAST('0x' ||
                          substr(md5(doc_id::VARCHAR || '_ks'), 1, 15)
                          AS BIGINT), doc_id) AS sample_rank
               FROM documents)
         WHERE sample_rank <= 20
         ORDER BY doc_id""",
    "q57_stratified_sample" -> {
      def t(rate: Double) = graft.text.Sampling.thresholdFor(rate)
      s"""SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   CAST('0x' || substr(md5(doc_id::VARCHAR || '_mix1'), 1, 15)
                        AS BIGINT) AS bucket,
                   CASE source WHEN 'src0' THEN ${t(0.8)}
                               WHEN 'src1' THEN ${t(0.1)}
                               WHEN 'src2' THEN ${t(0.5)}
                               ELSE ${t(0.25)} END AS threshold
            FROM documents)
          WHERE bucket < threshold
          ORDER BY doc_id"""
    },
    "q55_curation_pipeline" ->
      """WITH s AS (
           SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
         scored AS (
           SELECT doc_id, source, w,
                  round(least(1.0, len(w)::DOUBLE / 100.0) * 0.4 +
                    (len(list_distinct(w))::DOUBLE / len(w)::DOUBLE) * 0.4 +
                    least(1.0, len(list_filter(w, x ->
                      x IN ('the','a','of','and','to','in','is')))::DOUBLE
                      * 5.0 / len(w)::DOUBLE) * 0.2,
                    6) AS q
           FROM s),
         qualified AS (SELECT * FROM scored WHERE q >= 0.45),
         canon AS (
           SELECT min(doc_id) AS doc_id FROM (
             SELECT doc_id,
                    sha256(array_to_string(list_sort(list_distinct(w)), ' '))
                      AS h
             FROM qualified)
           GROUP BY h),
         kept1 AS (
           SELECT * FROM qualified
           WHERE doc_id IN (SELECT doc_id FROM canon)),
         sh AS (
           SELECT doc_id,
                  list_distinct(list_transform(generate_series(1, len(w) - 2),
                    i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
           FROM kept1),
         pairs AS (
           SELECT b.doc_id AS id_b
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE len(a.sh) + len(b.sh) > 0
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                   (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                    - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.8),
         kept2 AS (
           SELECT * FROM kept1
           WHERE doc_id NOT IN (SELECT id_b FROM pairs))
         SELECT source, count(1) AS n_docs,
                CAST(SUM(len(w)) AS BIGINT) AS n_tokens,
                CAST(SUM(list_sum(list_transform(w, x ->
                  (length(x) + 3) // 4))) AS BIGINT) AS n_bpe_tokens
         FROM kept2
         GROUP BY source
         ORDER BY source""",
    "q24_text_stats" ->
      """SELECT doc_id,
                len(w) AS n_tokens,
                len(list_distinct(w)) AS n_uniq_tokens,
                list_sum(list_transform(w, x -> (length(x) + 3) // 4))::BIGINT
                  AS n_bpe_tokens,
                len(list_filter(w, x ->
                  x IN ('the','a','of','and','to','in','is'))) AS n_stopwords,
                round(
                  least(1.0, len(w)::DOUBLE / 100.0) * 0.4 +
                  (len(list_distinct(w))::DOUBLE / len(w)::DOUBLE) * 0.4 +
                  least(1.0, len(list_filter(w, x ->
                    x IN ('the','a','of','and','to','in','is')))::DOUBLE
                    * 5.0 / len(w)::DOUBLE) * 0.2,
                  6) AS quality_score
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id""",
    "q25_langid" ->
      s"""SELECT doc_id,
                len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS hits_en,
                len(list_filter(w, x -> x IN ('el','la','de','los','que'))) AS hits_es,
                len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS hits_de,
                $predictLangSqlCase AS predicted_lang
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
         ORDER BY doc_id""",
    "q301_flesch_readability" ->
      """SELECT doc_id,
                CAST(length(string_split(text, ' ')) AS BIGINT)
                  AS n_words,
                CAST(greatest(1,
                  len(regexp_extract_all(text, '[.!?]+')))
                  AS BIGINT) AS n_sentences,
                CAST(len(regexp_extract_all(text, '[aeiouy]+'))
                  AS BIGINT) AS n_syllables,
                round(206.835
                  - 1.015 * (CAST(length(string_split(text, ' '))
                      AS DOUBLE)
                    / CAST(greatest(1, len(regexp_extract_all(text,
                        '[.!?]+'))) AS DOUBLE))
                  - 84.6 * (CAST(len(regexp_extract_all(text,
                        '[aeiouy]+')) AS DOUBLE)
                    / CAST(length(string_split(text, ' '))
                        AS DOUBLE)), 3) AS flesch
         FROM documents ORDER BY doc_id""",
    "q302_langid_confusion" ->
      s"""WITH p AS (
           SELECT lang AS true_lang, $predictLangSqlCase
                    AS predicted_lang
           FROM (SELECT lang, string_split(text, ' ') AS w
                 FROM documents)),
         c AS (
           SELECT true_lang, predicted_lang, count(*)::BIGINT AS n
           FROM p GROUP BY 1, 2),
         t AS (
           SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true
           FROM c GROUP BY 1)
         SELECT c.true_lang, c.predicted_lang, c.n,
                c.n * 1000000 // t.n_true AS share_ppm,
                CAST(CASE WHEN c.true_lang = c.predicted_lang
                  THEN 1 ELSE 0 END AS INT) AS is_correct
         FROM c JOIN t USING (true_lang)
         ORDER BY c.true_lang, c.predicted_lang""",
    "q26_doc_fingerprints" -> (
      docSets +
      """ SELECT d.doc_id,
                 sha256(doc.text) AS content_sha,
                 sha256(array_to_string(list_sort(list_distinct(
                   string_split(doc.text, ' '))), ' ')) AS normalized_sha,
                 list_min(list_transform(d.sh, s -> md5(s))) AS min_shingle_md5
          FROM d JOIN documents doc ON d.doc_id = doc.doc_id
          ORDER BY d.doc_id"""),
    "q27_exact_dedup_groups" ->
      """SELECT content_hash, min(doc_id) AS canonical_id,
                count(1) AS n_members
         FROM (SELECT doc_id,
                 sha256(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS content_hash
               FROM documents)
         GROUP BY content_hash
         ORDER BY content_hash""",
    "q78_epoch_mixture" -> {
      def t(rate: Double) = graft.text.Sampling.thresholdFor(rate)
      s"""WITH f AS (SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1
                         WHEN 'src2' THEN 0 ELSE 1 END AS n_full,
             CASE source WHEN 'src0' THEN ${t(0.5)}
                         WHEN 'src2' THEN ${t(0.25)}
                         ELSE 0 END AS thr,
             CAST('0x' || substr(md5(doc_id::VARCHAR || '_ep'), 1, 15)
                  AS BIGINT) AS b
           FROM documents)
         SELECT doc_id, source,
                unnest(generate_series(1,
                  n_full + (CASE WHEN b < thr THEN 1 ELSE 0 END))) AS epoch
         FROM f
         ORDER BY doc_id, epoch"""
    },
    "q83_incremental_neardup" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
                    FROM documents),
         d AS (SELECT doc_id, source,
                 list_distinct(list_transform(generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
               FROM w)
         SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
                len(list_intersect(b.sh, c.sh))::DOUBLE /
                  (len(b.sh)::DOUBLE + len(c.sh)::DOUBLE
                   - len(list_intersect(b.sh, c.sh))::DOUBLE) AS jaccard
         FROM d b JOIN d c ON b.source <> 'src0' AND c.source = 'src0'
         WHERE len(b.sh) + len(c.sh) > 0  -- 0/0 jaccard is NaN, and
               -- DuckDB NaN >= t is TRUE; Spark emits no pair for
               -- shingle-less docs (no signature row)
           AND len(list_intersect(b.sh, c.sh))::DOUBLE /
                 (len(b.sh)::DOUBLE + len(c.sh)::DOUBLE
                  - len(list_intersect(b.sh, c.sh))::DOUBLE) >= 0.8
         ORDER BY batch_id, corpus_id""",
    "q80_quality_trim" ->
      s"""WITH s AS (SELECT doc_id, source, string_split(text, ' ') AS w
                    FROM documents),
         scored AS (
           SELECT doc_id, source, ${qualitySql("w")} AS quality_score
           FROM s),
         r AS (SELECT doc_id, source, quality_score,
                      row_number() OVER (PARTITION BY source
                        ORDER BY quality_score DESC, doc_id) AS q_rank,
                      count(1) OVER (PARTITION BY source) AS n
               FROM scored)
         SELECT doc_id, source, quality_score,
                CAST(q_rank AS BIGINT) AS q_rank
         FROM r
         WHERE q_rank <= CAST(ceil(n::DOUBLE * 0.3) AS BIGINT)
         ORDER BY doc_id""",
    "q182_preference_pairs" ->
      s"""WITH s AS (SELECT doc_id, lang, source,
                           string_split(text, ' ') AS w
                    FROM documents),
         scored AS (
           SELECT doc_id, lang, source, ${qualitySql("w")} AS q
           FROM s),
         r AS (
           SELECT *,
                  row_number() OVER (PARTITION BY lang, source
                    ORDER BY q DESC, doc_id) AS rn_top,
                  row_number() OVER (PARTITION BY lang, source
                    ORDER BY q ASC, doc_id DESC) AS rn_bot
           FROM scored)
         SELECT lang, source, count(1) AS n_docs,
                max(CASE WHEN rn_top = 1 THEN doc_id END) AS chosen_id,
                max(CASE WHEN rn_top = 1 THEN q END) AS chosen_score,
                max(CASE WHEN rn_bot = 1 THEN doc_id END) AS rejected_id,
                max(CASE WHEN rn_bot = 1 THEN q END) AS rejected_score,
                max(CASE WHEN rn_top = 1 THEN q END)
                  - max(CASE WHEN rn_bot = 1 THEN q END) AS margin
         FROM r
         GROUP BY lang, source
         HAVING count(1) >= 2
         ORDER BY lang, source""",
    "q203_attention_cost" ->
      """WITH d AS (SELECT len(string_split(text, ' '))::BIGINT AS len
                   FROM documents),
         t AS (SELECT CAST(SUM(len) AS BIGINT) AS tokens,
                      count(1) AS n_docs,
                      CAST(ceil(SUM(len) / 2048.0) AS BIGINT)
                        * 2048 * 2048 AS concat_cost,
                      CAST(SUM(len * 2048) AS BIGINT) AS pad_cost,
                      CAST(SUM(len * len) AS BIGINT) AS masked_cost
               FROM d)
         SELECT tokens, n_docs, concat_cost, pad_cost, masked_cost,
                1000 * masked_cost // concat_cost AS masked_vs_concat_pm,
                1000 * masked_cost // pad_cost AS masked_vs_pad_pm
         FROM t""",

    "q204_needle_haystack" ->
      """WITH hay AS (
           SELECT doc_id // 10 AS hid, count(1) AS n_docs,
                  string_agg(text, ' ' ORDER BY doc_id) AS htext
           FROM documents GROUP BY doc_id // 10),
         w AS (SELECT hid, n_docs, string_split(htext, ' ') AS ws
               FROM hay),
         m AS (
           SELECT hid, n_docs, ws,
                  CAST(len(ws) AS BIGINT) AS n_tokens,
                  CAST('0x' || substr(md5(hid::VARCHAR || '_needle'),
                    1, 15) AS BIGINT) % 1000 AS depth_pm
           FROM w)
         SELECT hid, n_docs, n_tokens, depth_pm,
                CAST(n_tokens * depth_pm // 1000 AS BIGINT)
                  AS needle_word_pos,
                md5(concat_ws(' ',
                  coalesce(array_to_string(
                    ws[1:(n_tokens * depth_pm // 1000)], ' '), ''),
                  'The secret ingredient is graft number FORTYTWO .',
                  coalesce(array_to_string(
                    ws[(n_tokens * depth_pm // 1000) + 1:], ' '), '')))
                  AS assembled_md5
         FROM m
         ORDER BY hid""",

    "q205_bpe_vocab_ablation" -> Seq(0, 8, 17).map { k =>
      s"""SELECT $k AS k, count(*) AS n_docs,
             CAST(sum(len(text)) AS BIGINT) AS n_chars,
             CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
             (CAST(sum(len(text)) AS BIGINT) * 1000)
               // CAST(sum(n_tok) AS BIGINT) AS fertility_ppk
          FROM (
            SELECT text,
                   CASE WHEN tokens = '' THEN 0
                        ELSE len(string_split(tokens, '|'))
                   END::BIGINT AS n_tok
            FROM (
              SELECT text, array_to_string(list_transform(
                       list_filter(string_split(text, ' '),
                                   x -> x <> ''),
                       x -> ${bpeWordSqlAt(k)}), '|') AS tokens
              FROM documents))"""
    }.mkString("", " UNION ALL ", " ORDER BY k"),

    "q208_quality_auc" ->
      s"""WITH s AS (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
                   string_split(text, ' ') AS w
            FROM documents),
          sc AS (SELECT pos, ${qualitySql("w")} AS score FROM s),
          g AS (SELECT score,
                       CAST(sum(pos) AS BIGINT) AS np,
                       CAST(count(1) - sum(pos) AS BIGINT) AS nn
                FROM sc GROUP BY score),
          r AS (SELECT np, nn,
                       CAST(sum(nn) OVER (ORDER BY score
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS cum_nn
                FROM g)
          SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                 CAST(sum(nn) AS BIGINT) AS n_neg,
                 CAST(sum(np * (cum_nn - nn)) AS BIGINT) AS concordant,
                 CAST(sum(np * nn) AS BIGINT) AS tied,
                 (2 * CAST(sum(np * (cum_nn - nn)) AS BIGINT)
                    + CAST(sum(np * nn) AS BIGINT)) * 500000
                   // (CAST(sum(np) AS BIGINT) * CAST(sum(nn) AS BIGINT))
                   AS auc_ppm
          FROM r""",

    "q217_chunk_retrieval_agreement" -> {
      val terms = Seq("hash", "spark", "window")
      def scoreSql(t: String, i: Int): String =
        s"""((n_docs - df_$i + CAST(0.5 AS DOUBLE))
             / (df_$i + CAST(0.5 AS DOUBLE)))
            * (len(list_filter(ws, x -> x = '$t'))::DOUBLE
               * CAST(2.2 AS DOUBLE))
            / (len(list_filter(ws, x -> x = '$t'))::DOUBLE
               + CAST(1.2 AS DOUBLE)
                 * (CAST(0.25 AS DOUBLE)
                    + CAST(0.75 AS DOUBLE) * len(ws)::DOUBLE / avgdl))"""
      def statsSql(rel: String): String = {
        val dfs = terms.zipWithIndex.map { case (t, i) =>
          s"""sum(CASE WHEN list_contains(ws, '$t')
                  THEN 1::BIGINT ELSE 0::BIGINT END)::BIGINT AS df_$i"""
        }.mkString(", ")
        s"""SELECT count(*)::BIGINT AS n_docs,
                   CAST(sum(CAST(len(ws) AS DECIMAL(18,0))) AS DOUBLE)
                     / count(*) AS avgdl,
                   $dfs
            FROM $rel"""
      }
      val perTerm = terms.zipWithIndex.map { case (t, i) =>
        s"""d_$i AS (SELECT doc_id, ${scoreSql(t, i)} AS sc FROM w, st),
          dt_$i AS (SELECT doc_id, sc FROM d_$i
                    ORDER BY sc DESC, doc_id LIMIT 5),
          c_$i AS (SELECT doc_id, max(${scoreSql(t, i)}) AS sc
                   FROM ch, cst GROUP BY doc_id),
          ct_$i AS (SELECT doc_id, sc FROM c_$i
                    ORDER BY sc DESC, doc_id LIMIT 5)"""
      }.mkString(",\n          ")
      val legs = terms.zipWithIndex.map { case (t, i) =>
        s"""SELECT '$t' AS term,
               (SELECT doc_id FROM dt_$i
                ORDER BY sc DESC, doc_id LIMIT 1) AS doc_top1,
               (SELECT doc_id FROM ct_$i
                ORDER BY sc DESC, doc_id LIMIT 1) AS chunk_top1,
               (SELECT count(*)::BIGINT
                FROM dt_$i JOIN ct_$i USING (doc_id)) AS n_overlap"""
      }.mkString("\n          UNION ALL\n          ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
          st AS (${statsSql("w")}),
          ch AS (SELECT doc_id, list_slice(ws, st2 + 1, st2 + 64) AS ws
                 FROM (SELECT doc_id, ws,
                         unnest(generate_series(0,
                           CASE WHEN len(ws) <= 64 THEN 0
                                ELSE ((len(ws) - 64 + 47) // 48) * 48 END,
                           48)) AS st2
                       FROM w WHERE len(ws) >= 1)),
          cst AS (${statsSql("ch")}),
          $perTerm
          $legs
          ORDER BY term"""
    },

    "q214_vocab_growth" ->
      """WITH rng AS (SELECT min(doc_id) AS mn,
                             max(doc_id) - min(doc_id) + 1 AS span
                      FROM documents),
          d AS (SELECT CAST((doc_id - mn) * 10 // span AS INTEGER)
                         AS bucket,
                       string_split(text, ' ') AS w
                FROM documents, rng),
          toks AS (
            SELECT bucket,
                   unnest(list_filter(w, x -> x <> '')) AS tok
            FROM d),
          bis AS (
            SELECT bucket,
                   unnest(list_distinct(list_transform(
                     generate_series(1, len(w) - 1),
                     i -> concat_ws(' ', w[i], w[i+1])))) AS bg
            FROM d),
          tpb AS (SELECT bucket, CAST(count(1) AS BIGINT) AS n_tokens
                  FROM toks GROUP BY bucket),
          fu AS (SELECT bucket, CAST(count(1) AS BIGINT) AS new_uni
                 FROM (SELECT min(bucket) AS bucket FROM toks
                       GROUP BY tok)
                 GROUP BY bucket),
          fb AS (SELECT bucket, CAST(count(1) AS BIGINT) AS new_bi
                 FROM (SELECT min(bucket) AS bucket FROM bis
                       GROUP BY bg)
                 GROUP BY bucket)
          SELECT t.bucket, t.n_tokens,
                 COALESCE(u.new_uni, 0) AS new_uni,
                 COALESCE(b.new_bi, 0) AS new_bi,
                 CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens,
                 CAST(sum(COALESCE(u.new_uni, 0)) OVER (
                   ORDER BY t.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_uni_types,
                 CAST(sum(COALESCE(b.new_bi, 0)) OVER (
                   ORDER BY t.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_bi_types
          FROM tpb t
          LEFT JOIN fu u USING (bucket)
          LEFT JOIN fb b USING (bucket)
          ORDER BY t.bucket""",

    "q202_cdc_chunking" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                   FROM documents),
         toks AS (
           SELECT doc_id, source, ws[i] AS w, i - 1 AS pos
           FROM d, unnest(generate_series(1, len(ws))) AS t(i)),
         flag AS (
           SELECT *, lead(w, 1) OVER dw AS w1,
                     lead(w, 2) OVER dw AS w2,
                     lead(w, 3) OVER dw AS w3
           FROM toks
           WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
         b AS (
           SELECT *, CASE WHEN pos = 0 THEN 1
                  WHEN w3 IS NOT NULL AND
                       CAST('0x' || substr(md5(w || ' ' || w1 || ' '
                         || w2 || ' ' || w3 || '_cdc'), 1, 15)
                         AS BIGINT) % 16 = 0
                  THEN 1 ELSE 0 END AS boundary
           FROM flag),
         cs AS (
           SELECT *, SUM(boundary) OVER (PARTITION BY doc_id
             ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS chunk_seq
           FROM b),
         chunks AS (
           SELECT doc_id, source, chunk_seq,
                  md5(string_agg(w, ' ' ORDER BY pos)) AS ch,
                  count(1) AS chunk_words
           FROM cs GROUP BY doc_id, source, chunk_seq),
         dd AS (SELECT ch, count(DISTINCT doc_id) AS nd
                FROM chunks GROUP BY ch)
         SELECT source, count(1) AS n_chunks,
                CAST(count(DISTINCT chunks.ch) AS BIGINT) AS n_distinct,
                CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_shared_chunks,
                CAST(SUM(chunk_words) AS BIGINT) AS n_words
         FROM chunks JOIN dd USING (ch)
         GROUP BY source
         ORDER BY source""",
    "q183_length_matched_resample" ->
      """WITH b AS (SELECT doc_id, source, n_chars,
                          n_chars // 100 AS len_bucket
                   FROM documents),
         c AS (SELECT len_bucket, count(1) AS n_bucket
               FROM b GROUP BY len_bucket),
         mm AS (SELECT min(n_bucket) AS m FROM c)
         SELECT doc_id, source, b.len_bucket, n_bucket
         FROM b JOIN c ON b.len_bucket = c.len_bucket, mm
         WHERE (CAST('0x' || substr(md5(doc_id::VARCHAR || '_lmr'), 1, 15)
                  AS BIGINT) % 1000000) * n_bucket < m * 1000000
         ORDER BY doc_id""",
    "q79_chunk_windows" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         s AS (SELECT doc_id, ws,
                      unnest(generate_series(0,
                        CASE WHEN len(ws) <= 64 THEN 0
                             ELSE ((len(ws) - 64 + 47) // 48) * 48 END,
                        48)) AS st
               FROM t WHERE len(ws) >= 1)
         SELECT doc_id,
                st // 48 AS chunk_id,
                st AS start_token,
                len(list_slice(ws, st + 1, st + 64))::BIGINT AS n_tokens,
                array_to_string(list_slice(ws, st + 1, st + 64), ' ')
                  AS chunk_text
         FROM s
         ORDER BY doc_id, chunk_id""",
    "q76_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS n_tokens,
                CAST('0x' || substr(md5(doc_id::VARCHAR || '_pack'), 1, 15)
                     AS BIGINT) AS k
              FROM documents),
         c AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY k, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS start_offset
               FROM t)
         SELECT doc_id, n_tokens, start_offset,
                start_offset // 2048 AS first_bin,
                (start_offset + n_tokens - 1) // 2048 AS last_bin
         FROM c ORDER BY doc_id""",
    "q73_decontaminate" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                    FROM documents),
         g AS (SELECT doc_id, source,
                 unnest(list_distinct([concat_ws(' ', ws[i], ws[i+1], ws[i+2],
                   ws[i+3], ws[i+4], ws[i+5], ws[i+6], ws[i+7], ws[i+8],
                   ws[i+9], ws[i+10], ws[i+11], ws[i+12])
                   FOR i IN generate_series(1, len(ws) - 12)])) AS g
               FROM w),
         bench AS (SELECT DISTINCT g FROM g WHERE source = 'src0')
         SELECT t.doc_id, t.source, count(*) AS n_contaminated_grams
         FROM g t JOIN bench b USING (g)
         WHERE t.source <> 'src0'
         GROUP BY t.doc_id, t.source
         ORDER BY doc_id""",
    "q74_pii_redact" ->
      """SELECT c_custkey,
                len(regexp_extract_all(profile,
                  '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
                regexp_replace(
                  regexp_replace(profile,
                    '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
                  '[0-9]{4,}', '[NUM]', 'g') AS redacted
         FROM (SELECT c_custkey,
                      concat_ws(' ', c_name,
                        CASE WHEN c_custkey % 3 = 0 THEN
                          printf('%02d-%03d-%03d-%04d',
                            c_custkey % 90 + 10, (c_custkey * 7) % 900 + 100,
                            (c_custkey * 13) % 900 + 100,
                            (c_custkey * 31) % 9000 + 1000)
                        ELSE 'unlisted' END,
                        c_mktsegment) AS profile
               FROM customer)
         ORDER BY c_custkey""",
    "q75_dedup_clusters" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         d AS (SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
               FROM w),
         e AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM d a JOIN d b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                       (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                        - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.8),
         sym AS (SELECT ia, ib FROM e UNION SELECT ib AS ia, ia AS ib FROM e),
         reach(id, r) AS (
           SELECT ia, ib FROM sym
           UNION
           SELECT s.ia, reach.r FROM sym s JOIN reach ON s.ib = reach.id),
         lab AS (SELECT id, least(min(r), id) AS cluster_id
                 FROM reach GROUP BY id),
         sz AS (SELECT cluster_id, count(*) AS cluster_size
                FROM lab GROUP BY cluster_id)
         SELECT l.id AS doc_id, l.cluster_id, s.cluster_size
         FROM lab l JOIN sz s USING (cluster_id)
         ORDER BY doc_id""",
    "q164_leakage_safe_splits" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         d AS (SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(w) - 2),
                   i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
               FROM w),
         e AS (SELECT a.doc_id AS ia, b.doc_id AS ib
               FROM d a JOIN d b ON a.doc_id < b.doc_id
               WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                       (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                        - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.8),
         sym AS (SELECT ia, ib FROM e UNION SELECT ib AS ia, ia AS ib FROM e),
         reach(id, r) AS (
           SELECT ia, ib FROM sym
           UNION
           SELECT s.ia, reach.r FROM sym s JOIN reach ON s.ib = reach.id),
         lab AS (SELECT id, least(min(r), id) AS cluster_id
                 FROM reach GROUP BY id),
         g AS (SELECT doc.doc_id,
                 coalesce(l.cluster_id, doc.doc_id) AS gid
               FROM documents doc LEFT JOIN lab l ON l.id = doc.doc_id),
         a AS (SELECT doc_id, gid,
                 CASE WHEN h < 98 THEN 'train' WHEN h = 98 THEN 'val'
                      ELSE 'test' END AS split
               FROM (SELECT doc_id, gid,
                       CAST('0x' || substr(md5(gid::VARCHAR || '_gsplit'),
                         1, 15) AS BIGINT) % 100 AS h
                     FROM g) t),
         x AS (SELECT count(*) AS cross_pairs
               FROM e JOIN a aa ON aa.doc_id = e.ia
                      JOIN a ab ON ab.doc_id = e.ib
               WHERE aa.split <> ab.split)
         SELECT a.split, count(DISTINCT a.gid) AS n_groups,
                count(*) AS n_docs,
                (SELECT cross_pairs FROM x) AS cross_pairs
         FROM a GROUP BY a.split ORDER BY a.split""",

    "q28_minhash_neardup" -> (
      docSets +
      """ SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.sh, b.sh))::DOUBLE /
                   (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                    - len(list_intersect(a.sh, b.sh))::DOUBLE) AS jaccard
          FROM d a JOIN d b ON a.doc_id < b.doc_id
          WHERE len(a.sh) + len(b.sh) > 0  -- guard 0/0 -> NaN (NaN >= t
                -- is TRUE in DuckDB; Spark has no pair without shingles)
            AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                  (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                   - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.8
          ORDER BY id_a, id_b"""),
    "q54_source_overlap" ->
      """WITH d AS (
           SELECT source,
                  list_distinct(flatten(list(
                    list_transform(generate_series(1, len(w) - 1),
                      i -> concat_ws(' ', w[i], w[i+1]))))) AS shs
           FROM (SELECT source, string_split(text, ' ') AS w FROM documents)
           GROUP BY source)
         SELECT a.source AS src_a, b.source AS src_b,
                len(list_intersect(a.shs, b.shs))::DOUBLE /
                  (len(a.shs)::DOUBLE + len(b.shs)::DOUBLE
                   - len(list_intersect(a.shs, b.shs))::DOUBLE) AS jaccard
         FROM d a JOIN d b ON a.source < b.source
         ORDER BY src_a, src_b""",
    "q49_ngram_jaccard_blocked" ->
      """WITH d AS (
           SELECT doc_id, lang, source,
                  list_distinct(list_transform(generate_series(1, len(w) - 1),
                    i -> concat_ws(' ', w[i], w[i+1]))) AS sh
           FROM (SELECT doc_id, lang, source,
                        string_split(text, ' ') AS w FROM documents))
         SELECT a.lang, a.source, a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.sh, b.sh))::DOUBLE /
                  (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                   - len(list_intersect(a.sh, b.sh))::DOUBLE) AS jaccard
         FROM d a JOIN d b
           ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
                 (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                  - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.5
         ORDER BY id_a, id_b""",
    "q29_simhash_fingerprints" -> (
      docSets +
      """, h AS (SELECT doc_id,
                  list_transform(sh, s ->
                    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
               FROM d)
         SELECT doc_id,
                list_sum(list_transform(generate_series(0, 59), k ->
                  CASE WHEN list_sum(list_transform(hs, v ->
                         CASE WHEN (v >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                       THEN (1::BIGINT << k) ELSE 0::BIGINT END))::BIGINT
                  AS simhash
         FROM h
         ORDER BY doc_id"""),
    "q30_simhash_neardup" -> (
      docSets +
      """, h AS (SELECT doc_id,
                  list_transform(sh, s ->
                    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
               FROM d),
         f AS (SELECT doc_id,
                 list_sum(list_transform(generate_series(0, 59), k ->
                   CASE WHEN list_sum(list_transform(hs, v ->
                          CASE WHEN (v >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (1::BIGINT << k) ELSE 0::BIGINT END))::BIGINT
                   AS simhash
               FROM h)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM f a JOIN f b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
         ORDER BY id_a, id_b"""),
    // all-pairs definition the blocked length-bucket join must equal
    "q98_editdist_neardup" ->
      """WITH p AS (
           SELECT doc_id, lang,
                  rpad(substring(text, 1, 40), 40, chr(1)) AS pref
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang,
                levenshtein(a.pref, b.pref) AS dist
         FROM p a JOIN p b
           ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE levenshtein(a.pref, b.pref) <= 5
         ORDER BY id_a, id_b""",
    "q99_quality_quartiles" ->
      """SELECT source, quartile, count(1) AS n_docs,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM (SELECT source, doc_id, n_chars,
                      ntile(4) OVER (PARTITION BY source
                        ORDER BY n_chars, doc_id) AS quartile
               FROM documents)
         GROUP BY source, quartile
         ORDER BY source, quartile""",
    // Replay of all 3 gradient-descent steps as chained CTEs — the
    // q100 PageRank discipline plus fixed-point gradient sums:
    // floor(x·10¹²) per row (pure IEEE double ops, engine-exact),
    // exact decimal sum of the floored integers, divisions in double.
    // A direct double→DECIMAL cast of the products is NOT portable
    // (the engines round the scaled value differently in the last
    // ulp); every literal is CAST to DOUBLE (a bare numeric literal
    // is DECIMAL in DuckDB and would change the arithmetic).
    "q109_train_linear_gate" -> {
      val r = "(w.a + w.b * f.x1 + w.c * f.x2 + w.d * f.x3 - f.y)"
      def qsum(expr: String): String =
        s"""CAST(sum(CAST(floor(($expr) * CAST(1e12 AS DOUBLE))
              AS DECIMAL(38,0))) AS DOUBLE) / CAST(1e12 AS DOUBLE)"""
      def grad(wcte: String, gcte: String): String =
        s"""$gcte AS (
              SELECT
                ${qsum(r)} / count(*) AS g0,
                ${qsum(s"$r * f.x1")} / count(*) AS g1,
                ${qsum(s"$r * f.x2")} / count(*) AS g2,
                ${qsum(s"$r * f.x3")} / count(*) AS g3
              FROM f, $wcte w)"""
      def upd(prev: String, g: String, out: String): String =
        s"""$out AS (
              SELECT w.a - CAST(0.5 AS DOUBLE) * g.g0 AS a,
                     w.b - CAST(0.5 AS DOUBLE) * g.g1 AS b,
                     w.c - CAST(0.5 AS DOUBLE) * g.g2 AS c,
                     w.d - CAST(0.5 AS DOUBLE) * g.g3 AS d
              FROM $prev w, $g g)"""
      s"""WITH d AS (SELECT string_split(text, ' ') AS ws FROM documents),
          f AS (SELECT len(ws)::DOUBLE / CAST(100.0 AS DOUBLE) AS x1,
                       len(list_distinct(ws))::DOUBLE
                         / len(ws)::DOUBLE AS x2,
                       len(list_filter(ws, x -> x IN
                           ('the','a','of','and','to','in','is')))::DOUBLE
                         / len(ws)::DOUBLE AS x3,
                       ${qualitySql("ws")} AS y
                FROM d),
          w0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b,
                        CAST(0 AS DOUBLE) AS c, CAST(0 AS DOUBLE) AS d),
          ${grad("w0", "g1")}, ${upd("w0", "g1", "w1")},
          ${grad("w1", "g2")}, ${upd("w1", "g2", "w2")},
          ${grad("w2", "g3")}, ${upd("w2", "g3", "w3")},
          m AS (SELECT ${qsum(s"$r * $r")} / count(*) AS mse,
                       count(*)::BIGINT AS n_docs
                FROM f, w3 w)
          SELECT w.a AS w0, w.b AS w1, w.c AS w2, w.d AS w3,
                 m.mse, m.n_docs
          FROM w3 w, m"""
    },

    "q101_substring_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         wins AS (
           SELECT doc_id,
                  unnest([array_to_string(ws[i:i+9], ' ')
                          FOR i IN generate_series(1, len(ws) - 9)]) AS span
           FROM w
           WHERE len(ws) >= 10),
         dup AS (
           SELECT span FROM wins
           GROUP BY span HAVING count(DISTINCT doc_id) >= 2)
         SELECT w.doc_id, count(*)::BIGINT AS n_windows,
                count(d.span)::BIGINT AS n_dup,
                round(count(d.span)::DOUBLE / count(*)::DOUBLE, 6) AS dup_frac
         FROM wins w LEFT JOIN dup d ON w.span = d.span
         GROUP BY w.doc_id
         ORDER BY w.doc_id""",
    "q123_calibrated_quality_trim" ->
      s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
                     FROM documents),
          scored AS (
            SELECT doc_id, source, ${qualitySql("ws")} AS q FROM w),
          ranked AS (
            SELECT doc_id, source, q,
                   percent_rank() OVER (PARTITION BY source
                     ORDER BY q, doc_id) AS pr
            FROM scored)
          SELECT doc_id, source, q, round(pr, 6) AS pr
          FROM ranked
          WHERE pr >= 0.5
          ORDER BY doc_id""",
    "q121_token_waterfill" ->
      """WITH caps AS (
           SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS cap
           FROM documents GROUP BY source),
         tot AS (SELECT sum(cap)::BIGINT AS t, count(*)::BIGINT AS n
                 FROM caps),
         ranked AS (
           SELECT source, cap, t // 2 AS budget, n,
                  row_number() OVER (ORDER BY cap, source) AS k,
                  sum(cap) OVER (ORDER BY cap, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS pfx
           FROM caps, tot),
         lv AS (
           SELECT *, CASE WHEN k < n THEN
                       (budget - pfx)::DOUBLE / (n - k)::DOUBLE
                     END AS lvl
           FROM ranked),
         chosen AS (
           SELECT coalesce(
             (SELECT lvl FROM lv WHERE lvl >= cap::DOUBLE
              ORDER BY k DESC LIMIT 1),
             (SELECT (t // 2)::DOUBLE / n::DOUBLE FROM tot)) AS level)
         SELECT source, cap,
                round(least(cap::DOUBLE, level), 6) AS allocation
         FROM lv, chosen
         ORDER BY source""",
    "q117_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
                count(*)::BIGINT AS group_size,
                count(*) < 10 AS suppress
         FROM customer
         GROUP BY c_nationkey, c_mktsegment
         ORDER BY c_nationkey, c_mktsegment""",
    "q118_canary_manifest" ->
      """WITH m AS (SELECT max(doc_id) AS max_id FROM documents)
         SELECT source,
                max_id + 1 +
                  CAST('0x' || substr(md5(source || '_canary'), 1, 15)
                       AS BIGINT) % 1000000 AS canary_id,
                'canary ' || md5(source || '_canary_text') AS canary_text,
                count(*)::BIGINT AS n_docs
         FROM documents, m
         GROUP BY source, max_id
         ORDER BY source""",
    "q116_contrastive_triplets" -> (
      docSets +
      """, p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  len(list_intersect(a.sh, b.sh))::DOUBLE /
                    (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                     - len(list_intersect(a.sh, b.sh))::DOUBLE) AS jaccard
           FROM d a JOIN d b ON a.doc_id < b.doc_id
           WHERE len(a.sh) + len(b.sh) > 0
             AND len(list_intersect(a.sh, b.sh))::DOUBLE /
                   (len(a.sh)::DOUBLE + len(b.sh)::DOUBLE
                    - len(list_intersect(a.sh, b.sh))::DOUBLE) >= 0.8),
         nn AS (SELECT count(*)::BIGINT AS n FROM documents),
         h AS (
           SELECT id_a, id_b, jaccard, n,
                  CAST('0x' || substr(md5(id_a::VARCHAR || '_' ||
                    id_b::VARCHAR || '_neg'), 1, 15) AS BIGINT) % n AS h0
           FROM p, nn)
         SELECT id_a AS anchor, id_b AS positive,
                CASE WHEN h0 <> id_a AND h0 <> id_b THEN h0
                     WHEN (h0 + 1) % n <> id_a AND (h0 + 1) % n <> id_b
                       THEN (h0 + 1) % n
                     ELSE (h0 + 2) % n END AS negative,
                jaccard
         FROM h
         ORDER BY anchor, positive"""),
    "q115_substring_removal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
         wpos AS (
           SELECT doc_id, ws,
                  unnest(generate_series(1, len(ws) - 9)) AS i
           FROM w WHERE len(ws) >= 10),
         wins AS (
           SELECT doc_id, i, array_to_string(ws[i:i+9], ' ') AS span
           FROM wpos),
         dup AS (
           SELECT span, min(doc_id) AS canon FROM wins
           GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         cov AS (
           SELECT DISTINCT wi.doc_id, wi.i + g.o AS pos
           FROM wins wi JOIN dup d USING (span),
                generate_series(0, 9) g(o)
           WHERE wi.doc_id <> d.canon),
         toks AS (
           SELECT doc_id, unnest(ws) AS token,
                  unnest(generate_series(1, len(ws))) AS pos
           FROM w),
         kept AS (
           SELECT t.doc_id, t.pos, t.token FROM toks t
           WHERE NOT EXISTS (SELECT 1 FROM cov c
                             WHERE c.doc_id = t.doc_id AND c.pos = t.pos)),
         rebuilt AS (
           SELECT doc_id, count(*)::BIGINT AS n_after,
                  string_agg(token, ' ' ORDER BY pos) AS text_clean
           FROM kept GROUP BY doc_id)
         SELECT w.doc_id, len(w.ws)::BIGINT AS n_before,
                coalesce(r.n_after, 0)::BIGINT AS n_after,
                coalesce(r.text_clean, '') AS text_clean
         FROM w LEFT JOIN rebuilt r USING (doc_id)
         ORDER BY w.doc_id""",
    "q102_inverted_index" ->
      """WITH t AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents)
         SELECT term, count(DISTINCT doc_id)::BIGINT AS df,
                count(*)::BIGINT AS cf,
                array_to_string(
                  list_sort(list_distinct(list(doc_id)))[1:5], ',')
                  AS posting_head
         FROM t GROUP BY term
         ORDER BY df DESC, term LIMIT 50""",
    "q103_bm25_topk" -> {
      // one scoring term, instantiated per query term IN A FIXED
      // ORDER — the Spark side sums term scores in the same literal
      // expression order, so the double adds are bit-identical
      def termScore(t: String, i: Int): String =
        s"""((n_docs - df_$i + CAST(0.5 AS DOUBLE))
             / (df_$i + CAST(0.5 AS DOUBLE)))
            * (len(list_filter(ws, x -> x = '$t'))::DOUBLE
               * CAST(2.2 AS DOUBLE))
            / (len(list_filter(ws, x -> x = '$t'))::DOUBLE
               + CAST(1.2 AS DOUBLE)
                 * (CAST(0.25 AS DOUBLE)
                    + CAST(0.75 AS DOUBLE) * len(ws)::DOUBLE / avgdl))"""
      val terms = Seq("spark", "window", "hash")
      val scoreSum = terms.zipWithIndex
        .map { case (t, i) => termScore(t, i) }.mkString("(", " + ", ")")
      val dfSelects = terms.zipWithIndex.map { case (t, i) =>
        s"""sum(CASE WHEN list_contains(ws, '$t')
                THEN 1::BIGINT ELSE 0::BIGINT END)::BIGINT AS df_$i"""
      }.mkString(", ")
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
          st AS (SELECT count(*)::BIGINT AS n_docs,
                        CAST(sum(CAST(len(ws) AS DECIMAL(18,0))) AS DOUBLE)
                          / count(*) AS avgdl,
                        $dfSelects
                 FROM w)
          SELECT doc_id, len(ws) AS dl, round($scoreSum, 6) AS bm25
          FROM w, st
          ORDER BY bm25 DESC, doc_id LIMIT 20"""
    },
    "q104_rare_token_score" ->
      """WITH t AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         cf AS (SELECT term, count(*)::BIGINT AS cf FROM t GROUP BY term),
         tot AS (SELECT count(*)::BIGINT AS n_terms,
                        sum(cf)::BIGINT AS n_total FROM cf)
         SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
                count(CASE WHEN cf.cf * tot.n_terms < tot.n_total
                      THEN 1 END)::BIGINT AS n_rare,
                round(count(CASE WHEN cf.cf * tot.n_terms < tot.n_total
                            THEN 1 END)::DOUBLE
                      / count(*)::DOUBLE, 6) AS rare_frac
         FROM t JOIN cf USING (term), tot
         GROUP BY t.doc_id
         ORDER BY t.doc_id""")
}
