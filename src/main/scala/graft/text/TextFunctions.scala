package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (SURVEY.md §7.2 step 8): tokenization, shingling, quality/langid
  * heuristics, and portable content hashes. Everything is built-in
  * Catalyst expressions (split/transform/aggregate/md5/sha2) — no
  * UDFs — so the ops stay codegen-friendly and reproducible in the
  * DuckDB oracle.
  *
  * Cross-engine determinism: any hash that must match the oracle is
  * md5/sha2-derived (both engines agree bit-for-bit); xxhash64 is
  * used only engine-internally (MinHash signatures), where the oracle
  * checks the verified output, not the hashes.
  */
object TextFunctions {

  /** Whitespace tokenization (documents.text is space-separated). */
  def words(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles, order-preserving, 1-based like the
    * oracle's generate_series — empty when the doc has < n words.
    * One kernel pass (graft_shingles codegen Expression); the HOF
    * rendering ran n interpreted element_at lambdas per shingle. */
  def shingles(text: Column, n: Int = 3): Column =
    call_function("graft_shingles", text, lit(n))

  /** Portable 60-bit hash: first 15 hex chars of md5, base-16 → long.
    * Positive (< 2^60), identical in DuckDB via
    * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Exact token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** One-pass token/stopword/quality kernel (graft_text_stats codegen
    * Expression) — replaces the interpreted `aggregate`/`filter`
    * higher-order folds on the quality-gating hot path. Same
    * arithmetic, verified by the q24 oracle. */
  def textStats(text: Column): Column =
    call_function("graft_text_stats", text)

  /** BPE-ish subword count: each word contributes ceil(len/4) tokens —
    * a deterministic stand-in for a real BPE vocab (which would be a
    * lookup table broadcast to executors). */
  def bpeTokenCount(text: Column): Column =
    textStats(text).getField("n_bpe_tokens")

  /** English-ish stopword list used by quality scoring. Mirrored in
    * the TextStatsExpr kernel — keep in sync. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordHits(text: Column, stopwords: Seq[String] = stopwordsEn): Column =
    if (stopwords == stopwordsEn) textStats(text).getField("n_stopwords")
    else size(filter(words(text), w => w.isin(stopwords.map(lit): _*)))

  /** Document quality score in [0,1]: length saturation, lexical
    * diversity, stopword presence — the classic cheap pre-filters for
    * LLM corpus curation. Pure double arithmetic on exact ints →
    * bit-identical on both engines (kernel field; see TextStatsExpr). */
  def qualityScore(text: Column): Column =
    textStats(text).getField("quality_score")

  /** Tiny per-language stopword lists for the n-gram/stopword langid
    * heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** Language-ID heuristic: argmax of stopword hit counts with a
    * deterministic tiebreak (first list order wins; all-zero → "und").
    */
  def predictLang(text: Column): Column = {
    val scores = langStopwords.map { case (lang, stops) =>
      lang -> stopwordHits(text, stops)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Non-distinct word n-grams, order-preserving (unlike [[shingles]],
    * which dedupes — repetition measures need multiplicities). Same
    * one-pass kernel, distinct flag off. */
  def ngrams(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n), lit(false))

  /** Max multiplicity of any element: longest run of equal neighbours
    * in the sorted array, via one O(L log L) per-row fold — scan-
    * parallel, zero shuffles (the explode+groupBy rendering would
    * shuffle every n-gram of every document; per-doc lengths are
    * bounded, so the per-row fold is the 100 TB shape). */
  def maxMultiplicity(arr: Column): Column =
    aggregate(
      sort_array(arr),
      struct(
        lit(null).cast("string").as("prev"),
        lit(0L).as("run"),
        lit(0L).as("best")),
      (s, x) => {
        val run = when(s.getField("prev").isNotNull &&
          x === s.getField("prev"), s.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))

  /** Gopher-style repetition/shape signals (Rae et al. 2021, §A1.1 —
    * the published pre-filters for LLM corpus curation), adapted to
    * whitespace-token documents: duplicate-word fraction, top-bigram /
    * top-trigram fraction, mean word length, and the composite gate,
    * all computed in ONE pass by the graft_gopher_stats codegen
    * Expression (the HOF-fold rendering was the curation hot spot —
    * interpreted lambdas cost ~1.4 ms/doc; the kernel is ~10 µs/doc).
    * Still per-row and shuffle-free; DuckDB mirrors the arithmetic in
    * the q64 oracle. Fractions are 0 for docs too short to form the
    * n-gram. Multiple field extractions of the same input collapse to
    * one kernel call under codegen subexpression elimination. */
  def gopherStats(text: Column): Column =
    call_function("graft_gopher_stats", text)

  def dupWordFrac(text: Column): Column =
    gopherStats(text).getField("dup_word_frac")

  def topNgramFrac(text: Column, n: Int): Column = n match {
    case 2 => gopherStats(text).getField("top_bigram_frac")
    case 3 => gopherStats(text).getField("top_trigram_frac")
    case _ => // general form: the per-row sorted fold over word n-grams
      val g = ngrams(text, n)
      when(size(g) > 0,
        round(maxMultiplicity(g).cast("double") / size(g).cast("double"), 6))
        .otherwise(lit(0.0))
  }

  def meanWordLen(text: Column): Column =
    gopherStats(text).getField("mean_word_len")

  /** The composite Gopher gate at the published thresholds: mean word
    * length in [3,10], duplicate-word fraction ≤ 0.5, top-2-gram
    * fraction ≤ 0.18, top-3-gram fraction ≤ 0.16 (applied to the
    * 6-decimal-rounded stats, same as the oracle). */
  def passesGopher(text: Column): Column =
    gopherStats(text).getField("passes_gopher")

  /** Canonical text normalization — the curation front door: Unicode
    * NFC (composed/decomposed sequences unify — via the graft_nfc
    * codegen Expression, since Spark has no built-in normalizer),
    * lowercase, whitespace collapse, trim. Run BEFORE hashing/dedup
    * so byte-different renderings of the same text dedup together.
    * Mirrored in DuckDB by nfc_normalize for the q69 oracle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(call_function("graft_nfc", text)),
      "\\s+", " "))

  /** Full-content hash for exact dedup (sha2 like the reference's PII
    * masking, dynamic-data-processor.py:94). */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** Canonicalized content hash: sorted distinct words — catches
    * reordered/repeated word-soup dups that byte-exact hashing
    * misses. */
  def normalizedHash(text: Column): Column =
    sha2(array_join(sort_array(array_distinct(words(text))), " "), 256)

  /** Winnowing-style document fingerprint: lexicographic min of the
    * shingle md5s (stable under small edits away from the minimum). */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  /** 60-bit SimHash over the shingle set, from precomputed hash60
    * values: bit k is set iff the sum over shingles of ±1 (by bit k of
    * the shingle hash) is positive. Built as a SQL expression (the
    * DSL's shift functions only take literal shift amounts). */
  def simhash60(hashArrayCol: String): Column = {
    val h = hashArrayCol
    expr(
      s"""aggregate(
            transform(sequence(0, 59), k ->
              if(aggregate($h, 0L, (acc, v) ->
                   acc + if((shiftright(v, k) & 1) = 1, 1L, -1L)) > 0,
                 shiftleft(1L, k), 0L)),
            0L, (a, b) -> a + b)""")
  }
}
