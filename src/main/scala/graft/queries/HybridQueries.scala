package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.vector.VectorFunctions

/** Retrieval-fusion, governance-noise, and data-layout operators that
  * COMPOSE verified primitives (q103 BM25, q31 exact kNN, q136
  * zone-map manifests) into the pipeline stages an LLM data platform
  * runs on top of them:
  *
  *  - q139: hybrid sparse+dense retrieval with reciprocal-rank fusion
  *    (the standard RAG retrieval stack: BM25 candidates ∪ embedding
  *    candidates, fused by 1/(60+rank) — Cormack et al., SIGIR'09).
  *  - q140: differentially-private group counts via the geometric
  *    mechanism (Ghosh–Roughgarden–Sundararajan, STOC'09) with
  *    INTEGER-ONLY noise sampling — engine-exact, so the privacy
  *    transform itself is oracle-verifiable.
  *  - q141: Z-order (Morton) multi-dimensional clustering vs linear
  *    sort, judged by the zone-map skipping power of the resulting
  *    file layout — the Delta/Iceberg OPTIMIZE ZORDER story, measured
  *    rather than asserted.
  */
object HybridQueries {

  type Fn = (SparkSession, String) => DataFrame

  // ---- shared BM25 scoring (mirrors q103 exactly: rational idf, the
  // same literal term order so the double adds are bit-identical) ----

  private val RrfTerms = Seq("spark", "window", "hash")

  /** (docs with ws/dl, broadcast 1-row stats) → per-doc bm25 Column.
    * Kept private to q139; q103 retains its own inline copy so its
    * verified body is untouched. */
  private def bm25Scored(docs: DataFrame): DataFrame = {
    val dfCols = RrfTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("w"), t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val statCols = Seq(
      (sum(col("dl").cast("decimal(18,0)")).cast("double") / count(lit(1)))
        .as("avgdl")) ++ dfCols
    val stats = docs.agg(count(lit(1)).as("n_docs"), statCols: _*)
    val score = RrfTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("w"), x => x === lit(t))).cast("double")
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
    }.reduce(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("bm25"))
  }

  // ---- oracle-side mirrors ----

  private def dotDec(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
          i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"""

  private def cosSql(av: String, bv: String): String =
    s"${dotDec(av, bv)} / (sqrt(${dotDec(av, av)}) * sqrt(${dotDec(bv, bv)}))"

  private def bm25SqlCtes: String = {
    def termScore(t: String, i: Int): String =
      s"""((n_docs - df_$i + CAST(0.5 AS DOUBLE))
           / (df_$i + CAST(0.5 AS DOUBLE)))
          * (len(list_filter(ws, x -> x = '$t'))::DOUBLE
             * CAST(2.2 AS DOUBLE))
          / (len(list_filter(ws, x -> x = '$t'))::DOUBLE
             + CAST(1.2 AS DOUBLE)
               * (CAST(0.25 AS DOUBLE)
                  + CAST(0.75 AS DOUBLE) * len(ws)::DOUBLE / avgdl))"""
    val scoreSum = RrfTerms.zipWithIndex
      .map { case (t, i) => termScore(t, i) }.mkString("(", " + ", ")")
    val dfSelects = RrfTerms.zipWithIndex.map { case (t, i) =>
      s"""sum(CASE WHEN list_contains(ws, '$t')
              THEN 1::BIGINT ELSE 0::BIGINT END)::BIGINT AS df_$i"""
    }.mkString(", ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents),
        st AS (SELECT count(*)::BIGINT AS n_docs,
                      CAST(sum(CAST(len(ws) AS DECIMAL(18,0))) AS DOUBLE)
                        / count(*) AS avgdl,
                      $dfSelects
               FROM w),
        sparse AS (SELECT doc_id, $scoreSum AS bm25 FROM w, st)"""
  }

  /** Geometric-mechanism DP group counts, parameterized by the
    * release salt. `salt` is the privacy boundary: a SECRET fresh
    * value per release gives ε = ln 2 discrete-Laplace counts; a
    * fixed public value (the q140 test harness) gives a
    * deterministic, oracle-replayable rendering with NO privacy.
    * One hash aggregate (group count bounded by langs × sources);
    * the noise is a projection. */
  def dpGroupCounts(docs: DataFrame, salt: String): DataFrame = {
    def h32(tag: String): Column =
      conv(substring(md5(concat(col("lang"), lit("|"), col("source"),
        lit(salt + tag))), 1, 8), 16, 10).cast("long")
    docs
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_exact"))
      .withColumn("noise",
        (length(bin(h32("2"))) - length(bin(h32("1"))))
          .cast("long"))
      .select(col("lang"), col("source"),
        greatest(lit(0L), col("n_exact") + col("noise")).as("n_dp"))
      .orderBy(col("lang"), col("source"))
  }

  // ---- q141 Morton interleave: 6 bits of x with 6 bits of y.
  // Integer shifts/masks only — identical on both engines; the SQL
  // rendering is generated from the same loop so the term list is
  // literally the same arithmetic. ----

  private val MortonBits = 6

  private def mortonCol(x: Column, y: Column): Column =
    (0 until MortonBits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1)) * lit(1 << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1)) * lit(1 << (2 * i + 1))
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until MortonBits).map { i =>
      s"(($x >> $i) & 1) * ${1 << (2 * i)} + " +
        s"(($y >> $i) & 1) * ${1 << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  val queries: Map[String, Fn] = Map(
    // Hybrid retrieval with reciprocal-rank fusion: BM25 top-20 (the
    // q103 scorer verbatim — corpus stats ride in as one broadcast
    // 1-row frame, scoring is a pure scan, top-k is
    // TakeOrderedAndProject) ∪ dense top-20 (q31's brute-force kNN
    // with the embedding of vec_id 0 as the query — the exactness
    // baseline; at corpus scale the dense leg swaps to the IVF probe
    // (q40/q137) without touching the fusion), fused by
    // rrf = Σ 1/(60+rank). Ranks are assigned on the bounded 20-row
    // top-k sets, so the only windows run on ≤ 20 rows; absent legs
    // contribute 0 (rank reported as 0). 1/(60+r) is one IEEE divide
    // of exactly-representable operands — bit-identical across
    // engines, no rounding needed.
    "q139_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .withColumn("dl", size($"w"))
      val sparseTop = bm25Scored(docs)
        .orderBy($"bm25".desc, $"doc_id").limit(20)
        .withColumn("sparse_rank",
          row_number().over(Window.orderBy($"bm25".desc, $"doc_id")))
        .select($"doc_id".as("id"), $"sparse_rank")
      val emb = Tables.table(s, dir, "embeddings")
      val denseTop = VectorFunctions.knnBruteForce(
        emb.filter($"vec_id" === 0)
          .withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"), k = 20)
        .select($"neighbor_id".as("id"), $"rank".as("dense_rank"))
      sparseTop.join(denseTop, Seq("id"), "full_outer")
        .select($"id",
          coalesce($"sparse_rank", lit(0)).as("sparse_rank"),
          coalesce($"dense_rank", lit(0)).as("dense_rank"),
          (coalesce(lit(1.0) / (lit(60.0) + $"sparse_rank".cast("double")),
            lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + $"dense_rank".cast("double")),
              lit(0.0))).as("rrf"))
        .orderBy($"rrf".desc, $"id")
        .limit(10)
    }),

    // q139 with the dense leg swapped from the brute-force kNN scan
    // to the IVF probe — the swap q139's comment promises, landed:
    // the flagship RAG retrieval stack is now index-backed
    // end-to-end. Fit/assign/probe are q137's adaptive-cells
    // machinery over the raw embedding space (cells ≈ √n by integer
    // bit-length, nprobe rides cells/4 clamped to [2,8]); the fusion
    // and the sparse BM25 leg are q139's verbatim. Per query the
    // dense scan touches ~nprobe/cells of the corpus instead of all
    // of it; ranks differ from q139 only where the probe misses a
    // true top-20 neighbor (recall bounded in IvfIndexSpec), and the
    // output is still a pure function of the data, so the oracle
    // replays fit→assign→probe→rank→fusion end to end.
    "q142_hybrid_rrf_ivf" -> ((s, dir) => {
      import s.implicits._
      import graft.vector.Ivf
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("w"))
        .withColumn("dl", size($"w"))
      val sparseTop = bm25Scored(docs)
        .orderBy($"bm25".desc, $"doc_id").limit(20)
        .withColumn("sparse_rank",
          row_number().over(Window.orderBy($"bm25".desc, $"doc_id")))
        .select($"doc_id".as("id"), $"sparse_rank")
      // fanout: the fit/assign scans are cells × 64-dim dot products
      // per row over a single-row-group local file — spread them
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val n = emb.count()
      val bits = if (n <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
      val cells = 1 << math.max(4, math.min(12, bits / 2))
      val nprobe = math.min(8, math.max(2, cells / 4))
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = cells,
        iters = 1)
      val assigned = Ivf.assign(
        emb.withColumnRenamed("vec_id", "neighbor_id"), model)
      val denseTop = Ivf.searchAssigned(
        emb.filter($"vec_id" === 0).withColumnRenamed("vec_id", "query_id"),
        assigned, model, k = 20, nprobe = nprobe)
        .select($"neighbor_id".as("id"), $"rank".as("dense_rank"))
      sparseTop.join(denseTop, Seq("id"), "full_outer")
        .select($"id",
          coalesce($"sparse_rank", lit(0)).as("sparse_rank"),
          coalesce($"dense_rank", lit(0)).as("dense_rank"),
          (coalesce(lit(1.0) / (lit(60.0) + $"sparse_rank".cast("double")),
            lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + $"dense_rank".cast("double")),
              lit(0.0))).as("rrf"))
        .orderBy($"rrf".desc, $"id")
        .limit(10)
    }),

    // Differentially-private per-(lang, source) release counts via
    // the geometric mechanism: noise = lz(h₁) − lz(h₂) where lz is
    // the 32-bit leading-zero count of an MD5-derived hash —
    // P(lz = k) = 2^−(k+1), so the difference is two-sided geometric
    // with p = 1/2, i.e. the discrete-Laplace mechanism at ε = ln 2
    // for a sensitivity-1 count. The sampling is INTEGER-ONLY
    // (md5 → hex slice → bit length; never exp/log floats), so the
    // DuckDB oracle replays the released values bit-for-bit — the
    // privacy transform itself is under the correctness gate, which
    // is exactly what a governance pipeline wants pinned.
    //
    // CAVEAT (do not read the green row as a DP guarantee): q140
    // passes FIXED salts, so the noise is exactly recomputable from
    // the public (lang, source) keys — a deterministic REPLAY
    // HARNESS, not a private release. [[dpGroupCounts]] takes the
    // salt as a parameter precisely so production calls it with a
    // SECRET fresh salt per release (same plan, same mechanism);
    // only then does the ε = ln 2 guarantee hold against readers.
    "q140_dp_group_counts" -> ((s, dir) =>
      dpGroupCounts(Tables.table(s, dir, "documents"), salt = "_dp")),

    // Z-order layout, measured: cluster lineitem rows into files by
    // the Morton interleave of two query dimensions (x = quantity,
    // 6 bits; y = partkey mod 64, 6 bits) vs a linear sort on x
    // alone, then build the q136-style zone-map manifest for BOTH
    // layouts and evaluate a 2-D probe (x∈[10,19] ∧ y∈[20,29])
    // against each file's (min,max) box. Files are Morton-PREFIX
    // ranges (morton >> 7 → 32 files; linear: x >> 1), so layout
    // assignment is a pure projection + one hash aggregate — no
    // global sort is needed to SIMULATE the layout, while at write
    // time the same prefix is the range-partition key
    // (repartitionByRange(morton) → sortWithinPartitions), i.e. the
    // standard OPTIMIZE ZORDER write path. The manifest shows what a
    // 100 TB scan planner sees: under linear layout only the x
    // predicate prunes (min_y/max_y spans the full domain in every
    // file); under Z-order BOTH bounds are tight, so the probe reads
    // a handful of files (ZOrderSpec asserts strictly more skipped
    // files than linear).
    "q141_zorder_layout" -> ((s, dir) => {
      import s.implicits._
      val b = Tables.table(s, dir, "lineitem")
        .select($"l_quantity".cast("int").as("x"),
          ($"l_partkey" % 64).cast("int").as("y"))
      val z = b.withColumn("file_id",
        shiftright(mortonCol($"x", $"y"), 7))
        .withColumn("layout", lit("zorder"))
      val l = b.withColumn("file_id", shiftright($"x", 1))
        .withColumn("layout", lit("linear"))
      z.unionByName(l)
        .groupBy($"layout", $"file_id")
        .agg(count(lit(1)).as("n_rows"),
          min($"x").as("min_x"), max($"x").as("max_x"),
          min($"y").as("min_y"), max($"y").as("max_y"))
        .withColumn("skip_probe",
          $"max_x" < 10 || $"min_x" > 19 ||
            $"max_y" < 20 || $"min_y" > 29)
        .orderBy($"layout", $"file_id")
    }))

  val oracles: Map[String, String] = Map(
    // Sparse leg = q103's CTEs verbatim; dense leg = q31's scored
    // shape with vec_id 0 as the query; both ranked inside their
    // bounded top-20, full-outer fused on the shared id space.
    "q139_hybrid_rrf" ->
      s"""WITH $bm25SqlCtes,
          stop AS (
            SELECT doc_id AS id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id)
                     AS sparse_rank
            FROM sparse ORDER BY bm25 DESC, doc_id LIMIT 20),
          q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
          scored AS (
            SELECT e.vec_id AS id, ${cosSql("q.qv", "e.embedding")} AS cosine
            FROM embeddings e, q WHERE e.vec_id <> 0),
          dtop AS (
            SELECT id,
                   row_number() OVER (ORDER BY cosine DESC, id)
                     AS dense_rank
            FROM scored ORDER BY cosine DESC, id LIMIT 20),
          fused AS (
            SELECT coalesce(s.id, d.id) AS id,
                   coalesce(s.sparse_rank, 0) AS sparse_rank,
                   coalesce(d.dense_rank, 0) AS dense_rank,
                   coalesce(CAST(1.0 AS DOUBLE)
                              / (CAST(60.0 AS DOUBLE) + s.sparse_rank::DOUBLE),
                            CAST(0.0 AS DOUBLE))
                 + coalesce(CAST(1.0 AS DOUBLE)
                              / (CAST(60.0 AS DOUBLE) + d.dense_rank::DOUBLE),
                            CAST(0.0 AS DOUBLE)) AS rrf
            FROM stop s FULL OUTER JOIN dtop d ON s.id = d.id)
          SELECT id, sparse_rank, dense_rank, rrf
          FROM fused ORDER BY rrf DESC, id LIMIT 10""",

    // Sparse leg + fusion = q139's CTEs verbatim; dense leg = q40's
    // Lloyd replay (adaptive-cells form, VectorQueries.
    // lloydCtesAdaptive) with the probe restricted to vec_id 0,
    // nprobe = clamp(2..8, cells/4) from the same nc CTE, top-20.
    "q142_hybrid_rrf_ivf" ->
      s"""WITH $bm25SqlCtes,
          stop AS (
            SELECT doc_id AS id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id)
                     AS sparse_rank
            FROM sparse ORDER BY bm25 DESC, doc_id LIMIT 20),
          ${VectorQueries.lloydCtesAdaptive},
          corpus AS (
            SELECT vec_id AS neighbor_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1) WHERE rn = 1),
          qprobe AS (
            SELECT vec_id AS query_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1 WHERE vec_id = 0), nc
            WHERE rn <= least(8, greatest(2, nc.cells // 4))),
          dscored AS (
            SELECT q.query_id, c.neighbor_id,
                   ${cosSql("eq.embedding", "ec.embedding")} AS cosine
            FROM qprobe q JOIN corpus c USING (cell)
            JOIN embeddings eq ON eq.vec_id = q.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id
            WHERE c.neighbor_id <> q.query_id),
          dtop AS (
            SELECT neighbor_id AS id,
                   row_number() OVER (ORDER BY cosine DESC, neighbor_id)
                     AS dense_rank
            FROM dscored ORDER BY cosine DESC, neighbor_id LIMIT 20),
          fused AS (
            SELECT coalesce(s.id, d.id) AS id,
                   coalesce(s.sparse_rank, 0) AS sparse_rank,
                   coalesce(d.dense_rank, 0) AS dense_rank,
                   coalesce(CAST(1.0 AS DOUBLE)
                              / (CAST(60.0 AS DOUBLE) + s.sparse_rank::DOUBLE),
                            CAST(0.0 AS DOUBLE))
                 + coalesce(CAST(1.0 AS DOUBLE)
                              / (CAST(60.0 AS DOUBLE) + d.dense_rank::DOUBLE),
                            CAST(0.0 AS DOUBLE)) AS rrf
            FROM stop s FULL OUTER JOIN dtop d ON s.id = d.id)
          SELECT id, sparse_rank, dense_rank, rrf
          FROM fused ORDER BY rrf DESC, id LIMIT 10""",

    // md5 → first 8 hex chars → 32-bit int → bit length: the same
    // integer pipeline as the body (CAST('0x…' AS BIGINT) == Java
    // MessageDigest bytes; length(bin(n)) == 64 −
    // numberOfLeadingZeros for n > 0, and both engines render
    // bin(0) = '0').
    "q140_dp_group_counts" ->
      """WITH g AS (
           SELECT lang, source, count(*)::BIGINT AS n_exact
           FROM documents GROUP BY lang, source),
         n AS (
           SELECT lang, source, n_exact,
                  length(bin(CAST('0x' ||
                    substr(md5(lang || '|' || source || '_dp2'), 1, 8)
                    AS BIGINT)))
                - length(bin(CAST('0x' ||
                    substr(md5(lang || '|' || source || '_dp1'), 1, 8)
                    AS BIGINT))) AS noise
           FROM g)
         SELECT lang, source,
                greatest(0::BIGINT, n_exact + noise)::BIGINT AS n_dp
         FROM n ORDER BY lang, source""",

    "q141_zorder_layout" ->
      s"""WITH b AS (
            SELECT CAST(l_quantity AS INTEGER) AS x,
                   CAST(l_partkey % 64 AS INTEGER) AS y
            FROM lineitem),
          u AS (
            SELECT 'zorder' AS layout,
                   ${mortonSql("x", "y")} >> 7 AS file_id, x, y
            FROM b
            UNION ALL
            SELECT 'linear' AS layout, x >> 1 AS file_id, x, y
            FROM b),
          zm AS (
            SELECT layout, file_id, count(*)::BIGINT AS n_rows,
                   min(x) AS min_x, max(x) AS max_x,
                   min(y) AS min_y, max(y) AS max_y
            FROM u GROUP BY layout, file_id)
          SELECT layout, file_id, n_rows, min_x, max_x, min_y, max_y,
                 (max_x < 10 OR min_x > 19 OR max_y < 20 OR min_y > 29)
                   AS skip_probe
          FROM zm ORDER BY layout, file_id""")
}
