package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.vector.{Ivf, VectorFunctions}

/** Vector-similarity query surface over the embeddings table
  * (LLM-pipeline extensions): exact brute-force kNN as the verified
  * baseline, LSH-bucketed ANN as the scale path, cosine near-dup
  * pairs.
  */
object VectorQueries {
  import Q._

  /** Oracle-side dot product mirroring VectorFunctions.dotExact: the
    * same left-fold order over the same double products → identical
    * bits. */
  private def dotDec(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, 64),
          i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"""

  private def cosSql(av: String, bv: String): String =
    s"${dotDec(av, bv)} / (sqrt(${dotDec(av, av)}) * sqrt(${dotDec(bv, bv)}))"

  /** Shared oracle prefix: exact replay of the deterministic k-means
    * step both SemDedup.keep and Ivf.fit(iters = 1) perform — init =
    * first `cells` vectors by id, one Lloyd iteration with
    * DECIMAL(30,15)-exact means (order-independent, so partitioning
    * never shows in the bits). Scores are the same left-fold
    * v·c − ‖c‖²/2 the IvfTopCells codegen loop computes, ties toward
    * the larger cell id. Ends at `s1` = (vec_id, cell, score) against
    * the post-Lloyd centroids; callers append their own assignment /
    * probe CTEs. */
  /** The ADAPTIVE-cells rendering of [[lloydCtes]] (q94): the cell
    * count is 2^clamp(4..12, bitlen(n)/2) ≈ √n, computed by integer
    * bit-length on both engines (length(bin(count(*))) here, Long
    * bit-length in the query body — never float log). Only the `nc` +
    * `init` CTEs differ from the fixed form; everything downstream is
    * cell-count-independent. */
  private[queries] def lloydCtesAdaptive: String =
    s"""nc AS (
            SELECT CAST(1::BIGINT <<
                     greatest(4, least(12, length(bin(count(*))) // 2))
                   AS INTEGER) AS cells
            FROM embeddings),
          init AS (
            SELECT CAST(rn - 1 AS INTEGER) AS cell,
                   list_transform(embedding, x -> x::DOUBLE) AS cent
            FROM (SELECT embedding,
                         row_number() OVER (ORDER BY vec_id) AS rn
                  FROM embeddings), nc
            WHERE rn <= nc.cells),
          hn0 AS (
            SELECT cell, cent,
                   list_reduce(list_transform(cent, x -> x * x),
                     (a, b) -> a + b) / 2.0 AS hn
            FROM init),
          s0 AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, 64),
                     j -> e.embedding[j]::DOUBLE * c.cent[j]),
                     (a, b) -> a + b) - c.hn AS score
            FROM embeddings e, hn0 c),
          a0 AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s0) WHERE rn = 1),
          means AS (
            SELECT a0.cell, g.j AS pos,
                   CAST(sum(CAST(e.embedding[g.j] AS DECIMAL(30,15)))
                     AS DOUBLE) / count(*) AS m
            FROM a0 JOIN embeddings e USING (vec_id),
                 generate_series(1, 64) g(j)
            GROUP BY a0.cell, g.j),
          c1 AS (
            SELECT i.cell, coalesce(mm.cent, i.cent) AS cent
            FROM init i LEFT JOIN (
              SELECT cell, list(m ORDER BY pos) AS cent
              FROM means GROUP BY cell) mm USING (cell)),
          hn1 AS (
            SELECT cell, cent,
                   list_reduce(list_transform(cent, x -> x * x),
                     (a, b) -> a + b) / 2.0 AS hn
            FROM c1),
          s1 AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, 64),
                     j -> e.embedding[j]::DOUBLE * c.cent[j]),
                     (a, b) -> a + b) - c.hn AS score
            FROM embeddings e, hn1 c)"""

  /** [[lloydCtesAdaptive]] generalized to SPLIT fit and score
    * relations: the model (adaptive cell count, init, Lloyd means) is
    * fit over `fitRel` only, while `s1` scores every vector of
    * `scoreRel` against the post-Lloyd centroids — the oracle shape
    * for INCREMENTAL index maintenance (q143), where an append batch
    * is assigned under a model it never trained. The classic form is
    * the (embeddings, embeddings) instance. */
  private[graft] def lloydCtesSplit(fitRel: String,
      scoreRel: String, pfx: String = ""): String =
    s"""${pfx}nc AS (
            SELECT CAST(1::BIGINT <<
                     greatest(4, least(12, length(bin(count(*))) // 2))
                   AS INTEGER) AS cells
            FROM $fitRel),
          ${pfx}init AS (
            SELECT CAST(rn - 1 AS INTEGER) AS cell,
                   list_transform(embedding, x -> x::DOUBLE) AS cent
            FROM (SELECT embedding,
                         row_number() OVER (ORDER BY vec_id) AS rn
                  FROM $fitRel), ${pfx}nc
            WHERE rn <= ${pfx}nc.cells),
          ${pfx}hn0 AS (
            SELECT cell, cent,
                   list_reduce(list_transform(cent, x -> x * x),
                     (a, b) -> a + b) / 2.0 AS hn
            FROM ${pfx}init),
          ${pfx}s0 AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, 64),
                     j -> e.embedding[j]::DOUBLE * c.cent[j]),
                     (a, b) -> a + b) - c.hn AS score
            FROM $fitRel e, ${pfx}hn0 c),
          ${pfx}a0 AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM ${pfx}s0) WHERE rn = 1),
          ${pfx}means AS (
            SELECT ${pfx}a0.cell, g.j AS pos,
                   CAST(sum(CAST(e.embedding[g.j] AS DECIMAL(30,15)))
                     AS DOUBLE) / count(*) AS m
            FROM ${pfx}a0 JOIN $fitRel e USING (vec_id),
                 generate_series(1, 64) g(j)
            GROUP BY ${pfx}a0.cell, g.j),
          ${pfx}c1 AS (
            SELECT i.cell, coalesce(mm.cent, i.cent) AS cent
            FROM ${pfx}init i LEFT JOIN (
              SELECT cell, list(m ORDER BY pos) AS cent
              FROM ${pfx}means GROUP BY cell) mm USING (cell)),
          ${pfx}hn1 AS (
            SELECT cell, cent,
                   list_reduce(list_transform(cent, x -> x * x),
                     (a, b) -> a + b) / 2.0 AS hn
            FROM ${pfx}c1),
          ${pfx}s1 AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, 64),
                     j -> e.embedding[j]::DOUBLE * c.cent[j]),
                     (a, b) -> a + b) - c.hn AS score
            FROM $scoreRel e, ${pfx}hn1 c)"""

  private def lloydCtes(cells: Int): String =
    s"""init AS (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
                     AS cell,
                   list_transform(embedding, x -> x::DOUBLE) AS cent
            FROM (SELECT vec_id, embedding FROM embeddings
                  ORDER BY vec_id LIMIT $cells)),
          hn0 AS (
            SELECT cell, cent,
                   list_reduce(list_transform(cent, x -> x * x),
                     (a, b) -> a + b) / 2.0 AS hn
            FROM init),
          s0 AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, 64),
                     j -> e.embedding[j]::DOUBLE * c.cent[j]),
                     (a, b) -> a + b) - c.hn AS score
            FROM embeddings e, hn0 c),
          a0 AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s0) WHERE rn = 1),
          means AS (
            SELECT a0.cell, g.j AS pos,
                   CAST(sum(CAST(e.embedding[g.j] AS DECIMAL(30,15)))
                     AS DOUBLE) / count(*) AS m
            FROM a0 JOIN embeddings e USING (vec_id),
                 generate_series(1, 64) g(j)
            GROUP BY a0.cell, g.j),
          c1 AS (
            SELECT i.cell, coalesce(mm.cent, i.cent) AS cent
            FROM init i LEFT JOIN (
              SELECT cell, list(m ORDER BY pos) AS cent
              FROM means GROUP BY cell) mm USING (cell)),
          hn1 AS (
            SELECT cell, cent,
                   list_reduce(list_transform(cent, x -> x * x),
                     (a, b) -> a + b) / 2.0 AS hn
            FROM c1),
          s1 AS (
            SELECT e.vec_id, c.cell,
                   list_reduce(list_transform(generate_series(1, 64),
                     j -> e.embedding[j]::DOUBLE * c.cent[j]),
                     (a, b) -> a + b) - c.hn AS score
            FROM embeddings e, hn1 c)"""

  val queries: Map[String, Fn] = Map(
    // Exact cosine top-5 for the first 20 vectors as queries, brute
    // force over the corpus: the correctness baseline every ANN method
    // is judged against. Queries are broadcast; the corpus scan is
    // shuffle-free until the per-query top-k.
    "q31_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      VectorFunctions.knnBruteForce(
        emb.filter($"vec_id" < 20).withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"),
        k = 5)
        .orderBy($"query_id", $"rank")
    }),

    // Embedding drift monitor: per-label centroid vs the global
    // centroid, by cosine — the "did this slice of the corpus move?"
    // check an embedding pipeline runs per refresh. Means are DYADIC
    // fixed-point: floor(v·2⁴⁰) per element (exact IEEE multiply by a
    // power of two + floor — deterministic on both engines, unlike a
    // float→DECIMAL cast, which DuckDB routes through the float's
    // ~7-digit decimal rendering: fine for q40's probe-cell CHOICE,
    // a 1e-8 hash break when the centroid is the OUTPUT), summed as
    // exact integers (order-independent), divided back. Centroids
    // assemble in dim order; the cosine folds left-to-right matching
    // the oracle. Two hash aggregates, dim-bounded output.
    "q133_embedding_drift" -> ((s, dir) => {
      import s.implicits._
      val sc40 = (1L << 40).toDouble
      val d = Tables.table(s, dir, "embeddings")
        .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      def centroid(df: org.apache.spark.sql.DataFrame,
          keys: Seq[org.apache.spark.sql.Column]) = df
        .groupBy((keys :+ $"pos"): _*)
        .agg((sum(floor($"v".cast("double") * lit(sc40))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / lit(sc40) / count(lit(1))).as("c"))
        .groupBy(keys: _*)
        .agg(array_sort(collect_list(struct($"pos", $"c"))).as("pc"))
        .select((keys :+ expr("transform(pc, x -> x.c)").as("cv")): _*)
      val lv = centroid(d, Seq($"label"))
      val gv = centroid(d.select(lit(0).as("g"), $"pos", $"v"), Seq($"g"))
        .select($"cv".as("gcv"))
      val nn = Tables.table(s, dir, "embeddings")
        .groupBy($"label").agg(count(lit(1)).as("n"))
      lv.join(nn, "label").crossJoin(broadcast(gv))
        .select($"label", $"n",
          VectorFunctions.cosine($"cv", $"gcv").as("drift_cosine"))
        .orderBy($"label")
    }),

    // Matryoshka truncation audit: how much top-10 retrieval quality
    // survives using only the first 16 of 64 dims (the MRL deploy
    // question — a 4× cheaper index)? Per query (bounded slice,
    // vec_id % 25): |top-10 by full cosine ∩ top-10 by truncated
    // cosine|. Both searches are the q31 bounded-broadcast shape;
    // the overlap join is per-query over ≤ 10 rows each side. At
    // scale the truncated side is the one you'd index (q33/q40) —
    // this audit is what justifies that swap.
    "q128_matryoshka_recall" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      val q = emb.filter($"vec_id" % 25 === 0)
      val fullTop = VectorFunctions.knnBruteForce(
        q.withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"), k = 10)
      val truncTop = VectorFunctions.knnBruteForce(
        q.select($"vec_id".as("query_id"),
          slice($"embedding", 1, 16).as("embedding")),
        emb.select($"vec_id".as("neighbor_id"),
          slice($"embedding", 1, 16).as("embedding")), k = 10)
      val overlap = fullTop.select($"query_id", $"neighbor_id")
        .join(truncTop.select($"query_id", $"neighbor_id"),
          Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_overlap"))
      q.select($"vec_id".as("query_id"))
        .join(overlap, Seq("query_id"), "left")
        .select($"query_id",
          coalesce($"n_overlap", lit(0L)).as("n_overlap"))
        .orderBy($"query_id")
    }),

    // Embedding near-duplicate pairs at cosine ≥ 0.45 (the planted
    // similarity level in the testdata). Exact output; the double
    // prefilter inside cosineNearDupPairs only skips pairs that
    // cannot reach the threshold.
    // Model-based quality gate: a frozen linear classifier
    // (fastText-style) scored per vector as one codegen dot product
    // with a LITERAL weight vector — the model rides inside the plan,
    // nothing joins, nothing shuffles; the keep decision is
    // logit ≥ 0 (≡ sigmoid ≥ 0.5 without exp(), whose last-ulp
    // behaviour differs across engines). Weights are sixteenths —
    // exactly representable in float AND double, so the fold is
    // bit-identical on both engines.
    "q77_classifier_gate" -> ((s, dir) => {
      import s.implicits._
      val w = array((1 to 64).map(i =>
        lit((((i * 37) % 13) - 6) / 16.0)): _*)
      Tables.table(s, dir, "embeddings")
        .select($"vec_id", $"label",
          round(VectorFunctions.dotExact($"embedding", w) + lit(0.25), 6)
            .as("logit"))
        .filter($"logit" >= 0.0)
        .orderBy($"vec_id")
    }),

    // Affine int8 quantization of the embedding column: fit per-dim
    // [min,max] (one bounded aggregate), quantize every vector to 4×
    // smaller int8 codes — the standard ANN compression step (scan
    // int8, exact-rescore survivors in float). Floor-based (round
    // half-up vs half-even differs across engines); ranges ride as
    // plan literals, scan-parallel. The codes are emitted as one
    // comma-joined string column: the driver's pandas compare sorts
    // raw columns, and a numpy-array cell is unhashable there (the
    // r1 q34 / r3 q85 failure class) — a scalar string is not.
    "q85_quantize_int8" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      val (mins, maxs) = VectorFunctions.fitQuantizer(emb, "embedding")
      emb.select($"vec_id",
          array_join(
            VectorFunctions.quantizeInt8($"embedding", mins, maxs), ",")
            .as("qvec"))
        .orderBy($"vec_id")
    }),

    "q32_embedding_neardup" -> ((s, dir) => {
      import s.implicits._
      VectorFunctions.cosineNearDupPairs(
        Tables.table(s, dir, "embeddings"), "vec_id", "embedding", 0.45)
        .orderBy($"id_a", $"id_b")
    }),

    // SemDeDup (Abbas et al. 2023): semantic dedup via k-means cells
    // + shared-cell cosine pairs — the published scale path for q32's
    // exact all-pairs baseline (cell equi-join, Σ|cell|² work, never
    // n²). Multi-probe assignment (top-3 cells) catches boundary
    // pairs; min-id representative per dup relation. The shared-cell
    // restriction is approximate vs the all-pairs set (recall bounded
    // in SemDedupSpec), but the KEPT MANIFEST ITSELF is a pure
    // function of the data: deterministic init (first `cells` vectors
    // by id), one decimal-exact Lloyd iteration, tie-stable argmax —
    // so the DuckDB oracle replays fit→assign→pair→anti-join
    // bit-for-bit and the flagship semantic-dedup operator is
    // hash-verified like q28/q30.
    // ADAPTIVE cell count (the ×50 sweep finding, r7): with cells
    // FIXED at 16, occupancy grows linearly in n and the Σ|cell|²
    // pair join grows quadratically — sf5 measured 61× at ×50 data,
    // the q122 fixed-planes bug one level up. cells ≈ √n balances
    // the fit scan (n·cells) against the pair join (n²/cells) — both
    // terms n^1.5 — rounded to a power of two by INTEGER bit-length
    // (cells = 2^clamp(4..12, bitlen(n)/2); no float log, DuckDB
    // replays the choice via length(bin(count(*)))). At the driver
    // SFs n = 500 → 16, so the verified output is unchanged.
    "q94_semdedup" -> ((s, dir) => {
      import s.implicits._
      val n = Tables.table(s, dir, "embeddings").count()
      val bits = if (n <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
      val cells = 1 << math.max(4, math.min(12, bits / 2))
      val emb = fanout(Tables.table(s, dir, "embeddings"))
      graft.vector.SemDedup.keep(emb, "vec_id", "embedding",
        cells = cells, threshold = 0.45, probes = 3)
        .orderBy($"vec_id")
    }),

    // IVF ANN (approximate RECALL — bounded vs brute force in
    // IvfIndexSpec) whose OUTPUT is nonetheless a pure function of the
    // data: deterministic init, one decimal-exact Lloyd step,
    // tie-stable cell argmax, exact cosines over the probed cells —
    // so the DuckDB oracle replays fit→assign→probe→rank bit-for-bit
    // (same structure as q94).
    "q40_ann_ivf_topk" -> ((s, dir) => {
      import s.implicits._
      // fanout: the assignment scans (fit means + index build) are
      // 16-cell × 64-dim dot products per row — spread them
      val emb = fanout(Tables.table(s, dir, "embeddings"))
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = 16, iters = 1)
      // index build once (the cached corpus assignment), then search
      val assigned = Ivf.assign(
        emb.withColumnRenamed("vec_id", "neighbor_id"), model)
        .localCheckpoint()
      Ivf.searchAssigned(
        emb.filter($"vec_id" < 20).withColumnRenamed("vec_id", "query_id"),
        assigned, model, k = 5, nprobe = 4)
        .orderBy($"query_id", $"rank")
    }),

    // FILTERED ANN — metadata-constrained vector search (the
    // pgvector/Qdrant "filter + top-k" staple the ANN family lacked):
    // neighbors must satisfy a predicate (here: share the query's
    // label — the multi-tenant / same-language constraint). The
    // filter is pushed INTO the candidate join as a second equi-key
    // (cell AND label), so selectivity cuts candidate volume before
    // any cosine is computed — at 100 TB the index is written
    // partitioned by (cell, label) and a filtered probe reads
    // nprobe·(1/|labels|) of the corpus; post-filtering after an
    // unfiltered ANN would instead LOSE recall (filtered-out
    // neighbors consume top-k slots). The exact filtered top-5 rides
    // in-row (label equality makes it an equi-join too, never a
    // product) with per-query recall — self-evaluating like q144.
    "q312_ann_filtered" -> ((s, dir) => {
      import s.implicits._
      val emb = fanout(Tables.table(s, dir, "embeddings"))
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = 16,
        iters = 1)
      def norm(c: org.apache.spark.sql.Column) =
        sqrt(VectorFunctions.dotExact(c, c))
      val corpus = emb.select($"vec_id".as("neighbor_id"),
          $"embedding".as("c_vec"), norm($"embedding").as("c_norm"),
          Ivf.cellColumn($"embedding", model).as("cell"),
          $"label".as("n_label"))
        .localCheckpoint() // the at-rest index (cell+label keyed)
      val q = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("query_id"), $"embedding".as("q_vec"),
          norm($"embedding").as("q_norm"), $"label".as("q_label"),
          explode(Ivf.probeCells($"embedding", model, 4)).as("cell"))
      val cos = VectorFunctions.dotExact($"q_vec", $"c_vec") /
        ($"q_norm" * $"c_norm")
      val byQ = Window.partitionBy($"query_id")
        .orderBy($"cosine".desc, $"neighbor_id")
      val cand = q.join(corpus, Seq("cell"))
        .filter($"q_label" === $"n_label" &&
          $"query_id" =!= $"neighbor_id")
        .withColumn("cosine", cos)
      val ann5 = cand.withColumn("rank", row_number().over(byQ))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"neighbor_id")
      val nCand = cand.groupBy($"query_id")
        .agg(count(lit(1)).as("n_cands"))
      // exact filtered top-5: label equality IS the equi-key, so the
      // exactness baseline shuffles on label, never a product
      val exact5 = emb.filter($"vec_id" < 20)
        .select($"vec_id".as("query_id"), $"embedding".as("q_vec"),
          norm($"embedding").as("q_norm"), $"label")
        .join(emb.select($"vec_id".as("neighbor_id"),
          $"embedding".as("c_vec"), norm($"embedding").as("c_norm"),
          $"label"), Seq("label"))
        .filter($"query_id" =!= $"neighbor_id")
        .withColumn("cosine", cos)
        .withColumn("rank", row_number().over(byQ))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank".as("e_rank"),
          $"neighbor_id".as("e_neighbor"))
      val hits = ann5.join(exact5,
          ann5("query_id") === exact5("query_id") &&
            $"neighbor_id" === $"e_neighbor")
        .groupBy(ann5("query_id")).agg(count(lit(1)).as("hits"))
      val top1a = ann5.filter($"rank" === 1)
        .select($"query_id", $"neighbor_id".as("top1_ann"))
      val top1e = exact5.filter($"e_rank" === 1)
        .select($"query_id", $"e_neighbor".as("top1_exact"))
      emb.filter($"vec_id" < 20)
        .select($"vec_id".as("query_id"), $"label".as("q_label"))
        .join(nCand, Seq("query_id"), "left")
        .join(hits, Seq("query_id"), "left")
        .join(top1a, Seq("query_id"), "left")
        .join(top1e, Seq("query_id"), "left")
        .select($"query_id", $"q_label",
          coalesce($"n_cands", lit(0L)).as("n_cands"),
          coalesce($"hits", lit(0L)).as("hits"),
          expr("coalesce(hits, CAST(0 AS BIGINT)) * 1000000 DIV 5")
            .as("recall_pm"),
          $"top1_ann", $"top1_exact")
        .orderBy($"query_id")
    }),

    // ANN over the int8-quantized corpus (q85's codes) with exact
    // float rescore of the overfetched candidates. Approximation
    // affects recall only (bounded in TextVectorSpec) — but the
    // quantizer fit, the dequantized approximate scan, the overfetch
    // cut and the rescore are all deterministic double arithmetic, so
    // the full search replays in DuckDB.
    "q90_ann_quantized_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      VectorFunctions.knnQuantized(
        emb.filter($"vec_id" < 20).withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"),
        k = 5, overfetch = 4)
        .orderBy($"query_id", $"rank")
    }),

    // Hyperplane-LSH ANN (recall bounded in TextVectorSpec): the
    // plane matrix is MD5-derived — pure integer/double arithmetic
    // DuckDB reproduces with md5()+hex-cast — and buckets, 1-bit-flip
    // probes and exact candidate cosines are all deterministic, so
    // even this ANN variant is hash-verified against a full replay.
    "q33_ann_lsh_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      VectorFunctions.knnLsh(
        emb.filter($"vec_id" < 20).withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"),
        k = 5, planes = 6, tables = 8)
        .orderBy($"query_id", $"rank")
    }),

    // INCREMENTAL index maintenance — the operation a 100 TB vector
    // store actually runs on append: fit the IVF model ONCE on the
    // at-rest base corpus (vec_id % 5 ≠ 0 here), assign the arriving
    // batch (vec_id % 5 = 0) under that model withOUT re-fitting —
    // O(batch) work, the at-rest assignment untouched — and emit the
    // per-cell occupancy-drift report that decides when a re-fit IS
    // due: per-mille occupancy shares of base vs batch (integer
    // floor(n·1000/total) — engine-exact), drift = |Δ| per-mille,
    // refit flag at > 50‰. Cost: one bounded model fit + two
    // assignment scans + a cell-count hash agg (output ≤ cells rows).
    // The drift gate is the q133 idea applied to the index's own
    // partitioning instead of to labels.
    "q143_ivf_append_drift" -> ((s, dir) => {
      import s.implicits._
      import graft.vector.Ivf
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val base = emb.filter($"vec_id" % 5 =!= 0)
      val batch = emb.filter($"vec_id" % 5 === 0)
      val n = base.count()
      val bits = if (n <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
      val cells = 1 << math.max(4, math.min(12, bits / 2))
      val model = Ivf.fit(base, "vec_id", "embedding", cells = cells,
        iters = 1)
      def occ(df: org.apache.spark.sql.DataFrame, out: String) =
        Ivf.assign(df, model, corpusId = "vec_id")
          .groupBy($"cell").agg(count(lit(1)).as(out))
      // `sum(..) over ()` funnels to one partition — fine: the frame
      // is the ≤ cells-row occupancy report, bounded model metadata
      occ(base, "n_base").join(occ(batch, "n_batch"), Seq("cell"),
          "full_outer")
        .select($"cell",
          coalesce($"n_base", lit(0L)).as("n_base"),
          coalesce($"n_batch", lit(0L)).as("n_batch"))
        .withColumn("base_pm",
          expr("n_base * 1000 div sum(n_base) over ()"))
        .withColumn("batch_pm",
          expr("n_batch * 1000 div sum(n_batch) over ()"))
        .withColumn("drift_pm",
          greatest($"base_pm" - $"batch_pm", $"batch_pm" - $"base_pm"))
        .withColumn("refit", $"drift_pm" > 50)
        .orderBy($"cell")
    }),

    // The COST side of q143's re-fit decision: if the drift gate
    // fires and the index is re-fit on the full corpus, how much
    // at-rest data physically moves? Assign every vector under BOTH
    // models — v1 (fit on the base corpus only, q143's stale model)
    // and v2 (fit on the full corpus) — and emit the migration
    // matrix: (cell_v1, cell_v2, n_moved) for cells that differ,
    // plus per-pair share in integer per-mille of the corpus. A
    // 100 TB store prices a re-fit by exactly this row-movement
    // count (cell-partitioned files to rewrite); staying/moving is
    // a pure function of the two deterministic fits, so the oracle
    // replays both and the matrix hash-checks. Cost: two bounded
    // model fits + two assignment scans + one hash agg on the
    // (cell_v1, cell_v2) pair — output ≤ cells² rows, model
    // metadata.
    "q145_ivf_migration_plan" -> ((s, dir) => {
      import s.implicits._
      import graft.vector.Ivf
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val base = emb.filter($"vec_id" % 5 =!= 0)
      def adaptiveCells(n: Long): Int = {
        val bits = if (n <= 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n)
        1 << math.max(4, math.min(12, bits / 2))
      }
      val m1 = Ivf.fit(base, "vec_id", "embedding",
        cells = adaptiveCells(base.count()), iters = 1)
      val m2 = Ivf.fit(emb, "vec_id", "embedding",
        cells = adaptiveCells(emb.count()), iters = 1)
      // both assignments fold into ONE scan (no id-join of two assign
      // outputs — that would shuffle the corpus twice for the same
      // answer); full transition matrix (diagonal = stayed): re-fit
      // cost is the off-diagonal row count, shares over the corpus
      emb.select(
          Ivf.cellColumn($"embedding", m1).as("cell_v1"),
          Ivf.cellColumn($"embedding", m2).as("cell_v2"))
        .groupBy($"cell_v1", $"cell_v2")
        .agg(count(lit(1)).as("n_vecs"))
        .withColumn("share_pm",
          expr("n_vecs * 1000 div sum(n_vecs) over ()"))
        .withColumn("moved", $"cell_v1" =!= $"cell_v2")
        .orderBy($"cell_v1", $"cell_v2")
    }),

    // ANN quality as an ORACLE-VERIFIED operator, not just a spec
    // assertion: q40's IVF top-5 joined against the exact brute-force
    // top-5 per query, per-query hit counts → recall in per-mille
    // (n_hits·200 for k = 5 — integer, engine-exact). This is the
    // eval harness a retrieval pipeline runs after every index build,
    // expressed in-engine so the recall NUMBER itself is under the
    // correctness gate. Cost: the q40 search + one bounded exact
    // top-k over the 20 eval queries (eval sets are small by
    // construction; the corpus-sized work is the same index scan
    // q40 already does).
    // MRR companion to q144's recall: where does the TRUE nearest
    // neighbor (exact top-1) land in the ANN top-10? Reciprocal rank
    // in integer parts-per-million (1000000 div rank; 0 on a miss) —
    // the metric is engine-exact, so the eval number itself sits
    // under the hash gate like q144's recall. Recall@k says "how much
    // of the answer set did the index keep"; MRR says "how early does
    // the one answer that matters surface" — a reranker's input
    // budget is chosen from exactly this. Cost: the q144 search with
    // k = 10 + a k = 1 exact scan over the 20 eval queries.
    "q150_mrr_eval" -> ((s, dir) => {
      import s.implicits._
      import graft.vector.Ivf
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val queries = emb.filter($"vec_id" < 20)
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = 16, iters = 1)
      val assigned = Ivf.assign(
        emb.withColumnRenamed("vec_id", "neighbor_id"), model)
        .localCheckpoint()
      val ann = Ivf.searchAssigned(
        queries.withColumnRenamed("vec_id", "query_id"),
        assigned, model, k = 10, nprobe = 4)
        .select($"query_id", $"neighbor_id".as("truth_id"), $"rank")
      val truth = VectorFunctions.knnBruteForce(
        queries.withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"), k = 1)
        .select($"query_id", $"neighbor_id".as("truth_id"))
      queries.select($"vec_id".as("query_id"))
        .join(truth, Seq("query_id"))
        .join(ann, Seq("query_id", "truth_id"), "left_outer")
        .select($"query_id", $"truth_id",
          coalesce($"rank", lit(0)).as("found_rank"),
          when($"rank".isNull, lit(0L))
            .otherwise(expr("1000000 div rank")).as("rr_ppm"))
        .orderBy($"query_id")
    }),

    "q144_ann_recall_report" -> ((s, dir) => {
      import s.implicits._
      import graft.vector.Ivf
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val queries = emb.filter($"vec_id" < 20)
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = 16, iters = 1)
      val assigned = Ivf.assign(
        emb.withColumnRenamed("vec_id", "neighbor_id"), model)
        .localCheckpoint()
      val ann = Ivf.searchAssigned(
        queries.withColumnRenamed("vec_id", "query_id"),
        assigned, model, k = 5, nprobe = 4)
        .select($"query_id", $"neighbor_id")
      val exact = VectorFunctions.knnBruteForce(
        queries.withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"), k = 5)
        .select($"query_id", $"neighbor_id")
      val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
      queries.select($"vec_id".as("query_id"))
        .join(hits, Seq("query_id"), "left_outer")
        .select($"query_id",
          coalesce($"n_hits", lit(0L)).as("n_hits"))
        .withColumn("recall_pm", $"n_hits" * 200)
        .orderBy($"query_id")
    }),

    // Semantic decontamination — q73's benchmark-overlap flagging in
    // EMBEDDING space (the paraphrase-robust complement to 13-gram
    // matching: a reworded benchmark item shares no n-grams but still
    // lands nearby in embedding space). Benchmark set = every 97th
    // vector (bounded, deterministic stand-in for a real eval suite);
    // a corpus vector is contaminated when ANY benchmark neighbor has
    // cosine ≥ 0.30 — deliberately LOOSER than q32's 0.45 near-dup
    // bar: decontamination errs toward recall (a flagged train doc is
    // cheap, a leaked eval item is not). Scale shape is q73's
    // exactly: the benchmark side is TINY and broadcast, the train
    // corpus is scanned once and NEVER shuffles — the semi join plans
    // as BroadcastNestedLoopJoin(LeftSemi) with O(|bench|·d) work per
    // row, then one partial-aggregable per-label census. At 100 TB
    // the corpus side cost is the scan itself.
    "q206_semantic_decontam" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      val bench = emb.filter($"vec_id" % 97 === 0)
        .select($"vec_id".as("bench_id"), $"embedding".as("bv"))
      val corpus = emb.filter($"vec_id" % 97 =!= 0)
      val flagged = corpus
        .join(broadcast(bench),
          VectorFunctions.cosine($"embedding", $"bv") >= 0.30, "left_semi")
        .groupBy($"label").agg(count(lit(1)).as("n_flagged"))
      corpus.groupBy($"label").agg(count(lit(1)).as("n_docs"))
        .join(flagged, Seq("label"), "left_outer")
        .select($"label", $"n_docs",
          coalesce($"n_flagged", lit(0L)).as("n_flagged"))
        .withColumn("flagged_pm", expr("1000 * n_flagged div n_docs"))
        .orderBy($"label")
    }),

    // q206's semantic decontam on the IVF PROBE (the q137 index
    // composed under it — VERDICT r8 #8): the train corpus is
    // assigned to cells ONCE (the reusable index build), each
    // benchmark vector probes only its nprobe = 4 best of 16 cells,
    // and the cosine test runs on cell-colocated candidates instead
    // of every (train, bench) pair — per-row work drops from
    // O(|bench|·d) to O(probed-candidates·d). The probe can MISS a
    // boundary neighbor, so the audit leg carries q206's exact
    // broadcast count and the shortfall (`missed`) in-row: the
    // recall-vs-cost contract of every index, stated in the artifact.
    // At 100 TB the assignment is written partitioned by cell and the
    // probe reads nprobe/cells of the data — partition pruning for
    // vectors.
    "q225_semantic_decontam_ivf" -> ((s, dir) => {
      import s.implicits._
      import graft.vector.Ivf
      val audit = s.conf.get("spark.graft.sketchAudit", "true").toBoolean
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = 16, iters = 1)
      val corpus = emb.filter($"vec_id" % 97 =!= 0).localCheckpoint()
      val bench = emb.filter($"vec_id" % 97 === 0)
      val assigned = corpus
        .withColumn("cell", Ivf.cellColumn($"embedding", model))
      val bprobe = Ivf.assignMulti(
        bench.select($"vec_id".as("bench_id"), $"embedding"),
        model, probes = 4, corpusId = "bench_id")
        .select($"cell", $"c_vec".as("bv"))
      val flaggedIvf = assigned
        .join(broadcast(bprobe),
          assigned("cell") === bprobe("cell") &&
            VectorFunctions.cosine($"embedding", $"bv") >= 0.30,
          "left_semi")
        .groupBy($"label").agg(count(lit(1)).as("n_flagged_ivf"))
      val base = corpus.groupBy($"label").agg(count(lit(1)).as("n_docs"))
        .join(flaggedIvf, Seq("label"), "left_outer")
        .select($"label", $"n_docs",
          coalesce($"n_flagged_ivf", lit(0L)).as("n_flagged_ivf"))
      if (!audit) base.orderBy($"label")
      else {
        val bcast = bench.select($"embedding".as("bv0"))
        val exact = corpus
          .join(broadcast(bcast),
            VectorFunctions.cosine($"embedding", $"bv0") >= 0.30,
            "left_semi")
          .groupBy($"label").agg(count(lit(1)).as("n_flagged_exact"))
        base.join(exact, Seq("label"), "left_outer")
          .select($"label", $"n_docs", $"n_flagged_ivf",
            coalesce($"n_flagged_exact", lit(0L)).as("n_flagged_exact"),
            (coalesce($"n_flagged_exact", lit(0L)) - $"n_flagged_ivf")
              .as("missed"))
          .orderBy($"label")
      }
    }),

    // Margin-based bitext mining (Artetxe & Schwenk ACL'19, the
    // LASER/CCMatrix parallel-corpus construction rule): for every
    // label-0 vector, its best label-1 neighbor scored by RATIO
    // margin = cos(x, y₁) / mean(cos(x, y₁..y₄)) — "is the best match
    // decisively better than x's neighborhood?", which separates true
    // translation pairs from hubness artifacts where raw cosine
    // can't. The forward-margin rendering: ONE kNN pass (q31's
    // broadcast-queries shape — corpus side never shuffles before the
    // per-query top-k); the mean folds the 4 cosines in rank order
    // (aggregate over the rank-sorted array — one fixed fold order,
    // so the double sum is engine-exact), margin = 4·cos₁ / Σ.
    // At 100 TB both legs swap to the IVF probe (q137) untouched.
    "q213_bitext_margin" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables.table(s, dir, "embeddings")
      val a = emb.filter($"label" === 0)
        .select($"vec_id".as("query_id"), $"embedding")
      val b = emb.filter($"label" === 1)
        .select($"vec_id".as("neighbor_id"), $"embedding")
      VectorFunctions.knnBruteForce(a, b, k = 4)
        .groupBy($"query_id")
        .agg(
          expr("""aggregate(
                    transform(array_sort(collect_list(struct(rank, cosine))),
                              x -> x.cosine),
                    cast(0.0 as double), (acc, c) -> acc + c)""").as("sum4"),
          max(when($"rank" === 1, $"neighbor_id")).as("best_id"),
          max(when($"rank" === 1, $"cosine")).as("best_cos"))
        .withColumn("margin", lit(4.0) * $"best_cos" / $"sum4")
        .withColumn("mined", $"margin" >= 1.5)
        .select($"query_id", $"best_id", $"best_cos", $"margin", $"mined")
        .orderBy($"query_id")
    }),

    // ANN tuning curve — the nprobe recall/cost frontier as ONE
    // verified artifact (q144 gives one point; an operator choosing
    // production nprobe needs the curve): per nprobe ∈ {1,2,4,8},
    // total exact-top-5 hits over the 20 eval queries (recall, ‰) and
    // the candidate rows a probe touches (scan cost, ‰ of the full
    // 20·n brute-force pair space — the number the 100 TB budget is
    // priced from). Fit/assign/exact-truth compute ONCE
    // (localCheckpoint pins them); each curve point reuses the
    // assignment, so the whole curve costs one fit + 4 bounded probe
    // joins. Candidate counts come from the ≤cells-row cell-size
    // table, not by re-materializing candidates.
    "q216_ann_tuning_curve" -> ((s, dir) => {
      import s.implicits._
      val emb = Q.fanout(Tables.table(s, dir, "embeddings"))
      val queries = emb.filter($"vec_id" < 20)
      val model = Ivf.fit(emb, "vec_id", "embedding", cells = 16, iters = 1)
      val assigned = Ivf.assign(
        emb.withColumnRenamed("vec_id", "neighbor_id"), model)
        .localCheckpoint()
      val cellSizes = assigned.groupBy($"cell")
        .agg(count(lit(1)).as("csz")).localCheckpoint() // ≤ cells rows
      val exact = VectorFunctions.knnBruteForce(
        queries.withColumnRenamed("vec_id", "query_id"),
        emb.withColumnRenamed("vec_id", "neighbor_id"), k = 5)
        .select($"query_id", $"neighbor_id").localCheckpoint()
      val nCorpus = emb.agg(count(lit(1)).as("n_corpus"))
      // r16: the four probe legs used to run FOUR full candidate
      // joins + cosine passes (searchAssigned per nprobe), but the
      // probe-cell ranking is a fixed total order (score desc, larger
      // id on ties — IvfTopCells.selectTop), so probeCells(v, np) is
      // EXACTLY the first np entries of probeCells(v, 8): score every
      // (query, candidate) pair ONCE at the widest probe with its
      // cell rank attached, pin that bounded frame, and each leg is a
      // rank filter + the same per-query top-5 window over pinned
      // blocks. Candidate counts reuse the ranked probe list the same
      // way. Per-leg winners are identical: filtering cpos < np
      // reproduces the leg's exact candidate set, and the window
      // ranks by the same (cosine desc, neighbor_id) order.
      val q8 = queries.select($"vec_id".as("query_id"),
          $"embedding".as("q_vec"),
          sqrt(VectorFunctions.dotExact($"embedding", $"embedding"))
            .as("q_norm"),
          posexplode(Ivf.probeCells($"embedding", model, 8))
            .as(Seq("cpos", "cell")))
        .localCheckpoint() // 20 queries × 8 cells
      // broadcast: bounded at 20 queries × 8 probes by construction,
      // so the corpus assignment never exchanges for the join
      val scored = broadcast(q8).join(assigned, "cell")
        .filter($"query_id" =!= $"neighbor_id")
        .select($"query_id", $"cpos", $"neighbor_id",
          (VectorFunctions.dotExact($"q_vec", $"c_vec") /
            ($"q_norm" * $"c_norm")).as("cosine"))
        .localCheckpoint()
      val probedSizes = q8.select($"query_id", $"cpos", $"cell")
        .join(cellSizes, "cell").localCheckpoint() // ≤ 20×8 rows
      val w5 = Window.partitionBy($"query_id")
        .orderBy($"cosine".desc, $"neighbor_id")
      val legs = Seq(1, 2, 4, 8).map { np =>
        val hits = scored.filter($"cpos" < np)
          .withColumn("rank", row_number().over(w5))
          .filter($"rank" <= 5)
          .select($"query_id", $"neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("n_hits"))
        val cands = probedSizes.filter($"cpos" < np)
          .agg(sum($"csz").as("n_candidates"))
        // 1-row × 1-row products: the q111/q153 scalar-stats pattern
        hits.crossJoin(cands)
          .select(lit(np).as("nprobe"), $"n_hits", $"n_candidates")
      }
      legs.reduce(_ unionByName _)
        .crossJoin(broadcast(nCorpus))
        .select($"nprobe", $"n_hits",
          ($"n_hits" * 10L).as("recall_pm"),
          $"n_candidates",
          expr("1000 * n_candidates div (20 * n_corpus)").as("scan_pm"))
        .orderBy($"nprobe")
    }),

    // Embedding-space diversity audit — per label: how much of the
    // 64-bucket sign-random-projection space does the slice occupy,
    // and how concentrated is it? (occupancy ‰ of 2⁶ buckets + top
    // bucket share ‰). A collapsing generator or a near-duplicate
    // flood shows up as occupancy ↓ / top-share ↑ long before any
    // pairwise scan could afford to — the scan-cheap early-warning
    // complement to q133's centroid drift and q152's LSH precision.
    // One codegen bucket projection + two hash aggregates; the bucket
    // ids reuse q33's plane matrix, so the oracle replays them.
    "q218_embedding_diversity" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "embeddings")
        .select($"label", element_at(
          VectorFunctions.hyperplaneBuckets($"embedding",
            planes = 6, tables = 1), 1).as("bucket"))
        .groupBy($"label", $"bucket").agg(count(lit(1)).as("c"))
        .groupBy($"label")
        .agg(sum($"c").as("n_vecs"),
          count(lit(1)).as("n_buckets"),
          max($"c").as("top_bucket_n"))
        .withColumn("occupancy_pm", expr("1000 * n_buckets div 64"))
        .withColumn("top_share_pm", expr("1000 * top_bucket_n div n_vecs"))
        .orderBy($"label")
    }),

    // Per-dimension Fisher discriminant score — the feature-selection
    // audit "which embedding coordinates actually separate the
    // labels": F_j = between-class / within-class variance. Elements
    // snap to the dyadic 1/1024 grid (floor(v·1024): exact IEEE
    // power-of-two multiply + floor, the q133 discipline — never a
    // float→DECIMAL cast), so all moments are EXACT integers; the
    // per-class scatter terms t_c = ⌊2²⁰·Sx_c²/n_c⌋ are exact BIGINT
    // DIVs (order-free to sum, unlike float terms), and F touches
    // IEEE only in the final one-division render. One posexplode +
    // two hash aggregates; output is dim-bounded (64 rows).
    "q274_fisher_score" -> ((s, dir) => {
      import s.implicits._
      val perClass = Tables.table(s, dir, "embeddings")
        .select($"label", posexplode($"embedding").as(Seq("j", "v")))
        .select($"label", $"j",
          floor($"v".cast("double") * lit(1024.0)).cast("long")
            .as("x"))
        .groupBy($"j", $"label")
        .agg(count(lit(1)).as("nc"), sum($"x").as("sx"),
          sum($"x" * $"x").as("sxx"))
      // sx ~ n·1024, so sx² wraps BIGINT past ~2.9M rows/group —
      // square in DECIMAL(38,0) (exact to 1e38; the oracle mirrors in
      // HUGEINT) and keep every scatter intermediate decimal so
      // nothing re-enters 64-bit (DIV's decimal path converts the
      // quotient back to LONG, re-introducing the wrap — hence the
      // exact ⌊a/b⌋ = (a − a%b)/b form: the numerator is made exactly
      // divisible, so the decimal divide is rounding-free and equals
      // DuckDB's `//` on these non-negative numerators).
      def exactDiv(a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) = Analytics.exactFloorDiv(a, b)
      val sq = expr("CAST(sx AS DECIMAL(38,0)) * sx * 1048576")
      val sqAll = expr("CAST(sx_all AS DECIMAL(38,0)) * sx_all * 1048576")
      perClass
        .select($"j", $"nc", $"sx", $"sxx",
          exactDiv(sq, $"nc").as("tc"))
        .groupBy($"j")
        .agg(sum($"nc").as("n"), sum($"sx").as("sx_all"),
          sum($"sxx".cast("decimal(38,0)")).as("sxx_all"),
          sum($"tc").as("t"))
        .select($"j", $"n",
          ($"t" - exactDiv(sqAll, $"n")).as("ssb_u"),
          ($"sxx_all" * lit(1048576L) - $"t").as("ssw_u"))
        .select($"j", $"n",
          round($"ssb_u".cast("double") / $"ssw_u".cast("double"), 6)
            .as("fisher_ratio"))
        .orderBy($"j")
    }),

    // Top principal component by POWER ITERATION in pure fixed-point
    // — PCA's workhorse step as a distributed integer program: with
    // X on the 1/1024 dyadic grid and v L∞-normalized to 1024
    // integer units each round, y = Xv and w = Xᵀy are EXACT integer
    // sums (order-free at any cluster layout), and renormalization
    // v' = ⌊1024·w/max|w|⌋ is a fixed scalar double chain both
    // engines compute bit-identically. 3 unrolled rounds from the
    // all-ones start; the DuckDB oracle replays them as chained
    // CTEs. Per round: one y-aggregate (n groups) + one w-aggregate
    // (64 groups) + a 64-row collect — the model-frame move; the
    // data-sized pass is the posexploded scan, 3×.
    "q275_power_iteration" -> ((s, dir) => {
      import s.implicits._
      val x = Tables.table(s, dir, "embeddings")
        .select($"vec_id", posexplode($"embedding").as(Seq("j", "e")))
        .select($"vec_id", $"j",
          floor($"e".cast("double") * lit(1024.0)).cast("long")
            .as("x"))
        .localCheckpoint() // scanned twice per round
      var v: Map[Int, Long] = (0 until 64).map(_ -> 1024L).toMap
      for (_ <- 1 to 3) {
        val vCol = coalesce(
          v.toSeq.sortBy(_._1).map { case (j, vj) =>
            when($"j" === j, lit(vj)) }: _*)
        val y = x.withColumn("vj", vCol)
          .groupBy($"vec_id")
          .agg(sum($"x" * $"vj").cast("decimal(38,0)").as("y"))
        val w = x.join(y, "vec_id")
          .groupBy($"j")
          .agg(sum($"x".cast("decimal(38,0)") * $"y").as("w"))
          .collect().map(r => r.getInt(0) ->
            BigDecimal(r.getDecimal(1)).toBigInt).toMap // 64-row model
        val mx = w.values.map(_.abs).max
        v = w.map { case (j, wj) =>
          j -> math.floor(wj.toDouble * 1024.0 / mx.toDouble).toLong
        }
      }
      s.createDataFrame(v.toSeq.sortBy(_._1).map(t => (t._1, t._2)))
        .toDF("j", "v_fixed").orderBy($"j")
    }),

    // Reciprocal-rank fusion — the standard hybrid-retrieval merge
    // (Cormack et al., SIGIR'09): for each probe document, fuse the
    // LEXICAL top-10 (token-set Jaccard, exact ppm via BIGINT DIV)
    // with the VECTOR top-10 (cosine over the aligned embeddings) by
    // RRF score Σ ⌊10⁹/(60+rank)⌋ — pure integers, so the fused
    // ordering replays bit-for-bit. Every top-k is a per-probe
    // TakeOrdered leg (the q261 shape — never a data-sized window);
    // the fusion itself runs on ≤20-row frames. Lexical and vector
    // retrieval disagree by construction (surface overlap vs
    // embedding geometry), which is exactly what RRF exists to merge.
    "q277_rrf_fusion" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", array_distinct(split($"text", " ")).as("tk"))
        .localCheckpoint() // 3 probe legs scan it
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", $"embedding")
        .localCheckpoint()
      val legs = Seq(0L, 1L, 2L).map { p =>
        val pTok = docs.filter($"doc_id" === p)
          .select($"tk".as("ptk")) // 1-row probe frame
        val lex = docs.filter($"doc_id" =!= p)
          .crossJoin(broadcast(pTok))
          .select($"doc_id",
            size(array_intersect($"tk", $"ptk")).cast("long").as("i"),
            size($"tk").cast("long").as("la"),
            size($"ptk").cast("long").as("lb"))
          .select($"doc_id",
            expr("i * 1000000 DIV (la + lb - i)").as("jac_ppm"))
          .orderBy($"jac_ppm".desc, $"doc_id").limit(10)
          .withColumn("rank",
            row_number().over(Window.orderBy($"jac_ppm".desc,
              $"doc_id"))) // 10-row frame
          .select($"doc_id", $"rank".as("lex_rank"))
        val pVec = vecs.filter($"vec_id" === p)
          .select($"embedding".as("pv"))
        val vec = vecs.filter($"vec_id" =!= p)
          .crossJoin(broadcast(pVec))
          .select($"vec_id".as("doc_id"),
            VectorFunctions.cosine($"embedding", $"pv").as("cos"))
          .orderBy($"cos".desc, $"doc_id").limit(10)
          .withColumn("rank",
            row_number().over(Window.orderBy($"cos".desc, $"doc_id")))
          .select($"doc_id", $"rank".as("vec_rank"))
        lex.join(vec, Seq("doc_id"), "full_outer") // ≤20-row frame
          .select(lit(p).as("probe_id"), $"doc_id",
            (coalesce(expr("1000000000 DIV (60 + lex_rank)"), lit(0L)) +
              coalesce(expr("1000000000 DIV (60 + vec_rank)"), lit(0L)))
              .as("rrf_ppb"),
            coalesce($"lex_rank", lit(-1)).as("lex_rank"),
            coalesce($"vec_rank", lit(-1)).as("vec_rank"))
          .orderBy($"rrf_ppb".desc, $"doc_id").limit(5)
      }
      legs.reduce(_ union _).orderBy($"probe_id", $"rrf_ppb".desc,
        $"doc_id")
    }),

    // MinHash-LSH parameter planner — the s-curve table an engineer
    // reads before picking (bands, rows) for q28's dedup: detection
    // probability p = 1 − (1 − s^r)^b on a 19-point similarity grid
    // for five (b, r) configs. All powers are EXPLICIT
    // multiply-by-squaring chains (x², x⁴, x⁸, x¹⁶, x³²) — fixed IEEE
    // op order, never libm pow, so both engines produce identical
    // doubles. Pure literal compute (no table scan): the planner is a
    // 95-row model frame at any data scale.
    "q278_lsh_planner" -> ((s, dir) => {
      import s.implicits._
      def ipow(x: org.apache.spark.sql.Column, n: Int):
          org.apache.spark.sql.Column = n match {
        case 1 => x
        case k if k % 2 == 0 => { val h = ipow(x, k / 2); h * h }
        case k => x * ipow(x, k - 1)
      }
      val grid = s.range(1, 20)
        .select(($"id" * 5).cast("int").as("s_pct"),
          ($"id".cast("double") * lit(0.05)).as("sim"))
      val configs = Seq((8, 4), (16, 4), (32, 4), (8, 8), (16, 8))
      configs.map { case (b, r) =>
        grid.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          $"s_pct",
          round(lit(1.0) - ipow(lit(1.0) - ipow($"sim", r), b), 6)
            .as("p_detect"))
      }.reduce(_ union _)
        .orderBy($"bands", $"rows_per_band", $"s_pct")
    }))

  /** dotDec with an explicit dim (q128 folds 16-dim truncations). */
  private def dotDim(a: String, b: String, n: Int): String =
    s"""list_reduce(list_transform(generate_series(1, $n),
          i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (acc, x) -> acc + x)"""

  private def cosDim(av: String, bv: String, n: Int): String =
    s"${dotDim(av, bv, n)} / (sqrt(${dotDim(av, av, n)})" +
      s" * sqrt(${dotDim(bv, bv, n)}))"

  val oracles: Map[String, String] = Map(
    "q277_rrf_fusion" -> {
      def leg(p: Int) =
        s"""lex$p AS (
           SELECT doc_id, i * 1000000 // (la + lb - i) AS jac_ppm
           FROM (
             SELECT d.doc_id,
                    CAST(length(list_intersect(d.tk, p.tk))
                      AS BIGINT) AS i,
                    CAST(length(d.tk) AS BIGINT) AS la,
                    CAST(length(p.tk) AS BIGINT) AS lb
             FROM docs d,
                  (SELECT tk FROM docs WHERE doc_id = $p) p
             WHERE d.doc_id <> $p)
           ORDER BY jac_ppm DESC, doc_id LIMIT 10),
         lexr$p AS (
           SELECT doc_id, CAST(row_number() OVER (ORDER BY jac_ppm
             DESC, doc_id) AS INT) AS lex_rank FROM lex$p),
         vec$p AS (
           SELECT e.vec_id AS doc_id,
                  ${cosDim("e.embedding", "p.pv", 64)} AS cos
           FROM embeddings e,
                (SELECT embedding AS pv FROM embeddings
                 WHERE vec_id = $p) p
           WHERE e.vec_id <> $p
           ORDER BY cos DESC, doc_id LIMIT 10),
         vecr$p AS (
           SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC,
             doc_id) AS INT) AS vec_rank FROM vec$p),
         fused$p AS (
           SELECT CAST($p AS BIGINT) AS probe_id, doc_id,
                  CAST(coalesce(1000000000 // (60 + l.lex_rank), 0)
                    + coalesce(1000000000 // (60 + v.vec_rank), 0)
                    AS BIGINT) AS rrf_ppb,
                  coalesce(l.lex_rank, -1) AS lex_rank,
                  coalesce(v.vec_rank, -1) AS vec_rank
           FROM lexr$p l FULL OUTER JOIN vecr$p v USING (doc_id)
           ORDER BY rrf_ppb DESC, doc_id LIMIT 5)"""
      s"""WITH docs AS (
           SELECT doc_id, list_distinct(string_split(text, ' ')) AS tk
           FROM documents),
         ${leg(0)},
         ${leg(1)},
         ${leg(2)}
         SELECT * FROM (
           SELECT * FROM fused0
           UNION ALL SELECT * FROM fused1
           UNION ALL SELECT * FROM fused2)
         ORDER BY probe_id, rrf_ppb DESC, doc_id"""
    },
    "q278_lsh_planner" -> {
      def sqlPow(e: String, n: Int): String = n match {
        case 1 => e
        case k if k % 2 == 0 =>
          val h = sqlPow(e, k / 2); s"($h * $h)"
        case k => s"($e * ${sqlPow(e, k - 1)})"
      }
      val configs = Seq((8, 4), (16, 4), (32, 4), (8, 8), (16, 8))
      val legs = configs.map { case (b, r) =>
        s"""SELECT $b AS bands, $r AS rows_per_band,
                CAST(k * 5 AS INT) AS s_pct,
                round(1.0 - ${sqlPow(
          s"(1.0 - ${sqlPow("(CAST(k AS DOUBLE) * 0.05)", r)})", b)},
                  6) AS p_detect
           FROM grid"""
      }.mkString(" UNION ALL ")
      s"""WITH grid AS (SELECT unnest(range(1, 20)) AS k)
         SELECT * FROM ($legs)
         ORDER BY bands, rows_per_band, s_pct"""
    },
    "q274_fisher_score" ->
      """WITH d AS (
           SELECT label,
                  generate_subscripts(embedding, 1) - 1 AS j,
                  CAST(floor(unnest(embedding)::DOUBLE * 1024.0)
                    AS BIGINT) AS x
           FROM embeddings),
         pc AS (
           SELECT j, label, count(*)::BIGINT AS nc,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(x * x) AS BIGINT) AS sxx
           FROM d GROUP BY 1, 2),
         t AS (
           SELECT j, nc, sx, sxx,
                  CAST(sx AS HUGEINT) * sx * 1048576 // nc AS tc
           FROM pc),
         g AS (
           SELECT j, CAST(sum(nc) AS BIGINT) AS n,
                  CAST(sum(sx) AS HUGEINT) AS sx_all,
                  CAST(sum(sxx) AS HUGEINT) AS sxx_all,
                  CAST(sum(tc) AS HUGEINT) AS t
           FROM t GROUP BY 1)
         SELECT j, n,
                round(CAST(t - (sx_all * sx_all * 1048576 // n)
                    AS DOUBLE)
                  / CAST(sxx_all * 1048576 - t AS DOUBLE), 6)
                  AS fisher_ratio
         FROM g ORDER BY j""",
    "q275_power_iteration" -> {
      // one fixed-point power-iteration round: y = Xv (exact integer
      // per-vector sums), w = Xᵀy (exact integer per-dim sums),
      // v' = ⌊1024·w/max|w|⌋ — unrolled 3× as chained CTEs
      def round(i: Int) =
        s"""y$i AS (
           SELECT x.vec_id, sum(CAST(x.x AS HUGEINT) * v${i - 1}.v)
                    AS y
           FROM x JOIN v${i - 1} ON x.j = v${i - 1}.j GROUP BY 1),
         w$i AS (
           SELECT x.j, sum(CAST(x.x AS HUGEINT) * y$i.y) AS w
           FROM x JOIN y$i ON x.vec_id = y$i.vec_id GROUP BY 1),
         v$i AS (
           SELECT j, CAST(floor(CAST(w AS DOUBLE) * 1024.0
                    / CAST((SELECT max(abs(w)) FROM w$i) AS DOUBLE))
                  AS BIGINT) AS v
           FROM w$i)"""
      s"""WITH x AS (
           SELECT vec_id,
                  generate_subscripts(embedding, 1) - 1 AS j,
                  CAST(floor(unnest(embedding)::DOUBLE * 1024.0)
                    AS BIGINT) AS x
           FROM embeddings),
         v0 AS (
           SELECT unnest(range(0, 64)) AS j,
                  CAST(1024 AS HUGEINT) AS v),
         ${round(1)},
         ${round(2)},
         ${round(3)}
         SELECT CAST(j AS INT) AS j, CAST(v AS BIGINT) AS v_fixed
         FROM v3 ORDER BY j"""
    },
    "q133_embedding_drift" ->
      s"""WITH d AS (SELECT label, unnest(embedding) AS v,
                            generate_subscripts(embedding, 1) AS dim
                     FROM embeddings),
          lc AS (SELECT label, dim,
                        CAST(sum(CAST(floor(v::DOUBLE *
                            CAST(1099511627776.0 AS DOUBLE))
                          AS DECIMAL(38,0))) AS DOUBLE)
                          / CAST(1099511627776.0 AS DOUBLE)
                          / count(*) AS c
                 FROM d GROUP BY label, dim),
          gc AS (SELECT dim,
                        CAST(sum(CAST(floor(v::DOUBLE *
                            CAST(1099511627776.0 AS DOUBLE))
                          AS DECIMAL(38,0))) AS DOUBLE)
                          / CAST(1099511627776.0 AS DOUBLE)
                          / count(*) AS c
                 FROM d GROUP BY dim),
          lv AS (SELECT label, list(c ORDER BY dim) AS cv
                 FROM lc GROUP BY label),
          gv AS (SELECT list(c ORDER BY dim) AS cv FROM gc),
          nn AS (SELECT label AS nlabel, count(*)::BIGINT AS n
                 FROM embeddings GROUP BY label)
          SELECT lv.label, nn.n,
                 ${dotDim("lv.cv", "gv.cv", 64)} /
                   (sqrt(${dotDim("lv.cv", "lv.cv", 64)})
                    * sqrt(${dotDim("gv.cv", "gv.cv", 64)}))
                   AS drift_cosine
          FROM lv JOIN nn ON lv.label = nn.nlabel CROSS JOIN gv
          ORDER BY label""",
    "q128_matryoshka_recall" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
                     FROM embeddings WHERE vec_id % 25 = 0),
          full_rk AS (
            SELECT q.qid, e.vec_id,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     ${cosDim("q.qv", "e.embedding", 64)} DESC,
                     e.vec_id) AS rnk
            FROM q, embeddings e WHERE e.vec_id <> q.qid),
          trunc_rk AS (
            SELECT q.qid, e.vec_id,
                   row_number() OVER (PARTITION BY q.qid ORDER BY
                     ${cosDim("q.qv", "e.embedding", 16)} DESC,
                     e.vec_id) AS rnk
            FROM q, embeddings e WHERE e.vec_id <> q.qid)
          SELECT f.qid AS query_id, count(t.vec_id)::BIGINT AS n_overlap
          FROM (SELECT * FROM full_rk WHERE rnk <= 10) f
          LEFT JOIN (SELECT * FROM trunc_rk WHERE rnk <= 10) t
            ON f.qid = t.qid AND f.vec_id = t.vec_id
          GROUP BY f.qid ORDER BY query_id""",
    "q77_classifier_gate" ->
      """SELECT vec_id, label, logit FROM (
           SELECT vec_id, label,
                  round(list_reduce(list_transform(generate_series(1, 64),
                    i -> embedding[i]::DOUBLE *
                         ((((i * 37) % 13) - 6)::DOUBLE / 16.0)),
                    (acc, x) -> acc + x) + 0.25, 6) AS logit
           FROM embeddings)
         WHERE logit >= 0
         ORDER BY vec_id""",
    // Exact replay of the incremental-append shape: model fit over
    // the base relation only, every vector (base AND batch) scored
    // under the post-Lloyd centroids via lloydCtesSplit, per-cell
    // occupancy shares in integer per-mille. Sums are CAST back to
    // BIGINT before the comparison surface (DuckDB SUM(BIGINT) is
    // HUGEINT → pandas float — the q44 dtype lesson).
    "q143_ivf_append_drift" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id % 5 <> 0),
          batch AS (SELECT vec_id, embedding FROM embeddings
                    WHERE vec_id % 5 = 0),
          ${lloydCtesSplit("base", "embeddings")},
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1) WHERE rn = 1),
          ob AS (SELECT a.cell, count(*)::BIGINT AS n_base
                 FROM asg a JOIN base USING (vec_id) GROUP BY a.cell),
          oq AS (SELECT a.cell, count(*)::BIGINT AS n_batch
                 FROM asg a JOIN batch USING (vec_id) GROUP BY a.cell),
          j AS (
            SELECT coalesce(ob.cell, oq.cell) AS cell,
                   coalesce(ob.n_base, 0::BIGINT) AS n_base,
                   coalesce(oq.n_batch, 0::BIGINT) AS n_batch
            FROM ob FULL OUTER JOIN oq ON ob.cell = oq.cell),
          t AS (SELECT sum(n_base) AS tb, sum(n_batch) AS tq FROM j),
          p AS (
            SELECT cell, n_base, n_batch,
                   CAST(n_base * 1000 // tb AS BIGINT) AS base_pm,
                   CAST(n_batch * 1000 // tq AS BIGINT) AS batch_pm
            FROM j, t)
          SELECT cell, n_base, n_batch, base_pm, batch_pm,
                 greatest(base_pm - batch_pm, batch_pm - base_pm)
                   AS drift_pm,
                 greatest(base_pm - batch_pm, batch_pm - base_pm) > 50
                   AS refit
          FROM p ORDER BY cell""",

    // Two Lloyd replays under distinct CTE prefixes (v1_ = fit on
    // base, v2_ = fit on the full corpus), every vector assigned
    // under both, transition matrix with integer per-mille shares.
    "q145_ivf_migration_plan" ->
      s"""WITH base AS (SELECT vec_id, embedding FROM embeddings
                        WHERE vec_id % 5 <> 0),
          ${lloydCtesSplit("base", "embeddings", "v1_")},
          ${lloydCtesSplit("embeddings", "embeddings", "v2_")},
          a1 AS (
            SELECT vec_id, cell AS cell_v1 FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM v1_s1) WHERE rn = 1),
          a2 AS (
            SELECT vec_id, cell AS cell_v2 FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM v2_s1) WHERE rn = 1),
          mv AS (
            SELECT cell_v1, cell_v2, count(*)::BIGINT AS n_vecs
            FROM a1 JOIN a2 USING (vec_id)
            GROUP BY cell_v1, cell_v2),
          t AS (SELECT sum(n_vecs) AS tm FROM mv)
          SELECT cell_v1, cell_v2, n_vecs,
                 CAST(n_vecs * 1000 // tm AS BIGINT) AS share_pm,
                 cell_v1 <> cell_v2 AS moved
          FROM mv, t ORDER BY cell_v1, cell_v2""",

    // q40's IVF replay joined against q31's exact replay: the recall
    // report is a composition of two already-verified renderings, so
    // the eval NUMBER is itself hash-checked.
    "q144_ann_recall_report" ->
      s"""WITH ${lloydCtes(16)},
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
              FROM s1 WHERE vec_id < 20) WHERE rn <= 4),
          ascored AS (
            SELECT q.query_id, c.neighbor_id,
                   ${cosSql("eq.embedding", "ec.embedding")} AS cosine
            FROM qprobe q JOIN corpus c USING (cell)
            JOIN embeddings eq ON eq.vec_id = q.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id
            WHERE c.neighbor_id <> q.query_id),
          ann AS (
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM ascored) WHERE rank <= 5),
          eq AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 20),
          escored AS (
            SELECT eq.query_id, e.vec_id AS neighbor_id,
                   ${cosSql("eq.qv", "e.embedding")} AS cosine
            FROM eq JOIN embeddings e ON e.vec_id <> eq.query_id),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM escored) WHERE rank <= 5),
          hits AS (
            SELECT a.query_id, count(*)::BIGINT AS n_hits
            FROM ann a JOIN exact USING (query_id, neighbor_id)
            GROUP BY a.query_id)
          SELECT q.query_id, coalesce(h.n_hits, 0::BIGINT) AS n_hits,
                 coalesce(h.n_hits, 0::BIGINT) * 200 AS recall_pm
          FROM (SELECT vec_id AS query_id FROM embeddings
                WHERE vec_id < 20) q
          LEFT JOIN hits h ON h.query_id = q.query_id
          ORDER BY q.query_id""",

    "q150_mrr_eval" ->
      s"""WITH ${lloydCtes(16)},
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
              FROM s1 WHERE vec_id < 20) WHERE rn <= 4),
          ascored AS (
            SELECT q.query_id, c.neighbor_id,
                   ${cosSql("eq.embedding", "ec.embedding")} AS cosine
            FROM qprobe q JOIN corpus c USING (cell)
            JOIN embeddings eq ON eq.vec_id = q.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id
            WHERE c.neighbor_id <> q.query_id),
          ann AS (
            SELECT query_id, neighbor_id, rank FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM ascored) WHERE rank <= 10),
          eq AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 20),
          escored AS (
            SELECT eq.query_id, e.vec_id AS neighbor_id,
                   ${cosSql("eq.qv", "e.embedding")} AS cosine
            FROM eq JOIN embeddings e ON e.vec_id <> eq.query_id),
          truth AS (
            SELECT query_id, neighbor_id AS truth_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM escored) WHERE rank = 1)
          SELECT q.query_id, t.truth_id,
                 coalesce(a.rank, 0) AS found_rank,
                 CASE WHEN a.rank IS NULL THEN 0
                      ELSE 1000000 // a.rank END AS rr_ppm
          FROM (SELECT vec_id AS query_id FROM embeddings
                WHERE vec_id < 20) q
          JOIN truth t ON t.query_id = q.query_id
          LEFT JOIN ann a ON a.query_id = q.query_id
                         AND a.neighbor_id = t.truth_id
          ORDER BY q.query_id""",

    "q31_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                     FROM embeddings WHERE vec_id < 20),
           scored AS (
             SELECT q.query_id, e.vec_id AS neighbor_id,
                    ${cosSql("q.qv", "e.embedding")} AS cosine
             FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
          SELECT query_id, rank, neighbor_id, cosine FROM (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= 5
          ORDER BY query_id, rank""",
    "q85_quantize_int8" ->
      """WITH dims AS (
           SELECT i, min(embedding[i]::DOUBLE) AS mn,
                  max(embedding[i]::DOUBLE) AS mx
           FROM embeddings, generate_series(1, 64) g(i)
           GROUP BY i),
         model AS (
           SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
           FROM dims)
         SELECT vec_id,
                array_to_string(
                  list_transform(generate_series(1, 64), i ->
                    CASE WHEN mxs[i] > mns[i] THEN
                      CAST(least(255, greatest(0,
                        floor((embedding[i]::DOUBLE - mns[i]) * 255.0
                              / (mxs[i] - mns[i])))) AS INTEGER)
                    ELSE 0 END), ',') AS qvec
         FROM embeddings, model
         ORDER BY vec_id""",
    "q32_embedding_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 ${cosSql("a.embedding", "b.embedding")} AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45
          ORDER BY id_a, id_b""",

    // Exact replay of SemDedup.keep(cells≈√n adaptive, threshold=0.45,
    // probes=3) — see lloydCtesAdaptive for the fit replay (cell
    // count from integer bit-length of count(*)); pairs share any of
    // the top-3 probed cells; a vector is dropped iff a lower-id
    // near-dup shares a cell.
    "q94_semdedup" ->
      s"""WITH $lloydCtesAdaptive,
          a1 AS (
            SELECT vec_id, cell, rn FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1) WHERE rn <= 3),
          pairs AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45)
          SELECT p.vec_id, p.cell
          FROM (SELECT vec_id, cell FROM a1 WHERE rn = 1) p
          WHERE p.vec_id NOT IN (SELECT id_b FROM pairs)
          ORDER BY p.vec_id""",

    // Exact replay of Ivf.fit(cells=16, iters=1) +
    // searchAssigned(k=5, nprobe=4): shared Lloyd replay, corpus
    // assignment = argmax cell over the post-Lloyd centroids, query
    // probes = top-4 cells, exact cosine over probed candidates,
    // rank ties toward the smaller neighbor id. Each corpus vector
    // sits in exactly one cell and a query's probe cells are
    // distinct, so no pair dedup is needed.
    "q40_ann_ivf_topk" ->
      s"""WITH ${lloydCtes(16)},
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
              FROM s1 WHERE vec_id < 20) WHERE rn <= 4),
          scored AS (
            SELECT q.query_id, c.neighbor_id,
                   ${cosSql("eq.embedding", "ec.embedding")} AS cosine
            FROM qprobe q JOIN corpus c USING (cell)
            JOIN embeddings eq ON eq.vec_id = q.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id
            WHERE c.neighbor_id <> q.query_id)
          SELECT query_id, rank, neighbor_id, cosine FROM (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= 5
          ORDER BY query_id, rank""",

    // Exact replay of the filtered probe: same Lloyd CTEs, candidate
    // join on (cell, label), per-query top-5 with the q40 tie rule,
    // exact filtered top-5 as a label equi-join, hits/recall in-row.
    "q312_ann_filtered" ->
      s"""WITH ${lloydCtes(16)},
          corpus AS (
            SELECT s.vec_id AS neighbor_id, s.cell, e.label AS n_label
            FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1) s JOIN embeddings e ON e.vec_id = s.vec_id
            WHERE s.rn = 1),
          qprobe AS (
            SELECT s.vec_id AS query_id, s.cell, e.label AS q_label
            FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1 WHERE vec_id < 20) s
            JOIN embeddings e ON e.vec_id = s.vec_id
            WHERE s.rn <= 4),
          cand AS (
            SELECT q.query_id, c.neighbor_id,
                   ${cosSql("eq.embedding", "ec.embedding")} AS cosine
            FROM qprobe q JOIN corpus c
              ON q.cell = c.cell AND q.q_label = c.n_label
            JOIN embeddings eq ON eq.vec_id = q.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id
            WHERE c.neighbor_id <> q.query_id),
          ann5 AS (
            SELECT query_id, neighbor_id, rank FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM cand) WHERE rank <= 5),
          ncand AS (
            SELECT query_id, count(*)::BIGINT AS n_cands
            FROM cand GROUP BY query_id),
          exact5 AS (
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY ${cosSql("q.embedding", "e.embedding")}
                         DESC, e.vec_id) AS rank
              FROM embeddings q JOIN embeddings e
                ON q.label = e.label AND e.vec_id <> q.vec_id
              WHERE q.vec_id < 20) WHERE rank <= 5),
          hits AS (
            SELECT a.query_id, count(*)::BIGINT AS hits
            FROM ann5 a JOIN exact5 x
              ON a.query_id = x.query_id
             AND a.neighbor_id = x.neighbor_id
            GROUP BY a.query_id)
          SELECT b.vec_id AS query_id, b.label AS q_label,
                 coalesce(n.n_cands, 0) AS n_cands,
                 coalesce(h.hits, 0) AS hits,
                 coalesce(h.hits, 0) * 1000000 // 5 AS recall_pm,
                 (SELECT neighbor_id FROM ann5 a
                  WHERE a.query_id = b.vec_id AND a.rank = 1)
                   AS top1_ann,
                 (SELECT neighbor_id FROM exact5 x
                  WHERE x.query_id = b.vec_id AND x.rank = 1)
                   AS top1_exact
          FROM embeddings b
          LEFT JOIN ncand n ON n.query_id = b.vec_id
          LEFT JOIN hits h ON h.query_id = b.vec_id
          WHERE b.vec_id < 20
          ORDER BY query_id""",

    // Exact replay of knnQuantized(k=5, overfetch=4): per-dim
    // [min,max] fit (q85's CTE), quantize→dequantize to the cell's
    // lower edge, approximate cosine against the dequantized corpus,
    // keep the top-20 per query (ties toward the smaller neighbor
    // id), exact-rescore those in float. Every step is deterministic
    // double arithmetic with the same fold order as the codegen dot.
    "q90_ann_quantized_topk" ->
      s"""WITH dims AS (
           SELECT i, min(embedding[i]::DOUBLE) AS mn,
                  max(embedding[i]::DOUBLE) AS mx
           FROM embeddings, generate_series(1, 64) g(i)
           GROUP BY i),
         model AS (
           SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
           FROM dims),
         deq AS (
           SELECT vec_id AS neighbor_id, embedding AS c_vec,
                  list_transform(generate_series(1, 64), i ->
                    CASE WHEN mxs[i] > mns[i] THEN
                      mns[i] +
                      (CAST(least(255, greatest(0,
                         floor((embedding[i]::DOUBLE - mns[i]) * 255.0
                               / (mxs[i] - mns[i])))) AS INTEGER)::DOUBLE
                       * (mxs[i] - mns[i])) / 255.0
                    ELSE mns[i] + (0::DOUBLE * (mxs[i] - mns[i])) / 255.0
                    END) AS c_deq
           FROM embeddings, model),
         q AS (
           SELECT vec_id AS query_id, embedding AS q_vec,
                  sqrt(${dotDec("embedding", "embedding")}) AS q_norm
           FROM embeddings WHERE vec_id < 20),
         approx AS (
           SELECT q.query_id, d.neighbor_id, d.c_vec, q.q_vec, q.q_norm,
                  list_reduce(list_transform(generate_series(1, 64),
                    i -> q.q_vec[i]::DOUBLE * d.c_deq[i]),
                    (a, b) -> a + b)
                  / (q.q_norm * sqrt(list_reduce(
                      list_transform(d.c_deq, x -> x * x),
                      (a, b) -> a + b))) AS approx_cos
           FROM deq d, q
           WHERE d.neighbor_id <> q.query_id),
         cands AS (
           SELECT query_id, neighbor_id, c_vec, q_vec, q_norm FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY approx_cos DESC, neighbor_id) AS arank
             FROM approx) WHERE arank <= 20),
         rescored AS (
           SELECT query_id, neighbor_id,
                  ${dotDec("q_vec", "c_vec")}
                  / (q_norm * sqrt(${dotDec("c_vec", "c_vec")})) AS cosine
           FROM cands)
         SELECT query_id, rank, neighbor_id, cosine FROM (
           SELECT query_id, neighbor_id, cosine,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS rank
           FROM rescored)
         WHERE rank <= 5
         ORDER BY query_id, rank""",

    // Exact replay of knnLsh(k=5, planes=6, tables=8): the plane
    // matrix is planeVector(t*64+p) — per-dim doubles derived from
    // the first 6 bytes of md5("<plane>_<dim>") scaled into
    // [-0.5, 0.5), which DuckDB reproduces with md5()+hex cast. A
    // bucket's bit p is set iff v·plane > 0 (same fold order);
    // queries probe their own bucket plus every 1-bit flip; the
    // candidate set is the distinct (query, neighbor) bucket
    // collisions; cosines are exact.
    "q33_ann_lsh_topk" ->
      s"""WITH planes AS (
            SELECT t, p,
                   list_transform(generate_series(0, 63), d ->
                     CAST('0x' || substr(md5((t * 64 + p) || '_' || d),
                                         1, 12) AS BIGINT)::DOUBLE
                       / 281474976710656.0 - 0.5) AS plane
            FROM generate_series(0, 7) gt(t), generate_series(0, 5) gp(p)),
          cbuck AS (
            SELECT e.vec_id, pl.t AS tbl,
                   sum(CASE WHEN list_reduce(
                         list_transform(generate_series(1, 64),
                           j -> e.embedding[j]::DOUBLE * pl.plane[j]),
                         (a, b) -> a + b) > 0
                       THEN CAST(1::BIGINT << pl.p AS BIGINT)
                       ELSE 0 END)::BIGINT AS bucket
            FROM embeddings e, planes pl
            GROUP BY e.vec_id, pl.t),
          probes AS (
            SELECT vec_id AS query_id, tbl, bucket FROM cbuck
            WHERE vec_id < 20
            UNION
            SELECT vec_id, tbl, xor(bucket, CAST(1::BIGINT << gp.p AS BIGINT))
            FROM cbuck, generate_series(0, 5) gp(p)
            WHERE vec_id < 20),
          cands AS (
            SELECT DISTINCT pr.query_id, cb.vec_id AS neighbor_id
            FROM probes pr
            JOIN cbuck cb ON cb.tbl = pr.tbl AND cb.bucket = pr.bucket
            WHERE cb.vec_id <> pr.query_id),
          scored AS (
            SELECT c.query_id, c.neighbor_id,
                   ${cosSql("eq.embedding", "ec.embedding")} AS cosine
            FROM cands c
            JOIN embeddings eq ON eq.vec_id = c.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id)
          SELECT query_id, rank, neighbor_id, cosine FROM (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= 5
          ORDER BY query_id, rank""",

    "q206_semantic_decontam" ->
      s"""WITH bench AS (
            SELECT vec_id AS bench_id, embedding AS bv
            FROM embeddings WHERE vec_id % 97 = 0),
          corpus AS (
            SELECT * FROM embeddings WHERE vec_id % 97 <> 0),
          flag AS (
            SELECT DISTINCT c.label, c.vec_id
            FROM corpus c JOIN bench b
              ON ${cosSql("c.embedding", "b.bv")} >= 0.30),
          f AS (SELECT label, count(1) AS n_flagged FROM flag
                GROUP BY label),
          t AS (SELECT label, count(1) AS n_docs FROM corpus
                GROUP BY label)
          SELECT t.label, t.n_docs,
                 COALESCE(f.n_flagged, 0) AS n_flagged,
                 1000 * COALESCE(f.n_flagged, 0) // t.n_docs AS flagged_pm
          FROM t LEFT JOIN f ON t.label = f.label
          ORDER BY t.label""",

    // The probe replayed: same Lloyd fit, same argmax assignment,
    // same 4-cell probes, same cosine bar — and the exact leg is
    // q206's census, so `missed` is pinned too.
    "q225_semantic_decontam_ivf" ->
      s"""WITH ${lloydCtes(16)},
          corpus AS (
            SELECT e.vec_id, e.label, e.embedding, a.cell
            FROM embeddings e JOIN (
              SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY score DESC, cell DESC) AS rn
                FROM s1) WHERE rn = 1) a USING (vec_id)
            WHERE e.vec_id % 97 <> 0),
          bprobe AS (
            SELECT b.cell, e.embedding AS bv
            FROM (
              SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY score DESC, cell DESC) AS rn
                FROM s1 WHERE vec_id % 97 = 0) WHERE rn <= 4) b
            JOIN embeddings e USING (vec_id)),
          flag_ivf AS (
            SELECT DISTINCT c.label, c.vec_id
            FROM corpus c JOIN bprobe b ON c.cell = b.cell
            WHERE ${cosSql("c.embedding", "b.bv")} >= 0.30),
          fi AS (SELECT label, count(1) AS n_flagged_ivf FROM flag_ivf
                 GROUP BY label),
          bench AS (
            SELECT embedding AS bv0 FROM embeddings WHERE vec_id % 97 = 0),
          flag_ex AS (
            SELECT DISTINCT c.label, c.vec_id
            FROM corpus c JOIN bench b
              ON ${cosSql("c.embedding", "b.bv0")} >= 0.30),
          fe AS (SELECT label, count(1) AS n_flagged_exact FROM flag_ex
                 GROUP BY label),
          t AS (SELECT label, count(1) AS n_docs FROM corpus
                GROUP BY label)
          SELECT t.label, t.n_docs,
                 COALESCE(fi.n_flagged_ivf, 0) AS n_flagged_ivf,
                 COALESCE(fe.n_flagged_exact, 0) AS n_flagged_exact,
                 COALESCE(fe.n_flagged_exact, 0) -
                   COALESCE(fi.n_flagged_ivf, 0) AS missed
          FROM t LEFT JOIN fi ON t.label = fi.label
                 LEFT JOIN fe ON t.label = fe.label
          ORDER BY t.label""",

    "q213_bitext_margin" ->
      s"""WITH a AS (SELECT vec_id AS query_id, embedding AS qv
                     FROM embeddings WHERE label = 0),
          b AS (SELECT vec_id AS neighbor_id, embedding AS cv
                FROM embeddings WHERE label = 1),
          scored AS (
            SELECT a.query_id, b.neighbor_id,
                   ${cosSql("a.qv", "b.cv")} AS cosine
            FROM a JOIN b ON a.query_id <> b.neighbor_id),
          ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored),
          aggd AS (
            SELECT query_id,
                   list_reduce(list(cosine ORDER BY rank),
                     (acc, c) -> acc + c) AS sum4,
                   max(CASE WHEN rank = 1 THEN neighbor_id END) AS best_id,
                   max(CASE WHEN rank = 1 THEN cosine END) AS best_cos
            FROM ranked WHERE rank <= 4
            GROUP BY query_id)
          SELECT query_id, best_id, best_cos,
                 4.0 * best_cos / sum4 AS margin,
                 (4.0 * best_cos / sum4) >= 1.5 AS mined
          FROM aggd ORDER BY query_id""",

    "q216_ann_tuning_curve" -> {
      val nps = Seq(1, 2, 4, 8)
      val perNp = nps.map { np =>
        s"""ascored$np AS (
            SELECT q.query_id, c.neighbor_id,
                   ${cosSql("eq2.embedding", "ec.embedding")} AS cosine
            FROM (SELECT query_id, cell FROM qp WHERE rn <= $np) q
            JOIN corpus c USING (cell)
            JOIN embeddings eq2 ON eq2.vec_id = q.query_id
            JOIN embeddings ec ON ec.vec_id = c.neighbor_id
            WHERE c.neighbor_id <> q.query_id),
          ann$np AS (
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM ascored$np) WHERE rank <= 5),
          hits$np AS (
            SELECT count(*)::BIGINT AS n_hits
            FROM ann$np JOIN exact USING (query_id, neighbor_id)),
          cand$np AS (
            SELECT CAST(sum(csz) AS BIGINT) AS n_candidates
            FROM (SELECT cell FROM qp WHERE rn <= $np) j
            JOIN csz USING (cell))"""
      }.mkString(",\n          ")
      val finals = nps.map { np =>
        s"""SELECT $np AS nprobe, h.n_hits, h.n_hits * 10 AS recall_pm,
                 c.n_candidates,
                 1000 * c.n_candidates // (20 * n.n_corpus) AS scan_pm
          FROM hits$np h, cand$np c, ncorp n"""
      }.mkString("\n          UNION ALL\n          ")
      s"""WITH ${lloydCtes(16)},
          corpus AS (
            SELECT vec_id AS neighbor_id, cell FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1) WHERE rn = 1),
          qp AS (
            SELECT vec_id AS query_id, cell, rn FROM (
              SELECT vec_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY score DESC, cell DESC) AS rn
              FROM s1 WHERE vec_id < 20) WHERE rn <= 8),
          csz AS (SELECT cell, count(*)::BIGINT AS csz
                  FROM corpus GROUP BY cell),
          eq AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < 20),
          escored AS (
            SELECT eq.query_id, e.vec_id AS neighbor_id,
                   ${cosSql("eq.qv", "e.embedding")} AS cosine
            FROM eq JOIN embeddings e ON e.vec_id <> eq.query_id),
          exact AS (
            SELECT query_id, neighbor_id FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id) AS rank
              FROM escored) WHERE rank <= 5),
          ncorp AS (SELECT count(*)::BIGINT AS n_corpus FROM embeddings),
          $perNp
          $finals
          ORDER BY nprobe"""
    },

    "q218_embedding_diversity" ->
      """WITH planes AS (
            SELECT p,
                   list_transform(generate_series(0, 63), d ->
                     CAST('0x' || substr(md5(p || '_' || d), 1, 12)
                          AS BIGINT)::DOUBLE
                       / 281474976710656.0 - 0.5) AS plane
            FROM generate_series(0, 5) gp(p)),
          cb AS (
            SELECT e.vec_id, e.label,
                   sum(CASE WHEN list_reduce(
                         list_transform(generate_series(1, 64),
                           j -> e.embedding[j]::DOUBLE * pl.plane[j]),
                         (a, b) -> a + b) > 0
                       THEN CAST(1::BIGINT << pl.p AS BIGINT)
                       ELSE 0 END)::BIGINT AS bucket
            FROM embeddings e, planes pl
            GROUP BY e.vec_id, e.label),
          bb AS (SELECT label, bucket, count(1)::BIGINT AS c
                 FROM cb GROUP BY label, bucket)
          SELECT label, CAST(sum(c) AS BIGINT) AS n_vecs,
                 count(1) AS n_buckets,
                 CAST(max(c) AS BIGINT) AS top_bucket_n,
                 1000 * count(1) // 64 AS occupancy_pm,
                 1000 * CAST(max(c) AS BIGINT) // CAST(sum(c) AS BIGINT)
                   AS top_share_pm
          FROM bb GROUP BY label ORDER BY label""")
}
