package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector-similarity operators over `array<float>` embedding columns
  * (FIXTURES.md §B.8): exact cosine via higher-order functions, brute
  * force top-k as the correctness baseline, and a hyperplane-LSH
  * bucketed variant as the scale path.
  *
  * Determinism: dot products are per-ROW left folds in double with
  * ONE fixed evaluation order (the array's), so the result does not
  * depend on partitioning or merge order — nothing is ever
  * accumulated across rows. The oracle mirrors the same order with
  * DuckDB list_reduce (also a left fold); float→double widening is
  * exact, so both engines see identical bit patterns.
  */
object VectorFunctions {

  /** Sequential left-fold dot product in double. Unlike a cross-row
    * aggregation, a per-row array fold has ONE fixed evaluation order
    * (the array's), so the result is deterministic on any cluster
    * layout; the oracle mirrors it with list_reduce (also a left
    * fold, and IEEE 0.0+x == x makes the seeds agree).
    *
    * Implemented by the native codegen ArrayDotProduct expression
    * (identical fold order and arithmetic to the
    * aggregate(zip_with(...)) spelling, ~20× faster). Queries must
    * call GraftFunctions.register(spark) first (Tables.table does). */
  def dotExact(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(dotExact(a, a))

  def cosine(a: Column, b: Column): Column =
    dotExact(a, b) / (norm(a) * norm(b))

  /** Per-dimension [min, max] ranges of a vector column — the model
    * of an affine int8 quantizer. One posexplode + hash aggregate
    * over `dim` groups; the collected result is `dim` pairs of
    * doubles (bounded model metadata, the IVF-centroid class of
    * collect, never data). */
  def fitQuantizer(df: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val ranges = df
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    (ranges.map(_._2).toSeq, ranges.map(_._3).toSeq)
  }

  /** Affine int8 quantization of a vector column against fitted
    * per-dim ranges: qᵢ = clamp(⌊(vᵢ − minᵢ)·255/(maxᵢ − minᵢ)⌋, 0,
    * 255) — 4× smaller vectors (the standard ANN compression step:
    * scan the int8 corpus, exact-rescore survivors in float). All
    * arithmetic is double with floor (never round: round half-up vs
    * half-even differs across engines); degenerate dims (max = min)
    * quantize to 0. The ranges ride in the plan as literals, so the
    * transform is scan-parallel with no join. */
  def quantizeInt8(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    require(mins.length == maxs.length && mins.nonEmpty)
    val mn = typedlit(mins)
    val mx = typedlit(maxs)
    transform(vec, (v, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi > lo,
        least(lit(255), greatest(lit(0),
          floor((v.cast("double") - lo) * lit(255.0) / (hi - lo)).cast("int"))))
        .otherwise(lit(0))
    })
  }

  /** Dequantize back to the cell's lower edge: vᵢ ≈ minᵢ + qᵢ·(maxᵢ −
    * minᵢ)/255 — error ≤ one cell width per dim (spec-bounded). */
  def dequantizeInt8(qvec: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mn = typedlit(mins)
    val mx = typedlit(maxs)
    transform(qvec, (q, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      lo + q.cast("double") * (hi - lo) / lit(255.0)
    })
  }

  /** ANN over the int8-quantized corpus with exact rescore — the
    * search loop the [[quantizeInt8]] compression exists for: scan
    * the 4×-smaller codes (approximate cosine against dequantized
    * cell edges), OVERFETCH k×overfetch candidates per query, then
    * rescore only those candidates against the float vectors and
    * keep the true top k. Quantization error affects recall only —
    * returned cosines are exact (bit-identical to brute force for
    * the candidates that survive); recall is bounded in
    * `TextVectorSpec`. At 100 TB the int8 corpus is what stays
    * resident: 4× more vectors per executor-memory-byte, and the
    * float corpus is touched only for k×overfetch rows per query. */
  def knnQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
      overfetch: Int = 4, queryId: String = "query_id",
      corpusId: String = "neighbor_id", vecCol: String = "embedding"):
      DataFrame = {
    val (mins, maxs) = fitQuantizer(corpus, vecCol)
    val deq = dequantizeInt8(quantizeInt8(col(vecCol), mins, maxs), mins, maxs)
    // norms once per corpus row, not once per (row × query) pair —
    // the approximate scan is the stage that touches the whole corpus
    val c = corpus.select(col(corpusId), col(vecCol).as("c_vec"),
        deq.as("c_deq"))
      .withColumn("c_deq_norm", sqrt(dotExact(col("c_deq"), col("c_deq"))))
    val q = queries.select(col(queryId), col(vecCol).as("q_vec"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("q_norm"))
    val approx = c.crossJoin(broadcast(q))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("approx_cos",
        dotExact(col("q_vec"), col("c_deq")) /
          (col("q_norm") * col("c_deq_norm")))
    val wA = Window.partitionBy(col(queryId))
      .orderBy(col("approx_cos").desc, col(corpusId))
    val cands = approx.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * overfetch)
    val rescored = cands.withColumn("cosine",
      dotExact(col("q_vec"), col("c_vec")) /
        (col("q_norm") * sqrt(dotExact(col("c_vec"), col("c_vec")))))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * the corpus, rank per query. At scale the corpus scan is
    * embarrassingly parallel and shuffle-free until the final
    * per-query top-k (TakeOrdered per partition + merge). */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int,
      queryId: String = "query_id", corpusId: String = "neighbor_id",
      vecCol: String = "embedding"): DataFrame = {
    // norms once per row, not once per pair — O(n+q) folds instead of O(n·q)
    val q = queries.select(col(queryId), col(vecCol).as("q_vec"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("q_norm"))
    val c = corpus.select(col(corpusId), col(vecCol).as("c_vec"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(queryId) =!= col(corpusId))
      .withColumn("cosine",
        dotExact(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** MD5-derived dense projection matrix (`rows` × `dims`, components
    * in [-0.5, 0.5)) — the deterministic random projection used to
    * map between embedding spaces (cross-modal alignment stub,
    * Johnson-Lindenstrauss down-projection). Same constant-literal
    * discipline as the LSH planes: built on the driver, embedded as
    * literals, reproduced in DuckDB via
    * `CAST('0x' || substr(md5(salt_k_d), 1, 12) AS BIGINT)`. */
  def mdProjectionMatrix(rows: Int, dims: Int,
      salt: String): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until rows).map { k =>
      (0 until dims).map { d =>
        val hex = md.digest(s"${salt}_${k}_$d".getBytes("UTF-8"))
          .take(6).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(hex, 16).toDouble
          / (1L << 48).toDouble) - 0.5
      }
    }
  }

  /** Deterministic pseudo-random hyperplane: components in [-0.5, 0.5)
    * derived from md5(plane, dim) on the DRIVER, embedded as a literal
    * array — executors see a constant (effectively a broadcast of the
    * plane matrix), and the projection is one codegen dot product per
    * plane instead of per-element md5 calls. */
  private val planeDims = 64
  private def planeVector(plane: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planeDims) { d =>
      val hex = md.digest(s"${plane}_$d".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16).toDouble / (1L << 48).toDouble) - 0.5
    }
  }

  /** Sign-random-projection (hyperplane LSH) bucket id over `planes`
    * bits for hash table `table`. Vectors in the same bucket tend to
    * have high cosine. */
  def hyperplaneBucket(vec: Column, planes: Int, table: Int): Column =
    (0 until planes).map { p =>
      val proj = dotExact(vec, typedlit(planeVector(table * 64 + p)))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-table bucket ids for ALL `tables` tables at once via the
    * graft_lsh_buckets codegen expression (same sign bits as
    * [[hyperplaneBucket]] — identical dot order — but the plane
    * matrix ships as one reference object, so generated source stays
    * constant-size instead of tables × planes literal dot trees that
    * took seconds of janino compile). */
  def hyperplaneBuckets(vec: Column, planes: Int, tables: Int): Column = {
    val matrix: Seq[Seq[Double]] = for {
      t <- 0 until tables
      p <- 0 until planes
    } yield planeVector(t * 64 + p).toSeq
    call_function("graft_lsh_buckets", vec, typedlit(matrix),
      lit(tables), lit(planes))
  }

  /** Approximate NN via multi-table hyperplane LSH with 1-bit
    * multi-probe: `tables` independent hash tables of `planes` bits;
    * a query probes its own bucket plus every 1-bit flip in each
    * table, and candidates are the union. For moderately similar
    * neighbors (cos ≈ 0.4 → per-plane agreement ≈ 0.63) recall at
    * (8 tables × 6 planes, 1-probe) is ≈ 0.9 — one table would give
    * ≈ 0.1.
    *
    * Scale: the corpus is bucketed once ((table, bucket) keys —
    * written bucketed at rest in a real deployment); each query
    * touches tables·(planes+1) buckets ≈ a constant fraction of data
    * that shrinks as 2^-planes. The bucket equi-join replaces the
    * O(n·q) cross product.
    */
  def knnLsh(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 6,
      tables: Int = 8, queryId: String = "query_id",
      corpusId: String = "neighbor_id", vecCol: String = "embedding"):
      DataFrame = {
    val c = corpus.select(
      col(corpusId), col(vecCol).as("c_vec"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("c_norm"))
    val cBucketed = c.select(col(corpusId), col("c_vec"), col("c_norm"),
      posexplode(hyperplaneBuckets(col("c_vec"), planes, tables)))
      .toDF(corpusId, "c_vec", "c_norm", "tbl", "bucket")
    val qBase = queries.select(col(queryId), col(vecCol).as("q_vec"),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("q_norm"))
    val qBucketed = qBase.select(col(queryId), col("q_vec"), col("q_norm"),
      posexplode(hyperplaneBuckets(col("q_vec"), planes, tables)))
      .toDF(queryId, "q_vec", "q_norm", "tbl", "bucket0")
    // multi-probe: own bucket + every 1-bit flip
    val probes = qBucketed.select(
      col(queryId), col("q_vec"), col("q_norm"), col("tbl"),
      explode(expr(
        s"array_union(array(bucket0), transform(sequence(0, ${planes - 1}), p -> bucket0 ^ shiftleft(cast(1 as bigint), p)))"))
        .as("bucket"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId))
    probes.join(cBucketed, Seq("tbl", "bucket"))
      .filter(col(queryId) =!= col(corpusId))
      // cosine BEFORE the dedup: a pair colliding in several tables
      // yields bit-identical cosines, and deduping on the scored rows
      // shuffles 3 scalars per candidate instead of two 64-float
      // vectors + norms — at corpus scale the dedup exchange payload
      // drops ~30× (the duplicate dot products are codegen-cheap)
      .withColumn("cosine",
        dotExact(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")))
      .select(col(queryId), col(corpusId), col("cosine"))
      .dropDuplicates(queryId, corpusId)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup). Brute
    * force with per-row norm precompute; the LSH bucket join above is
    * the scale path when O(n²) dot products are too much. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val withNorm = df.select(
      col(idCol), col(vecCol),
      sqrt(dotExact(col(vecCol), col(vecCol))).as("norm"))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      col("norm").as("norm_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      col("norm").as("norm_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        dotExact(col("v_a"), col("v_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
