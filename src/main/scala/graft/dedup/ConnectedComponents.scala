package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns pairwise near-duplicate PAIRS (MinHash/SimHash verify
  * output) into duplicate CLUSTERS, so a curation pipeline can keep
  * exactly one canonical doc per transitive group (a~b, b~c ⇒ one
  * survivor of {a,b,c}, which pair-dropping alone gets wrong).
  *
  * Algorithm: iterative min-label propagation — each round every
  * vertex adopts the minimum label among itself and its neighbours;
  * fixpoint when no label changes. Each round is one shuffle join +
  * one aggregate on the edge list, O(E) work; rounds are bounded by
  * the component diameter. Near-dup graphs are LSH band cliques with
  * tiny diameter (2-3 rounds observed), which is why propagation is
  * the right default here; for adversarial long-path graphs at 100 TB
  * scale the O(log n)-round alternating small-star/large-star
  * contraction (Kiveris et al., "Connected Components in MapReduce
  * and Beyond") swaps in without changing the contract. The
  * per-round count() is a convergence check on a bounded scalar, and
  * localCheckpoint truncates the growing lineage each round — the
  * standard pattern for iterative DataFrame algorithms.
  */
object ConnectedComponents {

  /** Labels every vertex of `edges` (two id columns, one row per
    * undirected edge) with the minimum vertex id reachable from it.
    * Returns (id, cluster_id) for vertices appearing in ≥1 edge. */
  def label(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val sym = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .union(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("label", $"id")
      .localCheckpoint()
    // r16: the label vector and the per-round neighbourhood-min are
    // both |V| rows (≪ |E| on any graph with edges) — broadcast them
    // into the two per-round joins under ONE measured gate (counting
    // the just-checkpointed label vector is a cached-block scan).
    // Checkpointed frames carry no stats, so Catalyst planned every
    // round as two two-sided exchanges+sorts (edge list shuffled per
    // round!); with the hints each round pays ONE exchange (the
    // groupBy-min). Past the gate everything shuffles as before —
    // min-label propagation is join-strategy invariant.
    val vSmall = labels.count() <= 2000000L
    def vSide(d: DataFrame) = if (vSmall) broadcast(d) else d
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym
        .join(vSide(labels.select($"id".as("dst"), $"label")), "dst")
        .groupBy($"src").agg(min($"label").as("nbr_label"))
        .select($"src".as("id"), $"nbr_label")
      // carry the previous label through the update so convergence is
      // a filter+count on `next` itself, not a second join per round —
      // near-dup graphs are tiny and fixed per-round job overhead is
      // what the loop actually pays
      val next = labels.join(vSide(nbrMin), Seq("id"), "left")
        .select($"id", $"label".as("__old"),
          least($"label", coalesce($"nbr_label", $"label")).as("label"))
        .localCheckpoint()
      changed = next.filter($"label" =!= $"__old").count()
      labels = next.select($"id", $"label")
    }
    labels.select($"id", $"label".as("cluster_id"))
  }

  /** The O(log n)-round alternative for graphs whose diameter is NOT
    * small — alternating large-star / small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond"). Each
    * round is two groupBy-min + join passes over the edge list; the
    * round count is O(log n) regardless of diameter, vs O(diameter)
    * for [[label]]'s propagation — the difference between 2-3 rounds
    * and thousands on a 10⁶-hop path component. Same contract as
    * [[label]].
    *
    * large-star: every node links its larger neighbours to the min of
    * its neighbourhood (incl. itself); small-star does the same for
    * the smaller-or-equal neighbours. Both preserve connectivity and
    * strictly reduce total edge "height"; at fixpoint every component
    * is a star rooted at its min id. Convergence is checked on a
    * (count, hash-sum) signature of the edge set — one cheap
    * aggregate per round instead of a full EXCEPT. */
  /** @param rounds 0 = run to a detected fixpoint (a count+xor
    *   signature job per round, plus the extra round that proves
    *   stability — the safe default for unknown graphs); N > 0 =
    *   unroll exactly N contraction rounds with NO signature jobs
    *   (the q226 k-core discipline: star contraction converges in
    *   O(log n) rounds regardless of diameter, so a caller that has
    *   PINNED convergence-by-round-N on its data class — see
    *   ConnectedComponentsSpec's fixed≡fixpoint pin for q313 — drops
    *   ~2 jobs/round of detection overhead; at 100 TB the signature
    *   aggregates are full-edge passes, so the fixed form saves real
    *   scans, not just scheduler time). Fixed-round runs are GUARDED,
    *   not trusted: convergence-by-round-N is a measurement on the
    *   caller's data class, not a theorem for arbitrary inputs, so
    *   after the unrolled rounds a cheap structural check over the
    *   FINAL (contracted) edge set asserts the fixpoint shape — every
    *   component a star rooted at its min id — and throws instead of
    *   returning an unconverged labeling (which would silently emit a
    *   wrong component census wherever the oracle is not replayed,
    *   e.g. Bench). Two aggregates over the contracted edges (one
    *   edge per non-root node), not an extra contraction round. */
  def labelAlternating(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", rounds: Int = 0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // r16: the per-node min table `m` is ≤ |V| rows (one per distinct
    // u) — broadcast it into each star's relink join under a MEASURED
    // gate on the edge count (counted once before the loop for the
    // adaptive width; contraction keeps the working set within a
    // small multiple of it). Checkpointed frames carry no stats, so
    // Catalyst planned every relink as a two-sided exchange+sort of
    // the EDGE list — with the broadcast each star pays ONE edge
    // exchange (its own groupBy-min) instead of two-plus-sorts. Past
    // the gate (a 100 TB graph) the joins shuffle exactly as before;
    // the contracted edge set is identical either way.
    def mSide(small: Boolean)(m: DataFrame): DataFrame =
      if (small) broadcast(m) else m

    def largeStar(e: DataFrame, small: Boolean): DataFrame = {
      val sym = e.select($"u", $"v").union(e.select($"v".as("u"), $"u".as("v")))
      val m = sym.groupBy($"u")
        .agg(least(min($"v"), first($"u")).as("m"))
      sym.join(mSide(small)(m), "u")
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v")
        .distinct()
    }

    def smallStar(e: DataFrame, small: Boolean): DataFrame = {
      // orient every edge (bigger -> smaller); group by the bigger end
      val dir = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      val m = dir.groupBy($"u").agg(min($"v").as("m"))
      val relink = dir.join(mSide(small)(m), "u")
        .filter($"v" =!= $"m")
        .select($"v".as("u"), $"m".as("v"))
      val self = m.select($"u", $"m".as("v"))
      relink.union(self).filter($"u" =!= $"v").distinct()
    }

    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent and overflow-free (ANSI-safe)
      val r = e.agg(count(lit(1)),
        expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var cur = edges.select(col(idA).as("u"), col(idB).as("v"))
      .filter($"u" =!= $"v").distinct().localCheckpoint()
    // edge count for the adaptive width; in fixed-round mode this is
    // the ONLY pre-loop action (no per-round signatures)
    var sig = if (rounds > 0) (cur.count(), 0L) else signature(cur)
    // adaptive round width: every round runs ~6 tiny shuffles over an
    // edge frame that only SHRINKS — at session width each op pays
    // (width × rounds) near-empty tasks, which dominated wall time on
    // thinned graphs (q313: 8.6 s of task overhead at sf0.1). Width
    // follows the measured edge count (the adaptive-cells discipline
    // applied to the loop), growing for 100 TB inputs and collapsing
    // to a handful of tasks for small ones.
    val parts = math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      math.max(4L, sig._1 / 100000L)).toInt
    val mSmall = sig._1 <= 1000000L
    cur = cur.repartition(parts, $"u").localCheckpoint()
    if (rounds > 0) {
      for (_ <- 1 to rounds)
        cur = smallStar(largeStar(cur, mSmall), mSmall)
          .repartition(parts, $"u").localCheckpoint()
      // Fixpoint-shape guard: converged ⟺ the edge set is a star
      // forest rooted at component minima — (a) every edge points
      // down (v < u: the root is the min), (b) every non-root has
      // exactly one root, (c) no node is both child and root. Each
      // is violated by ANY unconverged state (a mid-algorithm edge
      // chain breaks (c); a node between two candidate roots breaks
      // (b)), and together they imply one more largeStar/smallStar
      // round is a no-op — so passing here IS the fixpoint proof,
      // at the cost of two aggregates over the contracted edges
      // instead of a full extra round + signatures.
      val down = cur.agg(
        sum(when($"v" >= $"u", 1L).otherwise(0L)),
        count(lit(1))).head()
      val multi = cur.select($"u".as("n"), lit(1).as("c"), lit(0).as("r"))
        .union(cur.select($"v".as("n"), lit(0).as("c"), lit(1).as("r")))
        .groupBy($"n")
        .agg(sum($"c").as("as_child"), max($"r").as("as_root"))
        .filter($"as_child" > 1 || ($"as_child" > 0 && $"as_root" > 0))
        .count()
      val downViolations =
        if (down.isNullAt(0)) 0L else down.getLong(0)
      if (downViolations > 0L || multi > 0L)
        throw new IllegalStateException(
          s"labelAlternating(rounds=$rounds) did not converge: the " +
            s"contracted edge set is not a min-rooted star forest " +
            s"($downViolations upward edges, $multi nodes with " +
            "multiple labels or dual child/root roles) — this graph " +
            "needs more contraction rounds; rerun with rounds=0 " +
            "(detected fixpoint) or a larger bound")
    } else {
      var done = false
      while (!done) {
        val next = smallStar(largeStar(cur, mSmall), mSmall)
          .repartition(parts, $"u").localCheckpoint()
        val nextSig = signature(next)
        done = nextSig == sig
        cur = next
        sig = nextSig
      }
    }
    // fixpoint: stars (child -> root). Roots label themselves.
    cur.select($"u".as("id"), $"v".as("cluster_id"))
      .union(cur.select($"v".as("id"), $"v".as("cluster_id")))
      .distinct()
  }

  /** Near-dup clusters of `docs`: MinHash-LSH verified pairs →
    * transitive closure → (doc_id, cluster_id, cluster_size), one row
    * per doc belonging to a cluster of ≥2 docs. cluster_id is the min
    * doc id of the component — the canonical survivor a dedup pass
    * keeps. */
  def nearDupClusters(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    clustersFromPairs(
      Dedup.minhashNearDupPairs(docs, idCol, textCol, threshold), idCol)

  /** The closure+census half of [[nearDupClusters]], split out so a
    * caller sweeping several thresholds (q296) can compute the
    * verified pair list ONCE at the loosest threshold and re-cluster
    * each tighter cut as a filter — banding does not depend on the
    * threshold, so pairs(t') ≡ pairs(t).filter(jaccard ≥ t') for any
    * t' ≥ t (the final verify filter is the only place the threshold
    * appears). `edges` must carry (id_a, id_b). */
  def clustersFromPairs(edges: DataFrame, idCol: String): DataFrame = {
    val labeled = label(edges)
    val sizes = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("id").as(idCol), col("cluster_id"), col("cluster_size"))
  }
}
