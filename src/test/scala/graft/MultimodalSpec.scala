package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: schema, determinism, frame fan-out, resize
  * metadata. (Feature math is oracle-verified via q34.) */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val assets = Multimodal.syntheticAssets(spark, sf0001)

  test("synthetic assets have full typed metadata") {
    val rows = assets.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.content.nonEmpty))
    assert(rows.filter(_.media_type == "image").forall(a =>
      a.width.isDefined && a.height.isDefined && a.duration_ms.isEmpty))
    assert(rows.filter(_.media_type != "image").forall(a =>
      a.width.isEmpty && a.duration_ms.isDefined))
  }

  test("featurize is deterministic, fixed-dim, and drops the bytes") {
    val f1 = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.featurize(assets).collect().sortBy(_.asset_id)
    assert(f1.length === 500)
    assert(f1.forall(_.feature.length === Multimodal.featureDim))
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    assert(!Multimodal.featurize(assets).schema.fieldNames.contains("content"))
  }

  test("resize pins dimensions and byte budget") {
    val r = Multimodal.resize(assets.limit(10), 32, 24).collect()
    assert(r.forall(a => a.width.contains(32) && a.height.contains(24)))
    assert(r.forall(_.content.length === 32 * 24))
  }

  test("frame sampling fans out only videos, bounded, with derived ids") {
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.media_type == "image"))
    val videoIds = assets.filter(_.media_type == "video").collect().map(_.asset_id).toSet
    assert(frames.map(_.asset_id / 1000).toSet.subsetOf(videoIds))
    assert(frames.forall(_.uri.contains("#frame=")))
  }

  test("q122 adaptive planes: recall pinned ABOVE the clamp floor (planes = 8 at sf0.1)") {
    // the r5 sf1 spot-bench fix made the plane count adaptive; the
    // recall bound was only ever asserted at the clamp floor (6).
    // sf0.1's 5000 assets give v = ceil(5000/32) = 157 → bit-length
    // 8, so this corpus exercises the adaptive branch for real
    // (documents at sf0.001 AND sf0.01 are both 500 rows → planes 6).
    val sf001 = "/root/testdata/sf0.1"
    val n = Multimodal.syntheticAssets(spark, sf001).count()
    val v = (n + 31) / 32
    val planes = math.max(6, math.min(24,
      if (v <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v - 1)))
    assert(planes === 8, s"corpus no longer lands above the floor: planes=$planes")
    val exact = SparkEntry.queries("q84_media_neardup")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q122_media_neardup_lsh")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must never invent a pair (exact rescore)")
    assert(exact.nonEmpty)
    // hyperplane-LSH theory at the 0.75-cosine threshold: per-plane
    // collision p = 1 − acos(0.75)/π ≈ 0.770, so at planes = 8,
    // tables = 8 expected recall ≈ 1 − (1 − 0.77⁸)⁸ ≈ 0.66; measured
    // 0.70 on this corpus. The adaptive-plane rule deliberately
    // trades recall at the threshold for linear candidate work —
    // `tables` is the compensating knob (SCALE.md documents the
    // tables-per-planes compensation). This pin catches regressions
    // below the theory-predicted level, not a 0.8 SLO that planes = 8
    // never promised.
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.65, s"recall $recall (${lsh.size}/${exact.size}) at planes=$planes")
  }

  test("tables-per-planes compensation recovers floor-level recall at planes = 8") {
    // SCALE.md's compensation design, executed: holding recall R at
    // the 0.75-cosine threshold while planes adapts needs tables ≈
    // ln(1−R)/ln(1−p^planes), p = 1 − acos(0.75)/π ≈ 0.770 — a
    // per-planes integer lookup (never runtime float log): planes 6→7,
    // 7→9, 8→12, 9→16, 10→21 for R = 0.8. This case runs q122's exact
    // pipeline at planes = 8 with the LUT's 12 tables and checks the
    // floor-level bound comes back — evidence the documented knob
    // works, without changing q122's oracled 8-table form.
    val sfDir = "/root/testdata/sf0.1"
    val feats = Multimodal.featurize(Multimodal.syntheticAssets(spark, sfDir))
      .toDF().select($"asset_id", $"feature").localCheckpoint()
    val exact = SparkEntry.queries("q84_media_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compensated = graft.queries.MultimodalQueries
      .lshNearDupPairs(spark, feats, planes = 8, tables = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(compensated.subsetOf(exact))
    val recall = compensated.size.toDouble / exact.size
    assert(recall >= 0.78,
      s"compensated recall $recall (${compensated.size}/${exact.size})")
  }

  test("ANN cross-modal (q137) recalls the exact top-3 (q126) and never invents cosines") {
    // both schemas are (asset_id, rank, vec_id, cosine)
    val exact = SparkEntry.queries("q126_crossmodal_topk")(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val ann = SparkEntry.queries("q137_crossmodal_ann")(spark, sf0001)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    assert(exact.nonEmpty && ann.nonEmpty)
    // exact-pair keys are (asset_id, vec_id); ann keys (asset_id, vec_id)
    val exactPairs = exact.keySet
    val annPairs = ann.keySet
    val recall = annPairs.count(exactPairs).toDouble / exactPairs.size
    assert(recall >= 0.6,
      s"ANN recall $recall (${annPairs.count(exactPairs)}/${exactPairs.size})")
    // every candidate the ANN scored has the SAME cosine as the exact
    // path — the approximation may only drop candidates, never move them
    annPairs.intersect(exactPairs).foreach { k =>
      assert(ann(k) === exact(k), s"cosine drift at $k")
    }
  }

  test("LSH media near-dup (q122) is a subset of exact (q84) with recall >= 0.8") {
    val exact = SparkEntry.queries("q84_media_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q122_media_neardup_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH must never invent a pair (exact rescore)")
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${lsh.size}/${exact.size})")
  }
}
