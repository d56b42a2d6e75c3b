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
