package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline surface: the synthetic asset table (bytes
  * derived from documents.text) run through the decode/featurize
  * mapPartitions stage. The stub feature math is sha256-based, so the
  * oracle reproduces it bit-for-bit in SQL — verifying the real
  * plumbing (schema, per-partition batching, binary handling), which
  * is the part that survives a codec swap.
  *
  * The checked projection explodes the feature vector into f0..f15
  * scalar FLOAT columns: the driver's pandas compare sorts rows and a
  * raw array<float> column is unhashable there. Library users get the
  * typed Dataset[MediaFeatures] (array column intact) from
  * [[Multimodal.featurize]] directly. Each component is
  * (16-bit int / 32768) - 1 — a dyadic rational, exactly
  * representable in FLOAT on both engines, so no rounding is needed.
  */
object MultimodalQueries {
  import Q._

  private val dim = Multimodal.featureDim

  val queries: Map[String, Fn] = Map(
    "q34_media_features" -> ((s, dir) => {
      import s.implicits._
      val flat = (0 until dim).map(i =>
        element_at($"feature", i + 1).as(s"f$i"))
      Multimodal.featurize(Multimodal.syntheticAssets(s, dir))
        .toDF()
        .select(($"asset_id" +: $"media_type" +: $"n_bytes" +:
          $"content_sha" +: flat): _*)
        .orderBy($"asset_id")
    }))

  private val featureCols = (0 until dim).map { i =>
    s"""((('0x' || substr(sha256(text), ${i * 4} + 1, 4))::INTEGER::FLOAT
        |  / 32768::FLOAT) - 1::FLOAT)::FLOAT AS f$i""".stripMargin
  }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "q34_media_features" ->
      s"""SELECT doc_id AS asset_id,
                CASE doc_id % 3 WHEN 0 THEN 'image'
                                WHEN 1 THEN 'audio'
                                ELSE 'video' END AS media_type,
                octet_length(encode(text))::BIGINT AS n_bytes,
                sha256(text) AS content_sha,
                $featureCols
         FROM documents
         ORDER BY asset_id""")
}
