package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline surface: the synthetic asset table (bytes
  * derived from documents.text) run through the decode/featurize
  * mapPartitions stage. The stub feature math is sha256-based, so the
  * oracle reproduces it bit-for-bit in SQL — verifying the real
  * plumbing (schema, per-partition batching, binary handling), which
  * is the part that survives a codec swap.
  */
object MultimodalQueries {
  import Q._

  val queries: Map[String, Fn] = Map(
    "q34_media_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.featurize(Multimodal.syntheticAssets(s, dir))
        .toDF()
        .orderBy($"asset_id")
    }))

  val oracles: Map[String, String] = Map(
    "q34_media_features" ->
      """SELECT doc_id AS asset_id,
                CASE doc_id % 3 WHEN 0 THEN 'image'
                                WHEN 1 THEN 'audio'
                                ELSE 'video' END AS media_type,
                octet_length(encode(text))::BIGINT AS n_bytes,
                sha256(text) AS content_sha,
                list_transform(generate_series(0, 15), i ->
                  ((('0x' || substr(sha256(text), i*4 + 1, 4))::INTEGER::FLOAT
                    / 32768::FLOAT) - 1::FLOAT)::FLOAT) AS feature
         FROM documents
         ORDER BY asset_id""")
}
