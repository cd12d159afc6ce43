package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import QueryUtil._

/** Multimodal plumbing suite — binary payloads derived from the
  * `documents` table (ASCII text, so byte offsets == char offsets and
  * DuckDB can mirror every byte-level computation over the text).
  */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(
    "mm_binary_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.byteFeatures(media, "doc_id").toDF()
        .orderBy(col("doc_id"))
    }),

    "mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.frameSample(media, "doc_id", stride = 64, frameLen = 16).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }))

  val oracles: Map[String, String] = Map(
    "mm_binary_features" ->
      """SELECT doc_id,
        |  len(text)::BIGINT AS n_bytes,
        |  (len(text) - len(regexp_replace(text, '[aeiou]', '', 'g')))::BIGINT AS n_vowel_bytes,
        |  round(list_sum([ord(c) for c in string_split(text, '')]) * 1.0 / len(text), 6) AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id,
        |  (off / 64)::BIGINT AS frame_idx,
        |  off::BIGINT AS offset,
        |  16::BIGINT AS frame_len,
        |  md5(substr(text, (off + 1)::INT, 16)) AS frame_md5
        |FROM documents,
        |  unnest(range(0, greatest(len(text) - 15, 0), 64)) AS u(off)
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
