package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Streaming MEDIA ingest gate: drop incoming binary payloads whose
  * perceptual fingerprint is within `maxHamming` of anything already
  * in the (static) media corpus — mm_dedup's pairing made a
  * streaming admission check, exactly as StreamingNearDup is for
  * dd_simhash.
  *
  * The perceptual fingerprint (SimHash64 over decoded byte 4-grams,
  * Multimodal.contentSignatures' scheme) is a stateless per-row
  * projection, so the whole gate is the same ZERO-streaming-state
  * design as the text gate: fingerprint, then one stream-static LEFT
  * ANTI join per 16-bit chunk (pigeonhole: hamming ≤ 3 ⇒ some chunk
  * matches exactly). Exact byte duplicates are a special case of
  * hamming 0 — one gate handles both. The static side re-plans per
  * micro-batch, which is the index-refresh hook.
  */
object StreamingMediaDedup {

  /** One narrow batch pass: (idx_fp, chunk_i, chunk_v) rows for the
    * media corpus the gate protects.
    */
  def indexFingerprints(media: DataFrame, idCol: String): DataFrame =
    Multimodal.contentSignatures(media, idCol)
      .select(col("phash").as("idx_fp"),
        posexplode(expr(
          "transform(sequence(0,3), c -> shiftright(phash, c*16) & 65535L)"))
          .as(Seq("chunk_i", "chunk_v")))

  /** The gate: `stream` rows (carrying a binary `payload` column)
    * whose perceptual fingerprint has NO indexed fingerprint within
    * `maxHamming`. Works identically on a batch frame (the
    * equivalence MultimodalSpec asserts). NOTE: project the payload
    * column directly on a stream — Multimodal.asMedia's fan-out
    * guard inspects the source's partitioning and is batch-only.
    */
  def gate(stream: DataFrame, index: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"gate: maxHamming=$maxHamming — 4×16-bit chunk blocking only " +
        "guarantees a shared chunk for hamming <= 3 (pigeonhole)")
    StreamingNearDup.gateByFingerprint(
      Multimodal.withPhash(stream, "_fp"), index, maxHamming)
  }
}
