package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming NEAR-dup ingest gate: drop incoming documents whose
  * SimHash fingerprint is within `maxHamming` of any document already
  * in a (static) corpus index — "don't ingest what we already have a
  * near-copy of", the streaming face of Dedup.simHashPairs.
  *
  * Shape: the per-row SimHash64 kernel fingerprints each arriving doc
  * (a stateless projection — no watermark, no state store), then one
  * stream-static LEFT ANTI join per 16-bit fingerprint chunk (the
  * batch pair join's pigeonhole blocking: hamming ≤ 3 ⇒ some chunk
  * matches exactly, so each anti join equi-keys on that chunk's value
  * and verifies exact hamming in the join condition). Stream-stream
  * joins and streaming aggregation are never needed — every stage is
  * stateless, so the gate holds ZERO streaming state; the static side
  * is re-planned per micro-batch, which is exactly the refresh hook
  * (rebuild IndexedFingerprints on whatever cadence ingest tolerates).
  *
  * At corpus scale add a blocking column (lang/source) to both sides'
  * join keys, as the batch operator does — a bare 16-bit chunk key
  * leaves ~n/2^16 candidates per row.
  */
object StreamingNearDup {

  /** One narrow batch pass: (idx_fp, chunk_i, chunk_v) rows for the
    * corpus the gate protects. `portable` must match the gate's.
    */
  def indexFingerprints(corpus: DataFrame, idCol: String, textCol: String,
      portable: Boolean = false): DataFrame =
    graft.dedup.Dedup.simHash(corpus, idCol, textCol, keepCols = Nil, portable)
      .select(col("simhash").as("idx_fp"),
        posexplode(expr(
          "transform(sequence(0,3), c -> shiftright(simhash, c*16) & 65535L)"))
          .as(Seq("chunk_i", "chunk_v")))

  /** The gate: `stream` rows whose fingerprint has NO indexed
    * fingerprint within `maxHamming`. Works identically on a batch
    * frame (the equivalence StreamingSpec asserts).
    */
  def gate(stream: DataFrame, textCol: String, index: DataFrame,
      maxHamming: Int = 3, portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    import graft.functions.TextFunctions._
    require(maxHamming >= 0 && maxHamming <= 3,
      s"gate: maxHamming=$maxHamming — 4×16-bit chunk blocking only " +
        "guarantees a shared chunk for hamming <= 3 (pigeonhole); a " +
        "larger radius would silently pass near-copies")
    val fp = ColumnBridge.column(graft.functions.expr.SimHash64(
      ColumnBridge.expression(wsTokens(normText(col(textCol)))), portable))
    gateByFingerprint(stream.withColumn("_fp", fp), index, maxHamming)
  }

  /** The chunk-blocked anti-join cascade over a frame that already
    * carries its 64-bit fingerprint in `_fp` — shared by the text
    * gate above and the media gate (StreamingMediaDedup), which
    * differ only in how the fingerprint is computed.
    */
  private[streaming] def gateByFingerprint(withFp: DataFrame,
      index: DataFrame, maxHamming: Int): DataFrame = {
    // materialize the index ONCE: the four anti-join subtrees below
    // each reference it, and an un-materialized subplan would re-run
    // the full corpus fingerprint pass 4× per micro-batch. The pin
    // lives for the streaming query's life — Barrier.release(spark)
    // after stopping it; refreshing the corpus = rebuild the index
    // frame and re-create the gate.
    val idx = graft.Barrier.checkpoint(index)
    var survivors = withFp
    // one stateless stream-static anti join per chunk position: a row
    // is dropped iff ANY chunk finds an indexed fp within maxHamming
    for (c <- 0 until 4) {
      val idxC = idx.filter(col("chunk_i") === c)
        .select(col("chunk_v").as(s"_cv$c"), col("idx_fp").as(s"_if$c"))
      survivors = survivors
        .withColumn(s"_k$c",
          shiftright(col("_fp"), c * 16).bitwiseAND(lit(0xFFFFL)))
        .join(idxC,
          col(s"_k$c") === col(s"_cv$c") &&
            bit_count(col("_fp").bitwiseXOR(col(s"_if$c"))) <= maxHamming,
          "left_anti")
        .drop(s"_k$c")
    }
    survivors.drop("_fp")
  }
}
