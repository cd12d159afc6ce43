package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Embeddings plumbing.
  *
  * The reference calls external embedding APIs in batches
  * (reference: openai_embeddings.py / oss_embeddings.py — network
  * models this zero-egress build cannot reach). The engine only
  * depends on the CONTRACT: text → fixed-dim float vector, identical
  * input → identical output, batchable. `HashingEmbedder` satisfies it
  * deterministically: a hashed bag-of-tokens projection (the classic
  * feature-hashing trick), L2-normalized so cosine scores are
  * well-behaved. Similar token multisets → nearby vectors, which is
  * enough to exercise every index/query path end-to-end.
  *
  * A production deployment swaps in a real model behind the same
  * trait (e.g. batch inference over `mapPartitions`); nothing else in
  * the engine changes.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(tokens: Seq[String]): Array[Float]

  /** Token budget per model call (reference:
    * local_document_index.py:160-171 batches chunks until
    * `embeddings.max_tokens` then flushes). Drives the batch grouping
    * in DocumentIndex's ingestion.
    */
  def maxBatchTokens: Int = 8000

  /** One model call for many chunk token-lists — override for real
    * batch-inference models; the default delegates per element.
    */
  def embedBatch(batch: Seq[Seq[String]]): Seq[Array[Float]] = batch.map(embed)
}

final class HashingEmbedder(val dim: Int = 64) extends Embedder {

  def embed(tokens: Seq[String]): Array[Float] = {
    val v = new Array[Double](dim)
    // Tokens arrive with attached leading whitespace (RegexTokenizer
    // preserves it for decode fidelity); hash the trimmed lowercase
    // form so ' Word' and 'word' land in the same feature.
    tokens.iterator.map(_.trim.toLowerCase).filter(_.nonEmpty).foreach { t =>
      val (idx, sign) = HashingEmbedder.feature(t, dim)
      v(idx) += sign
    }
    val norm = math.sqrt(v.map(x => x * x).sum)
    val scale = if (norm == 0.0) 1.0 else norm
    v.map(x => (x / scale).toFloat)
  }
}

object HashingEmbedder {
  // MessageDigest.getInstance per token is an allocation + provider
  // lookup on the embed hot loop; one reusable instance per executor
  // thread instead.
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** The (bucket, ±1 sign) feature of one already-trimmed-lowercase
    * token — exactly the pair `embed` accumulates. Exposed so the
    * d_sections oracle SQL is GENERATED from the same md5 math the
    * embedder runs (single source of truth; cosine is scale-invariant
    * so the oracle works on the raw signed counts and never needs the
    * float normalization).
    */
  def feature(token: String, dim: Int = 64): (Int, Int) = {
    val md = digests.get()
    md.reset()
    val d = md.digest(token.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    val idx = java.lang.Long.remainderUnsigned(h, dim.toLong).toInt
    (idx, if (((h >>> 32) & 1L) == 0L) 1 else -1)
  }
}
