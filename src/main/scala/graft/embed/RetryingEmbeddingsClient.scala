package graft.embed

import scala.annotation.tailrec

/** Retry / rate-limit / error-classification contract for a remote
  * embeddings API, as pure testable logic (reference:
  * openai_embeddings.py:73-133).
  *
  * The reference's `post` retries ONLY on HTTP 429, waiting
  * `retry_policy[retry_count]` milliseconds before each retry and
  * giving up once the policy list is exhausted
  * (openai_embeddings.py:128-133; default policy [2000, 5000] ms,
  * openai_embeddings.py:8). `create_embeddings` then classifies the
  * final response: status < 300 → success, 429 → rate_limited,
  * anything else (including 5xx) → error with the status in the
  * message (openai_embeddings.py:78-96). 5xx is deliberately
  * NON-retryable — matching the reference, not a judgment call.
  *
  * Zero-egress build: the HTTP half is abstracted as
  * [[EmbeddingTransport]] (tests inject flaky fakes; a production
  * deployment supplies a real client). The sleep is injected too, so
  * specs assert the exact backoff schedule without waiting it out.
  */
object EmbeddingsRetry {

  /** Backoff schedule in milliseconds; length bounds the retry count
    * (reference: openai_embeddings.py:8 `retry_policy = [2000, 5000]`).
    */
  final case class RetryPolicy(delaysMs: Seq[Long] = Seq(2000L, 5000L)) {
    require(delaysMs.forall(_ >= 0), "backoff delays must be non-negative")
    def maxRetries: Int = delaysMs.length
  }

  /** Raw transport result — the slice of an HTTP response the retry
    * and classification logic depends on.
    */
  final case class TransportResponse(
      statusCode: Int,
      embeddings: Seq[Array[Float]] = Nil,
      message: String = "")

  /** One embeddings API call for a batch of texts. Implementations:
    * a real HTTP POST in production; deterministic fakes in tests.
    *
    * Serializable because [[RemoteEmbedder]] is an [[Embedder]] and
    * DocumentIndex ships the embedder to executors inside a
    * mapPartitions closure (DocumentIndex.embedChunks) — so every
    * transport implementation must be executor-safe: hold no live
    * sockets as fields; initialize the HTTP client lazily
    * (`@transient lazy val`) so each executor builds its own.
    */
  trait EmbeddingTransport extends Serializable {
    def post(inputs: Seq[String]): TransportResponse
  }

  /** Terminal classification (reference: EmbeddingsResponse.status
    * strings "success" / "rate_limited" / "error",
    * openai_embeddings.py:44-48,78-96).
    */
  sealed trait Status
  case object Success extends Status
  case object RateLimited extends Status
  case object Error extends Status

  final case class EmbeddingsResponse(
      status: Status,
      output: Seq[Array[Float]],
      message: String)
}

/** Client wrapping a transport with the reference's retry + classify
  * behavior. `sleep` is injectable for tests (defaults to
  * Thread.sleep). Runs wherever the embedder runs: driver-side for
  * ad-hoc embeds, INSIDE executor tasks on the DocumentIndex ingest
  * path (mapPartitions ships the embedder) — hence the transport's
  * Serializable bound and per-executor lazy client in
  * [[RemoteEmbedder]].
  */
final class RetryingEmbeddingsClient(
    transport: EmbeddingsRetry.EmbeddingTransport,
    policy: EmbeddingsRetry.RetryPolicy = EmbeddingsRetry.RetryPolicy(),
    sleep: Long => Unit = Thread.sleep) {

  import EmbeddingsRetry._

  /** POST with bounded 429 retries (reference:
    * openai_embeddings.py:110-133): attempt k sleeps
    * `policy.delaysMs(k)` then retries, until the policy is
    * exhausted; the last response (still 429, or anything else) is
    * returned for classification.
    */
  @tailrec
  private def post(inputs: Seq[String], retryCount: Int): TransportResponse = {
    val r = transport.post(inputs)
    if (r.statusCode == 429 && retryCount < policy.maxRetries) {
      sleep(policy.delaysMs(retryCount))
      post(inputs, retryCount + 1)
    } else r
  }

  /** Retry then classify (reference: create_embeddings,
    * openai_embeddings.py:73-96).
    */
  def createEmbeddings(inputs: Seq[String]): EmbeddingsResponse = {
    val r = post(inputs, retryCount = 0)
    if (r.statusCode < 300)
      EmbeddingsResponse(Success, r.embeddings, r.message)
    else if (r.statusCode == 429)
      EmbeddingsResponse(RateLimited, Nil,
        "The embeddings API returned a rate limit error.")
    else
      EmbeddingsResponse(Error, Nil,
        s"The embeddings API returned an error status of ${r.statusCode}: ${r.message}")
  }
}

/** [[Embedder]] backed by a remote API through the retry client, so
  * DocumentIndex's ingest (token-budget batching + embedBatch) gains
  * the reference's resilience contract with zero changes to the
  * ingest path. Terminal failures surface as exceptions — ingest is
  * a batch job; a batch that is still rate-limited after the policy
  * is exhausted should fail the job, not silently zero-fill vectors.
  */
final class RemoteEmbedder(
    val dim: Int,
    transport: EmbeddingsRetry.EmbeddingTransport,
    policy: EmbeddingsRetry.RetryPolicy = EmbeddingsRetry.RetryPolicy(),
    sleep: Long => Unit = Thread.sleep,
    override val maxBatchTokens: Int = 8000) extends Embedder {

  import EmbeddingsRetry._

  @transient private lazy val client =
    new RetryingEmbeddingsClient(transport, policy, sleep)

  override def embed(tokens: Seq[String]): Array[Float] =
    embedBatch(Seq(tokens)).head

  override def embedBatch(batch: Seq[Seq[String]]): Seq[Array[Float]] = {
    val resp = client.createEmbeddings(batch.map(_.mkString(" ")))
    resp.status match {
      case Success =>
        require(resp.output.length == batch.length,
          s"embeddings API returned ${resp.output.length} vectors for ${batch.length} inputs")
        resp.output
      case RateLimited | Error =>
        throw new java.io.IOException(resp.message)
    }
  }
}
