package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{Embedder, EmbeddingsRetry, HashingEmbedder, RemoteEmbedder, RetryingEmbeddingsClient}
import graft.embed.EmbeddingsRetry._

/** Retry / rate-limit / classification contract of the embeddings
  * client (reference: openai_embeddings.py:73-133): 429 retries per
  * the policy's backoff schedule and is classified rate_limited when
  * exhausted; 5xx is a non-retryable error; < 300 is success.
  */
class EmbedderSpec extends AnyFunSuite {

  /** Transport that serves a scripted sequence of status codes
    * (repeating the last one forever) and records every call.
    */
  private class ScriptedTransport(script: Int*) extends EmbeddingTransport {
    val calls = ArrayBuffer.empty[Seq[String]]
    def post(inputs: Seq[String]): TransportResponse = {
      val code = script(math.min(calls.length, script.length - 1))
      calls += inputs
      if (code < 300)
        TransportResponse(code, inputs.map(_ => Array(1.0f, 0.0f)), "ok")
      else TransportResponse(code, Nil, s"http $code")
    }
  }

  private def client(t: EmbeddingTransport, sleeps: ArrayBuffer[Long],
      policy: RetryPolicy = RetryPolicy()) =
    new RetryingEmbeddingsClient(t, policy, sleeps += _)

  test("retry-then-succeed: two 429s consume the default backoff schedule in order") {
    val t = new ScriptedTransport(429, 429, 200)
    val sleeps = ArrayBuffer.empty[Long]
    val r = client(t, sleeps).createEmbeddings(Seq("a", "b"))
    assert(r.status == Success)
    assert(r.output.length == 2)
    assert(t.calls.length == 3)
    // reference default retry_policy = [2000, 5000] ms, consumed in order
    assert(sleeps.toSeq == Seq(2000L, 5000L))
  }

  test("retry-exhausted: still 429 after the policy runs out → rate_limited") {
    val t = new ScriptedTransport(429)
    val sleeps = ArrayBuffer.empty[Long]
    val r = client(t, sleeps, RetryPolicy(Seq(10L, 20L, 30L))).createEmbeddings(Seq("x"))
    assert(r.status == RateLimited)
    assert(r.output.isEmpty)
    // initial attempt + one per policy entry, then give up
    assert(t.calls.length == 4)
    assert(sleeps.toSeq == Seq(10L, 20L, 30L))
    assert(r.message.contains("rate limit"))
  }

  test("non-retryable: 500 fails immediately with the status in the message") {
    val t = new ScriptedTransport(500, 200) // a retry WOULD succeed — must not happen
    val sleeps = ArrayBuffer.empty[Long]
    val r = client(t, sleeps).createEmbeddings(Seq("x"))
    assert(r.status == Error)
    assert(t.calls.length == 1)
    assert(sleeps.isEmpty)
    assert(r.message.contains("500"))
  }

  test("empty policy never sleeps: first 429 is terminal") {
    val t = new ScriptedTransport(429, 200)
    val sleeps = ArrayBuffer.empty[Long]
    val r = client(t, sleeps, RetryPolicy(Nil)).createEmbeddings(Seq("x"))
    assert(r.status == RateLimited)
    assert(t.calls.length == 1)
    assert(sleeps.isEmpty)
  }

  test("RemoteEmbedder: embedBatch retries through to vectors; terminal failure throws") {
    val ok = new ScriptedTransport(429, 200)
    val sleeps = ArrayBuffer.empty[Long]
    val e: Embedder = new RemoteEmbedder(2, ok, RetryPolicy(Seq(1L)), sleeps += _)
    val vs = e.embedBatch(Seq(Seq("hello", "world"), Seq("bye")))
    assert(vs.length == 2 && vs.forall(_.length == 2))
    assert(ok.calls.length == 2 && sleeps.toSeq == Seq(1L))

    val bad = new ScriptedTransport(503)
    val e2 = new RemoteEmbedder(2, bad, RetryPolicy(Seq(1L)), _ => ())
    val ex = intercept[java.io.IOException](e2.embedBatch(Seq(Seq("x"))))
    assert(ex.getMessage.contains("503"))
  }

  test("HashingEmbedder still satisfies the Embedder contract (determinism + batching)") {
    val h = new HashingEmbedder(16)
    val a = h.embed(Seq("alpha", "beta"))
    val b = h.embed(Seq("alpha", "beta"))
    assert(a.toSeq == b.toSeq)
    assert(h.embedBatch(Seq(Seq("alpha", "beta"))).head.toSeq == a.toSeq)
  }
}
