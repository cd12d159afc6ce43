package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.TopKBuffer
import graft.text.{RegexTokenizer, SplitterConfig, TextSplitter}

/** Randomized invariant tests (seeded — fully deterministic). */
class PropertySpec extends AnyFunSuite {

  private val tok = new RegexTokenizer
  private val Trials = 300

  private def randomText(rnd: Random): String = {
    val words = Array("alpha", "beta", "gamma", "delta", "x1", "q", "longerword", "12", "!?")
    val seps = Array(" ", " ", "\n", "\n\n")
    val n = rnd.nextInt(120)
    (0 until n).map { i =>
      words(rnd.nextInt(words.length)) +
        (if (i < n - 1) seps(rnd.nextInt(seps.length)) else "")
    }.mkString
  }

  test("splitter: budget, ordering, bounds, content preservation") {
    val rnd = new Random(42)
    val sp = new TextSplitter(SplitterConfig(chunkSize = 8, chunkOverlap = 2))
    (1 to Trials).foreach { _ =>
      val text = randomText(rnd)
      val chunks = sp.split(text)
      chunks.foreach { c =>
        assert(c.tokens.length <= 8)
        assert(c.startPos >= 0 && c.startPos < math.max(text.length, 1))
        assert(c.startOverlap.length <= 2 && c.endOverlap.length <= 2)
      }
      chunks.sliding(2).foreach {
        case Vector(a, b) => assert(a.startPos <= b.startPos)
        case _ =>
      }
      // alphanumeric content survives chunking (merges drop separators only)
      def alnum(s: String) = s.filter(_.isLetterOrDigit)
      assert(chunks.map(c => alnum(c.text)).mkString == alnum(text))
    }
  }

  test("tokenizer: decode(encode(x)) == x up to trailing whitespace") {
    val rnd = new Random(7)
    (1 to Trials).foreach { _ =>
      val text = randomText(rnd)
      assert(tok.decode(tok.encode(text)) == text.replaceFirst("\\s+$", ""))
    }
  }

  test("TopKBuffer equals sort-take under any insert order and merge split") {
    val rnd = new Random(1234)
    (1 to Trials).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val pairs = Vector.fill(rnd.nextInt(60)) {
        (math.rint(rnd.nextDouble() * 100) / 100, rnd.nextLong(50))
      }.distinct
      val expected = pairs.sortBy(t => (-t._1, t._2)).take(k)
      val whole = new TopKBuffer(k)
      pairs.foreach { case (s, i) => whole.insert(s, i) }
      assert(whole.sorted == expected)
      // partial buffers merged must agree with the single buffer
      val (l, r) = pairs.splitAt(pairs.length / 2)
      val bl = new TopKBuffer(k); l.foreach { case (s, i) => bl.insert(s, i) }
      val br = new TopKBuffer(k); r.foreach { case (s, i) => br.insert(s, i) }
      bl.mergeFrom(br)
      assert(bl.sorted == expected)
    }
  }
}
