package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{RegexTokenizer, ScoredChunk, SectionRenderer}

class SectionRendererSpec extends AnyFunSuite {

  private val tok = new RegexTokenizer

  test("whole document under budget renders as one full section") {
    val text = "short document"
    val out = SectionRenderer.render(text, Seq(ScoredChunk(0, 4, 0.9)), 100, 3, tok)
    assert(out == Seq(graft.text.TextSection(text, tok.countTokens(text), 1.0)))
  }

  test("adjacent chunks merge; section score is the chunk mean") {
    val text = ("word " * 100).trim // 100 tokens > maxTokens
    // two adjacent chunks (0-49)(50-99) and one distant (300-349)
    val chunks = Seq(
      ScoredChunk(0, 49, 0.8), ScoredChunk(50, 99, 0.6), ScoredChunk(300, 349, 0.4))
    // budget 25: (c1,c2) pack one section (20 tokens), c3 its own
    val out = SectionRenderer.render(text, chunks, 25, 2, tok)
    assert(out.length == 2)
    assert(math.abs(out.head.score - 0.7) <= 1e-9) // mean of 0.8 and 0.6
    assert(math.abs(out(1).score - 0.4) <= 1e-9)
  }

  test("sections never exceed the token budget before padding; padding fills it") {
    val text = ("alpha beta gamma delta " * 60).trim
    val chunks = Seq.tabulate(6)(i => ScoredChunk(i * 100, i * 100 + 79, 1.0 - i * 0.1))
    val out = SectionRenderer.render(text, chunks, 50, 2, tok)
    assert(out.length == 2)
    out.foreach(s => assert(s.tokenCount <= 50))
  }

  test("oversized chunks fall back to truncated top chunk") {
    val text = ("tok " * 200).trim
    val chunks = Seq(ScoredChunk(0, text.length - 1, 0.9)) // bigger than budget
    val out = SectionRenderer.render(text, chunks, 20, 2, tok)
    assert(out.length == 1)
    assert(out.head.tokenCount == 20)
    assert(out.head.score == 0.9)
  }
}
