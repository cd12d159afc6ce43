package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{RegexTokenizer, SplitterConfig, TextSplitter}

class TextSplitterSpec extends AnyFunSuite {

  private val tok = new RegexTokenizer

  test("tokenizer round-trips text through encode/decode") {
    val text = "Hello world, this is  a test!\nSecond line 42."
    assert(tok.decode(tok.encode(text)) == text)
  }

  test("splits on paragraph separator and respects token budget") {
    val sp = new TextSplitter(SplitterConfig(chunkSize = 6, chunkOverlap = 0))
    val text = "one two three four five\n\nsix seven eight nine ten"
    val chunks = sp.split(text)
    assert(chunks.length == 2)
    assert(chunks.forall(_.tokens.length <= 6))
    assert(chunks(0).text == "one two three four five")
    assert(chunks(1).text == "six seven eight nine ten")
  }

  test("start/end positions index into the original text (no merge)") {
    // keepSeparators keeps chunk text identical to the original slice;
    // chunkSize 4 prevents the 3+3-token merge so positions stay exact
    val sp = new TextSplitter(SplitterConfig(
      chunkSize = 4, chunkOverlap = 0, keepSeparators = true))
    val text = "alpha beta gamma\n\ndelta epsilon zeta\n\neta theta iota"
    val chunks = sp.split(text)
    assert(chunks.length == 3)
    chunks.foreach { c =>
      assert(text.substring(c.startPos, math.min(text.length, c.endPos + 1)) == c.text)
    }
  }

  test("small adjacent chunks merge up to the budget") {
    val sp = new TextSplitter(SplitterConfig(chunkSize = 100, chunkOverlap = 0))
    val text = "a b\n\nc d\n\ne f"
    val chunks = sp.split(text)
    assert(chunks.length == 1) // all merged under one budget
    assert(chunks.head.text == "a b c d e f") // merge joins with ' '
  }

  test("non-alphanumeric parts are dropped") {
    val sp = new TextSplitter(SplitterConfig(chunkSize = 10, chunkOverlap = 0))
    val chunks = sp.split("real words\n\n!!! ---\n\nmore words")
    assert(chunks.forall(_.text.exists(_.isLetterOrDigit)))
  }

  test("overlap tokens come from neighbors") {
    val sp = new TextSplitter(SplitterConfig(chunkSize = 6, chunkOverlap = 2))
    val text = "one two three four five\n\nsix seven eight nine ten\n\na b c d e"
    val chunks = sp.split(text)
    assert(chunks.length == 3)
    assert(chunks(1).startOverlap == chunks(0).tokens.takeRight(2))
    assert(chunks(1).endOverlap == chunks(2).tokens.take(2))
    assert(chunks(0).startOverlap.isEmpty)
    assert(chunks(2).endOverlap.isEmpty)
  }

  test("oversized separator-free text falls back to halving") {
    val sp = new TextSplitter(SplitterConfig(chunkSize = 4, chunkOverlap = 0))
    val text = ("x" * 50) // one 50-char token run, no separators apply
    val chunks = sp.split(text)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.tokens.length <= 4))
  }

  test("doc-type selects the separator table (markdown headings)") {
    val sp = new TextSplitter(SplitterConfig(
      chunkSize = 8, chunkOverlap = 0, docType = Some("md")))
    val text = "intro text here\n## section one body\n## section two body"
    val chunks = sp.split(text)
    assert(chunks.length >= 2) // split happened on the heading separator
  }

  test("reference default config (512 tokens, keep separators) on real-ish doc") {
    val sp = new TextSplitter(SplitterConfig(
      keepSeparators = true, chunkSize = 512, chunkOverlap = 0))
    val text = Seq.tabulate(40)(i => s"Paragraph $i with some words in it.").mkString("\n\n")
    val chunks = sp.split(text)
    assert(chunks.forall(_.tokens.length <= 512))
    assert(chunks.map(_.tokens.length).sum >= 40 * 8)
  }
}
