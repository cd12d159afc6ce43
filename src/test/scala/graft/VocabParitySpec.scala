package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{ByteBpeTokenizer, WordPieceTokenizer}

/** Real-tokenizer parity (tools/vocab_parity.md): when the published
  * GPT-2 merges.txt / BERT vocab.txt are supplied via env, graft's
  * standard-format loaders must reproduce the reference
  * implementations' token COUNTS on the committed fixture set
  * (tools/vocab_parity_expected.tsv — counts recorded from public
  * tiktoken / HuggingFace examples). Zero-egress builds cancel the
  * gated tests but still validate the fixture and exercise the same
  * load/encode code paths against the in-build full-size tables.
  */
class VocabParitySpec extends AnyFunSuite {

  private case class Fixture(tokenizer: String, count: Int, text: String)

  private lazy val fixtures: Seq[Fixture] = {
    val path = "tools/vocab_parity_expected.tsv"
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val parts = l.split("\t", 3)
        require(parts.length == 3, s"bad fixture line: $l")
        Fixture(parts(0), parts(1).toInt, parts(2))
      }.toList
    finally src.close()
  }

  private def envFile(name: String): Option[String] =
    sys.env.get(name).filter(p => new java.io.File(p).isFile)

  test("fixture file parses: both tokenizers covered, counts positive") {
    assert(fixtures.nonEmpty)
    assert(fixtures.map(_.tokenizer).toSet == Set("gpt2", "bert"))
    assert(fixtures.forall(f => f.count > 0 && f.text.nonEmpty))
  }

  test("GATED: real GPT-2 merges.txt reproduces tiktoken token counts " +
      "(set GRAFT_GPT2_MERGES)") {
    val path = envFile("GRAFT_GPT2_MERGES")
    assume(path.isDefined, "no real GPT-2 merges.txt supplied")
    val tok = ByteBpeTokenizer.fromMergesFile(path.get)
    val mismatches = fixtures.filter(_.tokenizer == "gpt2").flatMap { f =>
      val got = tok.encode(f.text).length
      if (got == f.count) None
      else Some(s"'${f.text}': expected ${f.count}, got $got")
    }
    assert(mismatches.isEmpty, mismatches.mkString("; "))
  }

  test("GATED: real BERT vocab.txt reproduces HuggingFace token counts " +
      "(set GRAFT_BERT_VOCAB)") {
    val path = envFile("GRAFT_BERT_VOCAB")
    assume(path.isDefined, "no real BERT vocab.txt supplied")
    val tok = WordPieceTokenizer.fromVocabFile(path.get)
    val mismatches = fixtures.filter(_.tokenizer == "bert").flatMap { f =>
      val got = tok.encode(f.text).length
      if (got == f.count) None
      else Some(s"'${f.text}': expected ${f.count}, got $got")
    }
    assert(mismatches.isEmpty, mismatches.mkString("; "))
  }

  test("fixture snippets are lossless through the in-build full-size tables " +
      "(same code path the gated tests run)") {
    val bpe = ByteBpeTokenizer.fromMergesFile(graft.text.FullVocabFiles.merges)
    fixtures.filter(_.tokenizer == "gpt2").foreach { f =>
      assert(bpe.decode(bpe.encode(f.text)) == f.text)
    }
    val wp = WordPieceTokenizer.fromVocabFile(graft.text.FullVocabFiles.vocab)
    fixtures.filter(_.tokenizer == "bert").foreach { f =>
      // WordPiece normalizes case/whitespace; count sanity instead
      assert(wp.encode(f.text).nonEmpty)
    }
  }
}
