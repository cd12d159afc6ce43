package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.text.WordPieceTokenizer

/** The ta_tokens_wordpiece DuckDB oracle checks engine parity on the
  * corpus; these check the tokenizer itself: the greedy
  * longest-match-first contract, the [UNK] collapse rule, BERT basic
  * tokenization, the vocab.txt format round-trip, and cross-instance
  * determinism of the learned vocabulary.
  */
class WordPieceSpec extends AnyFunSuite {

  test("greedy longest-match-first against a hand-built public-format vocab") {
    val tok = WordPieceTokenizer.fromVocab(Seq(
      "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
      "un", "able", "break", "##able", "##break", "##a", "##b", "a", "ab", "abc", "##c", "##d"))
    // longest FIRST match wins, not any smaller decomposition
    assert(tok.tokenizeWord("unbreakable") ==
      Vector("un", "##break", "##able"))
    assert(tok.tokenizeWord("abcd") == Vector("abc", "##d"))
    // word-initial vs continuation pieces are distinct namespaces
    assert(tok.tokenizeWord("able") == Vector("able"))
    assert(tok.tokenizeWord("ab") == Vector("ab"))
  }

  test("a position with no matching piece collapses the WHOLE word to [UNK]") {
    val tok = WordPieceTokenizer.fromVocab(Seq(
      "[PAD]", "[UNK]", "un", "##able"))
    // 'un' matches, then 'x...' has no piece -> the word is [UNK],
    // not [un, UNK] (the BERT rule)
    assert(tok.tokenizeWord("unxable") == Vector("[UNK]"))
    assert(tok.tokenizeWord("zzz") == Vector("[UNK]"))
    // a word over MaxWordChars skips matching entirely
    assert(tok.tokenizeWord("a" * (WordPieceTokenizer.MaxWordChars + 1)) ==
      Vector("[UNK]"))
  }

  test("basic tokenizer: lowercase, accent strip, punctuation split") {
    assert(WordPieceTokenizer.basicTokenize("Hello, World!") ==
      Vector("hello", ",", "world", "!"))
    assert(WordPieceTokenizer.basicTokenize("café  naïve") ==
      Vector("cafe", "naive"))
    assert(WordPieceTokenizer.basicTokenize("don't stop") ==
      Vector("don", "'", "t", "stop"))
    assert(WordPieceTokenizer.basicTokenize("") == Vector.empty)
  }

  test("learned vocabulary is deterministic and encodes the seed style with 0 UNKs") {
    val a = WordPieceTokenizer()
    val b = WordPieceTokenizer.fromVocab(WordPieceTokenizer().vocab)
    assert(a.vocab == b.vocab)
    val text = "the committee announced a new program for schools"
    assert(a.encodeIds(text) == b.encodeIds(text))
    assert(!a.encode(text).contains(WordPieceTokenizer.Unk),
      s"seed-style English should not UNK: ${a.encode(text)}")
    // ids are vocab positions (the BERT line-number convention)
    assert(a.encodeIds(text).forall(id => id >= 0 && id < a.vocab.length))
  }

  test("vocab.txt round-trip preserves vocabulary and encodings byte for byte") {
    val tok = WordPieceTokenizer()
    val f = Files.createTempFile("wp", ".txt").toString
    tok.saveVocabFile(f)
    val loaded = WordPieceTokenizer.fromVocabFile(f)
    assert(loaded.vocab == tok.vocab)
    val text = "scientists studying the climate have found small changes"
    assert(loaded.encodeIds(text) == tok.encodeIds(text))
  }

  test("GATED: a full-size vocab.txt loads and tokenizes " +
      "(GRAFT_BERT_VOCAB points at a real published vocab; otherwise the " +
      "in-build synthetic 30k vocab trained by VocabTrainer)") {
    // zero-egress fallback: the 30k-piece vocabulary trained from the
    // synthetic morphological corpus (FullSizeVocabSpec) — same size
    // class and same assertions as a published BERT vocab, so this
    // gate RUNS in CI instead of cancelling
    val path = sys.env.get("GRAFT_BERT_VOCAB")
      .filter(p => new java.io.File(p).isFile)
      .orElse(Some(graft.text.FullVocabFiles.vocab))
    assume(path.exists(p => new java.io.File(p).isFile),
      "no full-size vocab.txt available")
    val tok = WordPieceTokenizer.fromVocabFile(path.get)
    // the BERT-family id conventions hold for any published vocab
    assert(tok.vocab.contains("[UNK]") && tok.vocab.contains("[CLS]"))
    assert(tok.vocab.length > 10000, s"real vocabs are large: ${tok.vocab.length}")
    // common English must not UNK and must round-trip decode
    val pieces = tok.encode("the quick brown fox")
    assert(pieces.nonEmpty && !pieces.contains(WordPieceTokenizer.Unk))
    assert(tok.decode(pieces) == "the quick brown fox")
  }

  test("decode inverts piece concatenation (modulo basic-tokenize lossiness)") {
    val tok = WordPieceTokenizer()
    val text = "the history of writing is the history of memory"
    assert(tok.decode(tok.encode(text)) == text)
    assert(tok.decodeIds(tok.encodeIds(text)) == text)
  }
}
