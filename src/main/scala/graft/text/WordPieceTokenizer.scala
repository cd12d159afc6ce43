package graft.text

import java.nio.charset.StandardCharsets
import java.text.Normalizer

import scala.collection.mutable

/** Self-contained WordPiece tokenizer — the engine-local
  * re-expression of the reference's BERT-family tokenizer path
  * (reference: all_MiniLM_L6_v2_tokenizer.py:1-23, which wraps the
  * HuggingFace `sentence-transformers/all-MiniLM-L6-v2` WordPiece
  * vocabulary). The external 30k-entry vocab.txt cannot ship in a
  * zero-egress build, so the vocabulary is LEARNED deterministically
  * at class-init from the same embedded seed corpus the BPE tokenizer
  * trains on, using the public WordPiece training rule (Schuster &
  * Nakajima 2012; the HF tokenizers likelihood formulation): merge
  * the adjacent pair maximizing count(ab) / (count(a)·count(b)),
  * ties broken lexicographically. Scores compare as cross-multiplied
  * exact integers, so the fit is float-free and byte-identical on
  * every JVM.
  *
  * ENCODING is the standard BERT WordpieceTokenizer algorithm
  * (public, Devlin et al. 2019): basic-tokenize (NFD accent strip,
  * lowercase — the MiniLM model is uncased — whitespace split, each
  * punctuation char its own token), then per word a GREEDY
  * LONGEST-MATCH-FIRST scan against the vocabulary: the longest
  * prefix present in the vocab (continuation pieces carry the `##`
  * prefix) is emitted and the cursor advances; a position with no
  * matching prefix — or a word over [[WordPieceTokenizer.MaxWordChars]]
  * chars — collapses the whole word to `[UNK]`.
  *
  * Ids are vocabulary positions (= line numbers of the vocab.txt
  * form, the BERT convention): the 5 specials `[PAD] [UNK] [CLS]
  * [SEP] [MASK]` first, then the single-char alphabet, then learned
  * pieces in merge order. [[WordPieceTokenizer.fromVocabFile]] reads
  * the standard one-token-per-line vocab.txt format, so the real
  * published MiniLM/BERT vocabulary drops in unchanged — the same
  * drop-in contract ByteBpeTokenizer.fromMergesFile gives GPT-2
  * merges (zero egress is a data gap, not a code gap).
  *
  * decode() inverts the piece concatenation (strip `##`, join words
  * with single spaces) — lossy exactly where BERT's is (case,
  * accents, whitespace runs, and anything that hit `[UNK]`).
  */
final class WordPieceTokenizer private (val vocab: IndexedSeq[String])
    extends Serializable {

  import WordPieceTokenizer._

  require(vocab.contains(Unk), s"vocabulary must contain $Unk")

  @transient private lazy val vocabIndex: Map[String, Int] =
    vocab.zipWithIndex.toMap

  @transient private lazy val unkId: Int = vocabIndex(Unk)

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()

  /** Word-level pieces for one already-basic-tokenized word — the
    * BERT greedy longest-match-first loop.
    */
  def tokenizeWord(word: String): Vector[String] = {
    if (word.length > MaxWordChars) return Vector(Unk)
    var cached = cache.get(word)
    if (cached != null) return cached
    val out = Vector.newBuilder[String]
    var pos = 0
    var failed = false
    while (pos < word.length && !failed) {
      var len = word.length - pos
      var hit: String = null
      while (len > 0 && hit == null) {
        val piece =
          if (pos == 0) word.substring(0, len)
          else "##" + word.substring(pos, pos + len)
        if (vocabIndex.contains(piece)) hit = piece else len -= 1
      }
      if (hit == null) failed = true
      else { out += hit; pos += len }
    }
    val res = if (failed) Vector(Unk) else out.result()
    if (cache.size < CacheMax) cache.put(word, res)
    res
  }

  def encode(text: String): Vector[String] =
    basicTokenize(text).flatMap(tokenizeWord)

  def encodeIds(text: String): Vector[Int] = encode(text).map(vocabIndex)

  def decode(tokens: Seq[String]): String = {
    val sb = new StringBuilder
    tokens.foreach { t =>
      if (t.startsWith("##")) sb.append(t.substring(2))
      else {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(t)
      }
    }
    sb.toString
  }

  def decodeIds(ids: Seq[Int]): String = decode(ids.map(vocab))

  /** The vocabulary in the standard BERT vocab.txt line format (one
    * token per line, id = line number) — [[WordPieceTokenizer.fromVocabLines]]
    * inverts exactly.
    */
  def vocabLines: Seq[String] = vocab

  def saveVocabFile(path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      vocabLines.mkString("\n").getBytes(StandardCharsets.UTF_8)): Unit
}

object WordPieceTokenizer {

  val Unk = "[UNK]"
  val Specials: IndexedSeq[String] =
    IndexedSeq("[PAD]", Unk, "[CLS]", "[SEP]", "[MASK]")

  /** BERT's max_input_chars_per_word: longer words skip matching and
    * collapse to [UNK] (bounds the O(len²) scan per word).
    */
  val MaxWordChars = 100

  val DefaultPieces = 2048
  private val CacheMax = 65536

  /** Learned vocabularies are memoized per size — training over the
    * seed corpus runs once per JVM, not once per executor task.
    */
  private val learned =
    new java.util.concurrent.ConcurrentHashMap[Int, IndexedSeq[String]]()

  /** Default: the vocabulary learned from the embedded seed corpus. */
  def apply(nPieces: Int = DefaultPieces): WordPieceTokenizer =
    new WordPieceTokenizer(learned.computeIfAbsent(nPieces, learnVocab(_)))

  /** Build from an explicit id-ordered token list — the
    * loaded-vocabulary path.
    */
  def fromVocab(tokens: Seq[String]): WordPieceTokenizer =
    new WordPieceTokenizer(tokens.toIndexedSeq)

  /** Parse the standard BERT vocab.txt format: one token per line in
    * id order (blank lines are invalid — a real vocab has none and a
    * silent skip would shift every id after it).
    */
  def fromVocabLines(lines: IterableOnce[String]): WordPieceTokenizer = {
    val toks = lines.iterator.zipWithIndex.map { case (l, ln) =>
      require(l.nonEmpty, s"vocab line ${ln + 1}: empty token")
      l
    }.toVector
    fromVocab(toks)
  }

  def fromVocabFile(path: String): WordPieceTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromVocabLines(src.getLines()) finally src.close()
  }

  /** BERT's uncased basic tokenizer: NFD + strip combining marks,
    * lowercase, whitespace split, punctuation chars split into
    * single-char tokens.
    */
  def basicTokenize(text: String): Vector[String] = {
    val stripped = Normalizer.normalize(text, Normalizer.Form.NFD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
      .toLowerCase
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    stripped.foreach { c =>
      if (c.isWhitespace) flush()
      else if (isPunct(c)) { flush(); out += c.toString }
      else cur.append(c)
    }
    flush()
    out.result()
  }

  /** BERT's _is_punctuation: ASCII non-alphanumeric printables plus
    * Unicode P* categories.
    */
  private def isPunct(c: Char): Boolean = {
    val cp = c.toInt
    ((cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126)) || {
      val t = Character.getType(c)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
        t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
        t == Character.INITIAL_QUOTE_PUNCTUATION ||
        t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
    }
  }

  /** WordPiece training (public algorithm): word frequencies from the
    * basic-tokenized seed corpus, symbols = first char + ##-prefixed
    * continuations, then up to nPieces rounds of "merge the pair with
    * the best count(ab)/(count(a)·count(b)) likelihood score". The
    * score comparison cross-multiplies in Long arithmetic (counts are
    * ≤ corpus size, so the triple products stay far below 2^63) —
    * no float ever enters the fit.
    */
  private def learnVocab(nPieces: Int): IndexedSeq[String] = {
    val wordFreq = mutable.LinkedHashMap.empty[Vector[String], Long]
    basicTokenize(ByteBpeTokenizer.SeedCorpus).foreach { w =>
      val sym = w.head.toString +: w.tail.map("##" + _).toVector
      wordFreq(sym) = wordFreq.getOrElse(sym, 0L) + 1L
    }
    var words = wordFreq.toVector
    val alphabet = words.flatMap(_._1).distinct.sorted
    val pieces = mutable.ArrayBuffer.empty[String]
    var round = 0
    var exhausted = false
    while (round < nPieces && !exhausted) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      val symCounts = mutable.Map.empty[String, Long]
      words.foreach { case (w, f) =>
        w.foreach(s => symCounts(s) = symCounts.getOrElse(s, 0L) + f)
        var i = 0
        while (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // best likelihood: c/(fa·fb); compare c1·fa2·fb2 vs c2·fa1·fb1
        var best: (String, String) = null
        var bc, bfa, bfb = 1L
        pairCounts.foreach { case (p @ (a, b), c) =>
          val fa = symCounts(a); val fb = symCounts(b)
          val cmp =
            if (best == null) 1
            else java.lang.Long.compare(c * bfa * bfb, bc * fa * fb)
          val better = cmp > 0 || (cmp == 0 && best != null &&
            (a < best._1 || (a == best._1 && b < best._2)))
          if (better) { best = p; bc = c; bfa = fa; bfb = fb }
        }
        val merged = best._1 + best._2.stripPrefix("##")
        pieces += merged
        words = words.map { case (w, f) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == best._1 && w(j + 1) == best._2) {
              b += merged; j += 2
            } else { b += w(j); j += 1 }
          }
          (b.result(), f)
        }
        round += 1
      }
    }
    Specials ++ alphabet ++ pieces
  }
}
