package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic synthetic-but-full-size vocabulary corpus: the
  * zero-egress stand-in for training at production vocabulary size.
  * Word types are real-English roots (harvested from the embedded
  * seed corpus plus an explicit common-word list) expanded through a
  * morphological affix grid, with Zipf-ish deterministic frequencies
  * — so a 50k-merge BPE table and a 30k-piece WordPiece vocabulary
  * are actually LEARNABLE from it, and the resulting tables tokenize
  * plain English at production-like tokens/char.
  */
object SyntheticVocabCorpus {

  private val common = Vector(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "a", "an", "and", "or", "but", "of", "to", "in", "on", "at", "by",
    "for", "with", "from", "into", "about", "after", "before", "is",
    "are", "was", "were", "be", "been", "has", "have", "had", "will",
    "would", "can", "could", "should", "not", "no", "yes", "all",
    "any", "each", "more", "most", "other", "some", "such", "only",
    "own", "same", "so", "than", "too", "very", "just", "now", "then",
    "here", "there", "when", "where", "why", "how", "what", "which",
    "who", "this", "that", "these", "those", "it", "its", "they",
    "them", "their", "we", "our", "you", "your", "he", "she", "his",
    "her", "one", "two", "new", "old", "good", "great", "little",
    "long", "many", "much", "time", "day", "year", "way", "man",
    "world", "life", "hand", "part", "place", "work", "word", "water")

  private val prefixes = Vector(
    "", "un", "re", "pre", "over", "under", "out", "non", "anti",
    "inter", "sub", "super", "semi", "mid", "mis", "dis", "co", "de",
    "multi", "trans")

  private val suffixes = Vector(
    "", "s", "ed", "ing", "er", "ers", "est", "ly", "ness", "ment",
    "tion", "al", "ic", "ous", "ful", "less", "ish", "able", "ity",
    "ism", "ist", "ize", "ized", "ation", "ments", "ings", "ance",
    "ive", "ary", "ology")

  /** ~35k distinct lowercase word types with deterministic
    * frequencies (total mass well under the 1e6 Long-overflow bound
    * documented on the scored trainer).
    */
  lazy val baseWords: Vector[(String, Long)] = {
    val roots = (ByteBpeTokenizer.SeedCorpus.toLowerCase
      .split("[^a-z]+").filter(_.length >= 3).toVector ++ common).distinct.sorted
    val out = Vector.newBuilder[(String, Long)]
    common.zipWithIndex.foreach { case (w, i) => out += ((w, 3000L - i * 20L)) }
    val commonSet = common.toSet
    roots.foreach { r =>
      if (!commonSet.contains(r)) out += ((r, 150L + math.abs(r.hashCode % 100)))
      prefixes.foreach { p =>
        suffixes.foreach { s =>
          if (p.nonEmpty || s.nonEmpty) {
            val w = p + r + s
            // deterministic thinning: keep ~30% of the affix grid
            if (math.floorMod((p + "|" + r + "|" + s).hashCode, 100) < 30)
              out += ((w, 1L + math.floorMod(w.hashCode, 7).toLong))
          }
        }
      }
    }
    out.result().distinct
  }

  /** The same types in BPE pre-token space: the dominant
    * space-prefixed running-text form, the bare sentence/line-initial
    * form, and (for the common words) capitalized variants — plus
    * punctuation pre-tokens, so the learned table sees realistic
    * GPT-2 pre-token shapes.
    */
  lazy val bpeHistogram: Seq[(String, Long)] = {
    val out = Vector.newBuilder[(String, Long)]
    baseWords.foreach { case (w, f) =>
      out += ((" " + w, f))
      out += ((w, math.max(1L, f / 20)))
    }
    common.foreach { w =>
      val cap = w.capitalize
      out += ((" " + cap, 40L))
      out += ((cap, 30L))
    }
    Seq(".", ",", "!", "?", ";", ":", "'s", ")", " (").foreach(p => out += ((p, 500L)))
    out.result()
  }

  def totalMass: Long = bpeHistogram.map(_._2).sum
}

/** Memoized full-size table files (trained once per build into
  * target/full_vocab): the in-CI stand-ins the env-gated drop-in
  * specs fall back to when no real published table is provided.
  */
object FullVocabFiles {

  private val dir = java.nio.file.Files.createDirectories(
    java.nio.file.Paths.get("target", "full_vocab")).toString

  lazy val merges: String = synchronized {
    val p = s"$dir/merges_50k.txt"
    if (!new java.io.File(p).isFile) {
      val m = VocabTrainer.bpeMerges(SyntheticVocabCorpus.bpeHistogram, 50000)
      require(m.size == 50000, s"expected a full-size table, learned ${m.size}")
      ByteBpeTokenizer.fromMerges(m).saveMergesFile(p)
    }
    p
  }

  lazy val vocab: String = synchronized {
    val p = s"$dir/vocab_30k.txt"
    if (!new java.io.File(p).isFile) {
      val v = VocabTrainer.wordPieceVocab(SyntheticVocabCorpus.baseWords, 30000)
      require(v.size >= 30000, s"expected a full-size vocab, got ${v.size}")
      WordPieceTokenizer.fromVocab(v).saveVocabFile(p)
    }
    p
  }
}

class FullSizeVocabSpec extends AnyFunSuite {

  // ---- exactness: the incremental trainer IS the seed learner ----

  test("bpeMerges reproduces the seed learner's merge sequence exactly") {
    val hist = {
      val m = ByteBpeTokenizer.PreTokenPattern.matcher(ByteBpeTokenizer.SeedCorpus)
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      while (m.find()) counts(m.group()) = counts.getOrElse(m.group(), 0L) + 1L
      counts.toSeq
    }
    val n = 600
    val fast = VocabTrainer.bpeMerges(hist, n)
    val ref = ByteBpeTokenizer.learnedMerges(n).toSeq.sortBy(_._2).map(_._1)
    assert(fast.size == ref.size)
    fast.zip(ref).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f == r, s"rank $i: fast=$f ref=$r")
    }
  }

  test("wordPieceVocab reproduces the seed learner's vocabulary exactly") {
    val words = {
      val ws = WordPieceTokenizer.basicTokenize(ByteBpeTokenizer.SeedCorpus)
      val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      ws.foreach(w => counts(w) = counts.getOrElse(w, 0L) + 1L)
      counts.toSeq
    }
    val n = 600
    val fast = VocabTrainer.wordPieceVocab(words, n)
    val ref = WordPieceTokenizer(n).vocab
    assert(fast.size == ref.size)
    fast.zip(ref).zipWithIndex.foreach { case ((f, r), i) =>
      assert(f == r, s"id $i: fast=$f ref=$r")
    }
  }

  // ---- full-size tables, trained + saved + reloaded in CI ----

  private lazy val dir = java.nio.file.Files.createDirectories(
    java.nio.file.Paths.get("target", "full_vocab")).toString

  lazy val mergesPath: String = FullVocabFiles.merges

  lazy val vocabPath: String = FullVocabFiles.vocab

  test("corpus mass stays under the scored-trainer Long bound") {
    // the scored (WordPiece) trainer cross-multiplies count·fa·fb;
    // all three are bounded by the training mass, so mass must stay
    // under cbrt(2^63) ≈ 2.09e6. The BPE path is count-only (no
    // products), so only the baseWords histogram is constrained.
    val scoredMass = SyntheticVocabCorpus.baseWords.map(_._2).sum
    assert(scoredMass < 2000000L,
      s"mass $scoredMass risks comparator overflow in the scored trainer")
  }

  test("full-size merges.txt (50k) loads and tokenizes at production quality") {
    val tok = ByteBpeTokenizer.fromMergesFile(mergesPath)
    // the same contract the env-gated real-table spec asserts
    assert(tok.vocab.size > 10000, s"real tables are large: ${tok.vocab.size}")
    val text = "The quick brown fox jumps over the lazy dog."
    assert(tok.decode(tok.encode(text)) == text)
    val perChar = tok.encode(text).length.toDouble / text.length
    assert(perChar < 0.32, f"full-size tables should reach ~0.25 tokens/char, got $perChar%.3f")
  }

  test("full-size vocab.txt (30k) loads and tokenizes at production quality") {
    val tok = WordPieceTokenizer.fromVocabFile(vocabPath)
    assert(tok.vocab.contains("[UNK]") && tok.vocab.contains("[CLS]"))
    assert(tok.vocab.length > 10000, s"real vocabs are large: ${tok.vocab.length}")
    val pieces = tok.encode("the quick brown fox")
    assert(pieces.nonEmpty && !pieces.contains(WordPieceTokenizer.Unk))
    assert(tok.decode(pieces) == "the quick brown fox")
  }

  test("full-size tables round-trip the file format byte for byte") {
    val tok = ByteBpeTokenizer.fromMergesFile(mergesPath)
    val p2 = s"$dir/merges_rt.txt"
    tok.saveMergesFile(p2)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mergesPath)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))))
    val wp = WordPieceTokenizer.fromVocabFile(vocabPath)
    val p3 = s"$dir/vocab_rt.txt"
    wp.saveVocabFile(p3)
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(vocabPath)),
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p3))))
  }

  test("full-size encode throughput is table-size-robust (greedy stays bounded)") {
    val tok = ByteBpeTokenizer.fromMergesFile(mergesPath)
    val text = ("the government announced a new program that would provide " +
      "money for schools and hospitals in every part of the country ") * 50
    val t0 = System.nanoTime()
    val n = tok.encode(text).length
    val dt = (System.nanoTime() - t0) / 1e9
    assert(n > 0)
    assert(dt < 5.0, f"50k-table encode of ${text.length} chars took $dt%.2f s")
  }
}
