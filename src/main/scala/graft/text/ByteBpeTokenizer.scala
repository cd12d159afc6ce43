package graft.text

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import scala.collection.mutable

/** Self-contained byte-level BPE tokenizer — the engine-local
  * re-expression of the reference's tiktoken path (reference:
  * gpt3_tokenizer.py:1-13). The external model files (50k-merge
  * vocabularies) cannot ship in a zero-egress build, so the merge
  * table is LEARNED deterministically at class-init from an embedded
  * seed corpus using the public BPE training algorithm (Sennrich et
  * al. 2016; byte-level treatment per GPT-2): count pre-token words,
  * repeatedly merge the most frequent adjacent symbol pair (ties
  * broken lexicographically), record merge ranks. Encoding then
  * applies merges greedily by rank — the exact tiktoken/GPT-2
  * algorithm, just with a smaller table.
  *
  * Byte-level means LOSSLESS: text → UTF-8 bytes → printable-unicode
  * symbols (the GPT-2 bytes_to_unicode bijection) → merged tokens,
  * so decode(encode(x)) == x for every string, including emoji/CJK/
  * control bytes — stronger than the RegexTokenizer's
  * modulo-trailing-whitespace guarantee.
  *
  * Everything is deterministic: same seed corpus + same nMerges →
  * byte-identical merge table on every JVM, so token counts are
  * reproducible across the cluster and across rounds.
  *
  * DIVERGENCE FROM PRODUCTION VOCABULARIES (quantified in BpeSpec's
  * golden test): the algorithm is exactly tiktoken/GPT-2's, but this
  * 512-merge table learned from the embedded seed stops at short
  * subwords, so counts are NOT comparable to any production model's —
  * on a fixed public English sentence set it emits ~0.51 tokens/char
  * where GPT-2's 50k-merge vocabulary averages ~0.25 (OpenAI's
  * published "1 token ≈ 4 characters" rule), i.e. ≈2× the tokens for
  * the same text. Budgets tuned against real GPT-2 counts (the
  * reference's gpt3_tokenizer.py path) must halve `n_bpe_tokens`, or
  * swap in a real merge table — the encode/decode loop accepts any
  * table; only the zero-egress build rules out shipping one.
  */
final class ByteBpeTokenizer(nMerges: Int = ByteBpeTokenizer.DefaultMerges)
    extends Tokenizer {

  import ByteBpeTokenizer._

  private val merges: Map[(String, String), Int] = learnMerges(nMerges)

  /** token string (in byte-symbol space) → stable id; ids 0-255 are
    * the base byte alphabet, merged tokens follow in rank order.
    */
  val vocab: Map[String, Int] = {
    val base = (0 until 256).map(b => byteToChar(b).toString)
    val merged = merges.toSeq.sortBy(_._2).map { case ((a, b), _) => a + b }
    (base ++ merged).zipWithIndex.toMap
  }

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()

  /** Tokens are returned in byte-symbol space (each char is one
    * original byte) — `decode` inverts exactly.
    */
  def encode(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val m = PreTokenPattern.matcher(text)
    while (m.find()) {
      val word = m.group()
      var toks = cache.get(word)
      if (toks == null) {
        toks = bpe(toSymbols(word))
        if (cache.size < CacheMax) cache.put(word, toks)
      }
      out ++= toks
    }
    out.result()
  }

  def encodeIds(text: String): Vector[Int] = encode(text).map(vocab)

  def decode(tokens: Seq[String]): String = {
    val joined = tokens.mkString("")
    val bytes = new Array[Byte](joined.length)
    var i = 0
    while (i < joined.length) {
      bytes(i) = charToByte(joined.charAt(i))
      i += 1
    }
    new String(bytes, StandardCharsets.UTF_8)
  }

  def decodeIds(ids: Seq[Int]): String = decode(ids.map(idToToken))

  @transient private lazy val idToToken: Map[Int, String] =
    vocab.map(_.swap)

  /** The merge table in RANK ORDER, each side decoded to raw byte
    * space (the string the original bytes spell) together with the
    * merged token's vocab id — the export the ta_tokens_bpe DuckDB
    * oracle is generated from, so both engines run the same table.
    * Non-UTF8-decodable sides come out with replacement chars; the
    * oracle filters to the ASCII-only entries its corpus can ever
    * match, preserving rank order (only relative order drives the
    * greedy loop) and carrying true vocab ids explicitly.
    */
  def mergesRaw: Seq[(String, String, Int)] =
    merges.toSeq.sortBy(_._2).map { case ((a, b), rank) =>
      (decode(Seq(a)), decode(Seq(b)), 256 + rank)
    }

  /** Greedy rank-ordered merging — the standard BPE encode loop. */
  private def bpe(word: Vector[String]): Vector[String] = {
    var w = word
    var done = false
    while (!done && w.length >= 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < w.length - 1) {
        val r = merges.getOrElse((w(i), w(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val pair = (w(bestIdx), w(bestIdx + 1))
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < w.length) {
          if (j < w.length - 1 && w(j) == pair._1 && w(j + 1) == pair._2) {
            b += (pair._1 + pair._2); j += 2
          } else { b += w(j); j += 1 }
        }
        w = b.result()
      }
    }
    w
  }
}

object ByteBpeTokenizer {

  val DefaultMerges = 512
  private val CacheMax = 65536

  /** GPT-2's pre-tokenization split (public): contractions, letter
    * runs, digit runs, symbol runs, whitespace — each with optional
    * leading space so merges never cross word boundaries.
    */
  private val PreTokenPattern: Pattern = Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+")

  /** GPT-2 bytes_to_unicode: visible bytes map to themselves, the
    * rest shift into the 256+ plane — a bijection byte ↔ printable
    * char so merged tokens are plain strings.
    */
  private val byteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    val visible = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val visSet = visible.toSet
    var shift = 0
    (0 until 256).foreach { b =>
      if (visSet(b)) arr(b) = b.toChar
      else { arr(b) = (256 + shift).toChar; shift += 1 }
    }
    arr
  }

  private val charToByte: Map[Char, Byte] =
    (0 until 256).map(b => byteToChar(b) -> b.toByte).toMap

  private def toSymbols(word: String): Vector[String] =
    word.getBytes(StandardCharsets.UTF_8).toVector
      .map(b => byteToChar(b & 0xff).toString)

  /** BPE training (public algorithm): word frequencies from the seed
    * corpus, then nMerges rounds of "merge the most frequent adjacent
    * pair", ties broken lexicographically for determinism.
    */
  private def learnMerges(nMerges: Int): Map[(String, String), Int] = {
    val wordFreq = mutable.LinkedHashMap.empty[Vector[String], Long]
    val m = PreTokenPattern.matcher(SeedCorpus)
    while (m.find()) {
      val sym = toSymbols(m.group())
      wordFreq(sym) = wordFreq.getOrElse(sym, 0L) + 1L
    }
    var words = wordFreq.toVector
    val ranks = mutable.Map.empty[(String, String), Int]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        var i = 0
        while (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        ranks(best) = rank
        words = words.map { case (w, f) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == best._1 && w(j + 1) == best._2) {
              b += (best._1 + best._2); j += 2
            } else { b += w(j); j += 1 }
          }
          (b.result(), f)
        }
        rank += 1
      }
    }
    ranks.toMap
  }

  /** Embedded seed corpus: generic English + code-flavored text.
    * Deliberately mundane — the point is a stable merge table with
    * sensible English subwords, not linguistic coverage. Editing this
    * string changes every token count downstream; treat it as frozen.
    */
  private val SeedCorpus: String = """
    |The quick brown fox jumps over the lazy dog. A distributed query
    |engine reads data from storage, filters and projects the columns
    |it needs, joins tables on their keys, groups rows to aggregate
    |measures, and writes the results back to storage. The planner
    |chooses between a broadcast join and a shuffle join based on the
    |size of each input. Partitions of the data are processed in
    |parallel across the executors of the cluster, and the scheduler
    |assigns tasks to the workers that hold the relevant blocks.
    |
    |When the data is skewed, a single partition can dominate the
    |running time of the whole stage, so the engine salts the heavy
    |keys and recombines the partial results afterwards. Columnar
    |formats store the values of each column together, which makes
    |scans faster because only the referenced columns are read from
    |disk. Predicate pushdown moves the filters into the scan itself,
    |skipping row groups whose statistics show that no row can match.
    |
    |for (i <- 0 until n) { sum += values(i) * weights(i) }
    |def process(input: DataFrame): DataFrame = input.filter(col("x") > 0)
    |SELECT key, count(*) AS n FROM table GROUP BY key ORDER BY n DESC;
    |val result = spark.read.parquet(path).groupBy("id").agg(sum("v"))
    |if (x == null) return None else Some(x.toString.trim.toLowerCase)
    |
    |Language models consume long sequences of tokens, and the cost of
    |training grows with the number of tokens in the corpus. Cleaning
    |the corpus removes duplicated documents, boilerplate navigation
    |text, and machine generated spam. Quality filters score each
    |document by its length, punctuation ratio, and vocabulary, and
    |the sampler mixes the sources according to a recipe. The pipeline
    |computes fingerprints of the normalized text, buckets similar
    |documents together, and verifies candidate pairs exactly before
    |removing them. These are the operations that matter at scale: one
    |hundred terabytes of text cannot pass through a single machine,
    |so every step must run in parallel with bounded memory on each
    |worker. 0 1 2 3 4 5 6 7 8 9 10 100 1000 2024 3.14 0.5
    |""".stripMargin
}
