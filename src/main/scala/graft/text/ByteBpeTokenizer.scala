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
  * golden test): the algorithm is exactly tiktoken/GPT-2's, but the
  * default table is learned from the embedded seed, so counts are NOT
  * identical to any production model's — on a fixed public English
  * sentence set the default table emits ~0.34 tokens/char where
  * GPT-2's 50k-merge vocabulary averages ~0.25 (OpenAI's published
  * "1 token ≈ 4 characters" rule), i.e. ≈1.4× the tokens for the same
  * text (the round-5 512-merge table was ≈2×). Budgets tuned against
  * real GPT-2 counts (the reference's gpt3_tokenizer.py path) should
  * scale `n_bpe_tokens` by that measured factor — or load the REAL
  * public table: [[ByteBpeTokenizer.fromMergesFile]] reads the
  * standard GPT-2 `merges.txt` format directly (the byte↔unicode
  * symbol mapping here is exactly GPT-2's `bytes_to_unicode`, so the
  * published 50k-merge file drops in unchanged); only the zero-egress
  * build keeps it from shipping embedded.
  */
final class ByteBpeTokenizer private (
    private val merges: Map[(String, String), Int]) extends Tokenizer {

  import ByteBpeTokenizer._

  /** Default: the table learned from the embedded seed corpus
    * (memoized per nMerges — training runs once per JVM).
    */
  def this(nMerges: Int = ByteBpeTokenizer.DefaultMerges) =
    this(ByteBpeTokenizer.learnedMerges(nMerges))

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

  /** The merge table in the standard GPT-2 `merges.txt` line format
    * (byte-symbol space, one "left right" pair per line, rank order,
    * version header) — [[ByteBpeTokenizer.fromMergesLines]] inverts
    * exactly, so a learned table round-trips through the same file
    * format a real GPT-2 vocabulary ships in.
    */
  def mergesLines: Seq[String] =
    "#version: 0.2" +: merges.toSeq.sortBy(_._2).map { case ((a, b), _) => s"$a $b" }

  /** Write the table as a standard merges.txt. */
  def saveMergesFile(path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      mergesLines.mkString("\n").getBytes(StandardCharsets.UTF_8)): Unit

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

  val DefaultMerges = 4096
  private val CacheMax = 65536

  /** Learned tables are memoized per nMerges: training over the seed
    * corpus is O(nMerges × seed words) and must run once per JVM, not
    * once per query build / executor task.
    */
  private val learned =
    new java.util.concurrent.ConcurrentHashMap[Int, Map[(String, String), Int]]()

  private[text] def learnedMerges(nMerges: Int): Map[(String, String), Int] =
    learned.computeIfAbsent(nMerges, learnMerges(_))

  /** Build from an explicit rank-ordered pair list (byte-symbol
    * space) — the loaded-vocabulary path.
    */
  def fromMerges(pairs: Seq[(String, String)]): ByteBpeTokenizer =
    new ByteBpeTokenizer(pairs.zipWithIndex.toMap)

  /** Parse the standard GPT-2 `merges.txt` format: optional
    * `#version` header and comment/blank lines, then one
    * "left right" pair per line in rank order, sides written in the
    * byte→unicode symbol alphabet (identical to [[byteToChar]], so
    * the published GPT-2/RoBERTa files load unchanged — byte 0x20 is
    * 'Ġ', never a literal space, making the single-space split
    * unambiguous). Malformed lines fail loudly with their line
    * number.
    */
  def fromMergesLines(lines: IterableOnce[String]): ByteBpeTokenizer = {
    val pairs = lines.iterator.zipWithIndex
      .filterNot { case (l, _) => l.isEmpty || l.startsWith("#") }
      .map { case (line, ln) =>
        val parts = line.split(" ", -1)
        require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
          s"merges line ${ln + 1}: expected 'left right', got '$line'")
        parts.foreach(_.foreach { c =>
          require(charToByte.contains(c),
            s"merges line ${ln + 1}: symbol '$c' (U+${c.toInt.toHexString}) " +
              "is outside the byte-symbol alphabet")
        })
        (parts(0), parts(1))
      }.toVector
    fromMerges(pairs)
  }

  /** Load a standard GPT-2-format merges.txt (see
    * [[fromMergesLines]]).
    */
  def fromMergesFile(path: String): ByteBpeTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromMergesLines(src.getLines()) finally src.close()
  }

  /** GPT-2's pre-tokenization split (public): contractions, letter
    * runs, digit runs, symbol runs, whitespace — each with optional
    * leading space so merges never cross word boundaries.
    */
  private[text] val PreTokenPattern: Pattern = Pattern.compile(
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

  private[text] def toSymbols(word: String): Vector[String] =
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
    * (Round 6 deliberately grew it — together with DefaultMerges
    * 512 → 4096 — to recalibrate tokens/char from ~0.51 toward the
    * ~0.25 of production vocabularies; BpeSpec's goldens were
    * re-pinned with it. It is general common English on purpose:
    * BpeSpec's held-out golden sentences are NOT included.)
    */
  private[text] lazy val SeedCorpus: String = SeedCorpusCore + """
    |People said that the old house at the end of the road had been
    |empty for years, but nobody could remember who had lived there
    |before. In the morning she walked down to the water and watched
    |the boats come in, and in the evening she wrote letters that she
    |never sent. He thought about what his father had told him, that
    |work done well is its own reward, and that a person should never
    |promise more than they can deliver. The children were playing in
    |the garden behind the school while their teacher talked with the
    |other parents about the coming winter. It was already getting
    |dark when they finally reached the village, and the lights in the
    |windows made everything look warm and quiet. There is nothing
    |more important than knowing when to speak and when to listen.
    |
    |The government announced a new program that would provide money
    |for schools and hospitals in every part of the country. Members
    |of the committee argued about the best way to measure the results
    |of the policy, and the discussion continued late into the night.
    |According to the report, the number of people working in the
    |industry increased again last year, although growth was slower
    |than expected. The company developed a system that allows users
    |to manage their accounts, change their settings, and download
    |their information at any time. Scientists studying the climate
    |have found that small changes in temperature can have large
    |effects on plants and animals across entire regions. The history
    |of writing is the history of civilization itself; without records
    |there can be no memory, and without memory there can be no
    |learning. Students should always question what they read,
    |consider the evidence carefully, and form their own conclusions.
    |
    |She opened the window because the room was too warm, and the
    |sound of the street filled the apartment. They would have gone
    |earlier if the weather had been better. I don't know whether he
    |will come, but we're ready either way. You shouldn't worry about
    |things that haven't happened yet. We've seen this before, and
    |it's never been a problem. The first thing you notice about the
    |city is how quickly everything moves, and the second is how
    |easily people make room for one another. Every generation
    |believes that the world is changing faster than ever before, and
    |every generation is right. Reading a good book is like talking
    |with a friend who always has something interesting to say.
    |
    |The national team played well in the first half, but the visitors
    |scored twice after the break and won the match three to one. The
    |doctor explained the treatment slowly, making sure the patient
    |understood each step before moving to the next. The market opened
    |higher this morning following strong results from several large
    |technology companies. Police said the road would remain closed
    |until the damage from the storm could be repaired. The museum's
    |new exhibition brings together paintings and photographs from
    |three different collections, telling the story of the city over
    |two hundred years. The recipe calls for flour, butter, sugar,
    |three eggs, and a little salt, mixed together until smooth.
    |Travelers are advised to arrive early, carry water, and check the
    |schedule for changes. The building was designed to use natural
    |light throughout the day, reducing the energy needed for heating
    |and cooling. Music, like language, is learned first by listening
    |and only later by study and practice.
    |
    |management development environment information international
    |understanding organization relationship responsibility particular
    |production education experience community television statement
    |performance difference population significant individual
    |especially probably actually certainly recently quickly slowly
    |carefully completely suddenly finally usually really working
    |playing running walking talking looking thinking feeling being
    |having doing saying getting making going coming seeing knowing
    |wanted needed seemed turned called asked moved lived believed
    |happened watched followed stopped created included considered
    |national natural general special public private possible likely
    |available different important interesting beautiful wonderful
    |stronger strongest larger largest smaller smallest better best
    |kindness darkness weakness happiness business witness careless
    |hopeful useful helpful powerful successful agreement movement
    |moment treatment department apartment equipment argument payment
    |action station nation section attention question direction
    |position condition situation education relation collection
    |
    |Why do some ideas spread while others disappear? The answer
    |depends partly on chance and partly on how simply an idea can be
    |explained. When you ask people what they value most, they rarely
    |mention objects; they talk about family, friends, health, and
    |time. Consider the humble bicycle: invented in the nineteenth
    |century, it remains among the most efficient machines ever built,
    |converting almost all of a rider's effort into motion. Between
    |1950 and 2000 the population of many cities doubled, while the
    |area they covered grew even faster. On 15 March 2021, after
    |months of preparation, the expedition finally set out toward the
    |mountains. Prices rose by 3.5 percent in the second quarter,
    |slightly below the 4.2 percent forecast. "Where are you going?"
    |she asked. "Home," he said, "before the rain starts." Numbers
    |like 7, 21, 365, and 1000 appear everywhere once you start
    |looking for them. The train leaves at 08:45 from platform 6.
    |
    |Knowledge grows when observations are recorded, compared, and
    |tested against each other. A hypothesis that cannot be tested is
    |merely an opinion. Early astronomers charted the motion of the
    |planets with remarkable accuracy using nothing but patience and
    |simple instruments. Modern medicine depends on careful trials in
    |which neither the patient nor the doctor knows who received the
    |treatment. Engineers learn more from a bridge that fails than
    |from a hundred that stand, because failure reveals the limits of
    |their assumptions. Languages borrow words from their neighbors:
    |English took its vocabulary from Latin, French, Norse, and a
    |dozen others, which is why its spelling follows no single rule.
    |The ocean covers more than two thirds of the planet, yet we have
    |mapped the surface of the moon in greater detail. Farmers have
    |always watched the sky, reading tomorrow's weather in tonight's
    |clouds. Everyone agrees that exercise matters; fewer agree on how
    |much is enough. If you want to understand a society, look first
    |at what it builds and second at what it throws away.
    |
    |although however therefore because whether against between among
    |through during without within toward beyond across behind beneath
    |anyone everyone someone nothing anything everything somewhere
    |themselves yourself himself herself ourselves whatever whenever
    |answered appeared arrived attempted avoided brought carried
    |changed charged checked claimed climbed closed compared continued
    |covered crossed decided delivered described designed discovered
    |discussed dropped earned entered expected explained expressed
    |finished forgotten gathered handled imagined improved increased
    |introduced invited joined jumped knocked landed laughed learned
    |listened managed marked married matched mentioned missed noticed
    |offered opened ordered organized passed performed picked planned
    |pointed prepared presented pressed produced promised pronounced
    |protected proved provided pulled pushed raised reached realized
    |received recognized recorded remained remembered removed repeated
    |replaced replied reported required returned revealed rolled
    |"""
    .stripMargin

  private val SeedCorpusCore: String = """
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
