package graft.text

import scala.collection.mutable

/** Corpus-scale tokenizer-vocabulary training.
  *
  * The embedded-seed learners in [[ByteBpeTokenizer]] /
  * [[WordPieceTokenizer]] recount every pair each round — fine for a
  * few-KB seed and a ~2k table, quadratic death for a production-size
  * 50k-merge fit. This trainer computes the SAME sequence (identical
  * scores, identical lexicographic tie-breaks — FullSizeVocabSpec
  * pins bit-equality against the reference learners on the seed
  * corpus) with incremental pair bookkeeping and a lazily-revalidated
  * priority queue, so a 50k-merge / 30k-piece fit over a
  * 100k-word-type histogram runs in seconds.
  *
  * Scale contract: training input is a WORD-TYPE HISTOGRAM, not the
  * corpus. At 100 TB the histogram is computed distributed (one
  * map-side-combined groupBy — [[wordHistogram]]) and only the capped
  * top-K types come to the driver; the merge loop itself is
  * inherently sequential (each rank depends on the previous) and runs
  * driver-side on the histogram, exactly how production BPE fits are
  * run (reference: vectra-py ships pre-fitted external vocabularies,
  * gpt3_tokenizer.py:1-23; this trainer is the in-engine path to
  * produce such a table).
  */
object VocabTrainer {

  /** max word-type histogram rows collected to the driver by the
    * corpus-input paths — ~60 B/row, so the default is ~60 MB. Tail
    * types beyond the cap are hapax-like noise a BPE fit ignores
    * anyway (their mass is spread over already-counted subword
    * pairs... they simply don't contribute counts).
    */
  val MaxWordTypes = 1000000

  /** Distributed word-type histogram in BPE pre-token space: GPT-2
    * pre-tokenization per document, groupBy word (map-side combined),
    * top [[MaxWordTypes]] by (count desc, word asc) for determinism.
    */
  def wordHistogram(df: org.apache.spark.sql.DataFrame, textCol: String,
      maxTypes: Int = MaxWordTypes): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val words = graft.Tables.fanOut(df).select(col(textCol).cast("string"))
      .as[String]
      .flatMap { text =>
        val m = ByteBpeTokenizer.PreTokenPattern.matcher(if (text == null) "" else text)
        val out = mutable.ArrayBuffer.empty[String]
        while (m.find()) out += m.group()
        out
      }
    words.groupBy(col("value").as("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(maxTypes)
      .as[(String, Long)]
      .collect()
      .toSeq
  }

  /** Learn `nMerges` byte-BPE merges from a word-type histogram
    * (words in RAW text space; byte-symbol conversion happens here).
    * Returns pairs in rank order — feed to
    * [[ByteBpeTokenizer.fromMerges]] or save via
    * [[ByteBpeTokenizer.saveMergesFile]]. Equivalent to the seed
    * learner: max pair count, ties to the lexicographically smallest
    * (a, b).
    */
  def bpeMerges(wordFreq: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    val syms = wordFreq.map { case (w, f) => (ByteBpeTokenizer.toSymbols(w), f) }
    learnLoop(syms, nMerges, scored = false, mergeSym = (a, b) => a + b)
  }

  /** Learn up to `nPieces` WordPiece pieces from a word-type
    * histogram (words raw; they are NOT basic-tokenized here — feed
    * the output of a basic tokenizer or an already-clean word list).
    * Returns the pieces in learn order; a full vocabulary is
    * `WordPieceTokenizer.Specials ++ alphabet ++ pieces` (see
    * [[wordPieceVocab]]). Scoring is BERT's likelihood
    * count(ab)/(count(a)·count(b)), ties to the smallest (a, b) —
    * identical to the seed learner. Counts must keep the triple
    * products under 2^63: total corpus mass ≤ ~1e6 is safe (the same
    * documented bound as the seed learner).
    */
  def wordPiecePieces(wordFreq: Seq[(String, Long)], nPieces: Int): Vector[String] = {
    val syms = wordFreq.collect { case (w, f) if w.nonEmpty =>
      (w.head.toString +: w.tail.map("##" + _).toVector, f)
    }
    learnLoop(syms, nPieces, scored = true,
      mergeSym = (a, b) => a + b.stripPrefix("##")).map { case (a, b) => a + b.stripPrefix("##") }
  }

  /** Full BERT-convention vocabulary from a histogram: specials,
    * then the sorted symbol alphabet, then learned pieces.
    */
  def wordPieceVocab(wordFreq: Seq[(String, Long)], nPieces: Int): IndexedSeq[String] = {
    val alphabet = wordFreq.collect { case (w, _) if w.nonEmpty =>
      w.head.toString +: w.tail.map("##" + _).toVector
    }.flatten.distinct.sorted
    WordPieceTokenizer.Specials ++ alphabet ++ wordPiecePieces(wordFreq, nPieces)
  }

  // ---- the shared incremental learner ----

  /** PQ entry: the score components at push time. For the unscored
    * (BPE) variant fa=fb=1 so the cross-multiplied comparison
    * degenerates to plain count order.
    */
  private final case class Cand(a: String, b: String, c: Long, fa: Long, fb: Long)

  private val candOrd: java.util.Comparator[Cand] = new java.util.Comparator[Cand] {
    def compare(x: Cand, y: Cand): Int = {
      // higher score first: x.c/(x.fa·x.fb) vs y.c/(y.fa·y.fb)
      val cmp = java.lang.Long.compare(y.c * x.fa * x.fb, x.c * y.fa * y.fb)
      if (cmp != 0) cmp
      else {
        val ca = x.a.compareTo(y.a)
        if (ca != 0) ca else x.b.compareTo(y.b)
      }
    }
  }

  private def learnLoop(input: Seq[(Vector[String], Long)], nMerges: Int,
      scored: Boolean, mergeSym: (String, String) => String): Vector[(String, String)] = {
    val words = input.map(_._1.toArray).toArray
    val freqs = input.map(_._2).toArray
    val lens = words.map(_.length)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val symCount = mutable.HashMap.empty[String, Long]
    // pair -> word indices where the pair has (ever) occurred; lazily
    // pruned — membership is re-verified against the word at use time
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // symbol -> pairs (ever) containing it, for score re-push on
    // symbol-count change (scored variant only)
    val symPairs =
      if (scored) mutable.HashMap.empty[String, mutable.Set[(String, String)]] else null

    val pq = new java.util.PriorityQueue[Cand](candOrd)

    def fa(s: String): Long = if (scored) symCount.getOrElse(s, 0L) else 1L

    def push(p: (String, String)): Unit = {
      val c = pairCount.getOrElse(p, 0L)
      if (c > 0L) pq.add(new Cand(p._1, p._2, c, fa(p._1), fa(p._2))): Unit
    }

    def addPair(p: (String, String), f: Long, wi: Int): Unit = {
      pairCount(p) = pairCount.getOrElse(p, 0L) + f
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
      if (scored) {
        symPairs.getOrElseUpdate(p._1, mutable.Set.empty) += p
        symPairs.getOrElseUpdate(p._2, mutable.Set.empty) += p
      }
    }

    def subPair(p: (String, String), f: Long): Unit = {
      val left = pairCount(p) - f
      if (left <= 0L) { pairCount.remove(p); pairWords.remove(p) }
      else pairCount(p) = left
    }

    // seed counts
    var wi = 0
    while (wi < words.length) {
      val w = words(wi); val f = freqs(wi); val n = lens(wi)
      var i = 0
      while (i < n) {
        if (scored) symCount(w(i)) = symCount.getOrElse(w(i), 0L) + f
        if (i < n - 1) addPair((w(i), w(i + 1)), f, wi)
        i += 1
      }
      wi += 1
    }
    pairCount.keysIterator.toArray.foreach(push)

    val merges = Vector.newBuilder[(String, String)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // pop to the first FRESH entry (matches current counts)
      var best: Cand = null
      while (best == null && !pq.isEmpty) {
        val e = pq.poll()
        val c = pairCount.getOrElse((e.a, e.b), 0L)
        if (c == e.c && fa(e.a) == e.fa && fa(e.b) == e.fb) best = e
        else if (c > 0L) push((e.a, e.b)) // stale: re-push with fresh stats
      }
      if (best == null) exhausted = true
      else {
        val p = (best.a, best.b)
        val merged = mergeSym(best.a, best.b)
        merges += p
        val touched = mutable.Set.empty[(String, String)]
        val members = pairWords.get(p).map(_.toArray).getOrElse(Array.empty[Int])
        java.util.Arrays.sort(members)
        members.foreach { i =>
          val w = words(i); val n = lens(i); val f = freqs(i)
          // verify (membership sets are lazily pruned supersets)
          var has = false
          var k = 0
          while (!has && k < n - 1) {
            has = (w(k) == best.a) && (w(k + 1) == best.b); k += 1
          }
          if (has) {
            // retract old adjacencies + symbol counts
            var j = 0
            while (j < n) {
              if (scored) symCount(w(j)) = symCount(w(j)) - f
              if (j < n - 1) { val q = (w(j), w(j + 1)); subPair(q, f); touched += q }
              j += 1
            }
            // rewrite with the merge applied (left-to-right, non-overlap)
            val out = new Array[String](n)
            var m = 0
            j = 0
            while (j < n) {
              if (j < n - 1 && w(j) == best.a && w(j + 1) == best.b) {
                out(m) = merged; m += 1; j += 2
              } else { out(m) = w(j); m += 1; j += 1 }
            }
            System.arraycopy(out, 0, w, 0, m)
            lens(i) = m
            // add new adjacencies + symbol counts
            j = 0
            while (j < m) {
              if (scored) symCount(w(j)) = symCount.getOrElse(w(j), 0L) + f
              if (j < m - 1) { val q = (w(j), w(j + 1)); addPair(q, f, i); touched += q }
              j += 1
            }
          }
        }
        if (scored) {
          // fa/fb changed for every pair containing a consumed side or
          // the merged symbol — their scores moved (possibly UP), so
          // they must be re-pushed, not left to lazy revalidation
          Seq(best.a, best.b, merged).foreach { s =>
            symPairs.get(s).foreach { ps =>
              ps.retain(q => pairCount.contains(q))
              touched ++= ps
            }
          }
        }
        touched.foreach(push)
        if (scored && symCount.getOrElse(best.a, 0L) <= 0L) symCount.remove(best.a): Unit
        if (scored && symCount.getOrElse(best.b, 0L) <= 0L) symCount.remove(best.b): Unit
        rank += 1
      }
    }
    merges.result()
  }
}
