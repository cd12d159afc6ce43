package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Corpus text-analysis operators: language ID, quality scoring,
  * token counting, fingerprinting. All pure column expressions —
  * a 100 TB corpus pass is a single narrow map stage with full
  * WholeStageCodegen and parquet column pruning (only `text` is read).
  */
object TextAnalysis {

  private val langs: Seq[(String, Seq[String])] = Seq(
    "de" -> MarkersDe, "en" -> StopwordsEn, "es" -> MarkersEs,
    "fr" -> MarkersFr, "zh" -> MarkersZh)

  /** Heuristic language ID: count marker-word hits per language over
    * whitespace tokens, plus a CJK-character override; argmax with
    * deterministic alphabetical tiebreak ('en' when all scores zero
    * ties are broken by language code order).
    */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = wsTokens(normText(col(textCol)))
    // one tokenize + one probe pass for all five marker sets (the
    // five-single-probe formulation re-walked the token array per
    // language — 5× the per-row cost of the whole scorer)
    val countsCol = {
      import org.apache.spark.sql.graftshim.ColumnBridge
      ColumnBridge.column(graft.functions.expr.TokensInSets(
        ColumnBridge.expression(toks), langs.map(_._2)))
    }
    // CJK: any han character → zh outright. Count via the
    // CodePointRangeCount kernel — an all-ASCII row is one byte scan.
    // The regexp_replace length-diff this replaces (itself a fix for
    // the split-per-char interpreted rlike, ~500M evals at 100×)
    // still built a replaced COPY of every document per row; the
    // count is identical (both count matched code points).
    val nCjk = {
      import org.apache.spark.sql.graftshim.ColumnBridge
      ColumnBridge.column(graft.functions.expr.CodePointRangeCount(
        ColumnBridge.expression(col(textCol)), 0x4e00, 0x9fff))
    }
    // MATERIALIZE the counts array and the cjk count as real columns
    // before the argmax: the pick/best expressions reference the
    // scores many times, and with inline subtrees the optimizer's
    // CollapseProject + codegen duplicated the whole tokenize+probe
    // pipeline per reference (~25 evaluations of split+regexp_replace
    // per ROW — the dominant hidden cost of the signal pass). As
    // standalone aliased columns they are evaluated once.
    //
    // The argmax itself is the ArgMaxFirst kernel (ties → lowest
    // index = first-in-Seq alphabetical priority, exactly what the
    // earlier foldRight when-chain encoded): the declarative
    // when/greatest tree re-expanded the 5-way comparison ~11× in the
    // generated projection, blew the JIT's huge-method limit, and ran
    // the stage as interpreted bytecode — the pick layer alone cost
    // 8× the tokenize+probe work (6.5 s vs 0.8 s at the 100×
    // corpus). A flat CASE over the index keeps the method tiny.
    val scored = graft.Tables.fanOut(docs)
      .withColumn("_lc", countsCol)
      .withColumn("_cjk", nCjk)
      .withColumn("_best", array_max(col("_lc")))
      .withColumn("_widx", {
        import org.apache.spark.sql.graftshim.ColumnBridge
        ColumnBridge.column(graft.functions.expr.ArgMaxFirst(
          ColumnBridge.expression(col("_lc"))))
      })
    val pick = langs.zipWithIndex.foldRight(lit("und")) {
      case (((code, _), i), rest) =>
        when(col("_widx") === i && col("_best") > 0, code).otherwise(rest)
    }
    scored
      .withColumn("pred_lang", when(col("_cjk") > 0, lit("zh")).otherwise(pick))
      .withColumn("lang_score", greatest(col("_best"), col("_cjk")).cast("long"))
      .drop("_lc", "_cjk", "_best", "_widx")
  }

  /** Quality scores (the standard cheap pretraining filters):
    * char/word counts, mean word length, stopword ratio, punctuation
    * ratio, alpha ratio. Downstream filters threshold these columns.
    */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the normalized text once (each derived column would
    // otherwise carry its own copy of the normText regex subtree —
    // see langId's materialization note)
    val base = graft.Tables.fanOut(docs)
      .withColumn("_t", normText(col(textCol)))
      .withColumn("_cc", {
        import org.apache.spark.sql.graftshim.ColumnBridge
        // [nPunct, nAlpha] in ONE allocation-free char scan — the two
        // regexp_replace length-diffs each allocated a replaced copy
        // of the text per row
        ColumnBridge.column(graft.functions.expr.CharClassCounts(
          ColumnBridge.expression(col("_t"))))
      })
    val t = col("_t")
    val toks = wsTokens(t)
    val nChars = length(t)
    val nWords = size(toks)
    val nPunct = element_at(col("_cc"), 1)
    val nAlpha = element_at(col("_cc"), 2)
    val nStop = tokensInSet(toks, StopwordsEn)
    base
      .withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len",
        round((nChars - (nWords - 1)).cast("double") / nWords, 6))
      .withColumn("stop_ratio", round(nStop.cast("double") / nWords, 6))
      .withColumn("punct_ratio", round(nPunct.cast("double") / nChars, 6))
      .withColumn("alpha_ratio", round(nAlpha.cast("double") / nChars, 6))
      .drop("_t", "_cc")
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens
    * (reference: gpt3_tokenizer.py / all_MiniLM_L6_v2_tokenizer.py —
    * the reference budgets chunks in tokens; this is the deterministic
    * portable stand-in used everywhere a token budget appears).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // BpeishTokenCount = size(regexTokens(_t)) without materializing
    // the match array (see the kernel scaladoc); regexTokens stays the
    // reference formulation the kernel is spec'd against
    val nre = {
      import org.apache.spark.sql.graftshim.ColumnBridge
      ColumnBridge.column(graft.functions.expr.BpeishTokenCount(
        ColumnBridge.expression(col("_t"))))
    }
    val base = graft.Tables.fanOut(docs)
      .withColumn("_t", normText(col(textCol)))
      .withColumn("_nre", nre)
    base
      .withColumn("ws_tokens", size(wsTokens(col("_t"))).cast("long"))
      .withColumn("re_tokens", col("_nre").cast("long"))
      .withColumn("chars_per_token",
        round(length(col("_t")).cast("double") / col("_nre"), 6))
      .drop("_t", "_nre")
  }

  /** Gopher-style repetition signals (Rae et al. 2021, table A1's
    * repetition filters): duplicate-word fraction, most-frequent-word
    * fraction, and the same two over word bigrams. High values mark
    * degenerate boilerplate ("click here click here …") that the
    * length/stopword filters in [[quality]] miss. Downstream filters
    * threshold these columns (Gopher drops docs with top-2-gram
    * fraction > 0.2).
    *
    * Everything is computed per row from the token array by the
    * TokenRunStats kernel (one sorted sweep per array → [distinct,
    * top multiplicity]), so the whole operator is one narrow map
    * stage with zero shuffle, integer-exact arithmetic, and no
    * interpreted HOF lambdas on the corpus-scan hot path.
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    // raw (positional) bigrams — multiplicity matters here, so not
    // TextFunctions.wordShingles (which dedups for the shingle-set ops)
    def rawShingles(tokens: Column, n: Int): Column =
      ColumnBridge.column(graft.functions.expr.WordShingles(
        ColumnBridge.expression(tokens), n))
    def runStats(arr: Column): Column =
      ColumnBridge.column(graft.functions.expr.TokenRunStats(
        ColumnBridge.expression(arr)))
    val base = graft.Tables.fanOut(docs)
      .withColumn("_toks", wsTokens(normText(col(textCol))))
      .withColumn("_bi", rawShingles(col("_toks"), 2))
      .withColumn("_nw", size(col("_toks")).cast("long"))
      .withColumn("_nb", size(col("_bi")).cast("long"))
      .withColumn("_ws", runStats(col("_toks")))
      .withColumn("_bs", runStats(col("_bi")))
    base
      .withColumn("n_words", col("_nw"))
      .withColumn("dup_word_ratio",
        round((col("_nw") - element_at(col("_ws"), 1)) / col("_nw"), 6))
      .withColumn("top_word_ratio",
        round(element_at(col("_ws"), 2) / col("_nw"), 6))
      .withColumn("dup_bigram_ratio",
        round((col("_nb") - element_at(col("_bs"), 1)) / col("_nb"), 6))
      .withColumn("top_bigram_ratio",
        round(element_at(col("_bs"), 2) / col("_nb"), 6))
      .drop("_toks", "_bi", "_nw", "_nb", "_ws", "_bs")
  }

  /** Gopher-rule document filter (Rae et al. 2021 "Scaling Language
    * Models: ... Gopher", table A1 — public recipe), adapted to
    * word-level signals because the synthetic corpus has no line
    * structure. One narrow pass over `text` computing every signal,
    * then a rule bitmask:
    *
    *   bit 0 — word count outside [GopherMinWords, GopherMaxWords]
    *   bit 1 — mean word length outside [3, 10]
    *   bit 2 — fewer than GopherMinStopHits English stopword hits
    *            (Gopher's stop-word requirement is an English filter
    *            by design; non-English docs fail it here too)
    *   bit 3 — duplicate-word fraction above GopherMaxDupWordRatio
    *            (the word-level analogue of Gopher's duplicate-line
    *            fraction rules)
    *
    * `keep = (flags == 0)`. Rule comparisons use the ROUNDED (6 dp)
    * ratios so engine-specific last-ulp division differences cannot
    * flip a boundary doc (the oracle compares the same rounded
    * values). Scale shape: zero shuffle — signals come from the
    * CharClassCounts / TokensInSet / TokenRunStats codegen kernels in
    * one WholeStageCodegen map stage; only `text` is read.
    */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    def runStats(arr: Column): Column =
      ColumnBridge.column(graft.functions.expr.TokenRunStats(
        ColumnBridge.expression(arr)))
    val base = graft.Tables.fanOut(docs)
      .withColumn("_t", normText(col(textCol)))
      .withColumn("_toks", wsTokens(col("_t")))
      .withColumn("_ws", runStats(col("_toks")))
    val nWords = size(col("_toks")).cast("long")
    val mwl = round((length(col("_t")) - (nWords - 1)).cast("double") / nWords, 6)
    val stopHits = tokensInSet(col("_toks"), StopwordsEn).cast("long")
    val dup = round((nWords - element_at(col("_ws"), 1)).cast("double") / nWords, 6)
    base
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len", mwl)
      .withColumn("stop_hits", stopHits)
      .withColumn("dup_word_ratio", dup)
      .withColumn("flags",
        (when(col("n_words") < GopherMinWords || col("n_words") > GopherMaxWords, 1).otherwise(0)
          + when(col("mean_word_len") < 3.0 || col("mean_word_len") > 10.0, 2).otherwise(0)
          + when(col("stop_hits") < GopherMinStopHits, 4).otherwise(0)
          + when(col("dup_word_ratio") > GopherMaxDupWordRatio, 8).otherwise(0)).cast("long"))
      .withColumn("keep", col("flags") === 0L)
      .drop("_t", "_toks", "_ws")
  }

  /** Gopher-rule thresholds (word-level adaptation — see gopherFilter).
    * Min/max words are Gopher's 50/100k scaled to the synthetic corpus
    * (docs run 10–99 words); the dup-word cutoff sits at the corpus
    * median so the rule discriminates rather than all-passing.
    */
  val GopherMinWords = 25
  val GopherMaxWords = 100000
  val GopherMinStopHits = 2
  val GopherMaxDupWordRatio = 0.55

  /** Document fingerprint: full-text 60-bit digest plus winnowing-style
    * min/max 8-gram shingle hashes (the rolling-window extrema are
    * robust to small edits; equal fp_min across docs is a cheap
    * near-dup signal that needs no pairwise join).
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the sliding-window extrema come from the NgramMinMaxHash kernel
    // (one digest pass over the shared byte buffer per row) —
    // bit-identical to the HOF formulation it replaces, which
    // materialized ~|text| substring copies and paid hex-md5 + conv
    // per n-gram (see NgramMinMaxHash scaladoc)
    import org.apache.spark.sql.graftshim.ColumnBridge
    val base = graft.Tables.fanOut(docs)
      .withColumn("_t", normText(col(textCol)))
      .withColumn("_mm", ColumnBridge.column(graft.functions.expr.NgramMinMaxHash(
        ColumnBridge.expression(col("_t")), 8)))
    base
      .withColumn("fp_full", portableHash(col("_t")))
      .withColumn("fp_min", element_at(col("_mm"), 1))
      .withColumn("fp_max", element_at(col("_mm"), 2))
      .drop("_t", "_mm")
  }
}
