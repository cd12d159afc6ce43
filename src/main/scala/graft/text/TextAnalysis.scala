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
    val scoreCols = langs.map { case (code, set) => code -> tokensInSet(toks, set) }
    // CJK: any han character → zh outright.
    val nCjk = size(filter(split(col(textCol), ""), c => c.rlike("[\\u4e00-\\u9fff]")))
    val best = scoreCols.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scoreCols.foldRight(lit("und")) { case ((code, s), rest) =>
      when(s === best && best > 0, code).otherwise(rest)
    }
    // foldRight gives first-in-Seq (alphabetical) priority on ties.
    graft.Tables.fanOut(docs)
      .withColumn("pred_lang", when(nCjk > 0, lit("zh")).otherwise(pick))
      .withColumn("lang_score", greatest(best, nCjk).cast("long"))
  }

  /** Quality scores (the standard cheap pretraining filters):
    * char/word counts, mean word length, stopword ratio, punctuation
    * ratio, alpha ratio. Downstream filters threshold these columns.
    */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = normText(col(textCol))
    val toks = wsTokens(t)
    val nChars = length(t)
    val nWords = size(toks)
    val nPunct = length(regexp_replace(t, "[a-z0-9 ]", ""))
    val nAlpha = length(regexp_replace(t, "[^a-z]", ""))
    val nStop = tokensInSet(toks, StopwordsEn)
    graft.Tables.fanOut(docs)
      .withColumn("n_chars", nChars.cast("long"))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("mean_word_len",
        round((nChars - (nWords - 1)).cast("double") / nWords, 6))
      .withColumn("stop_ratio", round(nStop.cast("double") / nWords, 6))
      .withColumn("punct_ratio", round(nPunct.cast("double") / nChars, 6))
      .withColumn("alpha_ratio", round(nAlpha.cast("double") / nChars, 6))
  }

  /** Token counts: whitespace tokens and BPE-ish regex tokens
    * (reference: gpt3_tokenizer.py / all_MiniLM_L6_v2_tokenizer.py —
    * the reference budgets chunks in tokens; this is the deterministic
    * portable stand-in used everywhere a token budget appears).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = normText(col(textCol))
    graft.Tables.fanOut(docs)
      .withColumn("ws_tokens", size(wsTokens(t)).cast("long"))
      .withColumn("re_tokens", size(regexTokens(t)).cast("long"))
      .withColumn("chars_per_token",
        round(length(t).cast("double") / size(regexTokens(t)), 6))
  }

  /** Document fingerprint: full-text 60-bit digest plus winnowing-style
    * min/max 8-gram shingle hashes (the rolling-window extrema are
    * robust to small edits; equal fp_min across docs is a cheap
    * near-dup signal that needs no pairwise join).
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = normText(col(textCol))
    val shingleHashes = transform(charNgrams(t, 8), s => portableHash(s))
    graft.Tables.fanOut(docs)
      .withColumn("fp_full", portableHash(t))
      .withColumn("fp_min", array_min(shingleHashes))
      .withColumn("fp_max", array_max(shingleHashes))
  }
}
