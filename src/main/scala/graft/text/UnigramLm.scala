package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions._

/** Corpus-LM quality scoring, CCNet-style (Wenzek et al. 2020 filter
  * CommonCrawl by the perplexity of a KenLM model; the cheap
  * distributed analogue is a unigram model fitted on the corpus
  * itself): every document is scored by the mean negative
  * log-likelihood of its tokens under the corpus' own unigram
  * distribution. Low avg_nll = made of common words (boilerplate-ish);
  * high avg_nll = rare-token-heavy (jargon, noise, other languages).
  * Downstream filters keep the middle band, exactly like CCNet's
  * head/middle/tail split.
  *
  * Dataflow (one corpus parquet scan): tokenize → explode to postings
  * → eager barrier; the model (token counts), the corpus total, and
  * the scoring join all read the materialized postings frame. The
  * model is joined back by token — a SHUFFLE join, deliberately: a
  * web-scale vocabulary does not broadcast. Per-document sums
  * accumulate the per-token NLL (rounded to 6 decimals first, so both
  * engines sum identical values) in exact DECIMAL(28,10) — partition-
  * order-independent, hash-identical in the DuckDB oracle.
  */
object UnigramLm {

  /** (idCol, n_tokens, avg_nll, max_nll) per document — max_nll is the
    * NLL of the document's rarest token, the "contains at least one
    * very odd word" signal.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val postings = graft.Tables.fanOut(docs)
      .select(col(idCol), explode(wsTokens(normText(col(textCol)))).as("tok"))
      .transform(graft.Barrier.checkpoint)
    val freq = postings.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).cast("double").as("n_total"))
    postings
      .join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("nll",
        round(-log(col("cnt").cast("double") / col("n_total")), 6))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("nll").cast(DecimalType(28, 10))).cast("double") /
          count(lit(1)), 6).as("avg_nll"),
        max(col("nll")).as("max_nll"))
  }

  /** The unigram MODEL from a persisted (idCol, tok, cnt) token-count
    * projection (StreamingQualityClassifier.buildTokenCounts — the
    * SAME ingest artifact the classifier gate scores from): corpus
    * token frequency = Σ cnt per token, identical to counting
    * postings. Artifact-to-artifact, vocabulary-sized output — the
    * buildSpanDupHashTable move.
    */
  def buildFreq(tokenCounts: DataFrame): DataFrame =
    tokenCounts.groupBy(col("tok")).agg(sum(col("cnt")).as("cnt"))

  /** [[score]] over the persisted token-count projection and a
    * persisted [[buildFreq]] model — the text is never read. Output
    * is bit-identical: summing `cnt` copies of a DECIMAL(28,10) NLL
    * equals nll × cnt exactly, n_tokens = Σ cnt = the posting count,
    * and max_nll ranges over the same distinct-token NLL set
    * (multiplicity can't change a max). The scoring plan is one
    * narrow artifact ⋈ vocabulary join — the same shuffle-join shape
    * as [[score]]'s (a web-scale vocabulary does not broadcast), but
    * over Σ-collapsed rows instead of raw postings.
    */
  def scoreFromTokenCounts(tokenCounts: DataFrame, idCol: String,
      freq: DataFrame): DataFrame = {
    val total = freq.agg(sum(col("cnt")).cast("double").as("n_total"))
    tokenCounts.withColumnRenamed("cnt", "_doc_cnt")
      .join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("nll",
        round(-log(col("cnt").cast("double") / col("n_total")), 6))
      .groupBy(col(idCol))
      .agg(
        sum(col("_doc_cnt")).as("n_tokens"),
        round(sum(col("nll").cast(DecimalType(28, 10)) * col("_doc_cnt"))
          .cast("double") / sum(col("_doc_cnt")), 6).as("avg_nll"),
        max(col("nll")).as("max_nll"))
  }
}
