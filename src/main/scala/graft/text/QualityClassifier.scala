package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions._

/** Model-based quality filtering — the fastText-classifier step of the
  * modern curation recipes (DCLM, FineWeb-Edu, RedPajama-v2 all gate
  * documents on a linear classifier trained to separate a trusted
  * reference corpus from generic crawl; the reference engine has no
  * analogue because its corpus fits in one process).
  *
  * This is the distributed Naive-Bayes form of that classifier, fitted
  * IN-PLAN so the whole thing is one deterministic dataflow:
  *
  *   - seed labels: a caller-supplied boolean column marks the
  *     reference slice (e.g. `lang === "en"` — the CCNet-style "looks
  *     like the target distribution" seed);
  *   - fit: per-token add-one-smoothed log-odds
  *     w(t) = ln( (cnt_pos(t)+1)/(N_pos+V) / ((cnt_neg(t)+1)/(N_neg+V)) )
  *     computed from one postings aggregation — exactly the weights a
  *     unigram fastText converges to under the NB factorization;
  *   - score: every document (including the seed slice) gets the MEAN
  *     token log-odds; score > 0 reads "closer to the reference corpus
  *     than to the rest".
  *
  * Scale shape (one corpus scan): tokenize → explode to postings →
  * plan barrier; the weight table and the scoring join both read the
  * materialized postings frame. Weights join back by token as a
  * SHUFFLE join — a web-scale vocabulary does not broadcast. Per-doc
  * sums accumulate 6dp-rounded weights in exact DECIMAL(28,10), so the
  * result is partition-order independent and replays hash-identically
  * in the DuckDB oracle (the ta_unigram_lm portability family).
  */
object QualityClassifier {

  /** (idCol, n_tokens, score, keep) per document. `isRef` is the seed
    * label column evaluated against `docs`' rows (true = reference
    * slice). keep = 1 iff the rounded mean log-odds is positive.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, isRef: Column): DataFrame = {
    val postings = graft.Tables.fanOut(docs)
      .select(col(idCol), isRef.as("is_pos"),
        explode(wsTokens(normText(col(textCol)))).as("tok"))
      .transform(graft.Barrier.checkpoint)
    val freq = postings.groupBy(col("tok")).agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("cnt_pos"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("cnt_neg"))
    val tot = freq.agg(
      sum(col("cnt_pos")).cast("double").as("n_pos"),
      sum(col("cnt_neg")).cast("double").as("n_neg"),
      count(lit(1)).cast("double").as("v"))
    postings
      .join(freq, "tok")
      .crossJoin(broadcast(tot))
      .withColumn("w", round(log(
        ((col("cnt_pos") + lit(1)) / (col("n_pos") + col("v"))) /
          ((col("cnt_neg") + lit(1)) / (col("n_neg") + col("v")))), 6))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("w").cast(DecimalType(28, 10))).cast("double") /
          count(lit(1)), 6).as("score"))
      .withColumn("keep", (col("score") > 0).cast("long"))
  }
}
