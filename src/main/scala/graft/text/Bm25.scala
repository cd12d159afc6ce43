package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** BM25 keyword retrieval over a document corpus — the lexical
  * complement to the engine's vector search (hybrid retrieval =
  * BM25 candidates ∪ ANN candidates, rerank).
  *
  * Dataflow: one explode to postings, tf per (doc, term), document
  * frequency per query term, document lengths, then the classic
  * Robertson/Sparck-Jones scoring
  *   idf(t)·tf/(tf + k1·(1 − b + b·dl/avgdl)),
  * idf = ln((N − df + 0.5)/(df + 0.5) + 1).
  *
  * Scale notes: postings are filtered to the query terms BEFORE the
  * tf aggregation (predicate on the exploded term — at 100 TB the
  * inverted postings for a handful of terms are a sliver of the
  * corpus); df/dl/avgdl are corpus statistics a standing deployment
  * precomputes once per corpus version and broadcast-joins.
  */
object Bm25 {

  def score(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 10): DataFrame = {
    val toks = graft.Tables.fanOut(docs).select(col(idCol),
      explode(wsTokens(normText(col(textCol)))).as("term"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      avg(col("dl")).as("avgdl"), count(lit(1)).cast("double").as("n_docs"))
    val qtoks = toks.filter(col("term").isInCollection(queryTerms))
    val tf = qtoks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf
      .join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w",
        col("idf") * col("tf") /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("score_raw"))
      .orderBy(desc("score_raw"), col(idCol))
      .limit(topN)
      .select(col(idCol), round(col("score_raw"), 6).as("score"))
  }
}
