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
  * Scale notes: ONE corpus scan — per-document length and the per-
  * query-term counts come out of a single narrow aggregation
  * (map-side combined; the shuffle is one row of |Q|+1 longs per
  * doc, never the postings), eagerly materialized as a text-free
  * plan barrier so the df / score branches read the tiny per-doc
  * frame instead of re-tokenizing the corpus (the round-2 plan
  * re-derived the exploded postings in 3 branches = 3 corpus scans
  * at cluster scale). df/dl/avgdl are corpus statistics a standing
  * deployment precomputes once per corpus version and
  * broadcast-joins.
  */
object Bm25 {

  def score(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 10): DataFrame = {
    // duplicates in the query would double df and double-count the
    // term's score contribution in the unpivoted tf frame; empty
    // queries would build an untyped empty array() — dedupe and
    // early-return instead (zero rows, correct schema).
    val qts = queryTerms.distinct
    if (qts.isEmpty)
      return docs.select(col(idCol), lit(0.0d).as("score")).limit(0)
    val toks = graft.Tables.fanOut(docs).select(col(idCol),
      explode(wsTokens(normText(col(textCol)))).as("term"))
    val tfAggs = qts.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"_tf$i")
    }
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"), tfAggs: _*)
      .transform(graft.Barrier.checkpoint)
    val stats = perDoc.agg(
      avg(col("dl")).as("avgdl"), count(lit(1)).cast("double").as("n_docs"))
    // unpivot the per-term counts back to (id, dl, term, tf) rows —
    // dl rides along, so no second join against a lengths frame
    val termTf = array(qts.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("term"), col(s"_tf$i").as("tf"))
    }: _*)
    val tf = perDoc.select(col(idCol), col("dl"), explode(termTf).as("p"))
      .select(col(idCol), col("dl"), col("p.term").as("term"), col("p.tf").as("tf"))
      .filter(col("tf") > 0)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf
      .join(broadcast(dfreq), "term")
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
