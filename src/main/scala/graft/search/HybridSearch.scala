package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse any number of ranked candidate lists
  * (vector ANN, BM25 lexical, recency, ...) with reciprocal-rank
  * fusion, score(d) = Σ_lists 1/(c + rank_list(d)) — the standard
  * robust fusion that needs no score calibration between lists.
  *
  * Each input must have (idCol, rank) with rank 1-based. Union +
  * groupBy instead of N-way outer join: one shuffle on the id,
  * linear in the total candidate count (lists are top-N, so tiny).
  */
object HybridSearch {

  def rrf(ranked: Seq[DataFrame], idCol: String, c: Int = 60, topN: Int = 10): DataFrame = {
    val contribs = ranked
      .map(_.select(col(idCol), (lit(1.0) / (lit(c) + col("rank"))).as("contrib")))
      .reduce(_ unionByName _)
    contribs
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).as("score_raw"), count(lit(1)).as("n_lists"))
      .orderBy(desc("score_raw"), col(idCol))
      .limit(topN)
      .select(col(idCol), round(col("score_raw"), 6).as("score"), col("n_lists"))
  }
}
