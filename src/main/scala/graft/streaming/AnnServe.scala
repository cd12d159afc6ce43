package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Streaming ANN serving: a stream of query vectors scored against a
  * static (periodically re-published) index — the Spark-native answer
  * to "online ANN needs specialized structures": the structure is the
  * bucketed/cell-partitioned index DataFrame, and serving is a
  * stream-static join, so index refresh is just pointing the static
  * side at the next published snapshot.
  *
  * Cost per micro-batch: |batch queries| × |probed corpus|. Pair this
  * with the LSH-bucketed or IVF-partitioned layouts (join on bucket /
  * cell first) to prune the static side exactly like the batch path.
  */
object AnnServe {

  /** queries: streaming (qid, qv); corpus: static (idCol, vecCol).
    * Emits every scored candidate; rank/top-k downstream per sink
    * (complete-mode aggregation or per-batch foreachBatch top-k).
    */
  def scoreStream(queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .join(corpus.select(col(idCol), col(vecCol)))
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .select(col("qid"), col(idCol), col("score"))

  /** Bucket-pruned variant: both sides bucketed by the same LSH
    * planes; the stream-static join carries the bucket equality so
    * each query scores only its bucket of the corpus.
    */
  def scoreStreamLsh(queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int, dim: Int): DataFrame = {
    val bucketedCorpus = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("bucket", graft.ann.Ann.lshBucket(col(vecCol), nPlanes, dim))
    queries
      .select(col(qidCol).as("qid"), col(qvecCol).as("qv"))
      .withColumn("bucket", graft.ann.Ann.lshBucket(col("qv"), nPlanes, dim))
      .join(bucketedCorpus, "bucket")
      .withColumn("score", cosine(col(vecCol), col("qv")))
      .select(col("qid"), col(idCol), col("score"))
  }
}
