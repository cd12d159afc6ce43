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

  /** INDEX-probed variant (the production serve shape): each query
    * micro-batch runs one IvfIndex.searchBatch probe against the
    * persisted cell-partitioned layout — per-batch scan cost is
    * |distinct probed cells| of the index, not |batch| × |corpus|,
    * so micro-batch latency stays near-flat as the corpus grows
    * (nprobe/nlist of the data, both scaling ~√n). Wire it through
    * `writeStream.foreachBatch { (b, _) => sink(scoreBatchIvf(b, …)) }`:
    * foreachBatch is exactly "stream micro-batch = query batch", and
    * index refresh is pointing `idx` at the next published layout.
    * Output mirrors searchBatch: (qid, id, score, rk) — already
    * top-k, no downstream ranking needed (StreamingSpec pins
    * equivalence with the brute stream-static join at full probe
    * width).
    */
  def scoreBatchIvf(batch: DataFrame, qidCol: String, qvecCol: String,
      idx: graft.ann.IvfIndex, nprobe: Int, k: Int): DataFrame =
    idx.searchBatch(batch, qidCol, qvecCol, nprobe, k)

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
