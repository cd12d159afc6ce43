package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistent 1-bit binary-quantization index — the persisted twin of
  * the in-query ann_bq plan, matching the reference's load-then-query
  * contract (local_index.py:126-151) the same way SqIndex / PqIndex
  * do for the finer rungs.
  *
  * `build` pays fit + encode once at ingest: one parquet write of
  * (id, vector, bcodes) where `bcodes` is a single ceil(dim/8)-byte
  * binary column (8 bytes for dim=64 — a 32× I/O cut on the
  * candidate scan), plus a 1-row thresholds parquet (the whole
  * "model"). A query's candidate pass reads ONLY (id, bcodes) —
  * columnar projection asserted by BqSpec — and the exact rerank
  * fetches just the `candidates` winners' vectors by id.
  */
final class BqIndex private (
    val spark: SparkSession,
    val path: String,
    val idCol: String,
    val vecCol: String) {

  lazy val codes: DataFrame = spark.read.parquet(s"$path/codes")

  /** The persisted midpoint thresholds, driver-loaded (dim doubles). */
  lazy val thresholds: Bq.Thresholds = {
    val r = spark.read.parquet(s"$path/thresholds").collect()
    require(r.length == 1, s"BqIndex: malformed thresholds at $path/thresholds")
    Bq.Thresholds(r(0).getSeq[Double](0).toArray)
  }

  def search(queryVec: Array[Double], k: Int, candidates: Int = 0): DataFrame =
    Bq.hammingTopK(codes, idCol, vecCol, thresholds, queryVec,
      k = k, candidates = candidates)
}

object BqIndex {

  def build(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      path: String): BqIndex = {
    val spark = corpus.sparkSession
    val th = Bq.fit(corpus, vecCol, dim)
    Bq.encode(corpus, vecCol, th)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/codes")
    import spark.implicits._
    Seq(th.mid.toSeq).toDF("mid")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/thresholds")
    new BqIndex(spark, path, idCol, vecCol)
  }

  def load(spark: SparkSession, path: String, idCol: String, vecCol: String): BqIndex =
    new BqIndex(spark, path, idCol, vecCol)
}
