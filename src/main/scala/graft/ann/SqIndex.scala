package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistent SQ8 index — the persisted twin of the in-query ann_sq
  * plan, matching the reference's load-then-query contract
  * (local_index.py:126-151) the same way PqIndex does for flat PQ.
  *
  * `build` pays fit + encode once at ingest: one parquet write of
  * (id, vector, codes) where `codes` is a single dim-byte binary
  * column, plus a 2-row grid parquet (lo, step — the whole "model").
  * A query's candidate pass reads ONLY the (id, codes) columns —
  * columnar projection, dim bytes/row instead of dim×4 float bytes —
  * and the exact rerank fetches just the `candidates` winners'
  * vectors by id. SQ8 is the first rung of the compression ladder:
  * no training, 4× I/O cut, full-corpus scan; PqIndex (32×) and
  * IvfPqIndex (32× + cell pruning) are the next rungs when the scan
  * itself must shrink.
  */
final class SqIndex private (
    val spark: SparkSession,
    val path: String,
    val idCol: String,
    val vecCol: String) {

  lazy val codes: DataFrame = spark.read.parquet(s"$path/codes")

  /** The persisted (lo, step) grid, driver-loaded (2×dim doubles). */
  lazy val grid: Sq.Grid = {
    val r = spark.read.parquet(s"$path/grid").orderBy("kind").collect()
    require(r.length == 2 && r(0).getString(0) == "lo" && r(1).getString(0) == "step",
      s"SqIndex: malformed grid at $path/grid")
    Sq.Grid(r(0).getSeq[Double](1).toArray, r(1).getSeq[Double](1).toArray)
  }

  def search(queryVec: Array[Double], k: Int, candidates: Int = 0): DataFrame =
    Sq.adcTopK(codes, idCol, vecCol, grid, queryVec, k = k, candidates = candidates)
}

object SqIndex {

  def build(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      path: String): SqIndex = {
    val spark = corpus.sparkSession
    val grid = Sq.fit(corpus, vecCol, dim)
    Sq.encode(corpus, vecCol, grid)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/codes")
    import spark.implicits._
    Seq(("lo", grid.lo.toSeq), ("step", grid.step.toSeq))
      .toDF("kind", "vals")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/grid")
    new SqIndex(spark, path, idCol, vecCol)
  }

  def load(spark: SparkSession, path: String, idCol: String, vecCol: String): SqIndex =
    new SqIndex(spark, path, idCol, vecCol)
}
