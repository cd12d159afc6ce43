package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF×PQ index — FAISS's IVFPQ as a storage layout
  * (reference analogue: local_index.py:126-151 queries a LOADED
  * index; this is that contract for the composed index).
  *
  * `build` pays the whole cost once at ingest: IVF cell assignment
  * (Ann.ivfAssign), per-subspace PQ encoding (Pq.encode), then ONE
  * parquet write `partitionBy(cell)` carrying (id, vector,
  * code0..code{nSub-1}). Centroids and the nSub codebooks are tiny
  * side parquets (bounded by the 65536-codeword require in
  * Pq.adcTopK when read back).
  *
  * A query then touches nprobe/nlist of the data at code width:
  * `probeCells` ranks the (bounded, driver-collected) centroid frame
  * by the same left-to-right d² fold the oracle orders by;
  * `searchCells` filters on the driver-known cell list — STATIC
  * partition pruning, asserted by IvfPqIndexSpec — and runs Pq's ADC
  * candidate scan over the code columns only, with the exact rerank
  * fetching just the candidates' float vectors. At 100 TB: the probe
  * reads nprobe directories of the layout, and the ADC pass inside
  * them reads nSub bytes per row, not the vector column (columnar
  * projection on the parquet scan).
  */
final class IvfPqIndex private (
    val spark: SparkSession,
    val path: String,
    val idCol: String,
    val vecCol: String,
    val nSub: Int) {

  def centroids: DataFrame = spark.read.parquet(s"$path/centroids")

  def cells: DataFrame = spark.read.parquet(s"$path/cells")

  def books: Seq[DataFrame] =
    (0 until nSub).map(s => spark.read.parquet(s"$path/book$s"))

  /** The nprobe cells nearest to the query, ranked by the raw
    * left-to-right squared-L2 fold with a (d², cell) tiebreak —
    * identical to the oracle's probe CTE. Driver-side over the
    * bounded centroid frame (same planning-time materialization
    * class as Pq's ADC tables).
    */
  def probeCells(queryVec: Array[Double], nprobe: Int): Seq[Long] = {
    val rows = centroids
      .select(col("cell").cast("long"), col("cv").cast("array<double>"))
      .collect()
    require(rows.nonEmpty && rows.length <= 65536,
      s"probeCells: ${rows.length} centroids (nlist rule bounds this)")
    rows.map { r =>
      val cv = r.getSeq[Double](1)
      var d = 0.0
      var j = 0
      while (j < queryVec.length) {
        val diff = queryVec(j) - cv(j)
        d += diff * diff
        j += 1
      }
      (r.getLong(0), d)
    }.sortBy { case (c, d) => (d, c) }.take(nprobe).map(_._1).toSeq
  }

  /** ADC top-k inside the driver-known probed cells: the cell filter
    * compiles to PartitionFilters on the layout scan, then
    * Pq.adcTopK's two-phase candidate/rerank shape runs over the
    * surviving files. Output mirrors ann_ivf_pq: (id, cell,
    * code0.., adc, exact_score).
    */
  def searchCells(cellIds: Seq[Long], queryVec: Array[Double],
      k: Int, candidates: Int = 0): DataFrame =
    Pq.adcTopK(
      cells.filter(col("cell").isin(cellIds: _*)),
      idCol, vecCol, books, queryVec, k = k, candidates = candidates,
      carryCols = Seq("cell"))
}

object IvfPqIndex {

  /** Assign cells, encode codes, write the partitioned layout.
    * `centroids` must have (cid, cv); `books` are Pq.fit's output
    * (Barrier them if the caller reuses them — build reads each
    * twice: encode + save).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      books: Seq[DataFrame], dim: Int, path: String): IvfPqIndex = {
    val spark = corpus.sparkSession
    val cents = centroids.select(col(cidCol).as("cell"), col(cvecCol).as("cv"))
    // stage the IVF cell under its own name: Pq.encode's subspace
    // assigns each reuse the "cell" slot (the ann_ivf_pq lesson)
    val assigned = Ann.ivfAssign(corpus, idCol, vecCol, cents, "cell", "cv")
      .withColumnRenamed("cell", "_ivf_cell")
    Pq.encode(assigned, idCol, vecCol, books, dim)
      .withColumnRenamed("_ivf_cell", "cell")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"$path/cells")
    cents.write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
    books.zipWithIndex.foreach { case (b, s) =>
      b.write.mode(SaveMode.Overwrite).parquet(s"$path/book$s")
    }
    new IvfPqIndex(spark, path, idCol, vecCol, books.size)
  }

  def load(spark: SparkSession, path: String, idCol: String, vecCol: String,
      nSub: Int): IvfPqIndex =
    new IvfPqIndex(spark, path, idCol, vecCol, nSub)
}
