package graft.ann

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistent flat-PQ index — the persisted-codes twin of the
  * in-query ann_pq plan, matching the reference's load-then-query
  * contract (local_index.py:126-151: queries run against a LOADED
  * index) the same way IvfPqIndex does for the composed IVF×PQ
  * layout.
  *
  * `build` pays fit + encode once at ingest: one parquet write of
  * (id, vector, code0..code{nSub-1}) plus the nSub tiny codebook
  * parquets. There is deliberately NO coarse layer — flat PQ is the
  * shape for corpora small enough to scan entirely but too big to
  * hold as floats (the FAISS `PQn` index): a query's candidate pass
  * reads ONLY the (id, code*) columns — columnar projection on the
  * parquet scan, nSub bytes per row instead of dim×4 float bytes, a
  * 32× I/O reduction at Dim=64/nSub=8 — and the exact rerank fetches
  * just the `candidates` winners' float vectors by id. When the
  * corpus outgrows the full code scan, IvfPqIndex is the next rung
  * (its cell pruning bounds the scanned fraction).
  *
  * The in-query Lloyd fit that dominates ann_pq's wall clock at
  * scale (the 10× sweep measured the fit at ~85% of the entry's
  * time) happens HERE, once, at build — the query path never fits,
  * never encodes, never touches the vector column outside the
  * bounded rerank fetch.
  */
final class PqIndex private (
    val spark: SparkSession,
    val path: String,
    val idCol: String,
    val vecCol: String,
    val nSub: Int) {

  lazy val codes: DataFrame = spark.read.parquet(s"$path/codes")

  /** Driver-local codebooks, loaded in ONE job (Pq.loadBooksLocal) and
    * cached on the instance — downstream encode/ADC collects are
    * jobless, like Pq.fit's own output. The layout is immutable
    * (PqIndex has no maintenance mutators), so the cache cannot go
    * stale.
    */
  lazy val books: Seq[DataFrame] = Pq.loadBooksLocal(spark, path, nSub)

  /** ADC candidate scan over the code columns + exact rerank —
    * Pq.adcTopK's two-phase shape against the on-disk layout.
    * Output mirrors ann_pq: (id, code0.., adc, exact_score).
    */
  def search(queryVec: Array[Double], k: Int, candidates: Int = 0): DataFrame =
    Pq.adcTopK(codes, idCol, vecCol, books, queryVec,
      k = k, candidates = candidates)
}

object PqIndex {

  /** Encode codes and write the flat layout. `books` are Pq.fit's
    * output (Barrier them if the caller reuses them — build reads
    * each twice: encode + save).
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      books: Seq[DataFrame], dim: Int, path: String): PqIndex = {
    val spark = corpus.sparkSession
    Pq.encode(corpus, idCol, vecCol, books, dim)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$path/codes")
    // tiny frames (≤ 65536 rows): one file each, so the load-side
    // combined scan costs one task per book instead of one per
    // empty local-relation slice
    books.zipWithIndex.foreach { case (b, s) =>
      b.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/book$s")
    }
    new PqIndex(spark, path, idCol, vecCol, books.size)
  }

  def load(spark: SparkSession, path: String, idCol: String, vecCol: String,
      nSub: Int): PqIndex =
    new PqIndex(spark, path, idCol, vecCol, nSub)
}
