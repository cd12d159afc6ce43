package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-compression ANN scale path
  * that complements IVF's partition pruning and LSH's bucketing:
  *
  *   - FIT: the vector space is split into `nSub` contiguous
  *     subspaces; each gets its own small k-means codebook
  *     (graft.ann.KMeans — deterministic seeds by an id-modulus rule,
  *     decimal-exact Lloyd updates, so a SQL engine replays the fit
  *     bit-for-bit exactly as dd_semantic's oracle does);
  *   - ENCODE: each vector becomes `nSub` small codes (nearest
  *     codebook centroid per subspace, NearestCentroid codegen kernel
  *     — one narrow map pass, no explosion, no shuffle). Codebook ids
  *     are relabeled 0..K-1 so a production layout can store each
  *     code as ONE BYTE: a 64-dim float corpus compresses 64× (256 B
  *     → 4 B per vector), which is what lets a 100 TB corpus's index
  *     live in cluster memory;
  *   - SEARCH (ADC + exact rerank — FAISS's refine shape): the query
  *     stays exact; its distance to every centroid of every codebook
  *     is a tiny driver-side table (nSub × K doubles) embedded as a
  *     plan constant, so the candidate scan reads ONLY the code
  *     columns (columnar pruning never touches the float vectors),
  *     approximates ||q - x||² as the sum of per-subspace table
  *     lookups, and TakeOrderedAndProject keeps the top `candidates`
  *     rows; those (and only those) get an exact-cosine rerank to the
  *     final k. Per-corpus-row cost: nSub map lookups + an add chain
  *     — no vector arithmetic at all.
  *
  * Determinism contract (SURVEY §5): subspace slicing is positional;
  * seed relabeling is ordered by id; every d² is the same
  * left-to-right fold the NearestCentroid kernel and DuckDB's
  * list_reduce use; ADC sums the nSub lookups in subspace order. The
  * oracle replays fit + encode + table + scan and orders by the raw
  * (unrounded) ADC, so even last-ulp ties resolve identically.
  */
object Pq {

  /** One codebook per subspace: (cid: Long 0..K-1, cv: array<double>
    * of length subDim). `seedMod` picks ~K seed rows (ids ≡ 0 mod
    * seedMod); `iters` Lloyd updates follow (1 is enough to pull
    * codewords off the seed rows — PQ needs coverage, not
    * convergence).
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, nSub: Int, seedMod: Long, iters: Int): Seq[DataFrame] = {
    require(dim % nSub == 0, s"dim $dim must split evenly into $nSub subspaces")
    val subDim = dim / nSub
    val w = Window.orderBy(col(idCol))
    (0 until nSub).map { s =>
      val sub = subVectors(corpus, idCol, vecCol, s, subDim)
      // relabeled seeds: the codebook id space is 0..K-1 (dense, byte-
      // sized) rather than raw corpus ids; relabeling is monotone in
      // id so NearestCentroid's lowest-id tiebreak is preserved
      val seeds = sub.filter(pmod(col(idCol), lit(seedMod)) === 0)
        .select((row_number().over(w) - 1).cast("long").as("cid"),
          col("_sv").as("cv"))
      KMeans.lloyd(sub, idCol, "_sv", seeds, iters)
    }
  }

  /** Append code columns `code0..code{nSub-1}` — one chained
    * NearestCentroid kernel per subspace, all inside a single narrow
    * WholeStageCodegen projection over the corpus.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      books: Seq[DataFrame], dim: Int): DataFrame = {
    val subDim = dim / books.size
    var cur = corpus
    books.zipWithIndex.foreach { case (book, s) =>
      cur = Ann.ivfAssign(
          subVectors(cur, idCol, vecCol, s, subDim), idCol, "_sv", book, "cid", "cv")
        .withColumnRenamed("cell", s"code$s")
        .drop("_sv")
    }
    cur
  }

  /** ADC candidate generation + exact rerank (FAISS's refine shape)
    * for one query vector: distance tables from the (collected,
    * ≤ nSub×K-row) codebooks become map literals; the candidate scan
    * touches only the code columns and keeps the `candidates` best by
    * ADC; the winners' float vectors are fetched by id and the final
    * k are ranked by EXACT cosine. Quantization noise costs recall
    * only when a true neighbor misses the candidate set — `candidates`
    * is the recall dial (measured by ann_pq_recall), and the exact
    * fetch is a bounded candidate-set lookup, never a corpus scan.
    * `candidates <= 0` means rerank exactly the top k.
    */
  def adcTopK(encoded: DataFrame, idCol: String, vecCol: String,
      books: Seq[DataFrame], queryVec: Array[Double], k: Int,
      candidates: Int = 0, carryCols: Seq[String] = Seq.empty): DataFrame = {
    val nCand = if (candidates <= 0) k else candidates
    require(nCand >= k, s"candidates $nCand must be >= k $k")
    val subDim = queryVec.length / books.size
    val tables: Seq[Map[Long, Double]] = books.zipWithIndex.map { case (book, s) =>
      val rows = book.select(col("cid").cast("long"), col("cv").cast("array<double>"))
        .collect()
      require(rows.nonEmpty && rows.length <= 65536,
        s"adcTopK: codebook $s has ${rows.length} codewords")
      rows.map { r =>
        val cv = r.getSeq[Double](1)
        // same left-to-right squared-L2 fold as NearestCentroid/DuckDB
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = queryVec(s * subDim + j) - cv(j)
          d += diff * diff
          j += 1
        }
        r.getLong(0) -> d
      }.toMap
    }
    val adcRaw = tables.zipWithIndex.map { case (tab, s) =>
      val entries = tab.toSeq.sortBy(_._1)
        .flatMap { case (cid, d) => Seq(lit(cid), lit(d)) }
      element_at(map(entries: _*), col(s"code$s"))
    }.reduce(_ + _) // subspace order — matches the oracle's add chain
    val qv = lit(queryVec)
    import graft.functions.VectorFunctions.cosine
    // two-phase serving shape: the candidate pass projects ONLY
    // (id, codes) — on a persisted code table the scan never touches
    // the float vectors — then the candidates' exact scores come from
    // a broadcast id-lookup against the corpus (a bounded fetch, the
    // point-lookup any serving store does after candidate selection)
    val cands = encoded
      .select(Seq(col(idCol)) ++ carryCols.map(col) ++
        books.indices.map(s => col(s"code$s")): _*)
      .withColumn("_adc", adcRaw)
      .orderBy(col("_adc"), col(idCol))
      .limit(nCand)
    val exactRaw = cosine(col(vecCol).cast("array<double>"), qv)
    encoded.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .withColumn("_exact", exactRaw)
      .orderBy(desc("_exact"), col(idCol))
      .limit(k)
      .select(Seq(col(idCol)) ++ carryCols.map(col) ++
        books.indices.map(s => col(s"code$s")) ++
        Seq(round(col("_adc"), 6).as("adc"),
          round(col("_exact"), 6).as("exact_score")): _*)
  }

  /** Positional subspace slice `_sv` (subspace s → dims
    * [s·subDim, (s+1)·subDim), 1-based slice like DuckDB's
    * v[lo:hi]).
    */
  private def subVectors(df: DataFrame, idCol: String, vecCol: String,
      s: Int, subDim: Int): DataFrame =
    df.withColumn("_sv",
      slice(col(vecCol).cast("array<double>"), s * subDim + 1, subDim))
}
