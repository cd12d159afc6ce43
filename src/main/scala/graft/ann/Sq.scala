package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (the FAISS SQ8 index shape) — the third rung of
  * the compression family next to PQ (ann_pq) and IVF×PQ:
  *
  *   - FIT: per-dimension (lo, hi) = corpus min/max — ONE partial-agg
  *     pass emitting 2×dim doubles to the driver. Unlike PQ's Lloyd
  *     fit there is no iteration and no codebook: SQ8's "model" is a
  *     per-dimension linear grid, which is why production stores
  *     reach for it first (cheap ingest, no training-distribution
  *     drift) and step up to PQ only when 4× compression isn't enough;
  *   - ENCODE: c_d = max(0, min(255, floor((x_d − lo_d)/step_d))), step_d =
  *     (hi_d − lo_d)/256 — a single codegen'd kernel (SqEncode) packing
  *     dim uint8 codes into ONE binary column: 64 B/row vs 256 B of
  *     float32, no per-element parquet overhead;
  *   - SEARCH: asymmetric distance (SqAdc kernel) — the exact query
  *     against each code's dequantized midpoint lo_d+(c_d+0.5)·step_d,
  *     algebraically folded as (qadj_d − c_d·step_d)² with qadj
  *     precomputed driver-side — then exact-cosine rerank of the
  *     bounded candidate set (FAISS refine shape, same two-phase plan
  *     as Pq.adcTopK: the candidate scan projects ONLY (id, codes)).
  *
  * Determinism (SURVEY §5): fit is min/max (order-free); encode and
  * the ADC fold are fixed left-to-right op sequences the DuckDB oracle
  * replays bit-for-bit; ties order by (adc, id) / (exact, id).
  */
object Sq {

  import org.apache.spark.sql.graftshim.{ColumnBridge => EU}
  import graft.functions.expr.{SqAdc, SqEncode}

  final case class Grid(lo: Array[Double], step: Array[Double])

  /** Per-dimension min/max over the corpus → quantization grid.
    * One aggregation (2×dim partial-aggregated columns), driver
    * payload 2×dim doubles — bounded, never corpus-sized.
    */
  def fit(corpus: DataFrame, vecCol: String, dim: Int): Grid = {
    val v = col(vecCol).cast("array<double>")
    val aggs = (0 until dim).map(d => min(element_at(v, d + 1)).as(s"_lo$d")) ++
      (0 until dim).map(d => max(element_at(v, d + 1)).as(s"_hi$d"))
    val r = corpus.agg(aggs.head, aggs.tail: _*).head()
    val lo = Array.tabulate(dim)(d => r.getDouble(d))
    val step = Array.tabulate(dim)(d => (r.getDouble(dim + d) - lo(d)) / 256.0)
    Grid(lo, step)
  }

  def encodeCol(vec: Column, grid: Grid): Column =
    EU.column(SqEncode(EU.expression(vec.cast("array<double>")),
      EU.expression(lit(grid.lo)), EU.expression(lit(grid.step))))

  /** Append the uint8 code column — one narrow codegen'd projection. */
  def encode(corpus: DataFrame, vecCol: String, grid: Grid,
      codeCol: String = "codes"): DataFrame =
    corpus.withColumn(codeCol, encodeCol(col(vecCol), grid))

  private def adcCol(codes: Column, grid: Grid, queryVec: Array[Double]): Column = {
    val qadj = Array.tabulate(queryVec.length)(d =>
      (queryVec(d) - grid.lo(d)) - 0.5 * grid.step(d))
    EU.column(SqAdc(EU.expression(codes),
      EU.expression(lit(qadj)), EU.expression(lit(grid.step))))
  }

  /** ADC candidate generation + exact rerank for one query vector —
    * Pq.adcTopK's two-phase serving shape on the SQ grid: the
    * candidate pass projects ONLY (id, codes); the `candidates`
    * winners' float vectors come back via a broadcast id-lookup for
    * the exact-cosine final k.
    */
  def adcTopK(encoded: DataFrame, idCol: String, vecCol: String, grid: Grid,
      queryVec: Array[Double], k: Int, candidates: Int = 0,
      codeCol: String = "codes"): DataFrame = {
    val nCand = if (candidates <= 0) k else candidates
    require(nCand >= k, s"candidates $nCand must be >= k $k")
    val cands = encoded
      .select(col(idCol), col(codeCol))
      .withColumn("_adc", adcCol(col(codeCol), grid, queryVec))
      .orderBy(col("_adc"), col(idCol))
      .limit(nCand)
    import graft.functions.VectorFunctions.cosine
    encoded.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .withColumn("_exact", cosine(col(vecCol).cast("array<double>"), lit(queryVec)))
      .orderBy(desc("_exact"), col(idCol))
      .limit(k)
      .select(col(idCol),
        round(col("_adc"), 6).as("adc"),
        round(col("_exact"), 6).as("exact_score"))
  }
}
