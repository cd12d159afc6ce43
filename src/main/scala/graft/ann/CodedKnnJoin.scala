package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** CODES-based corpus×corpus kNN against an IVF layout — the
  * shuffle-lean composition of knnJoinSelf (round-13 verdict #4): the
  * candidate join carries quantization CODES instead of dim×4 float
  * bytes, scores pairs with a symmetric-distance kernel (both sides
  * coded — no vector arithmetic in the hot join), cuts each query's
  * np × |cell ∩ block| candidates down to a bounded `candidates`
  * list, and only then pays exact cosines over n × candidates pairs
  * (the FAISS refine shape graft's point queries already use).
  *
  * Two rungs of the measured compression ladder, both implemented —
  * the same trade the point-query family documents (ann_pq vs
  * ann_sq), replayed at join scale:
  *
  *   - PQ-SDC ([[knnJoinSelfPq]], kernel PqSdc): 8 BYTES per side
  *     (codes packed into one long), per pair 8 table lookups — the
  *     cheapest possible candidate stage, but two codebook
  *     quantizations of noise mean the cut needs ~32 candidates to
  *     hold the coarse ceiling on the bench sphere;
  *   - SQ8-SDC ([[knnJoinSelfSq]], kernel SqSdc): dim bytes per side
  *     (64 B at Dim 64 — still 4× under float), per pair the
  *     dequantized-gap fold; 256 levels/dim track exact ordering so
  *     closely that candidates = 6 already reproduces the coarse
  *     ceiling EXACTLY on the bench corpus — the smaller cut keeps
  *     the bounded rerank's vector transport (n × candidates rows)
  *     small.
  *
  * What SHIPS as knn_join's production twin is the EXACT np=16 join
  * (knn_join_ivf / IvfIndex.knnJoinSelf — see Bench's twinAliases):
  * the coded rungs are GEOMETRY-GATED alternatives whose advantage is
  * measured to grow with dimension and probe width (see
  * [[chooseJoinRung]] and BENCH_DIM_r15.json) — at the bench corpus's
  * dim 64 a float vector costs about one shuffle row's key overhead,
  * so codes don't cut bytes there; at dim 768 / np 48 coded-SQ cuts
  * exchange bytes ~47%.
  *
  * Why FLAT codes, not IvfPqIndex's residual ones: SDC compares two
  * CODED vectors, so both must be quantized in the same coordinate
  * frame — residual codes live in per-cell frames and a probe pair's
  * two sides sit in different cells. The IVF layer contributes coarse
  * BLOCKING (probe lists, member cells); the flat code space
  * contributes comparability.
  *
  * Artifacts (corpus-version properties, built once at ingest): the
  * shared IVF layout, the shared code model (the ann_pq codebooks /
  * the ann_sq grid — one fit serving point queries AND the corpus
  * join), and ONE coded probe table per rung from
  * [[buildPqProbeTable]] / [[buildSqProbeTable]] — (qid, q_<block>…,
  * prank, cell, <codes>) where prank ranks the query's np nearest
  * cells. Its prank = 1 rows ARE the members side (NearestCentroids'
  * rank-1 pick is the NearestCentroid assignment by construction —
  * the np = 1 special case), so the per-run join reads one narrow
  * artifact twice; this mirrors the oracle's `rn = 1 members /
  * rn <= np probes` CTE pair literally.
  *
  * Determinism (SURVEY §5): SDC scores replay in SQL from the
  * replayed fits; candidate cut orders by (sdc asc, id asc) — the
  * TopKAgg tie law; final k by (exact cosine desc, id asc). Output
  * mirrors knnJoinSelf: (qid, id, score, rk).
  */
object CodedKnnJoin {

  /** The PQ-coded self-probe artifact: every layout row's np nearest
    * cells (prank 1..np, rank 1 = the member cell) + its flat-PQ
    * codes PACKED into one long (code s at bit 8s) + the block
    * columns — ~(8 + 8 + 4 + 8 + 8·|block|) bytes per row × n×np rows.
    */
  def buildPqProbeTable(ivf: IvfIndex, books: Seq[DataFrame], dim: Int,
      np: Int, blockCols: Seq[String] = Nil): DataFrame =
    pqProbeRows(ivf, ivf.cells, books, dim, np, blockCols)

  /** The SQ8-coded self-probe artifact: same shape with the dim-byte
    * SQ8 code column (qsq, binary) instead of the packed PQ long.
    */
  def buildSqProbeTable(ivf: IvfIndex, grid: Sq.Grid,
      np: Int, blockCols: Seq[String] = Nil): DataFrame =
    sqProbeRows(ivf, ivf.cells, grid, np, blockCols)

  /** INCREMENTAL maintenance of the coded probe artifacts — the
    * IvfIndex.appendSelfProbe discipline applied to the coded rungs:
    * a batch tick encodes the new rows against the FROZEN code model
    * (the corpus-version codebooks/grid — the same freeze contract as
    * the centroids; FAISS trains once and encodes forever) and
    * appends their probe rows, so append ≡ a rebuild that uses the
    * same frozen model, by construction
    * (CodedProbeMaintenanceSpec property-checks it). A model REFIT is
    * a re-index (new artifact path), never an append.
    */
  def appendPqProbe(ivf: IvfIndex, batch: DataFrame, probePath: String,
      books: Seq[DataFrame], dim: Int, np: Int,
      blockCols: Seq[String] = Nil): Unit =
    pqProbeRows(ivf, batch, books, dim, np, blockCols)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(probePath)

  def appendSqProbe(ivf: IvfIndex, batch: DataFrame, probePath: String,
      grid: Sq.Grid, np: Int, blockCols: Seq[String] = Nil): Unit =
    sqProbeRows(ivf, batch, grid, np, blockCols)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(probePath)

  private def pqProbeRows(ivf: IvfIndex, src: DataFrame,
      books: Seq[DataFrame], dim: Int, np: Int,
      blockCols: Seq[String]): DataFrame = {
    require(books.size <= 8, s"PQ packing needs nSub <= 8, got ${books.size}")
    // fail at ARTIFACT-BUILD time, not query time: the 8-bit packing
    // below silently corrupts codes (bleed into neighboring bytes) if
    // a codebook exceeds 256 codewords or ids aren't the dense
    // relabel — sdcLut enforces this at join time, but by then the
    // corrupt artifact is already on disk (round-14 advice #1).
    // Cost: one ≤ 256×nSub-row collect per build/append.
    collectBooks(books)
    val packed = books.indices
      .map(s => shiftleft(col(s"code$s"), 8 * s))
      .reduce(_.bitwiseOR(_))
    probeTable(ivf, np, blockCols,
      Pq.encode(src, ivf.idCol, ivf.vecCol, books, dim),
      packed.as("qpq"))
  }

  /** Schema-metadata key carrying the ENCODE-TIME dim on the packed
    * SQ code column: the packed-long layout can only word-count-check
    * dim drift (ceil(dim/8) granularity), so the exact dim rides in
    * the parquet footer's schema metadata — zero extra rows or jobs —
    * and [[knnJoinSelfSq]] requires it to equal the current grid's
    * (round-16 advice: drift WITHIN one 8-code word, e.g. a probe
    * encoded at 63 dims against a 64-dim grid, otherwise folds pad
    * bytes as code 0 — plausible-but-wrong partial distances).
    */
  private[graft] val SqEncDimKey = "graft.sq.encDim"

  private def sqProbeRows(ivf: IvfIndex, src: DataFrame, grid: Sq.Grid,
      np: Int, blockCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    // codes packed into ceil(dim/8) longs (SqPack): the SDC join reads
    // them zero-copy per pair, where the binary column's per-access
    // copy dominated the candidate stage at join pair counts
    val packed = ColumnBridge.column(graft.functions.expr.SqPack(
      ColumnBridge.expression(col("_sqc"))))
    val encDimMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(SqEncDimKey, grid.step.length.toLong).build()
    val coded = Sq.encode(src, ivf.vecCol, grid, codeCol = "_sqc")
    probeTable(ivf, np, blockCols,
      coded.select(coded.columns.filter(_ != "_sqc").map(col) :+
        packed.as("_sqp", encDimMeta): _*),
      col("_sqp").as("qsq"))
  }

  private def probeTable(ivf: IvfIndex, np: Int, blockCols: Seq[String],
      coded: DataFrame, codeCol: Column): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val rows = ivf.centroids
      .select(col("cell").cast("long"), col("cv").cast("array<double>"))
      .collect()
    require(rows.nonEmpty && rows.length <= 65536,
      s"CodedKnnJoin: ${rows.length} centroids (nlist rule bounds this)")
    val sorted = rows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val kernel = ColumnBridge.column(graft.functions.expr.NearestCentroids(
      ColumnBridge.expression(col(ivf.vecCol)), sorted.map(_._1), sorted.map(_._2), np))
    coded
      .select(col(ivf.idCol).as("qid") +:
        blockCols.map(c => col(c).as(s"q_$c")) :+
        codeCol.as("qcode") :+ kernel.as("_probes"): _*)
      .select(col("qid") +: blockCols.map(c => col(s"q_$c")) :+
        col("qcode") :+ posexplode(col("_probes")).as(Seq("_pos", "cell")): _*)
      .select(col("qid") +: blockCols.map(c => col(s"q_$c")) :+
        (col("_pos") + 1).cast("int").as("prank") :+ col("cell") :+
        col("qcode"): _*)
  }

  /** PQ-SDC rung: candidate scores from the packed-long codes via the
    * PqSdc lookup kernel. `probes` is a persisted
    * [[buildPqProbeTable]] frame.
    */
  def knnJoinSelfPq(ivf: IvfIndex, probes: DataFrame, books: Seq[DataFrame],
      blockCols: Seq[String], k: Int, candidates: Int,
      queryPred: Column = lit(true)): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val (lut, kk) = sdcLut(books)
    val sdc = ColumnBridge.column(graft.functions.expr.PqSdc(
      ColumnBridge.expression(col("_mcode")),
      ColumnBridge.expression(col("qcode")), lut, kk))
    joinCore(ivf, probes, blockCols, k, candidates, queryPred, sdc)
  }

  /** SQ8-SDC rung: candidate scores from the dim-byte codes via the
    * SqSdc dequantized-gap kernel. `probes` is a persisted
    * [[buildSqProbeTable]] frame. Geometry-gated: the byte advantage
    * appears at production dims/wide probes (object scaladoc,
    * [[chooseJoinRung]]); the exact np=16 join ships at dim 64.
    */
  /** `sdcDims` (0 = all) truncates the SDC fold to the FIRST D′
    * dimensions — the polysemous-style prefix filter for
    * high-dimension corpora where the full per-pair fold costs as
    * much as the exact dot it replaces (SqSdc folds to
    * min(codes, step2.length), so the truncated step² array IS the
    * mechanism): a dimension prefix of an isotropic embedding is an
    * unbiased distance subsample, `candidates` absorbs the added
    * selection noise, and the exact rerank restores output scores.
    */
  def knnJoinSelfSq(ivf: IvfIndex, probes: DataFrame, grid: Sq.Grid,
      blockCols: Seq[String], k: Int, candidates: Int,
      queryPred: Column = lit(true), sdcDims: Int = 0): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    // exact dim-drift gate (round-16 advice): the encode-time dim the
    // probe artifact carries in its schema metadata must equal the
    // current grid's — the SqSdc word-count check alone cannot see
    // drift within one 8-code word. Schema-only: no job, no collect.
    val qmeta = probes.schema("qcode").metadata
    if (qmeta.contains(SqEncDimKey))
      require(qmeta.getLong(SqEncDimKey) == grid.step.length.toLong,
        s"knnJoinSelfSq: probe artifact encoded at dim " +
          s"${qmeta.getLong(SqEncDimKey)} but the grid has " +
          s"${grid.step.length} dims — rebuild the probe table " +
          "against the current grid (grid/corpus drift)")
    // step² precomputed once driver-side (one rounding per dim — the
    // oracle mirrors it as step*step inside its fold)
    val step2 = grid.step.map(s => s * s)
    val sdc = ColumnBridge.column(graft.functions.expr.SqSdc(
      ColumnBridge.expression(col("_mcode")),
      ColumnBridge.expression(col("qcode")),
      if (sdcDims > 0) step2.take(sdcDims) else step2,
      grid.step.length))
    joinCore(ivf, probes, blockCols, k, candidates, queryPred, sdc)
  }

  /** The shared join shape: codes-only candidate join (layout rows as
    * the shuffled-hash build side — the knnJoinSelf round-14 lesson),
    * (sdc asc, id asc) cut via the bounded-heap TopKAgg, then the
    * bounded exact rerank fetching the two float vectors per
    * surviving pair.
    */
  private def joinCore(ivf: IvfIndex, probes: DataFrame,
      blockCols: Seq[String], k: Int, candidates: Int, queryPred: Column,
      sdc: Column): DataFrame = {
    require(candidates >= k, s"candidates $candidates must be >= k $k")
    // members = the rank-1 rows of the SAME artifact (the member
    // cell); NEVER filtered by queryPred — a query-subset evaluation
    // still ranks against the full corpus
    val members = probes.filter(col("prank") === 1)
      .select(col("qid").as("_mid") +: col("cell").as("_mcell") +:
        col("qcode").as("_mcode") +:
        blockCols.map(c => col(s"q_$c").as(s"_m_$c")): _*)
    val p = probes.filter(queryPred).select(
      col("qid") +: col("cell").as("_pcell") +: col("qcode") +:
        blockCols.map(c => col(s"q_$c")): _*)
    val blockCond = blockCols
      .map(c => col(s"_m_$c") === col(s"q_$c"))
      .foldLeft(col("_mcell") === col("_pcell"))(_ && _)
    val cands = members.hint("shuffle_hash")
      .join(p, blockCond && col("_mid") =!= col("qid"))
      .withColumn("_negsdc", -sdc)
      .groupBy(col("qid"))
      .agg(topK(col("_negsdc"), col("_mid"), candidates).as("_top"))
      .select(col("qid"), explode(col("_top.id")).as(ivf.idCol))
    // bounded exact rerank: n × candidates pairs move one float vector
    // each (the candidate side joins on id first — narrow left — then
    // the query side on qid); both corpus-sized fetches are
    // shuffled-hash with the vector side as build
    val vecs = ivf.cells
      .select(col(ivf.idCol), col(ivf.vecCol))
      .withColumn("_n", normD(col(ivf.vecCol)))
    cands
      .join(vecs.hint("shuffle_hash"), Seq(ivf.idCol))
      .withColumnRenamed(ivf.vecCol, "_v").withColumnRenamed("_n", "_nb")
      .join(vecs.withColumnRenamed(ivf.idCol, "qid").hint("shuffle_hash"),
        Seq("qid"))
      .withColumn("score_raw",
        cosinePreNorm(col("_v"), col("_nb"), col(ivf.vecCol), col("_n")))
      .groupBy(col("qid"))
      .agg(topK(col("score_raw"), col(ivf.idCol), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("_pos", "_t")))
      .select(col("qid"), col("_t.id").as(ivf.idCol),
        round(col("_t.score"), 6).as("score"),
        (col("_pos") + 1).cast("long").as("rk"))
  }

  /** The nSub × (K×K) SDC tables from the fitted codebooks — the same
    * left-to-right d² fold as NearestCentroid / the oracle's
    * list_reduce, indexed lut(s)(codeA·K + codeB).
    */
  private def sdcLut(books: Seq[DataFrame]): (Array[Array[Double]], Int) = {
    val local = collectBooks(books)
    val k = local.head.length
    val lut = local.map { book =>
      val t = new Array[Double](k * k)
      var a = 0
      while (a < k) {
        val va = book(a)._2
        var c = 0
        while (c < k) {
          val vc = book(c)._2
          var d = 0.0
          var j = 0
          while (j < va.length) { val x = va(j) - vc(j); d += x * x; j += 1 }
          t(a * k + c) = d
          c += 1
        }
        a += 1
      }
      t
    }.toArray
    (lut, k)
  }

  /** Collect + validate the fitted codebooks — the single place the
    * byte-packing preconditions live (codeword count ≤ 256, ids the
    * dense 0..K-1 relabel, equal K across subspaces), shared by the
    * artifact BUILD path (pqProbeRows — so a bad fit fails before a
    * corrupt packed-code table persists) and the join-time LUT.
    */
  private def collectBooks(books: Seq[DataFrame]): Seq[Array[(Long, Array[Double])]] = {
    val local = books.map { b =>
      val rows = b.select(col("cid").cast("long"), col("cv").cast("array<double>"))
        .collect()
      require(rows.nonEmpty && rows.length <= 256,
        s"CodedKnnJoin: codebook has ${rows.length} codewords (byte packing caps K at 256)")
      rows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    }
    val k = local.head.length
    require(local.forall(_.length == k),
      "CodedKnnJoin: all codebooks must have the same codeword count")
    require(local.forall(b => b.indices.forall(i => b(i)._1 == i.toLong)),
      "CodedKnnJoin: codebook ids must be the dense 0..K-1 relabel")
    local
  }

  /** Rung selection by geometry, encoding the measured crossover
    * (KnnDimProbe, 2 sessions × 3 reps — BENCH_DIM_r15.json):
    * candidate-stage bytes scale with code size vs dim×4 float bytes,
    * but every coded rung also pays a bounded exact rerank that moves
    * `candidates` float vectors per query, so codes only win once the
    * vector is much wider than a shuffle row's key overhead AND the
    * probe fan-out (np) is wide enough that the candidate stage
    * dominates the rerank. The artifact's min-of-sessions numbers
    * (50k × dim 768, nlist 225, k 3):
    *
    *   - dim 64 (bench gate), np 16: exact wins bytes AND time
    *     (vector ≈ key overhead; PQ's C=32 rerank moves 2916 MB vs
    *     exact's 812 MB at the 100× corpus — NOTES_r14).
    *   - dim 768, np 16: exact 23.2 s / 2215 MB still wins time;
    *     coded-SQ −18% bytes at +28% time, prefix-SDC loses both.
    *   - dim 768, np 48: the inversion — prefix-SDC (fold dim/4,
    *     C doubled) beats exact on BOTH axes (25.0 vs 31.1 s, −24%
    *     bytes); full-fold SQ8 buys the deepest byte cut (−47%) at
    *     +15% time for exchange-bound clusters.
    *
    * The rule ships the exact join until BOTH dim ≥ 256 (vector ≥
    * 1 KB/row, ~4× the key overhead where the np-16 measurement shows
    * codes start paying for themselves) and np ≥ 32 (between the
    * measured np-16 exact-wins and np-48 coded-wins points); above
    * that, SQ8-SDC — with the prefix fold (sdcDims = dim/4,
    * candidates doubled) once dim ≥ 512, where the full per-pair fold
    * costs as much as the exact dot it replaces (the r14 kernel
    * measurement) and the prefix is what makes the rung win wall time
    * too. Exchange-byte-bound deployments can still pick full "sq"
    * manually for the deeper cut. PQ-SDC is never auto-chosen: its
    * 8-byte codes win the candidate stage but its wider cut (C≈32 to
    * hold recall through two quantizations) loses total bytes at
    * every measured geometry (+146% at np 16, +28% at np 48).
    */
  def chooseJoinRung(dim: Int, np: Int): String =
    if (dim < 256 || np < 32) "exact"
    else if (dim >= 512) "sq-prefix"
    else "sq"
}
