package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex

/** Warm batch-serving handle over a persisted [[IvfIndex]]: the
  * streaming / request-loop counterpart of `IvfIndex.searchBatch`.
  *
  * searchBatch is the right shape for one-shot batch analytics, but a
  * SERVING loop pays its probe-selection stages (centroid crossJoin →
  * bounded-heap agg → re-attach join, each an exchange or broadcast
  * job) again on every micro-batch — ~0.7 s/batch of pure fixed cost
  * measured at sf0.1. A warm server holds the centroid table LOCAL
  * instead (bounded by the nlist rule, ≤ 65536 rows — the same
  * deliberate driver materialization class as IvfPqIndex.probeCells)
  * and computes each query's probe cells in-process, so a batch
  * submits exactly ONE distributed plan: statically-pruned cell scan →
  * broadcast probe join → bounded-heap top-k.
  *
  * Probe selection replays searchBatch bit for bit: the same
  * left-to-right squared-L2 fold over double-cast centroids, ties to
  * the lowest cell id (StreamingSpec pins row identity between the
  * two paths). Queries arrive as driver-local rows — the serving
  * contract: a request batch is in the server's memory by definition,
  * and its size is the micro-batch size, never the corpus.
  */
final class IvfServing(val idx: IvfIndex, val nprobe: Int,
    cacheCells: Boolean = true) {

  /** The layout frame the per-batch plan scans. A WARM server pins it
    * in (distributed) cluster memory — the like-for-like counterpart
    * of the brute serve path's cached corpus frame, and the reason the
    * warm loop never pays per-batch file opens: at 100× the
    * probed-cell scan re-opened ~250 partition files per micro-batch
    * (~0.8 s of pure file grain) where the cached frame filters
    * columnar in-memory batches. The cell filter still prunes the
    * COMPUTE (cosine over probed cells only) either way; caching
    * removes the I/O floor. Pass cacheCells=false for a cold,
    * disk-resident server (then partition pruning is what bounds I/O).
    */
  /** Cells frame + the centroid array it was probed against, as ONE
    * immutable snapshot behind a single volatile: a refresh after a
    * path-swap recluster changes BOTH, and two separate volatile
    * writes let a concurrent searchBatch read the new cells with the
    * old centroids — probing the wrong cells (round-12 advice). A
    * reader dereferences `snap` once per call and works off a
    * consistent pair; after append/compact (centroids unchanged) the
    * bundle is equivalent to the old two-field form.
    */
  private case class Snapshot(cellsFrame: DataFrame,
      cents: Array[(Long, Array[Double])])

  private def loadSnapshot(): Snapshot = {
    val rows = idx.centroids
      .select(col("cell").cast("long"), col("cv").cast("array<double>"))
      .collect()
    require(rows.nonEmpty && rows.length <= 65536,
      s"IvfServing: ${rows.length} centroids (the nlist rule bounds this at 65536)")
    val frame = if (cacheCells) idx.cells.cache() else idx.cells
    Snapshot(frame, rows.map(r => (r.getLong(0), r.getSeq[Double](1).toArray)))
  }

  @volatile private var snap: Snapshot = loadSnapshot()

  /** Re-pin the layout after ingest-side maintenance
    * (IvfIndex.append / compact / a path-swap recluster): the pinned
    * cells frame snapshots the file LIST at construction, so rows
    * appended afterwards are invisible to the warm loop until this is
    * called — the serving counterpart of RefreshingVectorServing's
    * applyChanges, driven by the maintenance schedule instead of a
    * changelog. Drops the old in-memory copy, re-lists the layout,
    * and re-reads centroids; concurrent searchBatch calls keep the
    * snapshot they started with (volatile swap, never torn).
    */
  def refresh(): Unit = synchronized {
    val old = snap
    snap = loadSnapshot()
    if (cacheCells) old.cellsFrame.unpersist()
  }

  /** nlist of the pinned index. */
  def nCells: Int = snap.cents.length

  /** The query's nprobe nearest cells — same fold, same (d², cell)
    * tie order as searchBatch's probe agg.
    */
  def probeCellsFor(qv: Array[Float]): Seq[Long] =
    probeCellsIn(snap.cents, qv)

  private def probeCellsIn(cents: Array[(Long, Array[Double])],
      qv: Array[Float]): Seq[Long] =
    cents.map { case (cell, cv) =>
      var d = 0.0
      var j = 0
      while (j < cv.length) {
        val diff = qv(j) - cv(j)
        d += diff * diff
        j += 1
      }
      (cell, d)
    }.sortBy { case (c, d) => (d, c) }.take(nprobe).map(_._1).toSeq

  /** Top-k for a driver-local query batch in ONE distributed plan.
    * Output mirrors searchBatch: (qid, idCol, score, rk). A cell
    * probed by many queries is scanned once and fanned in memory;
    * the cell filter is a driver-known IN-list → static partition
    * pruning on the layout scan.
    */
  def searchBatch(queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    require(queries.nonEmpty, "IvfServing.searchBatch: empty query batch")
    val spark = idx.spark
    import spark.implicits._
    import graft.functions.VectorFunctions.{cosine, topK}
    val snapshot = snap // one volatile read: cells + cents stay paired
    val probe = queries.flatMap { case (qid, qv) =>
      probeCellsIn(snapshot.cents, qv).map(c => (qid, c, qv))
    }
    val probeDf = probe.toDF("qid", "cell", "qv")
    val allCells = probe.map(_._2).distinct
    snapshot.cellsFrame
      .filter(col("cell").isin(allCells: _*))
      .join(broadcast(probeDf), "cell")
      .withColumn("score_raw", cosine(col(idx.vecCol), col("qv")))
      .groupBy(col("qid"))
      .agg(topK(col("score_raw"), col(idx.idCol), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("_pos", "_t")))
      .select(col("qid"), col("_t.id").as(idx.idCol),
        round(col("_t.score"), 6).as("score"),
        (col("_pos") + 1).cast("long").as("rk"))
  }
}
