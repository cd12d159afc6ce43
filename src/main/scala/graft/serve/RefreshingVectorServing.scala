package graft.serve

import org.apache.spark.sql.DataFrame

import graft.index.VectorIndex
import graft.operators.MergeApply

/** The serving-tier WRITE path: a [[LocalVectorServing]] snapshot
  * maintained by the s_merge CDC upsert stream.
  *
  * [[LocalVectorServing]] is a read-only point-in-time shard snapshot;
  * production serving also needs freshness: upserts/deletes flowing
  * through the streaming changelog must become visible to serve-local
  * queries. This class owns the maintained index table, applies each
  * CDC micro-batch with [[MergeApply.applyChanges]] (the same
  * one-change-per-key contract as q_merge / the s_merge sink), and
  * atomically swaps in a freshly rebuilt snapshot — readers always
  * see either the pre-batch or the post-batch index, never a torn
  * one.
  *
  * Scale shape: invalidate/rebuild per merge batch. The rebuild cost
  * is one bounded collect of the SHARD (LocalVectorServing's
  * maxLocalItems guard still applies); at 100 TB a deployment runs
  * one refresher per shard and routes each changelog partition to its
  * shard's refresher, so rebuild work is O(shard), never O(corpus).
  * Snapshot lineage is truncated per apply (localCheckpoint), exactly
  * like the s_merge sink, so a long-running stream cannot grow the
  * plan.
  *
  * Wire it as the foreachBatch target of a changelog stream:
  * {{{
  * changes.writeStream.foreachBatch { (b, _) => serving.applyChanges(b) }
  * }}}
  */
final class RefreshingVectorServing(
    initial: DataFrame,
    idCol: String,
    vecCol: String,
    maxLocalItems: Int = LocalVectorServing.DefaultMaxLocalItems) {

  // the maintained table (full rows incl. metadata, NO norm column —
  // norms are VectorIndex.build's job so CDC payloads stay raw)
  @volatile private var table: DataFrame = initial.localCheckpoint()

  @volatile private var snap: LocalVectorServing = rebuild()

  /** Applies since construction — observability for specs/telemetry. */
  @volatile private var applied0: Long = 0L
  def appliedBatches: Long = applied0

  private def rebuild(): LocalVectorServing =
    LocalVectorServing.load(VectorIndex.build(table, idCol, vecCol), maxLocalItems)

  /** Apply one CDC micro-batch (changelog contract: full new row +
    * op ∈ {u, i, d}) and publish the refreshed snapshot. Synchronized:
    * applies are ordered; reads never block.
    */
  def applyChanges(batch: DataFrame, opCol: String = "op"): Unit = synchronized {
    table = MergeApply.applyChanges(table, batch, idCol, opCol)
      .drop("status").localCheckpoint()
    snap = rebuild()
    applied0 += 1
  }

  /** The current snapshot — queries on it are zero-job in-process
    * scans, identical semantics to [[LocalVectorServing]].
    */
  def serving: LocalVectorServing = snap

  /** The maintained table as of the last apply (for cold-rebuild
    * equivalence checks and for persisting the shard).
    */
  def currentTable: DataFrame = table
}
