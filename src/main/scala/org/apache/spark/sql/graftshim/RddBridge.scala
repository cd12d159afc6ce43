package org.apache.spark.sql
package graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Minimal bridge for iterative operators that need BOTH properties
  * `Dataset.localCheckpoint` bundles with an internal count job:
  * lineage truncation (a plan referencing the frame N times must not
  * re-derive it) and preserved output partitioning (the next
  * iteration's co-partitioned joins must not re-exchange). The
  * checkpoint's own materializing job cannot carry caller state, so an
  * iteration that needs a convergence statistic pays a SECOND job per
  * round; this bridge splits the pieces — persist the internal rows,
  * let the caller drive the one materializing job itself (e.g. a
  * foreach that also feeds a convergence accumulator), and rebuild a
  * DataFrame over the pinned RDD that keeps the executed plan's
  * partitioning, exactly as localCheckpoint's LogicalRDD does.
  * Lives in the org.apache.spark.sql package solely for access
  * (Dataset.ofRows, LogicalRDD) — the ColumnBridge idiom.
  */
object RddBridge {

  /** Persist `df`'s internal rows (NOT yet materialized — the caller
    * must run exactly one action on the returned RDD, e.g.
    * `rdd.foreach`) and return a frame builder over those pinned rows.
    * `keepPartitioning = true` stamps the executed plan's output
    * partitioning onto the rebuilt frame so downstream co-partitioned
    * joins skip their exchange; `false` leaves it Unknown — which
    * matters because a non-Unknown partitioning participates in
    * RDDScanExec's canonical equality, so two self-join copies of the
    * same frame stop being recognized as identical broadcast builds
    * and exchange REUSE is lost (one extra broadcast job per
    * consumer). Callers pick per the frame's next use: preserved
    * partitioning for the shuffle-join regime, Unknown for the
    * broadcast regime. The caller owns the RDD's lifecycle.
    */
  /** Re-anchor an already-MATERIALIZED frame (a LogicalRDD leaf, i.e.
    * the output of a localCheckpoint/Barrier.checkpoint) onto another
    * session of the same SparkContext, preserving its output
    * partitioning. This is what lets an iterative operator run its
    * rounds in a CLONED session carrying iteration-only planner
    * overrides (width, AQE, broadcast threshold) without ever mutating
    * the caller's session conf (round-16 verdict #8: a concurrent
    * query planned mid-iteration must not inherit the iteration's
    * width). No job, no copy — the pinned rows are context-level.
    */
  def transfer(df: Dataset[Row], to: SparkSession): Dataset[Row] = {
    val target = to.asInstanceOf[classic.SparkSession]
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        classic.Dataset.ofRows(target,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, None)(target, None, None))
      case other => throw new IllegalArgumentException(
        "RddBridge.transfer needs a materialized LogicalRDD frame " +
          s"(checkpoint it first), got ${other.nodeName}")
    }
  }

  def persistDeferred(df: Dataset[Row]): (RDD[InternalRow], Boolean => Dataset[Row]) = {
    val qe = df.queryExecution
    val session = df.sparkSession.asInstanceOf[classic.SparkSession]
    // copy: toRdd yields reused UnsafeRow instances; caching without
    // the copy aliases every row in a partition to the last one
    val rdd = qe.toRdd.map(_.copy()).persist(StorageLevel.MEMORY_AND_DISK)
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case pc: PartitioningCollection => firstLeaf(pc.partitionings.head)
      case other => other
    }
    val mk = (keepPartitioning: Boolean) => {
      val part =
        if (keepPartitioning) firstLeaf(qe.executedPlan.outputPartitioning)
        else org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(0)
      val logical = LogicalRDD(qe.analyzed.output, rdd, part,
        Nil, isStreaming = false, None)(session, None, None)
      classic.Dataset.ofRows(session, logical)
    }
    (rdd, mk)
  }
}
