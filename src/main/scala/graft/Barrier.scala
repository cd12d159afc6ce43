package graft

import scala.collection.mutable

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Eager plan barriers with TRACKED cleanup.
  *
  * Library operators (Dedup, Bm25, CurationPipeline) materialize small
  * text-free intermediates — MinHash signatures, shingle sets, per-doc
  * term counts — as eager `localCheckpoint(true)` barriers so the many
  * downstream plan branches read the materialized RDD instead of
  * re-scanning the corpus parquet per branch. The checkpoint pins
  * executor storage for the JVM's life; a long-lived application
  * calling these operators repeatedly would accumulate pinned blocks
  * (GC inflation, eventually eviction pressure). This object registers
  * every barrier it creates so callers can free exactly the library's
  * pins — `Barrier.release(spark)` after consuming the returned
  * DataFrames — without touching caches the application owns.
  *
  * Contract: after `release`, DataFrames derived from earlier barriers
  * must not be re-executed (localCheckpoint truncates lineage; the
  * blocks are gone and there is no recompute path).
  *
  * FAULT TOLERANCE AT CLUSTER SCALE: `localCheckpoint` stores blocks
  * on executors only — an executor loss mid-query kills the query
  * (Spark cannot recompute truncated lineage). That is the right
  * trade for these single-session analytic sweeps (the retry is
  * "re-run the query"), but a production pipeline on a 1000-executor
  * cluster should flip the barrier to a PERSISTED stage table — write
  * the signature/postings frame to parquet (or use
  * `sparkContext.setCheckpointDir` + reliable `checkpoint()`) and
  * read it back, exactly the pattern CurationPipeline documents for
  * its inter-stage hand-offs. Each call site below marks which flip
  * applies. See SURVEY.md §6.
  */
object Barrier {

  // weak keys: a session that stops without calling release() must
  // not pin its SparkContext (and through it every registered RDD)
  // for the life of the library's classloader
  private val pinned = mutable.WeakHashMap.empty[SparkContext, mutable.Buffer[RDD[_]]]

  /** Eagerly materialize `df` and register the pinned RDD for later
    * [[release]]. Semantically identical to `df.localCheckpoint(true)`.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(eager = true)
    out.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }
      .foreach { rdd =>
        synchronized {
          pinned.getOrElseUpdate(df.sparkSession.sparkContext, mutable.Buffer.empty) += rdd
        }
      }
    out
  }

  /** Barriers currently registered for this session — each was one
    * eager materialization job at plan-build time (graft.Explain
    * reports this so the plan audit can count checkpoint-time corpus
    * scans that the final explain no longer shows).
    */
  def pinnedCount(spark: SparkSession): Int = synchronized {
    pinned.get(spark.sparkContext).map(_.size).getOrElse(0)
  }

  /** Unpersist every barrier this session created (and only those).
    * Blocks are dropped asynchronously by default (`blocking = true`
    * waits — BarrierSpec uses it to prove the no-recompute contract);
    * the registry entry is cleared either way.
    */
  def release(spark: SparkSession, blocking: Boolean = false): Unit = {
    val rdds = synchronized { pinned.remove(spark.sparkContext) }
    rdds.foreach(_.foreach(_.unpersist(blocking)))
  }

  /** The FAULT-TOLERANT flip of [[checkpoint]]: materialize `df` as a
    * parquet STAGE TABLE and read it back. Same plan-barrier effect
    * (downstream branches scan the materialized frame, the input is
    * computed exactly once), but the blocks live in the shared
    * filesystem: an executor loss costs a re-read, not the query.
    * This is what a standing production pipeline should pass for its
    * signature/postings hand-offs (SURVEY §6); checkpoint() remains
    * the default because single-session analytic sweeps prefer the
    * ~free executor-local write over a durable one.
    */
  def stage(df: DataFrame, path: String): DataFrame = {
    df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
