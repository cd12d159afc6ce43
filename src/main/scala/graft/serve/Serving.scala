package graft.serve

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.filters.MetaFilter
import graft.index.VectorIndex

/** Warm serving sessions: the fair counterpart of the reference's
  * query loop.
  *
  * The reference serves queries from a warm in-memory list
  * (local_index.py:126-151), and BASELINE.md's latencies are the mean
  * of 10 repetitions on that warm index. A cold Spark query instead
  * pays plan analysis + optimization + codegen + job scheduling
  * (~0.1–0.3 s) on EVERY call — irrelevant against a 100 TB scan,
  * but 10–30× the reference's whole latency on a 2 000-vector corpus.
  * These classes remove the removable part of that overhead, the same
  * way a production deployment would:
  *
  *   - the index is pinned in memory once (`cache()` + a materializing
  *     warm-up action), coalesced to a serving partition count (small
  *     corpus → 1 partition → 1 task per query, no task-launch fan-out;
  *     at scale leave the natural partitioning so queries parallelize);
  *   - each distinct query shape is analyzed/optimized/codegen'd ONCE:
  *     repeated calls re-execute the SAME DataFrame, and Spark reuses
  *     its QueryExecution (with AQE, even the finalized adaptive plan).
  *
  * What remains per call is the irreducible local-mode job floor (a
  * few ms). The plan shapes are unchanged from the cold path — a
  * k-bounded TakeOrderedAndProject or a pushed-down filter scan — so
  * the same session serves unchanged on a real cluster, where the
  * cache pins hot partitions executor-side.
  */
final class VectorServing(index: VectorIndex, servePartitions: Int = 1) {

  /** The pinned serving copy of the index. */
  val items: DataFrame =
    (if (servePartitions > 0) index.items.coalesce(servePartitions)
     else index.items).cache()

  private val idx = VectorIndex.build(items, index.idCol, index.vecCol)

  private val plans = new ConcurrentHashMap[String, DataFrame]()

  private def plan(key: String)(mk: => DataFrame): DataFrame =
    plans.computeIfAbsent(key, _ => mk)

  /** Materialize the cache so the first query doesn't pay the load. */
  def warm(): this.type = { items.count(): Unit; this }

  /** Top-k cosine on the warm index — same plan as
    * VectorIndex.queryItems, analyzed once per (query, k, filter).
    */
  def queryItems(query: Seq[Double], k: Int,
      filter: Option[MetaFilter] = None): Array[Row] =
    plan(s"topk|$k|${filter.map(_.toString).getOrElse("")}|${query.hashCode}") {
      idx.queryItems(query, k, filter)
    }.collect()

  /** Metadata-only listing on the warm index (deterministic id order). */
  def listItemsByMetadata(filter: MetaFilter): Array[Row] =
    plan(s"meta|${filter.toString}") {
      idx.listItemsByMetadata(filter).orderBy(col(index.idCol))
    }.collect()

  /** Point lookup on the warm index. */
  def getItem(id: Any): Array[Row] =
    plan(s"get|$id")(idx.getItem(id)).collect()

  /** Release the pinned partitions and the plan cache. */
  def close(): Unit = {
    plans.clear()
    items.unpersist(blocking = false): Unit
  }
}

/** Warm serving over a scored chunk table (the d_query_documents
  * shape: top chunks → per-doc mean → top docs). `pin = true` caches
  * the chunk frame in memory (the reference holds all chunks in RAM);
  * `pin = false` serves straight off the underlying storage with only
  * the plan reuse — the two modes bracket a production deployment's
  * memory budget choices.
  */
final class DocServing(chunks: DataFrame, servePartitions: Int = 1,
    pin: Boolean = true) {

  val scored: DataFrame = {
    val base =
      if (servePartitions > 0) chunks.coalesce(servePartitions) else chunks
    if (pin) base.cache() else base
  }

  private val plans = new ConcurrentHashMap[String, DataFrame]()

  def warm(): this.type = { scored.count(): Unit; this }

  /** Top-`topChunks` chunks by score → per-doc mean score → top
    * `topDocs` docs (reference: local_document_index.py:221-254).
    */
  def queryDocuments(topChunks: Int = 50, topDocs: Int = 10): Array[Row] =
    plans.computeIfAbsent(s"qd|$topChunks|$topDocs", { _ =>
      scored
        .orderBy(desc("score_raw"), col("doc_id"), col("i"))
        .limit(topChunks)
        .groupBy(col("doc_id"))
        .agg(round(avg(col("score_raw")), 6).as("score"),
          count(lit(1)).as("n_chunks"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(topDocs)
    }).collect()

  def close(): Unit = {
    plans.clear()
    if (pin) scored.unpersist(blocking = false): Unit
  }
}
