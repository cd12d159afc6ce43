package graft.serve

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

import graft.filters.MetaFilter

/** Multi-shard serving orchestration: the 100-TB shape the
  * single-shard classes document ("one refresher per shard, the
  * changelog partitioned by shard") as a real, testable object.
  *
  *   - PLACEMENT: rows land on `pmod(hash(id), nShards)` — Spark's
  *     murmur3 `hash` expression, evaluated IN SPARK for both the
  *     initial split and every CDC micro-batch, so the router and a
  *     cluster-side changelog partitioner (`repartition(nShards,
  *     hash(col(id)))`) agree by construction and no driver-side
  *     reimplementation of the hash can drift;
  *   - WRITE: each shard is a [[RefreshingVectorServing]] with its own
  *     apply lock — refreshers run CONCURRENTLY (one per changelog
  *     partition in production); a query mid-refresh sees each shard
  *     atomically pre- or post-batch (never torn), which is the
  *     cross-shard freshness contract a scatter-gather tier actually
  *     has;
  *   - READ: scatter-gather top-k — query every shard's bounded
  *     snapshot, merge by (score desc, id asc), take k. Identical
  *     results to one unsharded index over the same rows (ServingSpec
  *     pins this, including during concurrent per-shard refresh):
  *     cosine scores don't depend on co-residency, so sharding is
  *     invisible to correctness and only divides memory/refresh work.
  */
final class ShardedVectorServing(
    initial: DataFrame,
    idCol: String,
    vecCol: String,
    val nShards: Int,
    maxLocalItems: Int = LocalVectorServing.DefaultMaxLocalItems) {

  require(nShards > 0, s"nShards must be positive, got $nShards")

  private def shardOf = pmod(hash(col(idCol)), lit(nShards))

  private val refreshers: IndexedSeq[RefreshingVectorServing] =
    (0 until nShards).map { s =>
      new RefreshingVectorServing(
        initial.filter(shardOf === s), idCol, vecCol, maxLocalItems)
    }

  /** Direct shard access — production wires shard(i) as the
    * foreachBatch target of changelog partition i, so refreshes are
    * per-shard concurrent.
    */
  def shard(i: Int): RefreshingVectorServing = refreshers(i)

  /** Route one CDC micro-batch to its shards (same contract as
    * RefreshingVectorServing.applyChanges: full new row + op ∈
    * {u, i, d}). Convenience path for single-stream wiring; the
    * per-shard applies here run sequentially — partition the
    * changelog and use [[shard]] for concurrent refresh.
    */
  def applyChanges(batch: DataFrame, opCol: String = "op"): Unit = {
    val stamped = batch.withColumn("_shard", shardOf).localCheckpoint()
    (0 until nShards).foreach { s =>
      val part = stamped.filter(col("_shard") === s).drop("_shard")
      if (!part.isEmpty) refreshers(s).applyChanges(part, opCol)
    }
  }

  /** Scatter-gather top-k: each shard's bounded-heap scan returns its
    * local k, and the global k is the merge by (score desc, id asc) —
    * the same ordering contract as LocalVectorServing/VectorIndex, so
    * the result is row-identical to one unsharded snapshot.
    */
  def queryItems(query: Seq[Double], k: Int,
      filter: Option[MetaFilter] = None): Seq[(Row, Double)] = {
    val all = refreshers.flatMap(_.serving.queryItems(query, k, filter))
    all.sortBy { case (r, s) => (-s, idKey(r)) }.take(k)
  }

  /** Re-shard n → m (the operation a growing corpus forces): rebuild
    * placement from the SAME hash law — `pmod(hash(id), m)` with the
    * new modulus — over the union of the current shard tables, and
    * return a fully-built m-shard router. This is drain + swap, not an
    * in-place mutation:
    *
    *   1. DRAIN — quiesce the changelog (or buffer it) so the shard
    *      tables stop moving; the union here reads each shard's
    *      maintained table as of this call.
    *   2. BUILD — the new router materializes every one of its m
    *      snapshots in its constructor, while the OLD router keeps
    *      serving reads untouched (ServingSpec pins query identity
    *      before, during and after).
    *   3. SWAP — the caller flips its (volatile) router reference and
    *      replays any buffered changelog entries into the new router;
    *      readers see either the n-shard or the m-shard tier, never a
    *      mix.
    *
    * Placement is recomputed from scratch rather than incrementally
    * migrated: with `pmod(hash(id), m)` there is no split lineage
    * between moduli (this is not a consistent-hash ring), and the
    * rebuild cost is the same bounded per-shard collects the CDC path
    * already pays per refresh — O(corpus/m) per new shard, embarrassed
    * parallel across refreshers in production.
    */
  def reshard(newShards: Int): ShardedVectorServing = {
    val all = refreshers.map(_.currentTable).reduce(_ unionByName _)
    new ShardedVectorServing(all, idCol, vecCol, newShards, maxLocalItems)
  }

  /** Point lookup: probe every shard (id placement is a write-side
    * concern; a read probing nShards in-memory snapshots is cheaper
    * than keeping a driver-side hash in sync with Spark's).
    */
  def getItem(id: Any): Option[Row] =
    refreshers.iterator.flatMap(_.serving.getItem(id)).nextOption()

  /** Total items across shard snapshots. */
  def size: Int = refreshers.map(_.serving.size).sum

  /** Tie-break key: numeric ids order numerically (the suite's id
    * columns are longs), anything else falls back to string order —
    * mirrors LocalVectorServing's ascending-id drain within a shard.
    */
  private def idKey(r: Row): (Double, String) = r.getAs[Any](idCol) match {
    case n: java.lang.Number => (n.doubleValue(), "")
    case other               => (Double.MaxValue, String.valueOf(other))
  }
}
