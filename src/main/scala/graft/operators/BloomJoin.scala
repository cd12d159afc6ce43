package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.expr.{BloomFilterAgg, BloomMightContain}

/** Runtime-filter (Bloom) join pruning — the classic big-data join
  * optimization made a first-class operator: build a constant-size
  * bloom of the (selective) build side's keys, broadcast it, and drop
  * fact rows that cannot join BEFORE the fact-side shuffle.
  *
  * Why it matters at 100 TB: a selective dimension predicate (e.g.
  * "orders in one quarter") still forces the plain join to shuffle
  * EVERY fact row; the bloom costs one mBits/8-byte broadcast and a
  * codegen'd probe in the fact scan, and only surviving rows reach
  * the exchange. No false negatives, so the join result is
  * IDENTICAL to the unfiltered join — which is exactly what the
  * DuckDB oracle checks (the oracle runs the plain join; the bloom's
  * internals never need replaying).
  *
  * Spark's optimizer injects this shape itself when statistics
  * justify it (spark.sql.optimizer.runtime.bloomFilter, internal
  * BloomFilterAggregate); exposing it as an operator lets a pipeline
  * build the filter once, persist it, and reuse it across queries —
  * and keeps the decision explicit instead of stats-dependent.
  */
object BloomJoin {

  /** Default 2^20 bits (128 KiB) / 3 probes: ~1% false positives at
    * ~100k build keys — sizing is a broadcast-budget dial, not a
    * correctness one.
    */
  val DefaultMBits = 1 << 20
  val DefaultK = 3

  /** Keys of ANY type are reduced to a long via xxhash64 on BOTH the
    * build and probe side. The first cut used cast("long"), which
    * yields null for non-numeric strings: a null-cast build key was
    * silently skipped and the matching probe rows filtered out —
    * FALSE NEGATIVES, violating the row-identical-to-the-plain-join
    * contract for any key type a plain equi-join would match.
    * xxhash64 is codegen'd, deterministic, and never null (a null key
    * hashes to the seed — its probe rows survive the bloom and are
    * dropped by the equi-join, which never matches null anyway).
    */
  private def keyHash(key: Column): Column = xxhash64(key)

  def bloomAgg(key: Column, mBits: Int = DefaultMBits, k: Int = DefaultK): Column =
    ColumnBridge.column(BloomFilterAgg(
      ColumnBridge.expression(keyHash(key)), mBits, k).toAggregateExpression())

  def mightContain(bloom: Column, key: Column,
      mBits: Int = DefaultMBits, k: Int = DefaultK): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(keyHash(key)), mBits, k))

  /** Build the filter now: one bounded aggregate job whose result is
    * the mBits/8-byte serialized bloom — a planning-time
    * materialization in the same class as the IVF centroid collect
    * (hard-bounded by mBits, never by the key count).
    */
  def buildBloom(build: DataFrame, buildKey: String,
      mBits: Int = DefaultMBits, k: Int = DefaultK): Array[Byte] =
    build.agg(bloomAgg(col(buildKey), mBits, k).as("_bloom"))
      .head.getAs[Array[Byte]](0)

  /** `fact` rows whose `factKey` might join `build`'s `buildKey`.
    * The bloom is materialized on the driver and embedded as a
    * LITERAL, so the probe filter sits directly on the fact scan with
    * the byte array held once in the codegen references. (The first
    * cut shipped the one-row bloom frame via crossJoin(broadcast(…)) —
    * plan-lazy, but the generated filter then read the binary out of
    * the joined row, and UnsafeRow.getBinary COPIES: 128 KiB memcpy +
    * allocation per fact row, ~750 GB of copying on a 6M-row probe.
    * A literal ships once per task, not once per row.)
    * Equi-join afterwards drops the bloom's false positives; the
    * combined result is row-identical to the plain join.
    */
  def pruneFact(fact: DataFrame, factKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = DefaultMBits, k: Int = DefaultK): DataFrame = {
    val bloom = buildBloom(build, buildKey, mBits, k)
    fact.filter(mightContain(lit(bloom), col(factKey), mBits, k))
  }

  /** [[pruneFact]] with the filter SIZED from the measured build-side
    * row count instead of a fixed constant — the optimization guide's
    * expectedNumItems rule (≥ the true key count; ~12 bits/key ≈ 1%
    * false positives at k = 3). The count is one narrow aggregate over
    * the build side, which is by contract the SELECTIVE side, so the
    * extra pass is bounded; row count ≥ distinct key count, so the
    * sizing only ever over-provisions.
    *
    * Why sizing matters beyond memory: the serialized filter is
    * embedded as a plan LITERAL, and a literal fixed at the
    * corpus-scale worst case taxes every plan pass — measured at
    * sf0.1, a 4 MiB bloom cost ta_contaminate ~2.2 s/run of
    * driver-side plan work (AQE re-optimizes after each stage and
    * each pass walks the literal) for a filter whose build side held
    * a few hundred keys. Sized from the data it is KiB at test scale
    * and grows to `maxMBits` exactly when the keys do. False-positive
    * rate only affects how many fact rows the later equi-join must
    * drop — the join result is identical at any size.
    */
  def pruneFactSized(fact: DataFrame, factKey: String,
      build: DataFrame, buildKey: String,
      bitsPerKey: Int = 12, k: Int = DefaultK,
      maxMBits: Int = 1 << 27): DataFrame = {
    val n = build.count()
    val want = math.min(maxMBits.toLong, math.max(1L << 14, n * bitsPerKey))
    val mBits = ((want + 63) / 64 * 64).toInt
    pruneFact(fact, factKey, build, buildKey, mBits, k)
  }
}
