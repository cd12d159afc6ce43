package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable count-min sketch (Cormode & Muthukrishnan 2005) — the
  * mergeable scale path for per-key frequency / heavy-hitter queries.
  *
  * Exact per-key counts shuffle every (key, 1) pair and the result is
  * O(distinct keys); the sketch is a FIXED D×W counter grid:
  *
  *   - UPDATE: each input key increments one counter per hash row
  *     (D counters of D·W total). As a DataFrame this is a
  *     (row, position) count aggregate — map-side combine collapses
  *     each partition to ≤ D·W rows, so the shuffle carries a
  *     constant-size frame no matter the corpus;
  *   - ESTIMATE: est(k) = min over rows of counter[j][pos_j(k)].
  *     Collisions only ever ADD, so est ≥ true count (no false
  *     negatives for a threshold query) and the overcount shrinks
  *     geometrically with D;
  *   - MERGE: counters of a corpus union = elementwise SUM of the
  *     per-corpus counters (associative/commutative — shards, days,
  *     or stream micro-batches combine without re-scan; the running
  *     sum per (row, pos) is bounded state, never O(keys)).
  *
  * Engine-portable by the same rules as HllSketch (SURVEY §5): the
  * row-j position of a key is md5-derived from the string render
  * "j:key" (4 hex digits mod W), every counter is exact integer
  * arithmetic, so a SQL engine replays the whole sketch bit-for-bit
  * and combine order can never change a result.
  *
  * D=4, W=256: 1 KiB of counters, overcount per row ~n/W with
  * pairwise-independent-ish hashing — W is the accuracy dial, the
  * shuffle stays ≤ D·W rows either way.
  */
object CmSketch {

  val D = 4
  val W = 256

  /** Row-j counter position of a key (key must already be rendered as
    * a string so the oracle's VARCHAR cast matches): md5("j:key")
    * first 4 hex digits mod W — nonnegative, so Spark's % and
    * DuckDB's % agree.
    */
  def pos(j: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), key)), 1, 4), 16, 10)
      .cast("long") % W

  /** The counter frame — the sketch's mergeable form: (_j row,
    * _p position, _c count), ≤ D·W rows. One narrow projection
    * explodes each input row into its D (row, position) hits; the
    * count aggregate map-side combines to the grid.
    */
  def counters(df: DataFrame, keyCol: Column): DataFrame =
    df.select(explode(array((0 until D).map(j =>
        struct(lit(j).as("_j"), pos(j, keyCol).as("_p"))): _*)).as("_jp"))
      .select(col("_jp._j").as("_j"), col("_jp._p").as("_p"))
      .groupBy(col("_j"), col("_p"))
      .agg(count(lit(1)).as("_c"))

  /** Union two counter frames — elementwise sum (missing cell = 0). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("_j"), col("_p"))
      .agg(sum(col("_c")).as("_c"))

  /** Append `_est` (the count-min estimate, ≥ the true count) to a
    * frame of candidate keys: each key LEFT-joins its D counters —
    * the counter frame is ≤ D·W rows, always broadcast — and takes
    * the min with absent cells counted as 0. An absent cell means no
    * sketched key hashed there, i.e. the counter is 0; min over a 0
    * gives _est = 0, exactly what true count-min returns for a key
    * the input never contained. (An inner join would instead DROP the
    * empty cells — inflating the min for a partially-unseen key and
    * silently removing an all-unseen key from the output.)
    */
  def estimate(candidates: DataFrame, keyCol: Column,
      counterFrame: DataFrame): DataFrame = {
    val keyed = candidates.withColumn("_jp",
        explode(array((0 until D).map(j =>
          struct(lit(j).as("_j"), pos(j, keyCol).as("_p"))): _*)))
      .select(candidates.columns.map(col) :+
        col("_jp._j").as("_j") :+ col("_jp._p").as("_p"): _*)
    keyed.join(broadcast(counterFrame), Seq("_j", "_p"), "left")
      .groupBy(candidates.columns.map(col): _*)
      .agg(min(coalesce(col("_c"), lit(0L))).as("_est"))
  }
}
