package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Two-level grouping-set aggregation.
  *
  * Spark plans ROLLUP / CUBE / GROUPING SETS as an Expand operator —
  * every input row is replicated once per grouping set — feeding a
  * hash aggregate. Partial aggregation runs AFTER Expand, so on a
  * 100 TB fact table the ×|sets| row copy sits in the corpus-sized
  * scan stage and dominates the query (measured at the 100× bench:
  * q_cube 6.2 s vs the plain-groupBy q1_agg 4.0 s on the same scan).
  *
  * For decomposable aggregates (SUM and COUNT re-aggregate as SUM of
  * partials) the identity
  *
  *   cube(k…).agg(sum(v), count(*))
  *     ≡ groupBy(k…).agg(sum(v) AS s, count(*) AS c)
  *         |> cube(k…).agg(sum(s), sum(c))
  *
  * moves the split BEFORE Expand (which Catalyst does not do itself):
  * the corpus-sized stage becomes a plain partial-agg groupBy with no
  * row replication, and Expand runs over the pre-aggregate — one row
  * per distinct key combination instead of per corpus row.
  *
  * NULL soundness: a NULL key value forms one group in the
  * pre-aggregate; the outer rollup/cube then groups that single row
  * exactly as the one-level plan groups the underlying rows
  * (data-NULL vs subtotal-NULL is still distinguished by
  * grouping_id). SUM ignores NULL values and COUNT(1) counts all
  * rows in both shapes. The rewrite is exact, not approximate —
  * pinned by TwoLevelAggSpec against the one-level plans, including
  * a NULL-key corpus.
  *
  * Reference scope: vectra-py has no grouping-set surface at all
  * (its aggregation is Python-side list folds); this operator exists
  * for the 100 TB profile of the Spark-native engine.
  */
object TwoLevelAgg {

  /** Pre-aggregate `df` to the finest grain of `keys`: exact
    * DECIMAL(28,10) partial sum of `value` (decimal addition is
    * associative, so re-aggregation reproduces the one-level sum
    * bit-for-bit — the same determinism contract as QueryUtil.dsum)
    * plus a partial row count. Feed the result to rollup/cube/
    * groupingSets over the SAME keys with [[sumOfPartials]] /
    * [[countOfPartials]].
    */
  def preSumCount(df: DataFrame, keys: Seq[Column], value: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(sum(value.cast(DecimalType(28, 10))).as("p_sum"),
        count(lit(1)).as("p_n"))

  /** Final sum over [[preSumCount]] partials, emitted as the same
    * rounded double QueryUtil.dsum produces (schema-identical to the
    * one-level plan).
    */
  def sumOfPartials(scale: Int = 2): Column =
    round(sum(col("p_sum")).cast("double"), scale)

  /** Final count over [[preSumCount]] partials (LongType, matching
    * one-level count(*)).
    */
  def countOfPartials: Column = sum(col("p_n"))
}
