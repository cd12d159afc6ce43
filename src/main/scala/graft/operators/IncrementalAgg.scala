package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a PERSISTED partial-
  * aggregate state table and fold each new ingest batch's partials
  * into it, instead of re-aggregating the corpus per refresh — the
  * standing materialized-view pattern for corpus-scale rollups. At
  * 100 TB the daily refresh reads the day's partition plus a state
  * table bounded by the group-key cardinality; the full history is
  * never re-scanned.
  *
  * Correct for aggregates that are commutative monoids over their
  * partial representation: SUM and COUNT merge by summing, MIN/MAX by
  * re-min/maxing; AVG is derived as merged-SUM / merged-COUNT at read
  * time (never stored — averages of averages are wrong under unequal
  * group sizes). Partial sums should be carried exact (decimal for
  * money/quantity columns): the merge re-orders additions, and only
  * an exact representation makes `state ⊕ batch ≡ full recompute`
  * bit-for-bit rather than approximately.
  */
object IncrementalAgg {

  /** Merge partial-aggregate frames (the state table + a batch's
    * partials — or several) on `keys`. `sumCols` merge by summing
    * (covers SUM and COUNT partials), `minCols`/`maxCols` by
    * re-min/maxing. Frames must share the (keys ++ value-cols)
    * schema; column names are preserved so the merged frame can be
    * written straight back as the next state.
    */
  def merge(partials: Seq[DataFrame], keys: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    require(partials.nonEmpty, "IncrementalAgg.merge: no partial frames")
    val cols = keys ++ sumCols ++ minCols ++ maxCols
    val unioned = partials
      .map(df => df.select(cols.map(col): _*))
      .reduce(_ unionByName _)
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
