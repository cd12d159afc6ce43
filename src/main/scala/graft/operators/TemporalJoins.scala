package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins.
  *
  * asOf: for each left row, the most recent right row at-or-before its
  * timestamp, per key — implemented as the classic union + sorted
  * carry-forward (`last(_, ignoreNulls)` over a keyed window): ONE
  * shuffle on the key, no per-row subqueries, no non-equi join. The
  * carried state per key is one row regardless of history length,
  * which is what survives a 100 TB event table. Right rows are
  * deduplicated to one per (key, ts) first so ties are deterministic.
  *
  * rangeJoin: rows matched to the intervals containing their
  * timestamp. The generic form is a non-equi join (Spark plans
  * BroadcastNestedLoop when one side broadcasts); for two large sides
  * pre-bucket both by coarse time bins and add the bin equality to
  * the join keys — the standard bin-bucketed range join.
  */
object TemporalJoins {

  /** Output: keyCol, tsCol, leftCols..., `prefix`+rightCols...,
    * `prefix`ts (the matched right timestamp) — right fields null when
    * nothing precedes.
    */
  def asOf(left: DataFrame, leftCols: Seq[String],
      right: DataFrame, rightCols: Seq[String],
      keyCol: String, tsCol: String, prefix: String = "asof_"): DataFrame = {
    // one right row per (key, ts): deterministic tie pick
    val rWin = Window.partitionBy(col(keyCol), col(tsCol))
      .orderBy(rightCols.map(c => col(c).desc): _*)
    val rDedup = right
      .select((keyCol +: tsCol +: rightCols).map(col): _*)
      .withColumn("_rn", row_number().over(rWin))
      .filter(col("_rn") === 1)

    val rTagged = rDedup.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).as(c)) ++
        rightCols.map(c => col(c).as(s"$prefix$c")) :+
        col(tsCol).as(s"${prefix}ts"): _*)
    val lTagged = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).as(s"$prefix$c")) :+
        lit(null).cast("timestamp").as(s"${prefix}ts"): _*)

    // right rows sort before left rows at equal ts → "at-or-before"
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryCols = rightCols.map(c => s"$prefix$c") :+ s"${prefix}ts"
    val carried = carryCols.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }

  /** Rows joined to the (inclusive) intervals containing them;
    * broadcast the smaller side at call site. Plans a nested-loop
    * join — use only when one side is tiny; otherwise rangeJoinBinned.
    */
  def rangeJoin(events: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String): DataFrame =
    intervals.join(events,
      col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))

  /** Bin-bucketed range join: intervals explode over the time bins
    * they cover, events map to their bin, and the join gains a bin
    * EQUALITY key — a hash join whose per-bin work is |bin events| ×
    * |bin intervals| instead of a full nested loop. Each matching
    * (interval, event) pair meets in exactly one bin (the event's), so
    * no dedup is needed.
    *
    * Choosing binSeconds: total join candidates ≈ |E|·|I|·w/T (every
    * same-bin pair is a hash-join MATCH that must flow through the
    * range filter), while interval replication costs |I|·(1 + len/w).
    * Candidates grow LINEARLY with w, so oversizing the bin is far
    * worse than oversizing the explode: prefer w well BELOW the
    * typical interval length and let long intervals replicate —
    * shrink w until replication (≈ |I|·len_avg/w extra rows) rivals
    * the candidate count, i.e. w* ≈ sqrt(len_avg · T / |E|) when
    * intervals outnumber nothing. The round-7 q_range lesson: 2-hour
    * bins over median-zero-length sessions cost 52G candidates at the
    * 100× corpus; 5-minute bins cost 2G for the same output.
    */
  def rangeJoinBinned(events: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binUs).cast("long"),
        floor(unix_micros(col(endCol)) / binUs).cast("long"))))
    val ev = events.withColumn("_bin",
      floor(unix_micros(col(tsCol)) / binUs).cast("long"))
    iv.join(ev, Seq("_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
