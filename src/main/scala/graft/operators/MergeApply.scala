package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO / CDC-apply: apply a changelog frame to a base table in
  * ONE pass — the lakehouse incremental-maintenance primitive
  * (Delta/Iceberg MERGE, Flink upsert sink). The changelog carries the
  * FULL new row plus an op column — the classic CDC contract:
  * 'u' (update an existing key), 'i' (insert a fresh key), 'd'
  * (delete). v_upsert and v_delete are the single-op special cases.
  *
  * Plan shape at 100 TB: both sides are corpus-sized, so this is a
  * full-outer SortMergeJoin on the key — broadcast would be wrong and
  * full-outer cannot broadcast anyway — with all case logic in the
  * post-join projection (codegen'd, no second pass). Nothing but the
  * two keyed sides ever moves; repeated applies on the same key
  * benefit from bucketed layouts (operators.Bucketing) exactly like
  * any recurring big-big join.
  *
  * Streaming face: apply each micro-batch of a changelog stream via
  * `foreachBatch { (batch, _) => base = applyChanges(base, batch, …) }`
  * — the standard structured-streaming upsert-sink pattern
  * (StreamingSpec's s_merge test drives it and pins equivalence to
  * the one-shot batch apply).
  */
object MergeApply {

  /** `base` and `changes` share the key + payload columns; `changes`
    * adds `opCol` ∈ {u, i, d}. Returns the merged table with a
    * `status` column (updated / inserted / kept) — drop it when
    * chaining applies.
    *
    * PRECONDITION (enforced): at most ONE change row per key per
    * apply — like Delta/Iceberg MERGE, which errors when multiple
    * source rows match a target row. Duplicate keys would otherwise
    * fan out through the full-outer join and silently emit duplicate
    * merged rows. The guard is lazy and distributed: a window count
    * over the changes side (its shuffle is the join's own key
    * exchange, reused by the planner) feeds a raise_error folded into
    * the key projection, so the job fails loudly at runtime instead
    * of corrupting the merge.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    require(payload.forall(changes.columns.contains),
      s"applyChanges: changes must carry the full new row; missing " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    val b = base.select(col(keyCol) +: payload.map(c => col(c).as(s"_b_$c")): _*)
    val ch = changes.select(
      col(keyCol) +: (col(opCol).as("_op") +: payload.map(c => col(c).as(s"_c_$c"))): _*)
      .withColumn("_kn", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    val keyOut = when(coalesce(col("_kn"), lit(1L)) > 1L,
      raise_error(concat(
        lit(s"applyChanges: multiple change rows for key $keyCol="),
        col(keyCol).cast("string"),
        lit(" in one batch; MERGE requires at most one change per key per apply"))))
      .otherwise(col(keyCol)).as(keyCol)
    b.join(ch, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "d")
      .select(keyOut +:
        payload.map(c => when(col("_op").isin("u", "i"), col(s"_c_$c"))
          .otherwise(col(s"_b_$c")).as(c)) :+
        when(col("_op") === "u", "updated")
          .when(col("_op") === "i", "inserted")
          .otherwise("kept").as("status"): _*)
  }
}
