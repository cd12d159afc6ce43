package graft.operators

import org.apache.spark.sql.DataFrame
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
    b.join(ch, Seq(keyCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "d")
      .select(col(keyCol) +:
        payload.map(c => when(col("_op").isin("u", "i"), col(s"_c_$c"))
          .otherwise(col(s"_b_$c")).as(c)) :+
        when(col("_op") === "u", "updated")
          .when(col("_op") === "i", "inserted")
          .otherwise("kept").as("status"): _*)
  }
}
