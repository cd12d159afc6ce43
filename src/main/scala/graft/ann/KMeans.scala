package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic, oracle-replayable Lloyd's k-means.
  *
  * MLlib's KMeans (used by IvfIndex.buildWithKMeans) is the right tool
  * when only the fitted cells matter — but its k-means|| init and
  * float-order-dependent mean updates cannot be reproduced outside the
  * JVM, so nothing downstream of it can be value-checked by an
  * external engine. This variant pins every source of nondeterminism
  * so a SQL engine can replay the fit bit-for-bit (the dd_semantic
  * DuckDB oracle does exactly that):
  *
  *   - seeding is caller-supplied (corpus rows picked by an id rule,
  *     e.g. the IVF √n modulus) — no RNG;
  *   - assignment is the NearestCentroid codegen kernel: squared-L2
  *     argmin with the same left-to-right fold as DuckDB list
  *     arithmetic, ties to the lowest cluster id;
  *   - mean updates accumulate in DECIMAL(28,10) — exact, therefore
  *     independent of partitioning and shuffle order (a double sum is
  *     not) — and emit round(sum/count, 9) doubles, so the next
  *     iteration's distances start from identical bits on any engine.
  *
  * Scale shape: each iteration is one narrow assignment pass (the
  * centroid matrix is a plan constant, ≤ 65536 cells) plus one
  * map-side-combined aggregation of n×dim (cell, dim, x) rows. That is
  * the classic distributed Lloyd step; iterations are few and fixed.
  * Clusters that lose all members drop out (both engines compute the
  * same surviving set).
  */
object KMeans {

  /** `iters` Lloyd updates from `seeds` (cid, cv); returns the final
    * centroid frame (cid, cv: array<double>). Each update materializes
    * the (small) centroid frame on the driver for the next assignment
    * kernel — planning-time, bounded by ivfAssign's 65536-cell rule.
    */
  def lloyd(vecs: DataFrame, idCol: String, vecCol: String,
      seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cents = seeds.select(col("cid"), col("cv").cast("array<double>").as("cv"))
    for (_ <- 1 to iters)
      cents = meanCentroids(assign(vecs, idCol, vecCol, cents), vecCol)
    cents
  }

  /** Nearest-centroid cluster assignment: input columns plus `cell`. */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    Ann.ivfAssign(vecs, idCol, vecCol, cents, "cid", "cv")

  /** Per-cluster element-wise mean — exact decimal accumulation (see
    * scaladoc above), rounded to 9 decimals so the emitted centroid
    * doubles are engine-portable.
    */
  private def meanCentroids(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("cell"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col("cell"), col("j"))
      .agg(round(sum(col("x").cast(DecimalType(28, 10))).cast("double") /
        count(lit(1)), 9).as("m"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("j"), col("m"))).as("_jm"))
      .select(col("cell").as("cid"),
        transform(array_sort(col("_jm")), e => e.getField("m")).as("cv"))
}
