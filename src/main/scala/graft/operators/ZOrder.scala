package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering step behind Delta/Iceberg `OPTIMIZE ZORDER BY` and the
  * reason a 100 TB fact table can serve selective 2-D range queries
  * without a 2-D index: interleaving the bits of two sort keys makes
  * rows that are close in EITHER dimension land close on disk, so
  * every parquet file/row-group covers a tight min/max box in BOTH
  * columns and the reader's pushed-down range filters skip almost all
  * of them. A single-column sort gives perfect pruning on one key and
  * none on the other; the Z-curve trades a little of each for
  * pruning on both.
  *
  * Everything here is deterministic and engine-portable: the z-value
  * is a fixed sum of disjoint-bit terms (no sampling, unlike
  * `repartitionByRange`, whose sampled boundaries would make layouts
  * — and any oracle over them — run-dependent). File assignment uses
  * the TOP bits of the z-value (`zBucket`), which is exactly the
  * deterministic range-split a writer wants: contiguous z-ranges per
  * file, no skew surprises on uniform keys, no sample pass.
  */
object ZOrder {

  /** 2-D Morton interleave of the low `bits` bits of two non-negative
    * integer columns: a's bit j → position 2j, b's bit j → 2j+1.
    * Terms occupy disjoint bit positions, so the sum IS the bitwise
    * OR — and a plain add chain stays a codegen'd integer expression
    * in both Spark and the DuckDB oracle. Keys must fit in `bits`
    * bits (≤ 31 per key; 2·bits ≤ 62 keeps the result in a long).
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { j =>
      Seq(
        shiftleft(shiftright(a.cast("long"), j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(b.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1))
    }
    terms.reduce(_ + _)
  }

  /** Deterministic file assignment: the top 2·bits−log2(nBuckets)
    * shift keeps the HIGH bits — contiguous z-ranges map to the same
    * bucket, which is what clusters both dimensions per file.
    */
  def zBucket(z: Column, bits: Int, nBuckets: Int): Column = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    // nBuckets > 4^bits would make shift negative, and Java/Spark
    // shiftright masks the count (z >> -6 == z >> 58) — everything
    // would silently collapse into bucket 0 instead of failing
    require(Integer.numberOfTrailingZeros(nBuckets) <= 2 * bits,
      s"nBuckets ($nBuckets) must be <= 4^bits (bits=$bits): need log2(nBuckets) <= 2*bits")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(nBuckets)
    shiftright(z, shift)
  }

  /** Write `df` z-clustered on (a, b): one file per z-bucket, rows
    * z-sorted inside — per-file parquet min/max stats become tight
    * boxes in BOTH key columns, so range scans row-group-skip on
    * either. `repartition(col)` hash-shuffles by bucket (one reducer
    * per bucket, nBuckets-way parallel); sortWithinPartitions is a
    * local sort, never a global one.
    */
  def writeLayout(df: DataFrame, aCol: String, bCol: String, bits: Int,
      nBuckets: Int, path: String,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    val z = zValue(col(aCol), col(bCol), bits)
    df.withColumn("_zb", zBucket(z, bits, nBuckets))
      .repartition(nBuckets, col("_zb"))
      .sortWithinPartitions(col("_zb"), zValue(col(aCol), col(bCol), bits))
      .drop("_zb")
      .write.options(writerOptions).mode("overwrite").parquet(path)
  }
}
