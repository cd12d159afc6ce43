package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) layouts: pre-shuffle once at write time so
  * repeated big-big joins and aggregations on the same key never
  * shuffle again.
  *
  * At 100 TB the dominant cost of `orders ⋈ lineitem`-shaped joins is
  * the exchange of both sides; bucketing both tables by the join key
  * into the same bucket count lets Spark plan a SortMergeJoin with
  * NO Exchange on either side (BucketingSpec asserts the plan). This
  * is the standing answer to "is there a shuffle here that becomes
  * the bottleneck at scale" for every recurring join key in the
  * schema.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (bucketed parquet +
    * catalog metadata — bucket info lives in the metastore, so this
    * needs saveAsTable, not a bare path).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero Exchange when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
