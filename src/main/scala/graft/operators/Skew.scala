package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys at 100 TB.
  *
  * AQE's skew-join splitting handles most cases automatically
  * (spark.sql.adaptive.skewJoin, on by default); these helpers cover
  * the two patterns AQE doesn't: a single monster group in an
  * aggregation, and a broadcast-side explosion in a hot-key join.
  */
object Skew {

  /** Two-phase (salted) aggregation: groupBy(keys :+ salt) partial
    * sums, then groupBy(keys) final sums. Spark's hash aggregate
    * already map-side combines, so this only wins when ONE reduce
    * partition still drowns — i.e. a single group holds a large share
    * of all rows; the salt spreads that group over `saltBuckets`
    * reducers.
    *
    * sums/counts compose associatively so the two phases are exact.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** Salted join for one hot build-side key set: replicate the small
    * side `saltBuckets`× with an explicit salt column, salt the big
    * side randomly-but-deterministically, join on (key, salt). Turns
    * one hot reducer into `saltBuckets` even ones.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(col(key), spark_partition_id() + monotonically_increasing_id()),
        lit(saltBuckets.toLong)))
    val smallExploded = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Diagnostic: per-key row share of the top-N heaviest keys — run
    * this before deciding a key needs salting.
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("rows"))
      .withColumn("share", round(col("rows") / total, 4))
      .orderBy(desc("rows"))
      .limit(topN)
  }
}
