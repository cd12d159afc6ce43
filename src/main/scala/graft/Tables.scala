package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * the scale-factor dir.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects;
    // read nanos as long and rebuild a (micros) timestamp with integer
    // arithmetic — `div` keeps it in long (a double round-trip would
    // lose precision on ~1.7e18 ns epoch values).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts div 1000 AS BIGINT))"))
    else df
  }
}
