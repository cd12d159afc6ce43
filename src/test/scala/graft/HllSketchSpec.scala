package graft

import org.apache.spark.sql.functions._

import graft.operators.HllSketch

/** The q_distinct_sketch DuckDB oracle checks engine parity; these
  * check the estimator itself: accuracy within the published HLL
  * error bound, partition invariance (register max is order-free),
  * and monotone response to cardinality.
  */
class HllSketchSpec extends SparkSpecBase {

  private def est(n: Long, parts: Int = 4): Double = {
    import spark.implicits._
    val df = (0L until n).map(i => ("g", s"k$i")).toDF("grp", "key")
      .repartition(parts)
    HllSketch.distinctSketch(df, Seq("grp"), col("key"))
      .select($"hll_est").as[Double].head()
  }

  test("estimate lands within 3 standard errors across cardinalities") {
    // sigma = 1.04/sqrt(M) ~= 18.4% for M=32; 3 sigma ~= 55%
    for (n <- Seq(200L, 1000L, 5000L)) {
      val e = est(n)
      val rel = math.abs(e - n) / n.toDouble
      assert(rel < 0.55, s"n=$n est=$e rel=$rel")
    }
  }

  test("estimate is partition-invariant and duplicate-insensitive") {
    import spark.implicits._
    val base = (0L until 1000L).map(i => ("g", s"k$i"))
    val dup = base ++ base ++ base // same key set, 3x multiplicity
    val e1 = est(1000L, parts = 1)
    val e2 = est(1000L, parts = 17)
    val e3 = HllSketch.distinctSketch(
        dup.toDF("grp", "key").repartition(7), Seq("grp"), col("key"))
      .select($"hll_est").as[Double].head()
    assert(e1 == e2 && e1 == e3, s"$e1 / $e2 / $e3")
  }

  test("registers cap at M and estimates order with cardinality") {
    import spark.implicits._
    val df = ((0L until 50L).map(i => ("small", s"s$i")) ++
      (0L until 5000L).map(i => ("big", s"b$i"))).toDF("grp", "key")
    val rows = HllSketch.distinctSketch(df, Seq("grp"), col("key"))
      .select($"grp", $"hll_est", $"n_regs_hit")
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(rows("small")._2 <= HllSketch.M && rows("big")._2 <= HllSketch.M)
    assert(rows("big")._1 > rows("small")._1)
  }

  test("merge of disjoint halves equals the sketch of the union, bit for bit") {
    import spark.implicits._
    val all = (0L until 3000L).map(i => ("g", s"k$i")).toDF("grp", "key")
    val h1 = all.filter(xxhash64($"key") % 2 === 0)
    val h2 = all.filter(xxhash64($"key") % 2 =!= 0)
    val whole = HllSketch.distinctSketch(all, Seq("grp"), $"key")
      .select($"hll_est").as[Double].head()
    val merged = HllSketch.estimate(
      HllSketch.merge(
        HllSketch.registers(h1, Seq("grp"), $"key"),
        HllSketch.registers(h2, Seq("grp"), $"key"), Seq("grp")),
      Seq("grp")).select($"hll_est").as[Double].head()
    assert(whole == merged)
    // overlapping halves too — idempotent max means duplicates between
    // shards cannot inflate the union estimate
    val overlapped = HllSketch.estimate(
      HllSketch.merge(
        HllSketch.registers(all, Seq("grp"), $"key"),
        HllSketch.registers(h2, Seq("grp"), $"key"), Seq("grp")),
      Seq("grp")).select($"hll_est").as[Double].head()
    assert(overlapped == whole)
  }

  test("streaming twin: running registers converge to the batch sketch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 2000L).map(i => (s"t${i % 3}", s"u${i % 400}"))
    val stream = MemoryStream[(String, String)]
    // two batches — the second overlaps the first, exercising the
    // idempotent running max in the state store
    stream.addData(rows.take(1200))
    stream.addData(rows.drop(800))
    val q = graft.streaming.StreamingDistinctSketch.registersStream(
        stream.toDF().toDF("event_type", "user_id"), Seq("event_type"), "user_id")
      .writeStream.format("memory").queryName("hll_regs_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = HllSketch.estimate(spark.table("hll_regs_out"), Seq("event_type"))
      .orderBy("event_type").collect().toSeq
    val batch = HllSketch.distinctSketch(
        rows.toDF("event_type", "user_id"), Seq("event_type"), $"user_id")
      .orderBy("event_type").collect().toSeq
    assert(streamed == batch)
  }
}
