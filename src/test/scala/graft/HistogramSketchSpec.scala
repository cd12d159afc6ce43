package graft

import org.apache.spark.sql.functions._

import graft.operators.HistogramSketch

/** The q_quantiles_sketch DuckDB oracle checks engine parity; these
  * check the estimator: within one bin width of the exact quantile,
  * partition-invariant, and exact on degenerate one-value groups.
  */
class HistogramSketchSpec extends SparkSpecBase {

  private def sketch(parts: Int) = {
    import spark.implicits._
    // deterministic pseudo-uniform values on [0, 1000) plus a
    // one-value group that exercises the hi == lo guard
    val rows = (0L until 4000L).map { i =>
      ("u", ((i * 2654435761L) % 100000L).toDouble / 100.0)
    } ++ (0L until 10L).map(_ => ("const", 42.5))
    HistogramSketch.quantiles(
      rows.toDF("g", "x").repartition(parts), Seq("g"), col("x"),
      Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
  }

  test("estimates land within one bin width of the exact quantile") {
    import spark.implicits._
    val out = sketch(4).filter($"g" === "u")
      .select($"n", $"p25", $"p50", $"p95")
      .as[(Long, Double, Double, Double)].head()
    val binWidth = 1000.0 / HistogramSketch.B
    assert(out._1 == 4000L)
    for ((est, exact) <- Seq(out._2 -> 250.0, out._3 -> 500.0, out._4 -> 950.0))
      assert(math.abs(est - exact) <= binWidth + 1.0, s"est $est vs ~$exact")
  }

  test("one-value group reconstructs the value exactly") {
    import spark.implicits._
    val row = sketch(3).filter($"g" === "const")
      .select($"p25", $"p50", $"p95").as[(Double, Double, Double)].head()
    assert(row == ((42.5, 42.5, 42.5)))
  }

  test("p small enough to select the minimum returns _lo exactly") {
    import spark.implicits._
    val rows = (0L until 200L).map(i => ("g", 100.0 + i))
    val out = HistogramSketch.quantiles(
        rows.toDF("g", "x"), Seq("g"), col("x"),
        Seq("p0" -> 0.0, "pmin" -> 0.004, "p50" -> 0.5))
      .select($"p0", $"pmin", $"p50").as[(Double, Double, Double)].head()
    // ceil(0*200) = 0 and ceil(0.004*200) = 1 both select the group
    // minimum -> exact _lo, not lo + binWidth
    assert(out._1 == 100.0, s"p=0 returned ${out._1}")
    assert(out._2 == 100.0, s"p=1/n returned ${out._2}")
    assert(out._3 > 150.0)
  }

  test("lo=-0.0 / hi=0.0 is a degenerate range in the inline path (SQL === semantics)") {
    import spark.implicits._
    // boxed equals says -0.0 != 0.0, SQL === says they're equal; the
    // inline path must take the degenerate branch (bin 0) like the
    // join path, not divide by the zero width and bin to NaN/99
    val rows = Seq(("g", -0.0), ("g", 0.0), ("g", 0.0))
    val out = HistogramSketch.quantiles(
        rows.toDF("g", "x"), Seq("g"), col("x"), Seq("p50" -> 0.5))
      .select($"p50").as[Double].head()
    assert(out == 0.0, s"degenerate -0.0/0.0 range returned $out")
  }

  test("all-NaN group: inline path agrees with the join path (NaN=NaN is degenerate)") {
    import spark.implicits._
    // primitive == is false for NaN==NaN, so before the round-11 fix
    // the inline path took the arithmetic branch while the join
    // path's SQL === took the degenerate one; both must agree —
    // degenerate, yielding NaN quantiles without error
    val rows = Seq(("g", "x", Double.NaN), ("g", "x", Double.NaN),
      ("ok", "x", 1.0), ("ok", "x", 3.0))
    val inline = HistogramSketch.quantiles(
        rows.toDF("g", "g2", "v"), Seq("g"), col("v"), Seq("p50" -> 0.5))
      .select($"g", $"p50").collect().map(_.toString).sorted.toSeq
    // composite group key forces the join path over the same groups
    val joined = HistogramSketch.quantiles(
        rows.toDF("g", "g2", "v"), Seq("g", "g2"), col("v"), Seq("p50" -> 0.5))
      .select($"g", $"p50").collect().map(_.toString).sorted.toSeq
    assert(inline == joined)
    assert(inline.exists(_.contains("NaN")))
  }

  test("partition invariance: identical bits at any parallelism") {
    val a = sketch(1).orderBy("g").collect().toSeq
    val b = sketch(17).orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("fixed-bounds counters: estimates within one bin width, out-of-range clamped") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i =>
      ("u", ((i * 2654435761L) % 100000L).toDouble / 100.0)) ++
      Seq(("u", -50.0), ("u", 2000.0)) // outside [0, 1000) — edge bins
    val cnts = HistogramSketch.counters(
      rows.toDF("g", "x"), Seq("g"), col("x"), lo = 0.0, hi = 1000.0)
    assert(cnts.count() <= HistogramSketch.B.toLong)
    val out = HistogramSketch.quantilesFromCounters(
        cnts, Seq("g"), 0.0, 1000.0,
        Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
      .select($"n", $"p25", $"p50", $"p95")
      .as[(Long, Double, Double, Double)].head()
    val binWidth = 1000.0 / HistogramSketch.B
    assert(out._1 == 4002L)
    for ((est, exact) <- Seq(out._2 -> 250.0, out._3 -> 500.0, out._4 -> 950.0))
      assert(math.abs(est - exact) <= binWidth + 1.0, s"est $est vs ~$exact")
  }

  test("streaming twin: running counters equal the batch frame, and merge backfills") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 3000L).map(i => ((i * 7919L) % 1000L).toDouble)
    val stream = MemoryStream[Double]
    // disjoint batches: counts are sums, NOT idempotent — exactly-once
    // delivery is the contract this pins (same as the CmSketch twin)
    stream.addData(rows.take(1700))
    stream.addData(rows.drop(1700))
    val q = graft.streaming.StreamingQuantilesSketch.countersStream(
        stream.toDF().toDF("x").withColumn("g", lit("s")),
        Seq("g"), col("x"), lo = 0.0, hi = 1000.0)
      .writeStream.format("memory").queryName("hist_counters_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val batch = HistogramSketch.counters(
      rows.map(("s", _)).toDF("g", "x"), Seq("g"), col("x"), 0.0, 1000.0)
    assert(spark.table("hist_counters_out")
        .orderBy($"g", $"_bin").collect().map(_.toString).toSeq ==
      batch.orderBy($"g", $"_bin").collect().map(_.toString).toSeq)
    // lambda backfill: stream counters + a batch shard's counters
    val shard = (0L until 500L).map(i => ("s", (i % 800L).toDouble)).toDF("g", "x")
    val merged = HistogramSketch.merge(
      spark.table("hist_counters_out"),
      HistogramSketch.counters(shard, Seq("g"), col("x"), 0.0, 1000.0), Seq("g"))
    val whole = HistogramSketch.counters(
      rows.map(("s", _)).toDF("g", "x").unionByName(shard),
      Seq("g"), col("x"), 0.0, 1000.0)
    assert(merged.orderBy($"g", $"_bin").collect().map(_.toString).toSeq ==
      whole.orderBy($"g", $"_bin").collect().map(_.toString).toSeq)
  }
}
