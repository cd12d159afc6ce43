package graft

import org.apache.spark.sql.functions._

import graft.operators.CmSketch

/** The q_heavy_hitters oracle pins the full sketch replay; these
  * check the sketch's algebra: estimates never undercount (the
  * no-false-negative property the threshold scan relies on), and the
  * counter frame is mergeable by elementwise sum — shards, days, or
  * stream micro-batches combine without re-scan.
  */
class CmSketchSpec extends SparkSpecBase {

  test("estimate >= exact for every key, at any parallelism") {
    import spark.implicits._
    // zipf-ish: key k appears ~300/k times — real heavy-hitter shape
    val rows = (1 to 60).flatMap(k => Seq.fill(300 / k)(k.toLong))
    val df = rows.toDF("k").repartition(13)
    val cnts = CmSketch.counters(df, $"k".cast("string"))
    val cand = df.groupBy($"k").agg(count(lit(1)).as("exact"))
    val est = CmSketch.estimate(cand, $"k".cast("string"), cnts)
      .select($"k", $"exact", $"_est").collect()
    assert(est.length == 60)
    est.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"undercount for key ${r.getLong(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("candidate keys absent from the sketched input get _est = 0") {
    import spark.implicits._
    val df = (1L to 50L).toDF("k")
    val cnts = CmSketch.counters(df, $"k".cast("string"))
    // candidates the sketch never saw: with only 50 keys in a 4x256
    // grid, an unseen key hits at least one empty cell with
    // overwhelming probability -> min(..., 0) = 0; and every
    // candidate must appear in the output (the old inner join
    // dropped keys whose D cells were all empty)
    val cand = (1000L to 1040L).toDF("k")
    val est = CmSketch.estimate(cand, $"k".cast("string"), cnts)
      .select($"k", $"_est").collect()
    assert(est.length == 41, s"dropped candidates: ${est.length} of 41")
    assert(est.count(_.getLong(1) == 0L) >= 35,
      s"unseen keys should mostly estimate 0: ${est.map(_.getLong(1)).toSeq}")
    est.foreach(r => assert(r.getLong(1) >= 0L))
  }

  test("counter grid is bounded by D x W with map-side combine") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => i % 997L).toDF("k")
    val cnts = CmSketch.counters(df, $"k".cast("string"))
    assert(cnts.count() <= CmSketch.D.toLong * CmSketch.W)
    // total mass per row j = input rows (each input hits every row once)
    val mass = cnts.groupBy($"_j").agg(sum($"_c").as("m"))
      .select($"m").as[Long].collect().toSet
    assert(mass == Set(5000L))
  }

  test("streaming twin: running counters equal the batch grid, and merge backfills") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 3000L).map(i => i % 97L)
    val stream = MemoryStream[Long]
    // disjoint batches: counts are NOT idempotent (unlike HLL's max) —
    // exactly-once delivery is what the streaming aggregate contract
    // provides, and what this pins
    stream.addData(rows.take(1800))
    stream.addData(rows.drop(1800))
    val q = graft.streaming.StreamingHeavyHitters.countersStream(
        stream.toDF().toDF("k"), $"k".cast("string"))
      .writeStream.format("memory").queryName("cm_counters_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cm_counters_out")
      .orderBy($"_j", $"_p").collect().map(_.toString).toSeq
    val batch = CmSketch.counters(rows.toDF("k"), $"k".cast("string"))
      .orderBy($"_j", $"_p").collect().map(_.toString).toSeq
    assert(streamed == batch)
    // lambda backfill: stream counters + a batch shard's counters
    val shard = (0L until 500L).map(i => i % 13L).toDF("k")
    val merged = CmSketch.merge(
      spark.table("cm_counters_out"), CmSketch.counters(shard, $"k".cast("string")))
    val whole = CmSketch.counters(
      rows.toDF("k").unionByName(shard), $"k".cast("string"))
    assert(merged.orderBy($"_j", $"_p").collect().map(_.toString).toSeq ==
      whole.orderBy($"_j", $"_p").collect().map(_.toString).toSeq)
  }

  test("merge of shard counters equals counters of the union") {
    import spark.implicits._
    val a = (0L until 2000L).map(i => i % 41L).toDF("k")
    val b = (0L until 3000L).map(i => i % 67L).toDF("k")
    val merged = CmSketch.merge(
        CmSketch.counters(a, $"k".cast("string")),
        CmSketch.counters(b, $"k".cast("string")))
      .orderBy($"_j", $"_p").collect().map(_.toString).toSeq
    val whole = CmSketch.counters(a.unionByName(b), $"k".cast("string"))
      .orderBy($"_j", $"_p").collect().map(_.toString).toSeq
    assert(merged == whole)
  }
}
