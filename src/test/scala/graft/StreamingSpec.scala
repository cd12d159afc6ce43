package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

/** s_events_stream (SURVEY §2): the streaming twin of q_events_window
  * must produce the same totals as the batch transform over the same
  * rows once the stream is drained.
  */
class StreamingSpec extends SparkSpecBase {

  test("hourly streaming aggregation matches its batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      ("2024-01-01 10:05:00", "click", 1.0),
      ("2024-01-01 10:15:00", "click", 2.0),
      ("2024-01-01 10:45:00", "view", 3.0),
      ("2024-01-01 11:05:00", "click", 4.0),
      ("2024-01-01 11:55:00", "view", 5.0))
      .map { case (ts, tpe, v) => (Timestamp.valueOf(ts), tpe, v) }

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows)
    val streamDf = stream.toDF().toDF("ts", "event_type", "value")

    val q = EventWindows.hourlyStream(streamDf)
      .writeStream
      .format("memory")
      .queryName("hourly_out")
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("hourly_out")
      .orderBy("hour", "event_type")
      .select("hour", "event_type", "n", "sum_value")
      .collect().toSeq
    val want = EventWindows.hourly(rows.toDF("ts", "event_type", "value"))
      .orderBy("hour", "event_type")
      .collect().toSeq
    assert(got == want)
    assert(got.length == 4) // (10h click, 10h view, 11h click, 11h view)
  }

  test("stateful sessionization: stream twin matches batch twin") {
    import spark.implicits._
    import graft.streaming.{Session, SessionEvent, Sessionize}
    implicit val sqlCtx = spark.sqlContext

    def ev(uid: Long, ts: String, v: Double) =
      SessionEvent(uid, Timestamp.valueOf(ts), v)
    val real = Seq(
      ev(1, "2024-01-01 10:00:00", 1.0), ev(1, "2024-01-01 10:10:00", 2.0),
      ev(1, "2024-01-01 12:00:00", 3.0), // >30min gap → new session
      ev(2, "2024-01-01 10:05:00", 4.0))

    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.stream(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      stream.addData(real)
      q.processAllAvailable()
      // sentinel events push the watermark past every open session's
      // timeout; two micro-batches so the timeout fires after the
      // watermark advances
      stream.addData(Seq(ev(99, "2024-01-01 20:00:00", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq(ev(99, "2024-01-01 20:01:00", 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions_out").as[Session].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.session_start.toString, s.session_end.toString,
        s.n_events, s.sum_value))
      .toSet

    val batchIn = real.toDF().withColumn("event_id", monotonically_increasing_id())
    val want = Sessionize.batch(batchIn, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == want)
    assert(got.size == 3) // user1 × 2 sessions + user2 × 1
  }

  test("streaming ANN serve: stream-static join matches batch top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queryRows = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq

    val stream = MemoryStream[(Long, Array[Float])]
    stream.addData(queryRows)
    val scored = graft.streaming.AnnServe.scoreStream(
      stream.toDF().toDF("qid", "qv"), "qid", "qv",
      corpus, "vec_id", "embedding")
    val q = scored.writeStream.format("memory").queryName("ann_serve_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    // per-query top-3 from the streamed scores == batch brute force
    val got = spark.table("ann_serve_out")
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rk") <= 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val want = graft.ann.Ann.bruteForceTopK(corpus, "vec_id", "embedding",
        corpus.filter(col("vec_id") < 3), "vec_id", "embedding", k = 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming IVF serve: foreachBatch probe equals brute top-k at full probe width") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("srvivf").toString
    val idx = graft.ann.IvfIndex.buildAuto(corpus, "vec_id", "embedding", dir)
    val nlist = idx.centroids.count().toInt
    val queryRows = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq

    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val stream = MemoryStream[(Long, Array[Float])]
    stream.addData(queryRows)
    val q = stream.toDF().toDF("qid", "qv").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // k+1 then drop the query's own corpus row: searchBatch keeps
        // self (it IS a corpus member), bruteForceTopK excludes it
        val rows = graft.streaming.AnnServe
          .scoreBatchIvf(b, "qid", "qv", idx, nprobe = nlist, k = 4)
          .filter(col("qid") =!= col("vec_id"))
          .withColumn("_r", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("rk"))))
          .filter(col("_r") <= 3)
          .select("qid", "vec_id", "score")
          .as[(Long, Long, Double)].collect()
        got ++= rows
        ()
      }
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val want = graft.ann.Ann.bruteForceTopK(corpus, "vec_id", "embedding",
        corpus.filter(col("vec_id") < 3), "vec_id", "embedding", k = 3)
      .select("qid", "vec_id", "score").as[(Long, Long, Double)].collect().toSet
    assert(got.toSet == want, s"got=${got.toSet}\nwant=$want")
  }

  test("IvfServing: warm driver-probed batch is row-identical to IvfIndex.searchBatch") {
    import spark.implicits._
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("srvivf2").toString
    val idx = graft.ann.IvfIndex.buildAuto(corpus, "vec_id", "embedding", dir)
    val serving = new graft.serve.IvfServing(idx, nprobe = 3)
    val reqs = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val warm = serving.searchBatch(reqs, k = 4)
      .select("qid", "vec_id", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val batch = idx.searchBatch(
        corpus.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid", "qv", nprobe = 3, k = 4)
      .select("qid", "vec_id", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(warm == batch, s"warm=$warm\nbatch=$batch")
    assert(warm.nonEmpty)
  }

  test("streaming near-dup gate: fingerprint anti-join drops indexed near-copies") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingNearDup

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark shuffles data between executor partitions"))
      .toDF("doc_id", "text")
    val index = StreamingNearDup.indexFingerprints(corpus, "doc_id", "text")

    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),   // exact copy → dropped
      (11L, "the quick brown fox jumps over the lazy cat"),   // near-copy → dropped
      (12L, "completely unrelated content about databases and storage engines"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(incoming)
    val gated = StreamingNearDup.gate(
      stream.toDF().toDF("doc_id", "text"), "text", index, maxHamming = 3)
    val q = gated.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val survived = spark.table("neardup_out")
      .select("doc_id").as[Long].collect().toSet
    // derived expectation: a doc is dropped iff its fingerprint is
    // within maxHamming of some corpus fingerprint (the exact copy,
    // hamming 0, is always dropped; short near-copies may legitimately
    // exceed 3 — simhash is length-sensitive)
    val fpOf = (df: org.apache.spark.sql.DataFrame) =>
      graft.dedup.Dedup.simHash(df, "doc_id", "text")
        .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val corpusFps = fpOf(corpus).values.toSeq
    val expected = fpOf(incoming.toDF("doc_id", "text")).collect {
      case (id, f) if corpusFps.forall(c =>
        java.lang.Long.bitCount(c ^ f) > 3) => id
    }.toSet
    assert(!expected.contains(10L)) // the exact copy must be gated
    assert(expected.contains(12L))  // unrelated content must survive
    assert(survived == expected)

    // the same gate over a BATCH frame returns the same survivors
    val batchSurvived = StreamingNearDup.gate(
        incoming.toDF("doc_id", "text"), "text", index, maxHamming = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(batchSurvived == survived)
  }

  test("streaming exact dedup matches batch survivors' hashes") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "the quick brown fox"),
      (Timestamp.valueOf("2024-01-01 10:01:00"), "the  quick brown fox "), // normalized dup
      (Timestamp.valueOf("2024-01-01 10:02:00"), "something else entirely"))

    val stream = MemoryStream[(Timestamp, String)]
    stream.addData(rows)
    val q = StreamingDedup.exact(
        stream.toDF().toDF("ts", "text"), "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out").select("content_hash")
      .as[String].collect().toSet
    val want = graft.dedup.Dedup.exact(
        rows.toDF("ts", "text").withColumn("doc_id", monotonically_increasing_id()),
        "doc_id", "text")
      .select("content_hash").as[String].collect().toSet
    assert(got == want)
    assert(got.size == 2)
  }

  test("streaming split assignment equals the batch assignment bit-for-bit") {
    // Sampling.split is a stateless projection, so it runs UNCHANGED
    // on a stream — the property that matters is that a doc arriving
    // via the ingest stream lands in the same split it would get in a
    // batch backfill (split membership must never depend on arrival
    // order or batching).
    import spark.implicits._
    import graft.operators.Sampling
    implicit val sqlCtx = spark.sqlContext
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

    val stream = MemoryStream[Long]
    stream.addData(0L until 40L)
    stream.addData(40L until 100L) // two micro-batches
    val q = Sampling.split(stream.toDF().toDF("doc_id"), "doc_id", fracs)
      .writeStream.format("memory").queryName("split_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("split_out")
      .as[(Long, String)].collect().toMap
    val want = Sampling.split((0L until 100L).toDF("doc_id"), "doc_id", fracs)
      .as[(Long, String)].collect().toMap
    assert(got == want)
  }

  test("batch twin matches the q_events_window query shape on testdata") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val viaModule = EventWindows.hourly(events)
      .agg(sum("n")).collect().head.getLong(0)
    assert(viaModule == events.count())
  }

  test("streaming quality classifier: stream scores equal batch scores bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingQualityClassifier

    val corpus = Seq(
      (1L, "good clean prose here", true),
      (2L, "good words and more good words", true),
      (3L, "spam spam junk junk junk", false),
      (4L, "good spam mixed words here", false))
      .toDF("doc_id", "text", "is_ref")
    val weights = Barrier.checkpoint(
      StreamingQualityClassifier.fitWeights(corpus, "text", col("is_ref")))

    val incoming = Seq(
      (10L, "good clean words"),        // reference-ish → keep
      (11L, "junk spam junk"),          // anti-reference → drop
      (12L, "totally novel vocabulary")) // unseen tokens → weight 0
    val stream = MemoryStream[(Long, String)]
    stream.addData(incoming)
    val scored = StreamingQualityClassifier.score(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", weights)
    val q = scored.writeStream.format("memory").queryName("quality_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("quality_out")
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Long)].collect().toSet
    val batch = StreamingQualityClassifier.score(
        incoming.toDF("doc_id", "text"), "doc_id", "text", weights)
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == batch)
    val keep = got.map(r => r._1 -> r._4).toMap
    assert(keep(10L) == 1L && keep(11L) == 0L)
    assert(got.find(_._1 == 12L).get._3 == 0.0) // all-unseen doc scores 0

    // scoring the corpus against its own fitted weights reproduces the
    // in-plan QualityClassifier bit-for-bit (same smoothing, rounding,
    // and decimal accumulation)
    val viaServe = StreamingQualityClassifier.score(corpus, "doc_id", "text", weights)
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Long)].collect().toSet
    val viaPlan = graft.text.QualityClassifier.score(corpus, "doc_id", "text", col("is_ref"))
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaServe == viaPlan)
  }

  test("scoreFromTokenCounts over the persisted projection equals score " +
      "bit-for-bit (round-12 verdict #3)") {
    import spark.implicits._
    import graft.streaming.StreamingQualityClassifier
    // real corpus: exercises wide vocab, repeated tokens (cnt > 1 is
    // the decimal w×cnt path), and unseen-token coalesce
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val weights = Barrier.checkpoint(
      StreamingQualityClassifier.fitWeights(docs, "text", col("lang") === "en"))
    val viaText = StreamingQualityClassifier.score(docs, "doc_id", "text", weights)
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Long)].collect().toSet
    val tokCnt = StreamingQualityClassifier.buildTokenCounts(docs, "doc_id", "text")
    val viaCounts = StreamingQualityClassifier
      .scoreFromTokenCounts(tokCnt, "doc_id", weights)
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(viaCounts == viaText)
    assert(tokCnt.filter(col("cnt") > 1).count() > 0,
      "no repeated tokens — the w×cnt decimal path untested")
  }

  test("streaming CDC apply: foreachBatch merge equals one-shot batch merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.MergeApply

    val base0 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("k", "v")
    // two micro-batches of changelog rows: update k=1, delete k=2,
    // insert k=5; then update the freshly-inserted k=5 and delete k=3
    val batch1 = Seq((1L, "u", 11.0), (2L, "d", 0.0), (5L, "i", 50.0))
    val batch2 = Seq((5L, "u", 55.0), (3L, "d", 0.0))

    // the streaming upsert-sink pattern: state lives in a var the
    // foreachBatch closure replaces per micro-batch (a lakehouse
    // table in production; localCheckpoint keeps lineage bounded
    // across applies, exactly like a table rewrite does)
    var table = base0
    val stream = MemoryStream[(Long, String, Double)]
    val q = stream.toDF().toDF("k", "op", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        table = MergeApply.applyChanges(table, batch, "k")
          .drop("status").localCheckpoint()
      }
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = table.as[(Long, Double)].collect().toSet
    // equivalence: applying the same changelog in two batch calls
    val viaBatch = {
      val t1 = MergeApply.applyChanges(
        base0, batch1.toDF("k", "op", "v"), "k").drop("status")
      MergeApply.applyChanges(
        t1, batch2.toDF("k", "op", "v"), "k").drop("status")
        .as[(Long, Double)].collect().toSet
    }
    assert(streamed == viaBatch)
    assert(streamed == Set((1L, 11.0), (4L, 40.0), (5L, 55.0)))
  }

  test("streaming incremental agg: per-micro-batch partial merge " +
      "equals the one-shot aggregate over everything seen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.IncrementalAgg

    // the standing-rollup refresh shape: the state table holds
    // decimal-exact partial aggregates; every micro-batch folds its
    // OWN partials in via IncrementalAgg.merge (a parquet/lakehouse
    // table rewrite in production — localCheckpoint bounds lineage
    // the same way). No streaming state at all: restart-safe because
    // the state IS the table.
    def partials(df: org.apache.spark.sql.DataFrame) = df.groupBy($"k")
      .agg(sum($"v".cast(org.apache.spark.sql.types.DecimalType(28, 10))).as("s"),
        count(lit(1)).as("n"))
    var state = partials(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    val stream = MemoryStream[(String, Double)]
    val q = stream.toDF().toDF("k", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = IncrementalAgg.merge(Seq(state, partials(batch)),
          keys = Seq("k"), sumCols = Seq("s", "n")).localCheckpoint()
      }
      .outputMode("append").start()
    val b1 = Seq(("a", 10.0), ("c", 5.0))
    val b2 = Seq(("b", 1.5), ("a", 0.5), ("d", 9.0))
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = state
      .select($"k", $"s".cast("double"), $"n")
      .as[(String, Double, Long)].collect().toSet
    val oneShot = partials(
        (Seq(("a", 1.0), ("b", 2.0)) ++ b1 ++ b2).toDF("k", "v"))
      .select($"k", $"s".cast("double"), $"n")
      .as[(String, Double, Long)].collect().toSet
    assert(streamed == oneShot)
    assert(streamed == Set(
      ("a", 11.5, 3L), ("b", 3.5, 2L), ("c", 5.0, 1L), ("d", 9.0, 1L)))
  }

  test("file-source stream (readStream.parquet) matches batch totals") {
    // the real ingest shape: a parquet directory consumed as a stream
    val batchEvents = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = EventWindows.hourlyStream(streamed, watermark = "365 days")
      .writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("file_stream_out")
      .agg(sum("n")).collect().head.getLong(0)
    assert(got == batchEvents.count())
  }
}
