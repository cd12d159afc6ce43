package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {

  private lazy val media = {
    import spark.implicits._
    val docs = Seq((1L, "aeiou xyz"), (2L, ""), (3L, "a" * 200))
      .toDF("doc_id", "text")
    Multimodal.asMedia(docs, "doc_id", "text")
  }

  test("asMedia carries payload bytes + typed metadata") {
    import spark.implicits._
    val row = media.filter($"doc_id" === 1L).collect().head
    assert(new String(row.getAs[Array[Byte]]("payload")) == "aeiou xyz")
    val meta = row.getStruct(row.fieldIndex("media_meta"))
    assert(meta.getAs[Long]("n_bytes") == 9L)
    assert(meta.getAs[String]("mime") == "text/plain")
  }

  test("byteFeatures: counts and mean, empty payload safe") {
    import spark.implicits._
    val f = Multimodal.byteFeatures(media, "doc_id").collect()
      .map(x => x.doc_id -> x).toMap
    assert(f(1L).n_bytes == 9L)
    assert(f(1L).n_vowel_bytes == 5L) // a e i o u
    assert(f(2L).n_bytes == 0L && f(2L).mean_byte == 0.0)
    assert(f(3L).mean_byte == 'a'.toInt.toDouble)
  }

  test("contentSignatures + phashPairs: exact dups at hamming 0, near dups found, disjoint content apart") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      1L -> base,
      2L -> base,                            // exact byte duplicate of 1
      3L -> (base + " again"),               // near duplicate (small suffix)
      4L -> "completely unrelated content about database query planning engines"
    ).toDF("doc_id", "text")
    val sigs = Multimodal.contentSignatures(
      Multimodal.asMedia(docs, "doc_id", "text"), "doc_id")
    val sigMap = sigs.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(sigMap(1L) == sigMap(2L), "identical bytes must have identical signatures")
    assert(sigMap(1L)._2 != sigMap(4L)._2, "unrelated content must differ")
    val pairs = Multimodal.phashPairs(sigs, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(pairs((1L, 2L)) == ((0L, 1L)), s"exact pair: ${pairs.get((1L, 2L))}")
    pairs.get((1L, 3L)).foreach { case (h, e) => assert(h > 0L && e == 0L) }
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L },
      s"unrelated doc paired: ${pairs.keySet}")
  }

  test("streaming media gate: near-copies dropped, novel payloads pass, batch-equivalent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val corpus = Multimodal.asMedia(
      Seq(1L -> base).toDF("doc_id", "text"), "doc_id", "text")
    val idx = graft.streaming.StreamingMediaDedup.indexFingerprints(corpus, "doc_id")
    val novel = "completely unrelated content about database query planning engines"
    val incoming = Seq(
      10L -> base,                 // exact byte copy — dropped
      11L -> (base + " again"),    // near copy — dropped
      12L -> novel)                // novel — passes
    // batch equivalence first: the gate is stateless, so it runs
    // identically on a batch frame
    val batchIn = Multimodal.asMedia(
      incoming.toDF("doc_id", "text"), "doc_id", "text")
    val batchOut = graft.streaming.StreamingMediaDedup.gate(batchIn, idx)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchOut == Set(12L), s"batch gate: $batchOut")
    // the same gate over a memory stream — payload projected directly
    // (asMedia's fan-out guard inspects the source and is batch-only)
    val stream = MemoryStream[(Long, String)]
    stream.addData(incoming)
    val q = graft.streaming.StreamingMediaDedup.gate(
        stream.toDF().toDF("doc_id", "text")
          .select($"doc_id", $"text".cast("binary").as("payload")), idx)
      .select($"doc_id")
      .writeStream.format("memory").queryName("mm_gate_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    Barrier.release(spark)
    assert(spark.table("mm_gate_out").as[Long].collect().toSet == Set(12L))
  }

  test("frameSample: strided offsets, tail shorter than frame dropped") {
    import spark.implicits._
    val frames = Multimodal.frameSample(media, "doc_id", stride = 64, frameLen = 16)
      .collect().filter(_.doc_id == 3L)
    // 200 bytes → offsets 0, 64, 128 (176+16 > 200 ⇒ stop at 184 cap)
    assert(frames.map(_.offset).toSeq.sorted == Seq(0L, 64L, 128L))
    assert(frames.forall(_.frame_len == 16L))
    // identical frames ("a"*16) share the digest
    assert(frames.map(_.frame_md5).distinct.length == 1)
  }
}
