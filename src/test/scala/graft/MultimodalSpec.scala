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

  test("phashPairs two-level pigeonhole completeness: every hamming <= 3 " +
      "error placement is found, hamming 4 is not") {
    import spark.implicits._
    // adversarial placements for the recursed (16-bit chunk +
    // 12-bit sub-chunk) candidate key: errors spread across 3
    // DISTINCT top chunks (only one exact chunk left), errors placed
    // to straddle 12-bit sub-chunk boundaries, errors packed into one
    // chunk, and a hamming-4 pair that must NOT appear
    val base = 0x123456789abcdef0L
    val rows = Seq(
      (10L, "k10", base),
      // 3 errors in 3 distinct chunks (bits 0, 17, 34)
      (11L, "k11", base ^ ((1L << 0) | (1L << 17) | (1L << 34))),
      // 3 errors inside ONE chunk (bits 48, 55, 63 — top chunk)
      (12L, "k12", base ^ ((1L << 48) | (1L << 55) | (1L << 63))),
      // errors at 12-bit sub-chunk boundaries of every remainder
      // layout (bits 11, 12, 23)
      (13L, "k13", base ^ ((1L << 11) | (1L << 12) | (1L << 23))),
      // hamming 4 from base (bits 1, 18, 35, 52) — excluded
      (14L, "k14", base ^ ((1L << 1) | (1L << 18) | (1L << 35) | (1L << 52))))
      .toDF("doc_id", "content_key", "phash")
    val got = Multimodal.phashPairs(rows, "doc_id", maxHamming = 3)
      .select("ida", "idb", "hamming")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(got.get((10L, 11L)).contains(3L), s"3-distinct-chunk spread: $got")
    assert(got.get((10L, 12L)).contains(3L), s"one-chunk pack: $got")
    assert(got.get((10L, 13L)).contains(3L), s"sub-chunk boundary: $got")
    assert(!got.contains((10L, 14L)), s"hamming-4 pair leaked: $got")
    // cross pairs among the variants are found iff their mutual
    // hamming <= 3 — verify against the direct distance
    val ph = Map(10L -> base,
      11L -> (base ^ ((1L << 0) | (1L << 17) | (1L << 34))),
      12L -> (base ^ ((1L << 48) | (1L << 55) | (1L << 63))),
      13L -> (base ^ ((1L << 11) | (1L << 12) | (1L << 23))),
      14L -> (base ^ ((1L << 1) | (1L << 18) | (1L << 35) | (1L << 52))))
    for (a <- ph.keys; b <- ph.keys if a < b) {
      val h = java.lang.Long.bitCount(ph(a) ^ ph(b)).toLong
      assert(got.get((a, b)) == (if (h <= 3) Some(h) else None),
        s"pair ($a,$b) hamming $h: got ${got.get((a, b))}")
    }
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
