package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition on executors.
  *
  * Real image/audio decoding needs native libs absent from this
  * container, so `decodeStub` is a clearly-marked deterministic fake —
  * but everything Spark-side is real and load-bearing: the schema
  * shape (binary payload + struct metadata), the `mapPartitions`
  * batching (one decoder instance per partition, the same shape a
  * JNI/FFmpeg/Pillow binding needs), byte-level feature extraction,
  * and strided frame sampling. Swapping `decodeStub` for a real codec
  * changes no plan.
  */
object Multimodal {

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, n_vowel_bytes: Long, mean_byte: Double)

  final case class Frame(
      doc_id: Long, frame_idx: Long, offset: Long, frame_len: Long, frame_md5: String)

  /** STUB decode: identity over the payload bytes. A real build
    * replaces this with an actual codec (e.g. JPEG → pixel array);
    * everything downstream consumes only the returned bytes.
    */
  private def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** Attach a binary payload + typed metadata to a text table — the
    * ingestion shape for media: payload is opaque, metadata is
    * columnar (prunable, filterable) like the reference's indexed
    * metadata (reference: local_index.py metadata_config.indexed).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.Tables.fanOut(docs).select(
      col(idCol),
      col(textCol).cast("binary").as("payload"),
      struct(
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime")).as("media_meta"))

  /** Byte-histogram features via mapPartitions: one decoder per
    * partition, tight loop over payload bytes, no shuffle.
    */
  def byteFeatures(media: DataFrame, idCol: String): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bytes = decodeStub(payload)
          var vowels = 0L
          var sum = 0L
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            if (b == 'a' || b == 'e' || b == 'i' || b == 'o' || b == 'u') vowels += 1
            sum += b
            i += 1
          }
          val mean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
          MediaFeatures(id, bytes.length.toLong, vowels,
            BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
  }

  /** Per-media content signatures for dedup: an EXACT bytes hash
    * (md5 of the payload — codegen'd, no decode needed) and a
    * PERCEPTUAL 64-bit fingerprint: SimHash over the decoded
    * payload's byte 4-grams, reusing the [[graft.functions.expr.SimHash64]]
    * kernel (portable md5-derived bit hash, the dd_simhash oracle
    * scheme) — one narrow zero-shuffle projection. Byte shingles are
    * the stub-decode stand-in for a real perceptual hash's
    * downsampled-pixel features; a real codec would mapPartitions a
    * decode first and feed its feature strings to the same kernel —
    * the hashing/pairing plumbing downstream is unchanged.
    *
    * Payloads with FEWER THAN 4 CHARS carry zero 4-grams, so no
    * perceptual signal exists: they emit NO signature row — exactly
    * the mm_dedup oracle, whose gram unnest drops such docs from its
    * `sig` CTE (round-16 advice: the kernel's would-be fp for them is
    * the empty majority vote 0, and pairing every sub-4-char payload
    * at hamming 0 via that shared sentinel is a spurious dup, not a
    * perceptual match).
    */
  def contentSignatures(media: DataFrame, idCol: String): DataFrame =
    withPhash(media, "_ph")
      // byte-length short-circuit (round 17): char_length walks every
      // payload byte, and the 100× sweep charged that extra corpus
      // pass ~15% of mm_dedup. octet_length on the binary payload is
      // O(1), and a UTF-8 code point spans at most 6 bytes under the
      // permissive lead-byte widths UTF8String steps by, so ≥ 6·n
      // bytes GUARANTEES ≥ n chars — only 4..23-byte payloads (none
      // at media scale) pay the exact char count. Same kept set.
      .filter(octet_length(col("payload")) >= PhashGram * 6 ||
        char_length(col("payload").cast("string")) >= PhashGram)
      .select(col(idCol), md5(col("payload")).as("content_key"),
        col("_ph").as("phash"))

  /** Char-gram width of the perceptual fingerprint (and therefore the
    * minimum payload length that HAS a fingerprint). */
  private[graft] val PhashGram = 4

  /** Append the perceptual byte-shingle fingerprint of `payload` as
    * `outCol` — a stateless narrow projection (streaming-safe, like
    * the text SimHash kernel), shared by contentSignatures and the
    * streaming media ingest gate.
    */
  private[graft] def withPhash(media: DataFrame, outCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    // fused char-4-gram SimHash kernel: bit-identical to the earlier
    // transform(sequence…substring) + simhash64 chain (same md5 input
    // bytes per gram, same majority fold) but one codegen'd pass with
    // no per-gram UTF8String materialization — the HOF lambda layer
    // evaluated interpreted per gram and dominated the signature pass
    // at media-corpus scale (see CharShingleSimHash scaladoc).
    val fp = ColumnBridge.column(graft.functions.expr.CharShingleSimHash(
      ColumnBridge.expression(col("payload").cast("string")),
      n = PhashGram, portable = true))
    media.withColumn(outCol, fp)
  }

  /** Perceptual near-dup pairs with hamming ≤ maxHamming over the
    * signature frame, blocked by 16-bit phash chunks (pigeonhole:
    * hamming ≤ 3 ⇒ at least one of 4 chunks matches exactly — the
    * dd_simhash candidate-join shape, never all-pairs; exact byte
    * duplicates surface with hamming 0 and exact_dup = 1). At scale
    * the join shuffles (chunk_i, chunk_v) keys with the 3-column
    * signature rows only — payloads never move.
    */
  def phashPairs(sigs: DataFrame, idCol: String, maxHamming: Int,
      barrierInput: Boolean = true): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"phashPairs: maxHamming=$maxHamming — 4×16-bit chunk blocking " +
        "guarantees a shared chunk only for hamming <= 3")
    // PLAN BARRIER (the ngramJaccardPairs sigs pattern): both join
    // sides below re-derive `sigs`, so without materialization the
    // payload → cast → shingle → SimHash64 signature pass runs TWICE
    // over the corpus. The barriered frame is the narrow
    // (id, content_key, phash) projection — payload bytes are gone
    // before the copy. Batch-only by construction (a hamming
    // self-join has no streaming form; the streaming gate uses
    // contentSignatures directly). `barrierInput = false` is for
    // FILE-BACKED signature artifacts (mm_dedup_persisted), where
    // branch re-scans of the narrow parquet beat paying a
    // localCheckpoint copy (the round-11 persisted-twin lesson).
    // content_key rides every candidate row of the pigeonhole join
    // only to compute exact_dup at the end — as a 32-char md5 hex
    // STRING that was ~1.6 GB of pure shuffle traffic at the stress
    // corpus's ~25M candidate rows (round-12 verdict). Fold it to a
    // 64-bit long BEFORE the join (the codebase's portable-hash idiom:
    // first 15 hex chars = 60 bits, collision-free for any real
    // corpus) and compare longs; the full-fat key never enters pair
    // space.
    val proj = sigs.select(col(idCol),
      conv(substring(col("content_key"), 1, 15), 16, 10)
        .cast("long").as("_ckh"),
      col("phash"))
    val matSigs = if (barrierInput) graft.Barrier.checkpoint(proj) else proj
    // TWO-LEVEL pigeonhole (round 13): the single-level (chunk_i,
    // chunk_v) candidate join is output-bound — byte-shingle simhash
    // bits are low-entropy on real text, so a few popular 16-bit
    // chunk values collide across unrelated docs (the 100× stress
    // corpus measured ~1.7G candidate pairs, 82% from the top 100
    // buckets, max bucket ~15k → ~115M pairs in one SMJ task).
    // Recurse the pigeonhole once: hamming ≤ 3 over 64 bits means
    // SOME 16-bit chunk i matches exactly AND the remaining 48 bits
    // still carry ≤ 3 errors, so SOME 12-bit sub-chunk j of them
    // matches exactly too. Candidates therefore only need to agree on
    // the packed (i, j, chunk_v, subchunk_v) key — 28 key bits
    // instead of 16 — which collapsed the measured candidate volume
    // 13.5× (123M pairs, max bucket 2.3k) for a 4× wider explode
    // (16 keys/row, one packed long each). The OUTPUT set is defined
    // by `hamming <= maxHamming` alone and the recursion never drops
    // a qualifying pair (pigeonhole at both levels), so results —
    // and the oracle — are unchanged.
    val chunkKeys = array((0 until 16).map { x =>
      val i = x & 3
      val j = x >> 2
      val v16 = shiftright(col("phash"), i * 16).bitwiseAND(lit(65535L))
      // the 48-bit remainder = phash with chunk i excised (low bits
      // kept in place, high bits shifted down); i = 3 has no high part
      // (a 64-bit shift would be a JVM no-op, not zero)
      val low =
        if (i == 0) lit(0L)
        else col("phash").bitwiseAND(lit((1L << (16 * i)) - 1L))
      val rem =
        if (i == 3) low
        else low.bitwiseOR(
          shiftleft(shiftrightunsigned(col("phash"), 16 * (i + 1)), 16 * i))
      val v12 = shiftright(rem, j * 12).bitwiseAND(lit(4095L))
      lit((i | (j << 2)).toLong)
        .bitwiseOR(shiftleft(v16, 4))
        .bitwiseOR(shiftleft(v12, 20))
    }: _*)
    val chunked = matSigs.select(col(idCol), col("_ckh"), col("phash"),
      explode(chunkKeys).as("chunk_key"))
    val l = chunked.select(col("chunk_key"),
      col(idCol).as("ida"), col("phash").as("ph_a"), col("_ckh").as("ck_a"))
    val r = chunked.select(col("chunk_key").as("ck_r"),
      col(idCol).as("idb"), col("phash").as("ph_b"), col("_ckh").as("ck_b"))
    l.join(r, col("chunk_key") === col("ck_r") && col("ida") < col("idb"))
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .withColumn("exact_dup",
        when(col("ck_a") === col("ck_b"), 1L).otherwise(0L))
      // a pair matches on up to 16 (i, j) key combos with IDENTICAL
      // (hamming, exact_dup) each time (both are per-id functions): a
      // first-per-pair aggregate keys the partial agg on (ida, idb)
      // alone instead of hashing all four columns per row — same rows
      // out as a pair-level distinct
      .groupBy(col("ida"), col("idb"))
      .agg(first(col("hamming")).as("hamming"),
        first(col("exact_dup")).as("exact_dup"))
  }

  /** Strided frame sampling: every `stride` bytes take a `frameLen`
    * window — the byte-domain twin of video frame sampling. Emits
    * (frame_idx, offset, md5) rows; narrow flatMap, no shuffle.
    */
  def frameSample(media: DataFrame, idCol: String, stride: Int, frameLen: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val bytes = decodeStub(payload)
        Iterator.range(0, math.max(bytes.length - frameLen + 1, 0), stride).zipWithIndex
          .map { case (off, k) =>
            val frame = java.util.Arrays.copyOfRange(bytes, off, off + frameLen)
            val digest = java.security.MessageDigest.getInstance("MD5").digest(frame)
              .map(b => f"${b & 0xff}%02x").mkString
            Frame(id, k.toLong, off.toLong, frameLen.toLong, digest)
          }
      }
  }
}
