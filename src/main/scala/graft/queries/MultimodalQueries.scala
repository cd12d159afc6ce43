package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import QueryUtil._

/** Multimodal plumbing suite — binary payloads derived from the
  * `documents` table (ASCII text, so byte offsets == char offsets and
  * DuckDB can mirror every byte-level computation over the text).
  */
object MultimodalQueries {

  val defs: Map[String, Q] = Map(
    "mm_binary_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.byteFeatures(media, "doc_id").toDF()
        .orderBy(col("doc_id"))
    }),

    "mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.frameSample(media, "doc_id", stride = 64, frameLen = 16).toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // media dedup over binary columns: exact bytes-hash (md5 of the
    // payload) + perceptual near-dup (SimHash64 kernel over decoded
    // byte 4-grams, portable hash — the dd_simhash machinery applied
    // to the media tier). Pairs come from the 4×16-bit chunk
    // pigeonhole join, never all-pairs; exact byte duplicates surface
    // as hamming 0 / exact_dup 1. At 100 TB the signature pass is one
    // narrow zero-shuffle projection and only (chunk, signature) rows
    // reach the exchange — payload bytes never move.
    "mm_dedup" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      val sigs = Multimodal.contentSignatures(media, "doc_id")
      Multimodal.phashPairs(sigs, "doc_id", maxHamming = 3)
        .orderBy(col("ida"), col("idb"))
    }),

    // the PERSISTED-signature twin of mm_dedup (round-11 verdict #3):
    // payload decode + byte-shingle fingerprinting runs ONCE at
    // ingest and persists as a (doc_id, content_key, phash) parquet
    // artifact — payload bytes are read exactly once per corpus
    // version; the per-run cost is the exact-hash group + pigeonhole
    // join over the narrow artifact. Signatures are a deterministic
    // per-row projection → row-identical, shared oracle. No barrier
    // on the file-backed artifact (branch re-scans beat a copy).
    "mm_dedup_persisted" -> ((s, dir) => {
      val sigs = persistedTable(s, "mmsig", dir) { p =>
        Multimodal.contentSignatures(
            Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text"),
            "doc_id")
          .write.mode("overwrite").parquet(p)
      }
      Multimodal.phashPairs(sigs, "doc_id", maxHamming = 3,
          barrierInput = false)
        .orderBy(col("ida"), col("idb"))
    }),

    // payload integrity gate — the validate-before-ingest step every
    // media pipeline runs (truncated downloads, bitrot, mislabeled
    // sizes): recompute length + checksum FROM THE BYTES and compare
    // against the claimed sidecar metadata; mismatches are flagged
    // and quarantined, never silently dropped. The claimed sidecar is
    // synthesized deterministically (size off-by-one for id%7, rotted
    // checksum for id%11) so the oracle can replay the whole gate.
    // At 100 TB this is a single narrow zero-shuffle projection —
    // payload bytes are hashed in place and never move.
    "mm_integrity" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      media.select(col("doc_id"), col("payload"),
          (col("media_meta.n_bytes") +
            when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("claimed_n_bytes"),
          when(col("doc_id") % 11 === 0,
            md5(concat(col("payload"), lit("x".getBytes("UTF-8")))))
            .otherwise(md5(col("payload"))).as("claimed_md5"))
        .withColumn("actual_n_bytes", length(col("payload")).cast("long"))
        .withColumn("size_ok",
          (col("actual_n_bytes") === col("claimed_n_bytes")).cast("long"))
        .withColumn("hash_ok",
          (md5(col("payload")) === col("claimed_md5")).cast("long"))
        .select(col("doc_id"), col("actual_n_bytes"), col("claimed_n_bytes"),
          col("size_ok"), col("hash_ok"),
          (col("size_ok") === 0 || col("hash_ok") === 0).cast("long").as("quarantine"))
        .orderBy(col("doc_id"))
    }),

    // media ↔ caption alignment join — the WebDataset/LAION pairing
    // step when metadata keys are lost: captions attach to media by
    // CONTENT fingerprint (md5 of the payload bytes), so exact
    // duplicate payloads all inherit the caption and orphan media
    // stay visible with has_caption = 0 (a missing row must mean
    // "absent", never "unpaired"). min_by picks the lowest caption id
    // deterministically when duplicates collide. At scale this is a
    // shuffle equi-join on the content key between two corpus-sized
    // sides (no broadcast — both grow with the corpus) followed by a
    // partial-agg groupBy; payloads are projected away before the
    // exchange.
    "mm_join" -> ((s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text")
      val m = media.select(col("doc_id"), md5(col("payload")).as("ck"),
        col("media_meta.n_bytes").as("n_bytes"))
      val caps = t(s, dir, "documents").filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("cap_id"),
          md5(col("text").cast("binary")).as("ck"),
          substring(col("text"), 1, 40).as("caption"))
      val paired = m.join(caps, Seq("ck"))
        .groupBy(col("doc_id"))
        .agg(min(col("cap_id")).as("cap_id"),
          min_by(col("caption"), col("cap_id")).as("caption"))
      m.join(paired, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cap_id"), lit(-1L)).as("cap_id"),
          when(col("cap_id").isNull, 0L).otherwise(1L).as("has_caption"),
          coalesce(col("caption"), lit("")).as("caption"),
          col("n_bytes"))
        .orderBy(col("doc_id"))
    }))

  private val baseOracles: Map[String, String] = Map(
    "mm_binary_features" ->
      """SELECT doc_id,
        |  len(text)::BIGINT AS n_bytes,
        |  (len(text) - len(regexp_replace(text, '[aeiou]', '', 'g')))::BIGINT AS n_vowel_bytes,
        |  round(list_sum([ord(c) for c in string_split(text, '')]) * 1.0 / len(text), 6) AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id,
        |  (off / 64)::BIGINT AS frame_idx,
        |  off::BIGINT AS offset,
        |  16::BIGINT AS frame_len,
        |  md5(substr(text, (off + 1)::INT, 16)) AS frame_md5
        |FROM documents,
        |  unnest(range(0, greatest(len(text) - 15, 0), 64)) AS u(off)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // bit-for-bit replay of the SimHash64 kernel over byte 4-grams
    // (same 64 majority-vote bit terms as the dd_simhash oracle: low
    // md5 half carries bits 0-31, high half 32-63, bit 63's weight is
    // Long.MinValue so the signed fingerprint matches Spark's packed
    // sum) + the same 4×16-bit chunk pigeonhole candidate join.
    "mm_dedup" -> {
      def bit(i: Int): String =
        if (i < 32) s"((lo >> $i) & 1)" else s"((hi >> ${i - 32}) & 1)"
      val bitTerms = (0 until 64).map { i =>
        val weight = if (i == 63) "-9223372036854775808" else (1L << i).toString
        s"CASE WHEN 2 * sum(${bit(i)}) > count(*) THEN CAST($weight AS BIGINT) ELSE CAST(0 AS BIGINT) END"
      }.mkString(" +\n    ")
      s"""WITH sh AS (
         |  SELECT doc_id, md5(text) AS ck,
         |    unnest([substr(text, CAST(i AS INT), 4)
         |            for i in range(1, greatest(len(text) - 2, 1))]) AS g
         |  FROM documents),
         |th AS (
         |  SELECT doc_id, ck,
         |    ('0x'||substr(md5(g), 1, 8))::BIGINT AS hi,
         |    ('0x'||substr(md5(g), 9, 8))::BIGINT AS lo
         |  FROM sh),
         |sig AS (
         |  SELECT doc_id, ck,
         |    $bitTerms AS phash
         |  FROM th GROUP BY doc_id, ck),
         |chunked AS (
         |  SELECT doc_id, ck, phash, c AS chunk_i,
         |    (phash >> (c * 16)) & 65535 AS chunk_v
         |  FROM sig, range(0, 4) r(c)),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
         |    bit_count(xor(a.phash, b.phash)) AS hamming,
         |    CASE WHEN a.ck = b.ck THEN 1 ELSE 0 END AS exact_dup
         |  FROM chunked a JOIN chunked b
         |    ON a.chunk_i = b.chunk_i AND a.chunk_v = b.chunk_v
         |    AND a.doc_id < b.doc_id)
         |SELECT ida, idb, CAST(hamming AS BIGINT) AS hamming,
         |  CAST(exact_dup AS BIGINT) AS exact_dup
         |FROM pairs WHERE hamming <= 3
         |ORDER BY ida, idb""".stripMargin
    },

    // honest replay: the claimed sidecar is re-synthesized and then
    // COMPARED (md5 vs md5, length vs length) — the gate's decision
    // logic runs in both engines, not just its precomputed outcome
    "mm_integrity" ->
      """WITH claimed AS (
        |  SELECT doc_id, text,
        |    (len(text) + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS claimed_n_bytes,
        |    CASE WHEN doc_id % 11 = 0 THEN md5(text || 'x') ELSE md5(text) END AS claimed_md5
        |  FROM documents),
        |checked AS (
        |  SELECT doc_id,
        |    len(text)::BIGINT AS actual_n_bytes, claimed_n_bytes,
        |    CAST(CASE WHEN len(text)::BIGINT = claimed_n_bytes THEN 1 ELSE 0 END AS BIGINT) AS size_ok,
        |    CAST(CASE WHEN md5(text) = claimed_md5 THEN 1 ELSE 0 END AS BIGINT) AS hash_ok
        |  FROM claimed)
        |SELECT doc_id, actual_n_bytes, claimed_n_bytes, size_ok, hash_ok,
        |  CAST(CASE WHEN size_ok = 0 OR hash_ok = 0 THEN 1 ELSE 0 END AS BIGINT) AS quarantine
        |FROM checked ORDER BY doc_id""".stripMargin,

    "mm_join" ->
      """WITH media AS (
        |  SELECT doc_id, md5(text) AS ck, len(text) AS n_bytes FROM documents),
        |caps AS (
        |  SELECT doc_id AS cap_id, md5(text) AS ck, substr(text, 1, 40) AS caption
        |  FROM documents WHERE doc_id % 3 = 0),
        |paired AS (
        |  SELECT m.doc_id, min(c.cap_id) AS cap_id,
        |    arg_min(c.caption, c.cap_id) AS caption
        |  FROM media m JOIN caps c USING (ck) GROUP BY m.doc_id)
        |SELECT m.doc_id,
        |  CAST(coalesce(p.cap_id, -1) AS BIGINT) AS cap_id,
        |  CAST(CASE WHEN p.cap_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS has_caption,
        |  coalesce(p.caption, '') AS caption,
        |  CAST(m.n_bytes AS BIGINT) AS n_bytes
        |FROM media m LEFT JOIN paired p USING (doc_id)
        |ORDER BY doc_id""".stripMargin)

  /** mm_dedup_persisted is row-identical to mm_dedup by construction
    * (the same deterministic signature projection, persisted then
    * reloaded), so its oracle is shared verbatim.
    */
  val oracles: Map[String, String] =
    baseOracles + ("mm_dedup_persisted" -> baseOracles("mm_dedup"))

}
