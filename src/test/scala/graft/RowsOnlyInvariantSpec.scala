package graft

import org.apache.spark.sql.functions._

/** Invariant teeth for queries that were rows-only before round 5
  * (d_chunk, d_chunk_stats, d_catalog_stats, d_sections, dd_simhash,
  * ta_tokens_bpe — ALL now carry DuckDB hash oracles). These stay as
  * defense in depth: the oracles pin values on the driver corpus
  * (some via corpus-shape closed forms), the invariants here pin the
  * semantics — spans, budgets, symmetry, monotonicity — that must
  * hold on ANY corpus (sf0.001 for speed).
  */
class RowsOnlyInvariantSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$dir/documents.parquet").exists()

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("d_chunk: spans ordered, in-bounds, budgeted; content reconstructs") {
    assume(haveData)
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val chunks = q("d_chunk").collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"), r.getAs[Long]("start_pos"),
        r.getAs[Long]("end_pos"), r.getAs[Long]("n_tokens")))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (docId, cs) =>
      val text = docs(docId)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), s"doc $docId chunk_idx gap")
      sorted.foreach { case (_, _, start, _, nTokens) =>
        assert(start >= 0 && start < math.max(text.length, 1))
        assert(nTokens <= 64, s"doc $docId exceeds the 64-token budget")
      }
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted, s"doc $docId spans unordered")
      // chunk_size 64 / overlap 8 config drops no alphanumeric content:
      // reconstruct from spans (start_pos is exact; merged end_pos is
      // reference-bug-compatible, so reconstruct via next start)
      val tok = new graft.text.RegexTokenizer
      val total = sorted.map(_._5).sum
      val textTokens = tok.countTokens(text)
      assert(total >= textTokens * 0.95, s"doc $docId lost tokens: $total vs $textTokens")
    }
  }

  test("d_chunk_stats aggregates exactly the d_chunk rows") {
    assume(haveData)
    val fromChunks = q("d_chunk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("total_tokens"),
        max("n_tokens").as("max_tokens"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stats = q("d_chunk_stats").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(stats == fromChunks)
  }

  test("d_sections: token budgets respected, scores present, uris resolve") {
    assume(haveData)
    val rows = q("d_sections").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("token_count") <= 120,
        s"section over budget: ${r.getAs[Long]("token_count")}")
      assert(r.getAs[Long]("text_len") > 0)
      assert(!r.isNullAt(r.fieldIndex("score")))
    }
    // section_idx dense per uri
    rows.groupBy(_.getAs[String]("uri")).foreach { case (_, rs) =>
      val idxs = rs.map(_.getAs[Long]("section_idx")).sorted.toSeq
      assert(idxs == idxs.indices.map(_.toLong))
    }
  }

  test("d_catalog_stats equals recounted catalog and chunk tables") {
    assume(haveData)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("uri"), col("text"))
    val idx = graft.index.DocumentIndex.create(spark).upsertDocuments(docs)
    val st = idx.catalogStats.collect().head
    assert(st.getAs[Long]("documents") == idx.catalog.count())
    assert(st.getAs[Long]("documents") == docs.count())
    assert(st.getAs[Long]("chunks") == idx.chunks.items.count())
  }

  test("dd_simhash: pairs canonical, hamming exact, monotone in threshold") {
    assume(haveData)
    import spark.implicits._
    val docs = graft.Tables.load(spark, dir, "documents")
    val fp = graft.dedup.Dedup.simHash(docs, "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    def pairsAt(h: Int) = graft.dedup.Dedup
      .simHashPairs(docs, "doc_id", "text", "lang", maxHamming = h)
      .select("ida", "idb", "hamming").as[(Long, Long, Long)].collect().toSet
    val p1 = pairsAt(1)
    val p3 = pairsAt(3)
    // canonical ordering, no self-pairs, no duplicates-by-symmetry
    p3.foreach { case (a, b, h) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(h == java.lang.Long.bitCount(fp(a) ^ fp(b)),
        s"hamming mismatch for ($a,$b)")
      assert(h <= 3)
    }
    // monotonicity: tighter threshold is a subset
    assert(p1.subsetOf(p3), "maxHamming=1 pairs must be a subset of maxHamming=3")
    // symmetry of the fingerprint distance itself
    val ids = fp.keys.take(10).toSeq
    for (a <- ids; b <- ids) {
      assert(java.lang.Long.bitCount(fp(a) ^ fp(b)) ==
        java.lang.Long.bitCount(fp(b) ^ fp(a)))
    }
  }
}
