package graft

import org.apache.spark.sql.functions._

/** DocQueries kernel guards — the packed-chunk-key bounds in
  * queryDocsTop are enforced in-plan (raise_error), so an over-wide
  * doc fails loudly instead of silently corrupting the top-k heap
  * order (round-11 verdict #6).
  */
class DocQueriesSpec extends SparkSpecBase {

  import spark.implicits._

  private def chunkFrame(rows: Seq[(Long, Int, Double)]) =
    rows.toDF("doc_id", "i", "score_raw")

  test("queryDocsTop: in-bounds chunks aggregate normally") {
    val out = graft.queries.DocQueries.queryDocsTop(chunkFrame(Seq(
      (1L, 0, 0.9), (1L, 1, 0.7), (2L, 0, 0.8)))).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("queryDocsTop: a doc with a chunk index >= 2^20 fails loudly") {
    val e = intercept[Exception] {
      graft.queries.DocQueries.queryDocsTop(chunkFrame(Seq(
        (1L, 0, 0.9), (2L, 1 << 20, 0.8)))).collect()
    }
    assert(e.getMessage.contains("packing bounds") ||
      Option(e.getCause).exists(_.getMessage.contains("packing bounds")))
  }

  test("queryDocsTop: a doc_id >= 2^43 fails loudly") {
    val e = intercept[Exception] {
      graft.queries.DocQueries.queryDocsTop(chunkFrame(Seq(
        (1L << 43, 0, 0.9)))).collect()
    }
    assert(e.getMessage.contains("packing bounds") ||
      Option(e.getCause).exists(_.getMessage.contains("packing bounds")))
  }
}
