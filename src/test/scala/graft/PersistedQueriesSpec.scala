package graft

/** The persisted-index query entries must return exactly what their
  * in-query (build-per-call) counterparts return: the on-disk layout
  * (partitioned parquet cells, saved catalog+chunk index) is a storage
  * choice, never a semantics change. ann_ivf_persisted is also
  * DuckDB-oracled; d_sections_persisted has no SQL oracle, so this
  * equality — against the fully-specced d_sections pipeline — is its
  * correctness gate.
  */
class PersistedQueriesSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def haveData = new java.io.File(s"$dir/documents.parquet").exists()

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  test("ann_ivf_persisted returns exactly ann_ivf's rows") {
    assume(haveData)
    assert(rows("ann_ivf_persisted") == rows("ann_ivf"))
  }

  test("d_sections_persisted returns exactly d_sections' rows") {
    assume(haveData)
    assert(rows("d_sections_persisted") == rows("d_sections"))
  }

  test("d_query_documents_persisted returns exactly d_query_documents' rows") {
    assume(haveData)
    assert(rows("d_query_documents_persisted") == rows("d_query_documents"))
  }

  test("dd_simhash_persisted returns exactly dd_simhash's rows") {
    assume(haveData)
    assert(rows("dd_simhash_persisted") == rows("dd_simhash"))
  }

  test("mm_dedup_persisted returns exactly mm_dedup's rows") {
    assume(haveData)
    assert(rows("mm_dedup_persisted") == rows("mm_dedup"))
  }

  test("dd_semantic_persisted returns exactly dd_semantic's rows") {
    assume(haveData)
    assert(rows("dd_semantic_persisted") == rows("dd_semantic"))
  }

  test("dd_spans_persisted returns exactly dd_spans' rows") {
    assume(haveData)
    assert(rows("dd_spans_persisted") == rows("dd_spans"))
  }

  test("dd_spans_rewrite_persisted returns exactly dd_spans_rewrite's rows") {
    assume(haveData)
    assert(rows("dd_spans_rewrite_persisted") == rows("dd_spans_rewrite"))
  }

  test("persisted artifacts are built once per JVM and reused") {
    assume(haveData)
    var builds = 0
    val p1 = graft.queries.QueryUtil.persistedArtifact("spec_probe", dir) { _ => builds += 1 }
    val p2 = graft.queries.QueryUtil.persistedArtifact("spec_probe", dir) { _ => builds += 1 }
    assert(builds == 1 && p1 == p2)
  }
}
