package graft

import java.nio.file.Files

import graft.index.DocumentIndex
import graft.text.SplitterConfig

class DocumentIndexSpec extends SparkSpecBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      ("a.txt", "spark shuffles data between stages. " * 20),
      ("b.txt", "vectors live in embedding space. " * 20),
      ("c.md", "# title\n\nminhash finds near duplicates quickly.\n\nmore prose here."))
      .toDF("uri", "text")
  }

  private def mkIndex = DocumentIndex.create(
    spark, SplitterConfig(keepSeparators = true, chunkSize = 64, chunkOverlap = 0))
    .upsertDocuments(corpus)

  test("upsert catalogs every uri and chunks every document") {
    import spark.implicits._
    val idx = mkIndex
    assert(idx.catalog.count() == 3)
    val stats = idx.catalogStats.collect().head
    assert(stats.getAs[Long]("documents") == 3L)
    assert(stats.getAs[Long]("chunks") >= 3L)
    // every chunk's document_id resolves through the catalog
    val orphans = idx.chunks.items.join(idx.catalog, Seq("document_id"), "left_anti")
    assert(orphans.count() == 0)
  }

  test("upsert is latest-wins per uri") {
    import spark.implicits._
    val idx = mkIndex
    val v2 = Seq(("a.txt", "entirely new tiny text")).toDF("uri", "text")
    val updated = idx.upsertDocuments(v2)
    assert(updated.catalog.count() == 3)
    val aId = DocumentIndex.docIdFor("a.txt")
    val aChunks = updated.chunks.items.filter(s"document_id = '$aId'")
    assert(aChunks.count() == 1) // tiny text → one chunk
  }

  test("deleteDocument removes catalog entry and chunks") {
    val idx = mkIndex.deleteDocument("b.txt")
    assert(idx.catalog.count() == 2)
    val bId = DocumentIndex.docIdFor("b.txt")
    assert(idx.chunks.items.filter(s"document_id = '$bId'").count() == 0)
  }

  test("queryDocuments ranks the on-topic document first") {
    import spark.implicits._
    val idx = mkIndex
    val top = idx.queryDocuments("spark shuffles data", maxDocuments = 2)
      .select("uri").as[String].collect().toSeq
    assert(top.head == "a.txt")
  }

  test("save/load round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("didx").toString
    mkIndex.save(dir)
    val loaded = DocumentIndex.load(spark, dir)
    assert(loaded.catalog.count() == 3)
    val top = loaded.queryDocuments("embedding space vectors", maxDocuments = 1)
      .select("uri").as[String].collect().toSeq
    assert(top == Seq("b.txt"))
  }
}
