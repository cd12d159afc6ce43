package graft

import java.nio.file.{Files, Paths}

import graft.index.DocumentIndex
import graft.sources.FileFetcher

class FileFetcherSpec extends SparkSpecBase {

  test("recursive directory ingest → documents DataFrame → index") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("one.md"), "# heading\n\nbody text about joins")
    Files.writeString(dir.resolve("sub/two.txt"), "plain text about shuffles")
    Files.writeString(dir.resolve("sub/three.html"), "<body><p>markup text</p></body>")

    val docs = FileFetcher.fetchDir(spark, dir.toString)
    assert(docs.count() == 3)
    val byType = docs.select("doc_type").as[String].collect().toSet
    assert(byType == Set("md", "txt", "html"))
    val row = docs.filter($"doc_type" === "md").select("text").as[String].head()
    assert(row.contains("body text about joins"))

    // feeds straight into the document index
    val idx = DocumentIndex.create(spark).upsertDocuments(docs)
    assert(idx.catalog.count() == 3)
  }
}
