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

  test("html ingest converts to markdown and chunks on headings (CLI add path)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("htmlcorpus")
    val html = "<html><head><title>t</title></head><body>" +
      (1 to 5).map(i =>
        s"<h2>Chapter $i</h2><p>${"prose sentence here. " * 40}</p>").mkString +
      "</body></html>"
    Files.writeString(dir.resolve("page.html"), html)

    val tmpIdx = Files.createTempDirectory("htmlidx").toString + "/idx"
    Cli.run(spark, List("add", tmpIdx, "--uri", dir.toString, "--chunk-size", "80"))

    val idx = DocumentIndex.load(spark, tmpIdx)
    // doc_type metadata records the conversion
    assert(idx.catalog.select("doc_type").as[String].collect().toSeq == Seq("md"))
    // chunks align to headings: chapter titles open their own chunks
    // (start_pos is reliable; end_pos of merged chunks deliberately
    // keeps the first constituent's span — reference combine_chunks)
    val chunkStarts = idx.chunks.items
      .join(idx.catalog.select($"document_id", $"text".as("full")), "document_id")
      .select($"full", $"start_pos")
      .collect()
      .map(r => r.getString(0).substring(r.getInt(1)))
    val headingStarts = chunkStarts.count(t =>
      t.startsWith("Chapter ") || t.startsWith("## Chapter") || t.startsWith("# Chapter"))
    assert(headingStarts >= 4, s"chunks not heading-aligned: ${chunkStarts.map(_.take(30)).toSeq}")
  }
}
