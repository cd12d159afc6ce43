package graft

import java.nio.file.Files

class CliSpec extends SparkSpecBase {

  test("create → add → stats → remove lifecycle (vectra-cli surface)") {
    import spark.implicits._
    val corpus = Files.createTempDirectory("cli_corpus")
    Files.writeString(corpus.resolve("a.md"), "# one\n\nspark joins explained here")
    Files.writeString(corpus.resolve("b.txt"), "vectors and cosine similarity")
    val index = Files.createTempDirectory("cli_idx").resolve("idx").toString

    Cli.run(spark, List("create", index))
    Cli.run(spark, List("add", index, "--uri", corpus.toString))
    val idx1 = graft.index.DocumentIndex.load(spark, index)
    assert(idx1.catalog.count() == 2)

    val bUri = idx1.catalog.filter($"uri".endsWith("b.txt"))
      .select("uri").as[String].head()
    // query formats execute end-to-end (output goes to stdout)
    Cli.run(spark, List("query", index, "spark joins", "--format", "stats"))
    Cli.run(spark, List("query", index, "spark joins", "--format", "chunks"))
    Cli.run(spark, List("query", index, "spark joins",
      "--format", "sections", "--tokens", "50"))

    Cli.run(spark, List("remove", index, "--uri", bUri))
    val idx2 = graft.index.DocumentIndex.load(spark, index)
    assert(idx2.catalog.count() == 1)
    assert(idx2.catalogStats.collect().head.getAs[Long]("documents") == 1L)
  }
}
