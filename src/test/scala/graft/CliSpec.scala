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
    Cli.run(spark, List("remove", index, "--uri", bUri))
    val idx2 = graft.index.DocumentIndex.load(spark, index)
    assert(idx2.catalog.count() == 1)
    assert(idx2.catalogStats.collect().head.getAs[Long]("documents") == 1L)
  }
}
