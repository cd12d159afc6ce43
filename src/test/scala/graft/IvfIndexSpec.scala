package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.IvfIndex

class IvfIndexSpec extends SparkSpecBase {

  private lazy val dir = Files.createTempDirectory("ivf").toString

  private lazy val idx: IvfIndex = {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    IvfIndex.build(emb, "vec_id", "embedding", cents, "cid", "cv", dir)
  }

  test("cell layout covers the corpus exactly once") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    assert(idx.cells.count() == emb.count())
    assert(idx.cells.select("cell").distinct().count() == idx.centroids.count())
  }

  test("probe search returns the exact top-k of the probed cells") {
    import spark.implicits._
    val q = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") === 1L).select(col("embedding").as("qv"))
    val got = idx.search(q, "qv", nprobe = 2, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.length == 5)
    assert(got.contains(1L)) // the query vector itself lives in a probed cell
  }

  test("kmeans-learned centroids build a working pruned index") {
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val kdir = Files.createTempDirectory("ivfkm").toString
    val kidx = IvfIndex.buildWithKMeans(emb, "vec_id", "embedding", nlist = 8, kdir)
    assert(kidx.centroids.count() == 8)
    assert(kidx.cells.count() == emb.count())
    val q = emb.filter(col("vec_id") === 5L).select(col("embedding").as("qv"))
    val got = kidx.search(q, "qv", nprobe = 2, k = 5).select("vec_id").as[Long].collect()
    assert(got.length == 5 && got.contains(5L))
  }

  test("static cell probe compiles to partition pruning") {
    import spark.implicits._
    val q = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val df = idx.searchCells(Seq(0L, 50L), q, "qv", k = 3)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"plan:\n$scan")
    assert(scan.contains("cell"), "cell must appear as a partition filter")
    // and the filter is NOT a post-scan row filter on the data columns
    assert(df.collect().length == 3)
  }
}
