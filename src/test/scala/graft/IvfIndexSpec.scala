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

  test("searchWhere: filtered top-k == post-filtered unfiltered probe, " +
      "predicate pushed to the cells scan") {
    import spark.implicits._
    val q = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") === 1L).select(col("embedding").as("qv"))
    val got = idx.searchWhere(q, "qv", nprobe = 3, k = 5,
      pred = col("label") === 2, keepCols = Seq("label"))
    val rows = got.select("vec_id", "label").as[(Long, Int)].collect().toSeq
    assert(rows.nonEmpty && rows.forall(_._2 == 2), s"non-label-2 rows: $rows")
    // semantics: identical to ranking the unfiltered probe of the SAME
    // cells and keeping label-2 rows (filter restricts candidates,
    // never the probe geometry)
    val unfiltered = idx.search(q, "qv", nprobe = 3, k = Int.MaxValue)
      .join(idx.cells.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") === 2)
      .orderBy(desc("score"), col("vec_id"))
      .limit(5).select("vec_id").as[Long].collect().toSeq
    assert(rows.map(_._1).toSet == unfiltered.toSet,
      s"filtered=${rows.map(_._1)} vs post-filtered=$unfiltered")
    // the label predicate reaches the parquet scan
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("label"),
      s"label filter not pushed:\n$plan")
  }

  test("searchBatch: one plan reproduces per-query single probes") {
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 4)
    val batch = idx.searchBatch(queries, "vec_id", "embedding", nprobe = 2, k = 5)
      .select("qid", "vec_id", "score", "rk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val singles = (0L until 4L).flatMap { qid =>
      idx.search(emb.filter(col("vec_id") === qid).select(col("embedding").as("qv")),
          "qv", nprobe = 2, k = 5)
        .select("vec_id", "score").as[(Long, Double)].collect()
        .zipWithIndex.map { case ((id, sc), i) => (qid, id, sc, (i + 1).toLong) }
    }.toSet
    assert(batch == singles, s"batch=$batch\nsingles=$singles")
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
