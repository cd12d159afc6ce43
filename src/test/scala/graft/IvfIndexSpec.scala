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

  test("composed (cell, slot) layout: bounded files, pruning intact, results unchanged") {
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val mdir = Files.createTempDirectory("ivfmulti").toString
    val midx = IvfIndex.build(emb, "vec_id", "embedding", cents, "cid", "cv",
      mdir, filesPerCell = 3)

    // layout: every cell directory splits into slot subdirectories,
    // each holding exactly ONE parquet file (clustered write), and the
    // slot union covers the corpus exactly once
    val cellsRoot = new java.io.File(s"$mdir/cells")
    val cellDirs = cellsRoot.listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    val slotCounts = cellDirs.map(_.listFiles().count(_.getName.startsWith("slot=")))
    assert(slotCounts.forall(c => c >= 1 && c <= 3), slotCounts.toSeq.toString)
    assert(slotCounts.exists(_ > 1), "expected at least one multi-slot cell")
    for (cd <- cellDirs; sd <- cd.listFiles() if sd.getName.startsWith("slot="))
      assert(sd.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${sd} must hold exactly one clustered file")
    assert(midx.cells.count() == emb.count())
    assert(midx.cells.select("vec_id").distinct().count() == emb.count())

    // partition pruning still prunes on the leading cell level of the
    // composed key
    val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val df = midx.searchCells(Seq(0L, 50L), q, "qv", k = 3)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"), s"plan:\n$scan")

    // same results as the single-file layout
    val a = midx.search(q, "qv", nprobe = 2, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val b = idx.search(q, "qv", nprobe = 2, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(a == b)
  }

  test("append: batch lands on the frozen centroids, probes identical to a full rebuild") {
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val adir = Files.createTempDirectory("ivfapp").toString
    val aidx = IvfIndex.build(
      emb.filter(col("vec_id") % 10 =!= 7),
      "vec_id", "embedding", cents, "cid", "cv", adir)
    val before = aidx.cells.count()
    aidx.append(emb.filter(col("vec_id") % 10 === 7))

    // coverage: every corpus row exactly once after the append
    assert(aidx.cells.count() == emb.count() && before < emb.count())
    assert(aidx.cells.select("vec_id").distinct().count() == emb.count())
    assert(aidx.cellStats.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .head().getLong(0) == emb.count())

    // search identity with the one-shot full build over the same
    // centroids — placement depends only on the centroids
    val q = emb.filter(col("vec_id") === 1L).select(col("embedding").as("qv"))
    val got = aidx.search(q, "qv", nprobe = 2, k = 5)
      .select($"vec_id", $"cell".cast("long"), $"score")
      .as[(Long, Long, Double)].collect().toSeq
    val want = idx.search(q, "qv", nprobe = 2, k = 5)
      .select($"vec_id", $"cell".cast("long"), $"score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want)

    // file accounting: one append adds at most one file per touched
    // (cell, slot) — the compaction trade the scaladoc names
    val cellDirs = new java.io.File(s"$adir/cells").listFiles()
      .filter(_.getName.startsWith("cell="))
    for (cd <- cellDirs; sd <- cd.listFiles() if sd.getName.startsWith("slot="))
      assert(sd.listFiles().count(_.getName.endsWith(".parquet")) <= 2,
        s"$sd: more files than build+1 append can produce")
  }

  test("auto filesPerCell sizes from mean cell population") {
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // tiny targetRowsPerFile forces multi-slot cells even at sf0.001
    val adir = Files.createTempDirectory("ivfauto").toString
    val aidx = IvfIndex.build(emb, "vec_id", "embedding", cents, "cid", "cv",
      adir, filesPerCell = 0, targetRowsPerFile = 10L)
    val n = emb.count().toDouble
    val nlist = cents.count().toDouble
    val expected = math.max(1L, math.ceil(n / nlist / 10.0).toLong)
    val slotDirs = new java.io.File(s"$adir/cells").listFiles()
      .filter(_.getName.startsWith("cell=")).head.listFiles()
      .count(_.getName.startsWith("slot="))
    assert(slotDirs <= expected && expected > 1, s"slots=$slotDirs expected<=$expected")
    assert(aidx.cells.count() == emb.count())
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
