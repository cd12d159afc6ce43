package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ann.IvfIndex

/** The two standing IVF maintenance jobs (round-11 verdict #5):
  * append inherits the BUILD's slot geometry from the persisted meta,
  * compact rewrites a cell's accumulated append files back to one per
  * slot with search identity pinned, recluster refits + rebuilds on a
  * population-spread trigger, and the warm serving tier re-pins after
  * maintenance via IvfServing.refresh.
  */
class IvfMaintenanceSpec extends SparkSpecBase {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, sfDir, "embeddings")

  private def buildAt(dir: String, filesPerCell: Int): IvfIndex = {
    val cents = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    IvfIndex.build(emb.filter(col("vec_id") % 10 =!= 7),
      "vec_id", "embedding", cents, "cid", "cv", dir,
      filesPerCell = filesPerCell)
  }

  private def cellFiles(idx: IvfIndex): Map[(Long, Int), Int] =
    idx.cells.select(col("cell"), col("slot"),
        input_file_name().as("f"))
      .groupBy(col("cell"), col("slot"))
      .agg(countDistinct(col("f")).as("n"))
      .collect()
      // partition-discovery types the dir values (int when they fit)
      .map(r => (r.get(0).toString.toLong, r.get(1).toString.toInt) ->
        r.getLong(2).toInt).toMap

  test("append defaults to the persisted build-time filesPerCell") {
    val dir = Files.createTempDirectory("ivfm_append").toString
    val idx = buildAt(dir, filesPerCell = 2)
    assert(idx.filesPerCell == 2)
    idx.append(emb.filter(col("vec_id") % 10 === 7))
    // appended rows spread across BOTH slots with the build formula —
    // the old default (1) funneled every appended row into slot 0
    val bad = idx.cells
      .filter(col("slot") =!= pmod(hash(col("vec_id")), lit(2)))
      .count()
    assert(bad == 0, s"$bad rows in a slot other than pmod(hash(id), 2)")
    assert(idx.cells.select("slot").distinct().count() == 2)
  }

  test("compact: appended file fragments collapse to one file per slot, search-identical") {
    val dir = Files.createTempDirectory("ivfm_compact").toString
    val idx = buildAt(dir, filesPerCell = 2)
    // three appends → up to 3 extra files per touched (cell, slot)
    for (m <- Seq(7)) idx.append(emb.filter(col("vec_id") % 10 === m))
    idx.append(emb.filter(col("vec_id") % 20 === 3))
    val q = emb.filter(col("vec_id") === 1L).select(col("embedding").as("qv"))
    val before = idx.search(q, "qv", nprobe = 3, k = 10).collect().toSeq
    val fragmented = cellFiles(idx)
    val hot = fragmented.filter(_._2 > 1).keys.map(_._1).toSeq.distinct
    assert(hot.nonEmpty, "no fragmented cell to compact — test setup broken")
    hot.foreach(idx.compact)
    val after = cellFiles(idx)
    hot.foreach { c =>
      after.filter(_._1._1 == c).foreach { case ((_, s), n) =>
        assert(n == 1, s"cell $c slot $s still has $n files after compact")
      }
    }
    // compaction moves files, never rows: same corpus, same results
    assert(idx.cells.count() == emb.count() +
      emb.filter(col("vec_id") % 20 === 3).count())
    assert(idx.search(q, "qv", nprobe = 3, k = 10).collect().toSeq == before)
  }

  test("compact replaces HISTORICAL slots too — no duplicate rows after " +
      "an append with a larger filesPerCell override (round-12 advice)") {
    val dir = Files.createTempDirectory("ivfm_compact_hist").toString
    val idx = buildAt(dir, filesPerCell = 2)
    // the scaladoc-invited use: re-shard a hot batch across MORE slots
    // than the build's geometry — rows land in slots >= 2, which a
    // dynamic-partition-overwrite compact would have left in place
    // (recomputed content for those slots is empty → partitions
    // untouched → rows duplicated alongside their rewritten copies)
    idx.append(emb.filter(col("vec_id") % 10 === 7), filesPerCell = 8)
    val total = idx.cells.count()
    assert(idx.cells.filter(col("slot") >= 2).count() > 0,
      "override batch produced no high-slot rows — test setup broken")
    val q = emb.filter(col("vec_id") === 1L).select(col("embedding").as("qv"))
    val before = idx.search(q, "qv", nprobe = 3, k = 10).collect().toSeq
    val touched = idx.cells.select(col("cell")).distinct()
      .as[Long].collect().sorted
    touched.foreach(idx.compact)
    // every historical slot directory was swapped out: row count is
    // UNCHANGED (the old overwrite mode duplicated high-slot rows),
    // every row sits in the build-formula slot, and search is identical
    assert(idx.cells.count() == total,
      s"compact changed the row count: $total -> ${idx.cells.count()}")
    assert(idx.cells.filter(col("slot") >= 2).count() == 0,
      "high-slot rows survived compaction")
    assert(idx.cells
      .filter(col("slot") =!= pmod(hash(col("vec_id")), lit(2))).count() == 0)
    assert(idx.search(q, "qv", nprobe = 3, k = 10).collect().toSeq == before)
    // one distinct id per row — the duplicate symptom directly
    assert(idx.cells.select("vec_id").distinct().count() == total)
  }

  test("recluster: no-op under the threshold, refit + rebuild above it") {
    val dir = Files.createTempDirectory("ivfm_recl").toString
    val idx = buildAt(dir, filesPerCell = 1)
    assert(idx.populationSpread >= 1.0)
    // generous threshold → untouched index back
    assert(idx.recluster(1e9, dir + "_v2") eq idx)
    // skew the corpus: append the held-out batch twice over → spread
    // grows; force the rebuild with threshold 1.0 < spread
    idx.append(emb.filter(col("vec_id") % 10 === 7))
    val spread = idx.populationSpread
    assert(spread > 1.0)
    val v2 = idx.recluster(1.0, dir + "_v2")
    assert(v2 ne idx)
    assert(v2.cells.count() == idx.cells.count())
    // the refit is seeded and deterministic: an independent rebuild
    // over the same corpus produces row-identical search results
    val corpus = idx.cells.drop("cell", "slot")
    val ref = IvfIndex.buildWithKMeans(corpus, "vec_id", "embedding",
      graft.ann.AnnTuner.ivfNlist(corpus.count()), dir + "_ref")
    val q = emb.filter(col("vec_id") === 5L).select(col("embedding").as("qv"))
    assert(v2.search(q, "qv", nprobe = 2, k = 5).collect().toSeq ==
      ref.search(q, "qv", nprobe = 2, k = 5).collect().toSeq)
  }

  test("IvfServing.refresh makes post-append rows visible to the warm loop") {
    val dir = Files.createTempDirectory("ivfm_serve").toString
    val idx = buildAt(dir, filesPerCell = 1)
    val serving = new graft.serve.IvfServing(idx, nprobe = 2)
    val probeQ = emb.filter(col("vec_id") % 10 === 7).limit(1)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect()
    val (qid, qv) = probeQ.head
    // the held-out batch is not in the index yet: the warm loop can't
    // return it
    val cold = serving.searchBatch(Seq((qid, qv)), k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(!cold.contains(qid))
    idx.append(emb.filter(col("vec_id") % 10 === 7))
    // NOTE: within one session Spark recaches path writes
    // (CacheManager.recacheByPath), so no in-JVM staleness window is
    // asserted here — the hook exists for the production shape, where
    // the serving JVM is not the ingest JVM (and for maintenance
    // swaps); what this pins is that refresh() re-lists, re-pins, and
    // serves the appended rows bit-identically to the batch path.
    serving.refresh()
    val fresh = serving.searchBatch(Seq((qid, qv)), k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(fresh.contains(qid),
      s"appended vector $qid not served after refresh: $fresh")
    // and the refreshed warm loop matches the batch path bit for bit
    val viaIdx = idx.searchBatch(
        emb.filter(col("vec_id") === qid), "vec_id", "embedding",
        nprobe = 2, k = 5)
      .select("qid", "vec_id", "score", "rk")
      .collect().map(_.toSeq).toSet
    val viaServe = serving.searchBatch(Seq((qid, qv)), k = 5)
      .select("qid", "vec_id", "score", "rk")
      .collect().map(_.toSeq).toSet
    assert(viaServe == viaIdx)
  }
}
