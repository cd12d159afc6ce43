package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ann.IvfIndex

/** Incremental maintenance of the persisted self-probe artifact
  * (IvfIndex.selfProbeForBatch / appendSelfProbe): a batch tick's
  * probe rows appended to the base table must be row-identical to a
  * full selfProbeTable rebuild over the grown layout — probe
  * placement depends only on the layout's FROZEN centroids, so
  * append ≡ rebuild is an algebraic identity, property-checked here
  * on random corpus splits (the GroupsMaintenanceSpec discipline
  * applied to the ANN side, round-13 verdict #5).
  */
class SelfProbeMaintenanceSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Set[(Long, Seq[Float], Double, Long, Long)] =
    df.select(col("qid"), col("qv"), col("qn"),
        col("q_label").cast("long"), col("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
      .toSet

  /** Build the layout on the base split, append the batch, then
    * compare base-probes ∪ batch-probes against a full rebuild.
    */
  private def assertAppendEqualsRebuild(splitMod: Int, splitRem: Int,
      np: Int): Unit = {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.filter(pmod(col("vec_id"), lit(splitMod)) =!= splitRem)
    val batch = emb.filter(pmod(col("vec_id"), lit(splitMod)) === splitRem)
    val dir = Files.createTempDirectory("spmaint").toString
    val cents = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val idx = IvfIndex.build(base, "vec_id", "embedding", cents, "cid", "cv", dir)

    val probePath = s"$dir/selfprobe"
    idx.selfProbeTable(np = np, keepCols = Seq("label"))
      .write.mode("overwrite").parquet(probePath)
    idx.append(batch)
    idx.appendSelfProbe(batch, probePath, np = np, keepCols = Seq("label"))

    val maintained = rows(spark.read.parquet(probePath))
    val rebuilt = rows(idx.selfProbeTable(np = np, keepCols = Seq("label")))
    assert(maintained == rebuilt)
    assert(maintained.nonEmpty)
    // the batch actually contributed rows (np per batch vector)
    assert(maintained.map(_._1).intersect(
      batch.select("vec_id").collect().map(_.getLong(0)).toSet).nonEmpty)
  }

  test("append ≡ full rebuild on a 10% batch split") {
    assertAppendEqualsRebuild(splitMod = 10, splitRem = 7, np = 3)
  }

  test("append ≡ full rebuild on a 50% split at a wider probe width") {
    assertAppendEqualsRebuild(splitMod = 2, splitRem = 1, np = 5)
  }

  test("knnJoinSelf over the maintained probe table equals the join " +
      "over a rebuilt one (the artifact's consumer is unaffected)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 3)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 3)
    val dir = Files.createTempDirectory("spmaintk").toString
    val cents = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val idx = IvfIndex.build(base, "vec_id", "embedding", cents, "cid", "cv", dir)
    val probePath = s"$dir/selfprobe"
    idx.selfProbeTable(np = 3, keepCols = Seq("label"))
      .write.mode("overwrite").parquet(probePath)
    idx.append(batch)
    idx.appendSelfProbe(batch, probePath, np = 3, keepCols = Seq("label"))

    def joined(probes: DataFrame) =
      idx.knnJoinSelf(probes, Seq("label"), k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
    val viaMaintained = joined(spark.read.parquet(probePath))
    val viaRebuilt = joined(idx.selfProbeTable(np = 3, keepCols = Seq("label")))
    assert(viaMaintained == viaRebuilt)
    assert(viaMaintained.nonEmpty)
  }
}
