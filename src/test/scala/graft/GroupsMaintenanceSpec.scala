package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Incremental maintenance of the persisted dup-group closure
  * (Dedup.mergeGroups): merging a batch's pairs into an existing
  * assignment must be row-identical to recomputing connected
  * components over the union pair set — the algebra the
  * dd_groups_persisted artifact's standing-pipeline story rests on.
  */
class GroupsMaintenanceSpec extends SparkSpecBase {

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    ps.toDF("ida", "idb")
  }

  private def sortedRows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.select(col(df.columns.head), col("group_id"), col("group_size"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity)
      .toSeq

  private def assertMergeEqualsFull(p0: Seq[(Long, Long)],
      p1: Seq[(Long, Long)]): Unit = {
    val full = Dedup.connectedGroups(pairsDf(p0 ++ p1), "ida", "idb", "id")
    val base = Dedup.connectedGroups(pairsDf(p0), "ida", "idb", "id")
    val merged = Dedup.mergeGroups(base, "id", pairsDf(p1), "ida", "idb")
    assert(sortedRows(merged) == sortedRows(full))
  }

  test("empty batch leaves the assignment unchanged") {
    assertMergeEqualsFull(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq.empty)
  }

  test("batch pairs entirely inside existing groups are no-ops") {
    // (1,3) is already implied by the closure of (1,2),(2,3)
    assertMergeEqualsFull(Seq((1L, 2L), (2L, 3L)), Seq((1L, 3L)))
  }

  test("new nodes form their own group") {
    assertMergeEqualsFull(Seq((1L, 2L)), Seq((20L, 21L), (21L, 22L)))
  }

  test("a new node bridges two existing groups") {
    // 100 connects group {1,2} and group {10,11}: one merged group of 5
    assertMergeEqualsFull(Seq((1L, 2L), (10L, 11L)),
      Seq((2L, 100L), (100L, 10L)))
  }

  test("a new smaller id becomes the merged group's canonical id") {
    // group {5,6} gains member 0 — group_id must become 0
    assertMergeEqualsFull(Seq((5L, 6L)), Seq((0L, 6L)))
  }

  test("batch touches an ungrouped corpus doc (absent from the assignment)") {
    // 40 appears in no existing pair; the batch links it in
    assertMergeEqualsFull(Seq((1L, 2L)), Seq((40L, 2L)))
  }

  test("degenerate self-pair in the batch: node becomes a singleton, like the full closure") {
    assertMergeEqualsFull(Seq((1L, 2L)), Seq((30L, 30L)))
    // and mixed with a real edge on the same tick
    assertMergeEqualsFull(Seq((1L, 2L)), Seq((30L, 30L), (31L, 1L)))
  }

  test("property: merge ≡ full recompute on random graph splits") {
    val rnd = new scala.util.Random(911L)
    for (trial <- 0 until 6) {
      val n = 30 + rnd.nextInt(40)
      val m = 40 + rnd.nextInt(60)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val (p1, p0) = edges.partition(_ => rnd.nextDouble() < 0.4)
      // p0 may be empty on a small draw — connectedGroups handles it,
      // and the merge must still equal the full closure
      assertMergeEqualsFull(p0, p1)
    }
  }

  test("realistic path: corpus-minus-batch closure + batch-touching pairs ≡ full dd_groups closure") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cand = Dedup.minHashCandidatesTuned(docs, "doc_id", "text",
        shingleLen = 3, nHashes = 16, threshold = 0.7)
      .transform(Barrier.checkpoint)
    val isBatch = (c: org.apache.spark.sql.Column) => pmod(c, lit(10)) === 7
    val oldPairs = cand.filter(!isBatch(col("ida")) && !isBatch(col("idb")))
    val batchPairs = cand.filter(isBatch(col("ida")) || isBatch(col("idb")))
    val full = Dedup.connectedGroups(cand, "ida", "idb", "doc_id")
    val base = Dedup.connectedGroups(oldPairs, "ida", "idb", "doc_id")
    val merged = Dedup.mergeGroups(base, "doc_id", batchPairs, "ida", "idb")
    assert(sortedRows(merged) == sortedRows(full))
    assert(sortedRows(full).nonEmpty)
  }
}
