package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.MergeApply

/** Randomized equivalence of the one-pass full-outer CDC apply
  * against a reference map-fold (seeded — fully deterministic), plus
  * the contract guards.
  */
class MergeApplySpec extends SparkSpecBase {

  private def brute(base: Map[Long, Double],
      changes: Seq[(Long, String, Double)]): Map[Long, Double] =
    changes.foldLeft(base) {
      case (m, (k, "d", _)) => m - k
      case (m, (k, _, v)) => m.updated(k, v) // u and i both upsert
    }

  test("random changelogs: applyChanges equals the map-fold reference") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 25).foreach { trial =>
      val baseKeys = (0L until (5 + rnd.nextInt(40))).toSeq
      val base = baseKeys.map(k => k -> (rnd.nextInt(1000) / 10.0)).toMap
      // one change per key max (a single apply sees one row per key —
      // multi-change batches are sequenced by the caller, as in the
      // streaming foreachBatch test)
      val changeKeys = rnd.shuffle(baseKeys ++ baseKeys.map(_ + 1000L))
        .take(1 + rnd.nextInt(baseKeys.size))
      val changes = changeKeys.map { k =>
        val existing = base.contains(k)
        val op =
          if (!existing) "i"
          else if (rnd.nextBoolean()) "u" else "d"
        (k, op, (rnd.nextInt(1000) / 10.0))
      }
      val got = MergeApply.applyChanges(
          base.toSeq.toDF("k", "v"), changes.toDF("k", "op", "v"), "k")
        .select(col("k"), col("v")).as[(Long, Double)].collect().toMap
      assert(got == brute(base, changes), s"trial $trial")
    }
  }

  test("status labels reflect the op that produced each row") {
    import spark.implicits._
    val base = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
    val changes = Seq((1L, "u", 9.0), (2L, "d", 0.0), (9L, "i", 9.9))
      .toDF("k", "op", "v")
    val got = MergeApply.applyChanges(base, changes, "k")
      .select(col("k"), col("status")).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "updated", 3L -> "kept", 9L -> "inserted"))
  }

  test("missing payload columns fail loudly") {
    import spark.implicits._
    val base = Seq((1L, 1.0)).toDF("k", "v")
    val bad = Seq((1L, "u")).toDF("k", "op")
    val e = intercept[IllegalArgumentException] {
      MergeApply.applyChanges(base, bad, "k")
    }
    assert(e.getMessage.contains("full new row"))
  }

  test("duplicate change rows for one key fail loudly (MERGE contract)") {
    import spark.implicits._
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val dup = Seq((1L, "u", 9.0), (1L, "u", 8.0), (2L, "u", 5.0))
      .toDF("k", "op", "v")
    val e = intercept[Exception] {
      MergeApply.applyChanges(base, dup, "k").collect()
    }
    assert(e.getMessage.contains("multiple change rows"),
      s"expected the duplicate-key raise_error, got: ${e.getMessage}")
    // a clean batch on the same plan still works
    val ok = MergeApply.applyChanges(base,
        Seq((1L, "u", 9.0), (2L, "d", 0.0)).toDF("k", "op", "v"), "k")
      .select(col("k"), col("v")).as[(Long, Double)].collect().toMap
    assert(ok == Map(1L -> 9.0))
  }
}
