package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.filters.MetaFilter
import graft.index.VectorIndex

class VectorIndexSpec extends SparkSpecBase {

  private def mkIndex = {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), "a"),
      (2L, Array(0.0f, 1.0f, 0.0f), "a"),
      (3L, Array(0.0f, 0.0f, 1.0f), "b"),
      (4L, Array(0.7f, 0.7f, 0.0f), "b"))
      .toDF("id", "vec", "tag")
    VectorIndex.build(df, "id", "vec")
  }

  test("queryItems returns cosine top-k with deterministic tiebreak") {
    import spark.implicits._
    val top = mkIndex.queryItems(Seq(1.0, 0.0, 0.0), 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 4L)) // exact match first, then the diagonal
  }

  test("queryItems respects metadata filter") {
    import spark.implicits._
    val top = mkIndex.queryItems(Seq(1.0, 1.0, 0.0), 10, Some(MetaFilter.Eq("tag", "a")))
      .select("id").as[Long].collect().toSeq
    assert(top.toSet == Set(1L, 2L))
  }

  test("upsert is latest-wins, delete removes, stats count") {
    import spark.implicits._
    val idx = mkIndex
    val updates = Seq((1L, Array(0.0f, 0.0f, 2.0f), "z")).toDF("id", "vec", "tag")
    val up = idx.upsertItems(updates)
    assert(up.items.count() == 4)
    assert(up.getItem(1L).select("tag").as[String].head() == "z")

    val del = up.deleteItems(Seq(Tuple1(2L)).toDF("id"))
    assert(del.items.count() == 3)
    assert(del.getItem(2L).count() == 0)

    val st = del.stats.collect().head
    assert(st.getAs[Long]("items") == 3L)
    assert(st.getAs[Long]("min_dim") == 3L && st.getAs[Long]("max_dim") == 3L)
  }

  test("insertItems is strict on duplicates; metadata config projects") {
    import spark.implicits._
    val idx = mkIndex
    val fresh = Seq((9L, Array(0.2f, 0.2f, 0.2f), "c")).toDF("id", "vec", "tag")
    assert(idx.insertItems(fresh).items.count() == 5)
    val dup = Seq((1L, Array(0.2f, 0.2f, 0.2f), "c")).toDF("id", "vec", "tag")
    // the guard is lazy (in-plan raise_error): it fires on
    // materialization, wrapped by Spark's executor exception chain
    val ex = intercept[Exception](idx.insertItems(dup).items.count())
    assert(ex.getMessage != null || ex.getCause != null)

    val projected = idx.withIndexedMetadata(Nil)
    assert(projected.items.columns.toSet == Set("id", "vec", "norm"))
  }

  test("save/load parquet round-trip preserves query results") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vidx").toString
    val idx = mkIndex
    idx.save(dir)
    val loaded = VectorIndex.load(spark, dir, "id", "vec")
    val a = idx.queryItems(Seq(0.5, 0.5, 0.0), 4).select("id").as[Long].collect().toSeq
    val b = loaded.queryItems(Seq(0.5, 0.5, 0.0), 4).select("id").as[Long].collect().toSeq
    assert(a == b)
  }

  test("top-k plan is TakeOrderedAndProject (no global sort)") {
    // parquet-backed (a LocalTableScan input takes a different AQE
    // path); this is the plan shape that must hold at scale
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = VectorIndex.build(emb, "vec_id", "embedding")
    val df = idx.queryItems(Seq.fill(64)(0.1), 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
    assert(!plan.contains("rangepartitioning"), "top-k must not global-sort")
  }
}
