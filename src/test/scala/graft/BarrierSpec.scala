package graft

import org.apache.spark.sql.functions._

/** Tracked plan barriers: eager checkpoints register their pinned RDD
  * and release() frees exactly those; stage() is the fault-tolerant
  * parquet flip with identical contents.
  */
class BarrierSpec extends SparkSpecBase {

  test("checkpoint materializes eagerly, registers, and release unpins") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = Barrier.checkpoint((1 to 100).toDF("x").withColumn("y", col("x") * 2))
    assert(Barrier.pinnedCount(spark) >= 1)
    assert(spark.sparkContext.getPersistentRDDs.size > before, "no pinned RDD registered")
    assert(df.agg(sum("y")).head.getLong(0) == 10100L)
    Barrier.release(spark)
    assert(Barrier.pinnedCount(spark) == 0)
    // release is idempotent and safe with no registrations
    Barrier.release(spark)
  }

  test("stage writes a parquet stage table and reads back identical rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val src = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val staged = Barrier.stage(src, s"$dir/t")
    assert(staged.orderBy("id").collect().map(_.toSeq).toSeq ==
      src.orderBy("id").collect().map(_.toSeq).toSeq)
    // the staged frame scans the parquet, not the original lineage
    assert(staged.queryExecution.executedPlan.toString.contains("parquet"))
  }

  test("loss of materialized state: stage re-reads, checkpoint dies loudly") {
    import spark.implicits._
    // Simulate total loss of executor-held blocks (the executor-loss
    // failure mode localCheckpoint cannot survive): drop every cached/
    // pinned block, then re-execute each barrier's DataFrame.
    val dir = java.nio.file.Files.createTempDirectory("graft_stage_ft").toString
    val staged = Barrier.stage((1 to 50).toDF("x"), s"$dir/t")
    val ck = Barrier.checkpoint((1 to 50).toDF("x"))
    assert(staged.count() == 50L && ck.count() == 50L)

    Barrier.release(spark, blocking = true) // the "lost executor"
    spark.catalog.clearCache()

    // stage table: recovery semantics = re-read from shared storage
    assert(staged.count() == 50L)
    // checkpoint: truncated lineage has no recompute path — the query
    // fails (loudly), which is the documented trade (Barrier scaladoc)
    intercept[Exception] { ck.count() }
  }
}
