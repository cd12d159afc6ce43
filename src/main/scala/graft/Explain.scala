package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of each named query
  * (or all) so pushdown / broadcast / TakeOrderedAndProject /
  * WholeStageCodegen coverage can be reviewed.
  * Usage: Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      try {
        // STEADY-STATE audit: construct once to warm (once-per-JVM
        // persisted artifacts build here — ingest work, not query
        // cost), drop its barrier pins, then audit a SECOND
        // construction. Without this, an entry's first-build barrier
        // count depended on whether another query in the same JVM had
        // already built the shared artifact (the PlanAuditSpec
        // full-suite-order flake, round 12).
        SparkEntry.queries(n)(spark, sfDir)
        Barrier.release(spark)
        val df = SparkEntry.queries(n)(spark, sfDir)
        // plan barriers (Barrier.checkpoint) already RAN while the
        // query was constructed — the final explain shows them only as
        // Scan ExistingRDD. Report the count so the audit can account
        // for checkpoint-time materialization jobs separately.
        val barriers = Barrier.pinnedCount(spark)
        df.explain("formatted")
        println(s"BARRIERS: $barriers")
      }
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      Barrier.release(spark)
    }
    spark.stop()
  }
}
