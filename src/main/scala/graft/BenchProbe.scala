package graft

import org.apache.spark.sql.SparkSession

/** Latency-floor diagnostic: splits one query's cold wall time into
  * construct (table load + plan build, incl. any construction-time
  * jobs), plan (analyze/optimize/physical-plan), and execute (the
  * noop-forced job) — medians over N warm-JVM reps. This is the tool
  * behind the BENCH_LOCAL.md fixed-cost accounting: it shows which
  * part of a sub-second query is Spark's per-query floor vs real scan
  * work, without touching the Bench protocol.
  *
  * Usage: BenchProbe <sfDir> <reps> <query> [query ...]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench: the 100-entry default thrashes across multi-query
      // runs (round-14 — every query re-compiles per sweep)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q1_agg", "v_topk").foreach { w =>
      SparkEntry.queries(w)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    names.foreach { name =>
      val ts = (1 to reps).map { _ =>
        Barrier.release(spark)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        // A/B hook (round-14, the dd_embed_cosine floor/sweep gap):
        // a heavy iterative neighbor (dd_groups) leaves dead round
        // broadcasts/shuffle state that only a driver GC lets
        // ContextCleaner reclaim — force one between queries to test
        if (sys.env.contains("SPARK_GRAFT_PROBE_GC")) { System.gc(); Thread.sleep(300) }
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      println(f"$name%-22s construct ${med(ts.map(_._1))}%6.3f  " +
        f"plan ${med(ts.map(_._2))}%6.3f  exec ${med(ts.map(_._3))}%6.3f  " +
        f"(total ${med(ts.map(t => t._1 + t._2 + t._3))}%6.3f)")
    }
    spark.stop()
  }
}
