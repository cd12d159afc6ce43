package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-byte accounting per query — the evidence dial behind the
  * coded knn join's "carry codes, not vectors" claim (round-13
  * verdict #4 asked for shuffle bytes measurably down, not assumed):
  * a task-metrics listener sums shuffle WRITE bytes (each byte is
  * read once, so write volume is the exchange volume) across every
  * job a query's noop-forced execution runs, after a warm-up run so
  * once-per-JVM artifact builds are not charged to the query.
  *
  * Usage: ShuffleProbe <sfDir> <query> [query ...]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
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
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val rows = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          rows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      force(name) // warm: artifact builds + codegen, not charged
      Barrier.release(spark)
      bytes.set(0); rows.set(0)
      val t0 = System.nanoTime()
      force(name)
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      // (listenerBus is private[spark]; a short sleep after the action
      // returns is enough for a diagnostic tool)
      Thread.sleep(500)
      println(f"[shuffle] $name%-22s ${bytes.get / 1e6}%10.1f MB " +
        f"${rows.get / 1e6}%8.2f M rows  warm=$sec%6.2f s")
      Barrier.release(spark)
    }
    spark.stop()
  }
}
