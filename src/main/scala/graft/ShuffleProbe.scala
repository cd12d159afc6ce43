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
      settle(bytes, rows) // drain warm-run stragglers before the reset
      bytes.set(0); rows.set(0)
      val t0 = System.nanoTime()
      force(name)
      val sec = (System.nanoTime() - t0) / 1e9
      settle(bytes, rows)
      println(f"[shuffle] $name%-22s ${bytes.get / 1e6}%10.1f MB " +
        f"${rows.get / 1e6}%8.2f M rows  warm=$sec%6.2f s")
      Barrier.release(spark)
    }
    spark.stop()
  }

  /** Wait for the async listener bus to drain: poll the counters until
    * they hold still for `quiet` consecutive polls (capped at `maxMs`).
    * A single fixed sleep drops late task-end events on a loaded host
    * and lets one query's stragglers bleed into the next reset window
    * (round-14 advice #3) — these numbers back the shuffle-byte claims
    * quoted in the scaladocs, so they must be drained, not guessed.
    */
  def settle(bytes: java.util.concurrent.atomic.AtomicLong,
      rows: java.util.concurrent.atomic.AtomicLong,
      pollMs: Long = 100, quiet: Int = 3, maxMs: Long = 10000): Unit = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    var last = (bytes.get, rows.get)
    var still = 0
    while (still < quiet && System.nanoTime() < deadline) {
      Thread.sleep(pollMs)
      val now = (bytes.get, rows.get)
      if (now == last) still += 1 else { still = 0; last = now }
    }
  }
}
