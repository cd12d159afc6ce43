package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task accounting — the structural companion to
  * [[ShuffleProbe]]'s byte accounting. At sf0.1 (17 MB corpus) most of
  * a query's wall time is Spark fixed overhead: job submissions, stage
  * scheduling rounds, and task launches over near-empty shuffles. This
  * probe counts them (jobs, stages, tasks, summed task time, shuffle
  * bytes) and lists the slowest stages by wall-clock so optimization
  * targets the structure (fewer exchanges, fewer jobs, adaptive
  * partition counts) rather than guessing from totals.
  *
  * Usage: StageProbe <sfDir> <query> [query ...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val shufBytes = new java.util.concurrent.atomic.AtomicLong()
    val stageInfo = mutable.Buffer.empty[(Int, String, Long, Int)] // id, name, wallMs, nTasks
    val jobSites = mutable.Buffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobSites.synchronized(jobSites += site)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = s.stageInfo
        val wall = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(0L)
        stageInfo.synchronized {
          stageInfo += ((si.stageId, si.name.takeWhile(_ != '\n').take(60), wall, si.numTasks))
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shufBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); shufBytes.set(0)
      stageInfo.synchronized(stageInfo.clear())
      jobSites.synchronized(jobSites.clear())
    }
    def settle(): Unit =
      ShuffleProbe.settle(tasks, stages)
    names.foreach { name =>
      force(name) // warm: artifact builds + codegen, not charged
      Barrier.release(spark)
      settle()
      reset()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tC = (System.nanoTime() - t0) / 1e9 // construction (incl. eager barriers/bloom builds)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      settle()
      println(f"[stage] $name%-24s warm=$sec%6.2f s (construct=$tC%5.2f) jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d taskTime=${taskMs.get / 1000.0}%7.2f s " +
        f"shuffle=${shufBytes.get / 1e6}%8.1f MB")
      val top = stageInfo.synchronized(stageInfo.sortBy(-_._3).take(8).toList)
      top.foreach { case (id, nm, wall, nt) =>
        println(f"[stage]   s$id%-5d ${wall / 1000.0}%6.2f s tasks=$nt%4d  $nm")
      }
      jobSites.synchronized(
        jobSites.groupBy(identity).toSeq.sortBy(-_._2.size).foreach {
          case (site, xs) => println(f"[stage]   jobs ${xs.size}%3d x $site")
        })
      Barrier.release(spark)
    }
    spark.stop()
  }
}
