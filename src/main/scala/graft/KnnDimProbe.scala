package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dimension-dependence probe for the corpus kNN join family — the
  * measurement behind the coded joins' honest scale claim (round 14):
  * at the bench corpus's dim=64, a float vector (256 B) costs about
  * the same as a shuffle row's key overhead, so carrying codes
  * instead of vectors barely moves total exchange bytes (measured by
  * graft.ShuffleProbe: exact 916 MB vs SQ8-coded 911 MB at the 100×
  * corpus). At production embedding dims the ratio inverts — this
  * probe builds the same IVF layout + probe artifacts over an
  * arbitrary-dimension corpus (tools/make_dim_corpus.py) and reports
  * shuffle bytes + warm time for the exact join and both coded rungs.
  *
  * Usage: KnnDimProbe <embeddings.parquet> [np=16] [cSq=6] [cPq=32]
  */
object KnnDimProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val np = if (args.length > 1) args(1).toInt else 16
    val cSq = if (args.length > 2) args(2).toInt else 6
    val cPq = if (args.length > 3) args(3).toInt else 32
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

    val emb = spark.read.parquet(path)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val m = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    val cent = emb.filter(pmod(col("vec_id"), lit(m)) === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val dir = Files.createTempDirectory("knndim").toString
    val idx = graft.ann.IvfIndex.build(emb, "vec_id", "embedding",
      cent, "cid", "cv", dir)
    println(s"[dimprobe] $path n=$n dim=$dim nlist=${idx.centroids.count()} np=$np")

    // ingest artifacts (not charged): exact + coded probe tables
    val exactProbe = s"$dir/p-exact"
    idx.selfProbeTable(np, keepCols = Seq("label"))
      .write.mode("overwrite").parquet(exactProbe)
    val books = graft.ann.Pq.fit(emb, "vec_id", "embedding",
      dim = dim, nSub = 8, seedMod = math.max(1L, n / 32), iters = 1)
    val pqProbe = s"$dir/p-pq"
    graft.ann.CodedKnnJoin.buildPqProbeTable(idx, books, dim, np, Seq("label"))
      .write.mode("overwrite").parquet(pqProbe)
    val grid = graft.ann.Sq.fit(emb, "embedding", dim)
    val sqProbe = s"$dir/p-sq"
    graft.ann.CodedKnnJoin.buildSqProbeTable(idx, grid, np, Seq("label"))
      .write.mode("overwrite").parquet(sqProbe)

    def measure(tag: String, run: () => org.apache.spark.sql.DataFrame): Unit = {
      run().write.format("noop").mode("overwrite").save() // warm
      bytes.set(0); rows.set(0)
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[dimprobe] $tag%-10s ${bytes.get / 1e6}%10.1f MB " +
        f"${rows.get / 1e6}%8.2f M rows  warm=$sec%6.2f s")
    }
    measure("exact", () =>
      idx.knnJoinSelf(spark.read.parquet(exactProbe), Seq("label"), k = 3))
    measure("coded-sq", () =>
      graft.ann.CodedKnnJoin.knnJoinSelfSq(idx, spark.read.parquet(sqProbe),
        grid, Seq("label"), k = 3, candidates = cSq))
    // prefix-SDC: fold only the first dim/4 dimensions in the
    // candidate scorer (candidates widened 2× to absorb the
    // subsampled-distance selection noise)
    measure("coded-sq/4", () =>
      graft.ann.CodedKnnJoin.knnJoinSelfSq(idx, spark.read.parquet(sqProbe),
        grid, Seq("label"), k = 3, candidates = cSq * 2,
        sdcDims = math.max(1, dim / 4)))
    measure("coded-pq", () =>
      graft.ann.CodedKnnJoin.knnJoinSelfPq(idx, spark.read.parquet(pqProbe),
        books, Seq("label"), k = 3, candidates = cPq))
    spark.stop()
  }
}
