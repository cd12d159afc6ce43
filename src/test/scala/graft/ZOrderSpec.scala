package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** The q_zorder oracle checks the curve arithmetic; these check the
  * POINT of the layout: a z-clustered table serves selective 2-D
  * range scans by row-group skipping on BOTH keys, where a
  * single-key sort prunes only its own column.
  */
class ZOrderSpec extends SparkSpecBase {

  private val Bits = 16

  test("zValue interleaves bits exactly (hand cases + brute force)") {
    import spark.implicits._
    def brute(a: Long, b: Long): Long = {
      var z = 0L
      (0 until Bits).foreach { j =>
        z |= ((a >> j) & 1L) << (2 * j)
        z |= ((b >> j) & 1L) << (2 * j + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 0L),
      (12345L, 54321L), (65535L, 65535L)) ++
      (1L to 50L).map(i => (i * 131 % 65536, i * 977 % 65536))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), Bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(got((a, b)) == brute(a, b), s"z($a,$b)")
    }
    // hand case: a=1 → bit 0, b=1 → bit 1
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L)
  }

  test("zBucket keeps high bits and preserves z-order") {
    import spark.implicits._
    val rows = (0L until 1024L).map(i => (i * 37 % 256, i * 91 % 256))
    val df = rows.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 8).as("z"))
      .select(col("z"), ZOrder.zBucket(col("z"), 8, 16).as("zb"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    df.foreach { case (z, zb) => assert(zb == (z >> 12)) }
    assert(df.map(_._2).distinct.sorted.length > 1)
  }

  test("zBucket rejects nBuckets > 4^bits (negative shift would be masked)") {
    // Java/Spark shiftright masks the count, so 2*bits - log2(nBuckets) < 0
    // would silently collapse everything into bucket 0 — must fail instead
    val e = intercept[IllegalArgumentException] {
      ZOrder.zBucket(col("z"), 2, 32) // 4^2 = 16 < 32
    }
    assert(e.getMessage.contains("4^bits"))
    ZOrder.zBucket(col("z"), 2, 16) // boundary: log2(16) == 2*2 — allowed
  }

  /** Rows the scan node actually emitted (post row-group skipping). */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      .flatMap(_.collect { case s: FileSourceScanExec => s }) ++
      plan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScan in:\n$plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-layout row-group-skips 2-D range scans; single-key sort cannot") {
    val dir = Files.createTempDirectory("zorder").toString
    import spark.implicits._
    // 200k rows over a 1024×1024 key grid; small row groups make
    // skipping visible at test scale (production uses the defaults)
    val n = 200000
    val base = spark.range(n.toLong)
      .select(
        (col("id") * 7919 % 1024).as("ka"),
        (col("id") * 104729 % 1024).as("kb"),
        col("id").as("payload"))
    val rg = Map("parquet.block.size" -> "32768")
    // z-clustered layout
    ZOrder.writeLayout(base, "ka", "kb", bits = 10,
      nBuckets = 16, path = s"$dir/z", writerOptions = rg)
    // single-key layout: same file count and row-group size, sorted
    // by ka only
    base.repartition(16, col("ka"))
      .sortWithinPartitions("ka")
      .write.options(rg).mode("overwrite").parquet(s"$dir/single")
    // a 128×128 box aligned to 128 in both keys — one contiguous
    // z-range, the curve's best case and the single-key sort's
    // blind spot (it must read every kb for ka ∈ [256,383])
    def boxFilter(t: DataFrame) =
      t.filter(col("ka").between(256, 383) && col("kb").between(256, 383))
    val zRows = scanOutputRows(boxFilter(spark.read.parquet(s"$dir/z")))
    val sRows = scanOutputRows(boxFilter(spark.read.parquet(s"$dir/single")))
    // the box holds ~1.6% of rows; the z-layout must scan a small
    // fraction and beat the single-key layout by a wide margin
    assert(zRows < n / 10, s"z-layout scan read $zRows of $n rows")
    assert(zRows * 2 < sRows,
      s"z-layout ($zRows) should prune far more than single-key ($sRows)")
    // correctness: both layouts return identical boxes
    val zBox = boxFilter(spark.read.parquet(s"$dir/z"))
      .select("payload").as[Long].collect().sorted.toSeq
    val sBox = boxFilter(spark.read.parquet(s"$dir/single"))
      .select("payload").as[Long].collect().sorted.toSeq
    assert(zBox == sBox && zBox.nonEmpty)
  }
}
