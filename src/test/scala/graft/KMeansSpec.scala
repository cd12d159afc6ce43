package graft

import org.apache.spark.sql.functions._

import graft.ann.KMeans

class KMeansSpec extends SparkSpecBase {

  private def vecs = {
    import spark.implicits._
    // two well-separated blobs on the first two axes
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(1.1f, -0.1f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)),
      (11L, Array(0.1f, 0.9f, 0.0f)),
      (12L, Array(-0.1f, 1.1f, 0.0f)))
      .toDF("vec_id", "embedding")
  }

  private def seeds = {
    import spark.implicits._
    Seq((0L, Array(1.0, 0.0, 0.0)), (10L, Array(0.0, 1.0, 0.0)))
      .toDF("cid", "cv")
  }

  test("one Lloyd iteration lands centroids on the exact blob means") {
    val cents = KMeans.lloyd(vecs, "vec_id", "embedding", seeds, iters = 1)
      .orderBy(col("cid")).collect()
    assert(cents.length == 2)
    val c0 = cents(0).getSeq[Double](1)
    val c1 = cents(1).getSeq[Double](1)
    // float inputs are exact in binary (x.1f etc. are not, but their
    // double widenings are what both engines sum) — compare against
    // the same widen-sum-divide-round(9) arithmetic
    def mean(xs: Seq[Float]): Double = {
      val s = xs.map(x => BigDecimal(x.toDouble)
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      // Spark round(double, 9) = BigDecimal.valueOf + HALF_UP
      BigDecimal.valueOf(s / xs.length)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(c0(0) == mean(Seq(1.0f, 0.9f, 1.1f)))
    assert(c0(1) == mean(Seq(0.0f, 0.1f, -0.1f)))
    assert(c1(0) == mean(Seq(0.0f, 0.1f, -0.1f)))
    assert(c1(1) == mean(Seq(1.0f, 0.9f, 1.1f)))
  }

  test("decimal means make the fit partition-order independent") {
    def fit(parts: Int) =
      KMeans.lloyd(vecs.repartition(parts), "vec_id", "embedding", seeds, iters = 2)
        .orderBy(col("cid")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList)).toList
    assert(fit(1) == fit(7))
  }

  test("vector-state mean update equals the exploded formulation " +
      "(ragged rows, null elements, null vectors, any partitioning)") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(7)
    // ragged lengths, occasional null elements / null vectors, values
    // at awkward decimal boundaries
    val rows = (0 until 400).map { i =>
      val cell = (i % 7).toLong
      if (rnd.nextInt(20) == 0) (cell, null: Array[java.lang.Double])
      else {
        val len = 1 + rnd.nextInt(5)
        val v = Array.tabulate[java.lang.Double](len) { _ =>
          if (rnd.nextInt(15) == 0) null
          else java.lang.Double.valueOf(
            (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(6) - 3))
        }
        (cell, v)
      }
    }
    val df = rows.toDF("cell", "v").repartition(5)
    // the pre-round-17 exploded formulation, verbatim
    val old = df
      .select(col("cell"), posexplode(col("v").cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col("cell"), col("j"))
      .agg(round(sum(col("x").cast(DecimalType(28, 10))).cast("double") /
        count(lit(1)), 9).as("m"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("j"), col("m"))).as("_jm"))
      .select(col("cell").as("cid"),
        transform(array_sort(col("_jm")), e => e.getField("m")).as("cv"))
      .orderBy(col("cid")).collect()
      .map(r => (r.getLong(0), r.getSeq[java.lang.Double](1).toList)).toList
    import org.apache.spark.sql.graftshim.ColumnBridge
    val vecSum = ColumnBridge.column(
      graft.functions.expr.VecSumDecAgg(
        ColumnBridge.expression(col("v").cast("array<double>")))
        .toAggregateExpression())
    val nw = df
      .groupBy(col("cell"))
      .agg(vecSum.as("_sc"))
      .select(col("cell").as("cid"),
        zip_with(col("_sc.sums"), col("_sc.counts"),
          (s, c) => round(s.cast("double") / c, 9)).as("cv"))
      .filter(size(col("cv")) > 0)
      .orderBy(col("cid")).collect()
      .map(r => (r.getLong(0), r.getSeq[java.lang.Double](1).toList)).toList
    assert(nw == old)
  }

  test("clusters that lose all members drop out") {
    import spark.implicits._
    // both seeds sit in blob A's territory except one that captures all
    val farSeeds = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (99L, Array(100.0, 100.0, 100.0))) // captures nothing
      .toDF("cid", "cv")
    val cents = KMeans.lloyd(vecs, "vec_id", "embedding", farSeeds, iters = 1)
    assert(cents.select("cid").collect().map(_.getLong(0)).toSet == Set(0L))
  }
}
