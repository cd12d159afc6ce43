package graft

import org.apache.spark.sql.functions._

import graft.operators.HllSketch

/** The q_distinct_sketch DuckDB oracle checks engine parity; these
  * check the estimator itself: accuracy within the published HLL
  * error bound, partition invariance (register max is order-free),
  * and monotone response to cardinality.
  */
class HllSketchSpec extends SparkSpecBase {

  private def est(n: Long, parts: Int = 4): Double = {
    import spark.implicits._
    val df = (0L until n).map(i => ("g", s"k$i")).toDF("grp", "key")
      .repartition(parts)
    HllSketch.distinctSketch(df, Seq("grp"), col("key"))
      .select($"hll_est").as[Double].head()
  }

  test("estimate lands within 3 standard errors across cardinalities") {
    // sigma = 1.04/sqrt(M) ~= 18.4% for M=32; 3 sigma ~= 55%
    for (n <- Seq(200L, 1000L, 5000L)) {
      val e = est(n)
      val rel = math.abs(e - n) / n.toDouble
      assert(rel < 0.55, s"n=$n est=$e rel=$rel")
    }
  }

  test("estimate is partition-invariant and duplicate-insensitive") {
    import spark.implicits._
    val base = (0L until 1000L).map(i => ("g", s"k$i"))
    val dup = base ++ base ++ base // same key set, 3x multiplicity
    val e1 = est(1000L, parts = 1)
    val e2 = est(1000L, parts = 17)
    val e3 = HllSketch.distinctSketch(
        dup.toDF("grp", "key").repartition(7), Seq("grp"), col("key"))
      .select($"hll_est").as[Double].head()
    assert(e1 == e2 && e1 == e3, s"$e1 / $e2 / $e3")
  }

  test("registers cap at M and estimates order with cardinality") {
    import spark.implicits._
    val df = ((0L until 50L).map(i => ("small", s"s$i")) ++
      (0L until 5000L).map(i => ("big", s"b$i"))).toDF("grp", "key")
    val rows = HllSketch.distinctSketch(df, Seq("grp"), col("key"))
      .select($"grp", $"hll_est", $"n_regs_hit")
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(rows("small")._2 <= HllSketch.M && rows("big")._2 <= HllSketch.M)
    assert(rows("big")._1 > rows("small")._1)
  }
}
