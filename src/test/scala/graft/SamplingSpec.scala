package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpecBase {

  private lazy val df = {
    import spark.implicits._
    (0L until 10000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "grp")
  }

  test("hash sample hits the rate within tolerance and is reproducible") {
    val n1 = Sampling.hashSample(df, "id", 0.2).count()
    assert(math.abs(n1 / 10000.0 - 0.2) < 0.02)
    // same rows regardless of partitioning (hash-of-id, no RNG state)
    val ids1 = Sampling.hashSample(df, "id", 0.2).select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.hashSample(df.repartition(13), "id", 0.2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("nested rates: a lower-rate sample is a subset of a higher-rate one") {
    val small = Sampling.hashSample(df, "id", 0.1).select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(df, "id", 0.5).select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }

  test("temperature sampling upweights rare strata toward the alpha share") {
    import spark.implicits._
    // 9500 "big" vs 500 "rare": natural share 5%; alpha=0.5 tempered
    // target share = sqrt(500)/(sqrt(9500)+sqrt(500)) ≈ 18.7%
    val skewed = (0L until 10000L)
      .map(i => (i, if (i < 500) "rare" else "big")).toDF("id", "grp")
    val out = Sampling.temperature(skewed, "id", "grp",
      alpha = 0.5, budgetFrac = 0.3)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    // rare stratum keep rate should far exceed its natural sampling
    // rate (0.3), while big is downsampled below it
    val rareRate = byGrp("rare") / 500.0
    val bigRate = byGrp("big") / 9500.0
    assert(rareRate > 0.8, s"rare keep rate $rareRate")
    assert(bigRate < 0.3, s"big keep rate $bigRate")
    // tempered share realized approximately
    val share = byGrp("rare").toDouble / (byGrp("rare") + byGrp("big"))
    assert(share > 0.12 && share < 0.25, s"tempered share $share")
  }

  test("split: total, disjoint, proportional, and independent of the sample hash") {
    import spark.implicits._
    val out = Sampling.split(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byS = out.groupBy("split").count().as[(String, Long)].collect().toMap
    // every row assigned exactly once (withColumn keeps row count)
    assert(byS.values.sum == 10000L)
    assert(math.abs(byS("train") / 10000.0 - 0.8) < 0.02)
    assert(math.abs(byS("val") / 10000.0 - 0.1) < 0.01)
    assert(math.abs(byS("test") / 10000.0 - 0.1) < 0.01)
    // stable under repartitioning
    val a = out.select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.split(df.repartition(17), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    // salted: a 10% hashSample must NOT land inside one split — its
    // train share should match the population's, not collapse to 0/1
    val sampled = Sampling.hashSample(df, "id", 0.1)
    val sTrain = Sampling.split(sampled, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter($"split" === "train").count()
    val frac = sTrain.toDouble / sampled.count()
    assert(frac > 0.7 && frac < 0.9, s"sampled train share $frac")
  }

  test("split: guards — negative fraction, column collision, outCol rename") {
    // a negative fraction sums to 1 but makes thresholds non-monotonic
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("a" -> 0.9, "b" -> 0.2, "c" -> -0.1))
    }
    // refuse to silently overwrite a pre-existing "split" column
    val withSplit = Sampling.split(df, "id", Seq("x" -> 0.5, "y" -> 0.5))
    intercept[IllegalArgumentException] {
      Sampling.split(withSplit, "id", Seq("x" -> 0.5, "y" -> 0.5))
    }
    // outCol makes the second assignment coexist with the first
    val two = Sampling.split(withSplit, "id", Seq("x" -> 0.5, "y" -> 0.5), outCol = "split2")
    assert(two.columns.contains("split") && two.columns.contains("split2"))
    assert(two.filter(org.apache.spark.sql.functions.col("split") =!=
      org.apache.spark.sql.functions.col("split2")).count() == 0)
  }

  test("stratified rates apply per stratum") {
    import spark.implicits._
    val out = Sampling.stratified(df, "id", "grp", Map("a" -> 0.5), defaultRate = 0.05)
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    val aTotal = df.filter($"grp" === "a").count().toDouble
    val bTotal = df.filter($"grp" === "b").count().toDouble
    assert(math.abs(byGrp("a") / aTotal - 0.5) < 0.05)
    assert(math.abs(byGrp.getOrElse("b", 0L) / bTotal - 0.05) < 0.02)
  }

  test("tokenBudget: quality-ranked greedy cut per group, running total rule") {
    import spark.implicits._
    // src a: ranked by score desc then id — (3,.9,100)(1,.8,150)(2,.8,80)(4,.1,100)
    //   cums 100,250,330,430 -> budget 330 keeps 3,1,2 (4 over)
    // src b: first row alone exceeds the budget -> whole group empty
    // src c: exact-boundary row kept (cum == budget)
    val rows = Seq(
      (1L, "a", 0.8, 150L), (2L, "a", 0.8, 80L),
      (3L, "a", 0.9, 100L), (4L, "a", 0.1, 100L),
      (5L, "b", 0.9, 400L), (6L, "b", 0.5, 10L),
      (7L, "c", 0.7, 330L)).toDF("id", "src", "score", "toks")
    val out = Sampling.tokenBudget(rows, "id", "src", "score", "toks", budget = 330L)
      .select($"id", $"cum_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 100L, 1L -> 250L, 2L -> 330L, 7L -> 330L))
  }

  test("tokenBudget: a row over budget poisons the whole suffix (cumulative rule)") {
    import spark.implicits._
    // the big row lands mid-ranking; the smaller row after it would
    // fit under a knapsack rule but NOT under the running-total rule —
    // which is the deterministic, window-expressible (and
    // oracle-replayable) semantic
    val rows = Seq(
      (1L, "a", 0.9, 100L), (2L, "a", 0.5, 500L), (3L, "a", 0.1, 50L))
      .toDF("id", "src", "score", "toks")
    val kept = Sampling.tokenBudget(rows, "id", "src", "score", "toks", budget = 200L)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
