package graft

import graft.operators.IncrementalAgg

class IncrementalAggSpec extends SparkSpecBase {

  test("merge of per-batch partials == full recompute (sum/count/min/max)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 5.0),
      ("a", 4L, 20.0), ("b", 5L, 7.0), ("c", 6L, 1.0))
      .toDF("k", "id", "v")
    def partials(df: org.apache.spark.sql.DataFrame) = df.groupBy($"k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"),
        min($"v").as("lo"), max($"v").as("hi"))
    // batches split by id parity — "c" appears only in the even batch
    val merged = IncrementalAgg.merge(
        Seq(partials(rows.filter($"id" % 2 === 0)),
          partials(rows.filter($"id" % 2 === 1))),
        keys = Seq("k"), sumCols = Seq("s", "n"),
        minCols = Seq("lo"), maxCols = Seq("hi"))
      .orderBy($"k")
      .as[(String, Double, Long, Double, Double)].collect().toList
    val full = partials(rows).orderBy($"k")
      .as[(String, Double, Long, Double, Double)].collect().toList
    assert(merged == full, s"merged=$merged full=$full")
  }

  test("merge refuses an empty partial list") {
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(Nil, keys = Seq("k"), sumCols = Seq("s"))
    }
  }
}
