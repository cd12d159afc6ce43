package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bucketing, Skew}

class OperatorsSpec extends SparkSpecBase {

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    // one monster key (0) plus a long tail — the salting target
    val df = ((1 to 5000).map(i => (0L, i.toDouble)) ++
      (1 to 500).map(i => (i.toLong % 7 + 1, i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", saltBuckets = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("salted join equals direct join") {
    import spark.implicits._
    val big = ((1 to 2000).map(i => (0L, i)) ++ (1 to 100).map(i => (1L, i)))
      .toDF("k", "payload")
    val small = Seq((0L, "hot"), (1L, "cold")).toDF("k", "name")
    val direct = big.join(small, "k").groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 4)
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("key histogram surfaces the heavy key") {
    import spark.implicits._
    val df = ((1 to 900).map(_ => 7L) ++ (101 to 200).map(_.toLong)).toDF("k")
    val top = Skew.keyHistogram(df, col("k"), 1).collect().head
    assert(top.getAs[Long]("key") == 7L)
    assert(top.getAs[Double]("share") == 0.9)
  }

  test("bucketed join plans with no shuffle exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Seq("bk_a", "bk_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (loc.exists()) rm(loc)
    }
    Bucketing.writeBucketed(a, "bk_a", "k", 4, sortCols = Seq("k"))
    Bucketing.writeBucketed(b, "bk_b", "k", 4, sortCols = Seq("k"))
    val joined = Bucketing.bucketedJoin(spark, "bk_a", "bk_b", "k")
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"plan:\n$plan")
    assert(joined.count() == 1000)
  }
}
