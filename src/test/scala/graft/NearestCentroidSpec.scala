package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

class NearestCentroidSpec extends SparkSpecBase {

  test("kernel argmin matches the declarative (dist, cell) window pick") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val cents = Seq.tabulate(9) { c =>
      (c.toLong * 10, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("cid", "cv")

    val kernel = Ann.ivfAssign(corpus, "vec_id", "embedding", cents, "cid", "cv")
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap

    // declarative reference: score all pairs, window argmin by (dist, cell)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("_d"), col("cell"))
    val expected = corpus
      .crossJoin(cents.select(col("cid").as("cell"), col("cv")))
      .withColumn("_d", graft.functions.VectorFunctions.l2SqD(col("embedding"), col("cv")))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap

    assert(kernel == expected)
  }

  test("exact-tie centroids resolve to the lowest cell id") {
    import spark.implicits._
    val v = Array(1.0f, 2.0f, 3.0f)
    val corpus = Seq((0L, v)).toDF("vec_id", "embedding")
    // two identical centroids with different ids: both distances are
    // bit-identical, the pick must be the lower id
    val cents = Seq((7L, Array(0.5, 0.5, 0.5)), (3L, Array(0.5, 0.5, 0.5)))
      .toDF("cid", "cv")
    val cell = Ann.ivfAssign(corpus, "vec_id", "embedding", cents, "cid", "cv")
      .select("cell").as[Long].head()
    assert(cell == 3L)
  }

  test("oversized centroid sets are refused by the nlist bound") {
    import spark.implicits._
    val corpus = Seq((0L, Array(1.0f))).toDF("vec_id", "embedding")
    val cents = spark.range(70000)
      .select(col("id").as("cid"), array(col("id").cast("double")).as("cv"))
    assertThrows[IllegalArgumentException](
      Ann.ivfAssign(corpus, "vec_id", "embedding", cents, "cid", "cv"))
  }
}
