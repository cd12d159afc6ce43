package graft

class GraftExtensionsSpec extends SparkSpecBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("vector_dot / vector_l2sq from SQL match the column API") {
    val r = spark.sql(
      """SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vector_l2sq(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS l
      """.stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 8.0)
  }

  test("word_shingles from SQL") {
    val r = spark.sql(
      "SELECT word_shingles(array('a','b','c','d'), 3) AS s").collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
  }

  test("topk aggregate from SQL") {
    val r = spark.sql(
      """SELECT topk(s, id, 2) AS top FROM VALUES
        |  (0.5D, 1L), (0.9D, 2L), (0.9D, 3L), (0.1D, 4L) AS t(s, id)
      """.stripMargin).collect().head
    val top = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(top == Seq((0.9, 2L), (0.9, 3L))) // ties broken by lowest id
  }

  test("SQL plan uses the same codegen kernel on real data") {
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val df = spark.sql(
      """SELECT a.vec_id, vector_dot(a.embedding, b.embedding) AS d
        |FROM emb a JOIN emb b ON b.vec_id = 0""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("vector_dot"))
    assert(df.count() == 500)
  }
}
