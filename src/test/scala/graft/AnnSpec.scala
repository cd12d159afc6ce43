package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

class AnnSpec extends SparkSpecBase {

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 8)

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select("qid", "vec_id").as[(Long, Long)].collect().toSet
  }

  test("multi-probe recall >= single-probe recall against brute force") {
    val truth = hits(Ann.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val single = hits(Ann.lshSearch(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", nPlanes = 6, dim = 64, k = 10)
      .withColumnRenamed("bucket", "_b"))
    val multi = hits(Ann.lshSearchMultiProbe(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", nPlanes = 6, dim = 64, k = 10))
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    assert(rMulti >= rSingle)
    assert(rMulti > 0.15, s"multi-probe recall $rMulti suspiciously low")
  }

  test("ivf search agrees with brute force when probing all cells") {
    import spark.implicits._
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val nCells = cents.count().toInt
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
    val q = emb.filter(col("vec_id") === 3L).select(col("embedding").as("qv"))
    val ivfAll = Ann.ivfSearch(assigned, "vec_id", "embedding", cents, "cid", "cv",
        q, "qv", nprobe = nCells, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Ann.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 3L), "vec_id", "embedding", k = 5)
      .select("vec_id").as[Long].collect().toSeq
    // brute force excludes the query itself; ivf search does not, so
    // its post-filter list is one shorter — compare the common prefix
    val ivfOthers = ivfAll.filter(_ != 3L)
    assert(ivfOthers == brute.take(ivfOthers.length))
  }
}
