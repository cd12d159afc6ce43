package graft

import graft.text.Bm25

class Bm25Spec extends SparkSpecBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark runs fast"),         // high tf for 'spark'
      (2L, "spark is a engine for big data work"), // one hit, longer doc
      (3L, "ducks swim in the pond all day long"), // no hits
      (4L, "spark"))                               // one hit, shortest doc
      .toDF("doc_id", "text")
  }

  test("hit docs only, ranked by tf with length normalization") {
    import spark.implicits._
    val out = Bm25.score(docs, "doc_id", "text", Seq("spark"))
      .select("doc_id", "score").as[(Long, Double)].collect()
    val ranked = out.sortBy(-_._2).map(_._1).toSeq
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L)) // doc 3 absent
    // repeated term beats single; shortest single-hit doc beats longer one
    assert(ranked.head == 1L)
    assert(ranked.indexOf(4L) < ranked.indexOf(2L))
    assert(out.forall(_._2 > 0))
  }

  test("multi-term queries sum per-term contributions") {
    import spark.implicits._
    val one = Bm25.score(docs, "doc_id", "text", Seq("spark"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    val two = Bm25.score(docs, "doc_id", "text", Seq("spark", "pond"))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(two.contains(3L)) // 'pond' brings doc 3 in
    assert(math.abs(two(1L) - one(1L)) < 1e-9) // unrelated term unchanged
  }
}
