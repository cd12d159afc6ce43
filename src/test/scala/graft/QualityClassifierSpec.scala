package graft

import org.apache.spark.sql.functions._

import graft.text.QualityClassifier

/** Arithmetic + behavior checks for the in-plan Naive-Bayes quality
  * classifier (the DuckDB oracle checks engine parity on the driver
  * corpus; these check the math itself on hand-computable corpora).
  */
class QualityClassifierSpec extends SparkSpecBase {

  private def df(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "is_ref")
  }

  /** Reference implementation of the add-one-smoothed log-odds score. */
  private def brute(rows: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double, Long)] = {
    val toks = rows.map { case (id, t, r) =>
      (id, t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq, r)
    }
    val pos = toks.filter(_._3).flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val neg = toks.filterNot(_._3).flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val nPos = pos.values.sum.toDouble
    val nNeg = neg.values.sum.toDouble
    val v = (pos.keySet ++ neg.keySet).size.toDouble
    def r6(x: Double) = BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def w(t: String) = r6(math.log(
      ((pos.getOrElse(t, 0) + 1) / (nPos + v)) / ((neg.getOrElse(t, 0) + 1) / (nNeg + v))))
    toks.map { case (id, ts, _) =>
      val score = r6(ts.map(t => BigDecimal.valueOf(w(t))).sum.toDouble / ts.size)
      (id, (ts.size.toLong, score, if (score > 0) 1L else 0L))
    }.toMap
  }

  test("score matches the hand-computed NB log-odds on a tiny corpus") {
    val rows = Seq(
      (1L, "good clean prose here", true),
      (2L, "good words and more good words", true),
      (3L, "spam spam junk junk junk", false),
      (4L, "good spam mixed words here", false))
    val got = QualityClassifier.score(df(rows), "doc_id", "text", col("is_ref"))
      .select(col("doc_id"), col("n_tokens"), col("score"), col("keep"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got == brute(rows))
  }

  test("reference-slice tokens score positive, disjoint non-ref tokens negative") {
    val rows = Seq(
      (1L, "alpha beta gamma", true),
      (2L, "alpha beta delta", true),
      (3L, "noise garbage junk", false),
      (4L, "noise junk junk", false))
    val got = QualityClassifier.score(df(rows), "doc_id", "text", col("is_ref"))
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("scores are invariant to input partitioning") {
    val rows = (1L to 40L).map { i =>
      (i, s"tok${i % 7} tok${i % 5} shared tok${i % 3}", i % 2 == 0)
    }
    val base = QualityClassifier.score(df(rows), "doc_id", "text", col("is_ref"))
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val repart = QualityClassifier.score(df(rows).repartition(7), "doc_id", "text", col("is_ref"))
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base == repart)
  }
}
