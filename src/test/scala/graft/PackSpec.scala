package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.TextQueries

/** Sequence packing (ta_pack): the two-phase sharded prefix sum must
  * equal the single-window formulation and must actually fan the
  * window parallelism out to nShards per language.
  */
class PackSpec extends SparkSpecBase {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val lang = Seq("en", "zh", "de")(i % 3)
      val words = Seq.fill(1 + (i * 7) % 23)(s"w${i % 11}").mkString(" ")
      (i.toLong, lang, words)
    }.toDF("doc_id", "lang", "text")
  }

  test("two-phase pack equals single-window reference") {
    val df = docs(400)
    val got = TextQueries.pack(df, nShards = 8)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

    // reference: one window per lang ordered by (shard, doc_id)
    import graft.functions.TextFunctions._
    val shard = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(8L))
    val w = Window.partitionBy(col("lang")).orderBy(col("shard"), col("doc_id"))
    val want = df
      .select(col("doc_id"), col("lang"),
        size(wsTokens(normText(col("text")))).cast("long").as("n_tokens"))
      .withColumn("shard", shard)
      .withColumn("cum", sum(col("n_tokens"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / 4096))
      .withColumn("pack_offset", (col("cum") - col("n_tokens")) % 4096)
      .withColumn("end_pack_id", floor((col("cum") - 1) / 4096))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"),
        col("pack_offset"), col("end_pack_id"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

    assert(got == want)
  }

  test("window partition key includes the shard (parallelism = nShards per lang)") {
    val plan = TextQueries.pack(docs(100), nShards = 8)
      .queryExecution.optimizedPlan.toString
    // the big window (the one over doc rows) must partition by shard,
    // not lang alone — lang alone serializes a 100 TB corpus into ~5
    // sequential cumsums
    val bigWindow = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("local_cum")).toSeq
    assert(bigWindow.nonEmpty, s"no local_cum window in plan:\n$plan")
    assert(bigWindow.forall(l => l.contains("shard")),
      s"doc-row window not sharded:\n${bigWindow.mkString("\n")}")
  }

  test("no (lang, shard) slice exceeds ~2x its fair share of rows") {
    val n = 3000
    val nShards = 8
    import graft.functions.TextFunctions._
    val shard = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(nShards.toLong))
    val sizes = docs(n).withColumn("shard", shard)
      .groupBy("lang", "shard").count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.length == 3 * nShards, s"expected all slices populated, got ${sizes.length}")
    val fair = n.toDouble / (3 * nShards)
    assert(sizes.max <= 2 * fair,
      s"skewed shard: max=${sizes.max} fair=$fair")
  }

  test("pack layout is contiguous: offsets line up head-to-tail per lang") {
    // reconstruct the concat order (lang, shard, doc_id) and assert
    // each doc starts exactly where the previous one ended (mod 4096
    // bin arithmetic is derived from the same cum, so checking cum
    // continuity covers pack_id/pack_offset/end_pack_id coherence)
    val out = TextQueries.pack(docs(300), nShards = 8)
    val rows = out
      .withColumn("shard",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(8L)))
      .select("lang", "shard", "doc_id", "n_tokens", "pack_id", "pack_offset", "end_pack_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2, t._3))
    rows.groupBy(_._1).foreach { case (_, docsInLang) =>
      var cum = 0L
      docsInLang.foreach { case (_, _, id, nTok, packId, packOff, endPackId) =>
        assert(packId == cum / 4096, s"doc $id pack_id")
        assert(packOff == cum % 4096, s"doc $id pack_offset")
        cum += nTok
        assert(endPackId == (cum - 1) / 4096, s"doc $id end_pack_id")
      }
    }
  }
}
