package graft

import org.apache.spark.sql.functions._

import graft.text.{TextAnalysis, UnigramLm}

/** Hand-computed cases for the Gopher repetition signals and the
  * corpus-unigram LM score (the DuckDB oracles check engine parity on
  * the driver corpus; these check the arithmetic itself).
  */
class TextSignalsSpec extends SparkSpecBase {

  test("BpeishTokenCount kernel equals size(regexp_extract_all) incl. unicode") {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.ColumnBridge
    val texts = Seq(
      "", " ", "abc", "abc def", "a1b2", "123 456", "a-b.c!",
      "  leading and trailing  ", "tabs\tand\nnewlinesvt\fff\rcr",
      "mixed UPPER lower 0x9 #$%", "über café 中文 emoji 😀 end",
      "a" * 300 + "9" * 5 + "." * 4,
      "word, word; word: 42.5% (paren) [brack]")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val kernel = ColumnBridge.column(
      graft.functions.expr.BpeishTokenCount(ColumnBridge.expression(col("t"))))
    val bad = df
      .withColumn("k", kernel)
      .withColumn("r", size(graft.functions.TextFunctions.regexTokens(col("t"))).cast("long"))
      .filter(col("k") =!= col("r"))
      .count()
    assert(bad == 0L)
  }

  test("ArgMaxFirst picks the first maximum (the foldRight tie rule)") {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.ColumnBridge
    val cases = Seq(
      (Seq(3, 1, 2), 0), (Seq(1, 3, 2), 1), (Seq(2, 2, 1), 0),
      (Seq(0, 0, 0), 0), (Seq(1, 2, 2), 1), (Seq(-5, -2, -2), 1),
      (Seq.empty[Int], -1))
    val df = cases.zipWithIndex.map { case ((a, e), i) => (i.toLong, a, e) }
      .toDF("id", "arr", "expected")
    val kernel = ColumnBridge.column(graft.functions.expr.ArgMaxFirst(
      ColumnBridge.expression(col("arr"))))
    assert(df.withColumn("k", kernel).filter(col("k") =!= col("expected")).count() == 0L)
  }

  test("CodePointRangeCount equals the regexp_replace length diff incl. CJK") {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.ColumnBridge
    val texts = Seq(
      "", "plain ascii only", "中文", "mixed 中文 and ascii",
      "边界 一 鿿 ䷿ ꀀ", "emoji 😀 no han", "ü é ß")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val kernel = ColumnBridge.column(graft.functions.expr.CodePointRangeCount(
      ColumnBridge.expression(col("t")), 0x4e00, 0x9fff))
    val bad = df
      .withColumn("k", kernel)
      .withColumn("r", (length(col("t")) -
        length(regexp_replace(col("t"), "[\\u4e00-\\u9fff]", ""))).cast("long"))
      .filter(col("k") =!= col("r"))
      .count()
    assert(bad == 0L)
  }

  test("repetition: ratios match hand counts") {
    import spark.implicits._
    val d = Seq((1L, "a a a b"), (2L, "z"), (3L, "u v w x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d, "doc_id", "text")
      .select($"doc_id", $"n_words", $"dup_word_ratio", $"top_word_ratio",
        $"dup_bigram_ratio", $"top_bigram_ratio")
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Double, Double, Double)].collect().toList
    // doc 1: words [a,a,a,b] → dup 2/4, top 3/4;
    //        bigrams [a a, a a, a b] → dup 1/3, top 2/3
    // doc 2: one token; the single truncated "bigram" is unique
    // doc 3: all distinct → dup 0, top 1/n
    assert(out == List(
      (1L, 4L, 0.5, 0.75, 0.333333, 0.666667),
      (2L, 1L, 0.0, 1.0, 0.0, 1.0),
      (3L, 4L, 0.0, 0.25, 0.0, 0.333333)))
  }

  test("repetition: fold-based top count equals brute force on varied docs") {
    import spark.implicits._
    val texts = Seq(
      "the the the cat cat dog", "one two three four five",
      "x y x y x y x y", "solo", "a b a b c c c c c b")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysis.repetition(d, "doc_id", "text")
      .select($"doc_id", $"top_word_ratio").as[(Long, Double)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split(" ")
      val brute = toks.groupBy(identity).values.map(_.length).max.toDouble / toks.length
      val expected = BigDecimal.valueOf(brute)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(i.toLong) == expected, s"doc $i ('$t')")
    }
  }

  test("TokenRunStats kernel equals brute-force distinct/top counts on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(1 + rnd.nextInt(12))}").mkString(" "))
    }
    val got = TextAnalysis.repetition(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"dup_word_ratio", $"top_word_ratio")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val counts = toks.groupBy(identity).values.map(_.length)
      val want = (r6((toks.length - counts.size).toDouble / toks.length),
        r6(counts.max.toDouble / toks.length))
      assert(got(id) == want, s"doc $id ('$text')")
    }
  }

  test("NgramMinMaxHash kernel equals the HOF ngram-hash formulation") {
    import spark.implicits._
    import graft.functions.TextFunctions.{charNgrams, normText, portableHash}
    import org.apache.spark.sql.graftshim.ColumnBridge
    val rnd = new scala.util.Random(11)
    val vocab = Seq("the", "quick", "brown", "fox", "日本語", "düsseldorf", "a", "émigré")
    val docs = (0 until 120).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } ++ Seq((900L, ""), (901L, "short"), (902L, "exactly8"), (903L, "九字の日本語文だ"))
    val base = docs.toDF("doc_id", "text")
      .withColumn("_t", normText($"text"))
    val kernel = ColumnBridge.column(graft.functions.expr.NgramMinMaxHash(
      ColumnBridge.expression(col("_t")), 8))
    val hof = transform(charNgrams($"_t", 8), s => portableHash(s))
    val rows = base
      .select($"doc_id",
        element_at(kernel, 1).as("kmin"), element_at(kernel, 2).as("kmax"),
        array_min(hof).as("hmin"), array_max(hof).as("hmax"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == docs.length)
    rows.foreach { case (id, kmin, kmax, hmin, hmax) =>
      assert(kmin == hmin && kmax == hmax, s"doc $id")
    }
  }

  test("unigram LM: hand-computed NLL on a 2-doc corpus") {
    import spark.implicits._
    val d = Seq((1L, "x x"), (2L, "x y")).toDF("doc_id", "text")
    val out = UnigramLm.score(d, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Double)].collect().toList
    // counts: x=3, y=1, N=4 → nll(x) = -ln(3/4) = 0.287682,
    // nll(y) = -ln(1/4) = 1.386294 (rounded to 6 before the exact sum)
    assert(out == List(
      (1L, 2L, 0.287682, 0.287682),
      (2L, 2L, 0.836988, 1.386294))) // (0.287682 + 1.386294) / 2
    Barrier.release(spark)
  }

  test("unigram LM: scoreFromTokenCounts over the persisted projection " +
      "equals score bit-for-bit (counts-collapsed decimal path)") {
    import spark.implicits._
    import graft.streaming.StreamingQualityClassifier
    // real corpus: wide vocab, repeated tokens (cnt > 1 exercises the
    // nll × cnt decimal multiply), rare tokens for max_nll
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaText = UnigramLm.score(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "avg_nll", "max_nll")
      .as[(Long, Long, Double, Double)].collect().toSet
    val tokCnt = StreamingQualityClassifier.buildTokenCounts(docs, "doc_id", "text")
    val freq = UnigramLm.buildFreq(tokCnt)
    val viaCounts = UnigramLm.scoreFromTokenCounts(tokCnt, "doc_id", freq)
      .select("doc_id", "n_tokens", "avg_nll", "max_nll")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(viaCounts == viaText)
    assert(tokCnt.filter(col("cnt") > 1).count() > 0,
      "no repeated tokens — the nll × cnt decimal path untested")
    Barrier.release(spark)
  }

  test("unigram LM: rare-token documents score higher") {
    import spark.implicits._
    val common = Seq.fill(20)("alpha beta gamma").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val rare = Seq((100L, "zeta omega psi"))
    val d = (common ++ rare).toDF("doc_id", "text")
    val scores = UnigramLm.score(d, "doc_id", "text")
      .select($"doc_id", $"avg_nll").as[(Long, Double)].collect().toMap
    assert(scores(100L) > scores(0L))
    Barrier.release(spark)
  }

  test("gopher filter: each rule trips its own flag bit") {
    import spark.implicits._
    // mean word length must stay in [3,10] on the passing docs — mix
    // short stopwords with 6+ char filler
    val longOk = (("the of and to in is it that for a " * 3) +
      (1 to 31).map(i => s"wordish$i").mkString(" ")).trim
    val d = Seq(
      (1L, longOk),                                   // passes everything
      (2L, "tiny document the of and"),               // <25 words → bit 0
      (3L, ("xxxx " * 40).trim),                      // all-dup, no stopwords → bits 2+3 (40 words passes length)
      (4L, ("that for " * 20).trim)                   // stopword-rich but dup 38/40 → bit 3 only
    ).toDF("doc_id", "text")
    val byId = TextAnalysis.gopherFilter(d, "doc_id", "text")
      .select($"doc_id", $"flags", $"keep")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L) == ((0L, true)), s"doc 1 got ${byId(1L)}")
    assert((byId(2L)._1 & 1L) == 1L && !byId(2L)._2)
    assert((byId(3L)._1 & 4L) == 4L && (byId(3L)._1 & 8L) == 8L)
    assert(byId(4L)._1 == 8L && !byId(4L)._2)
  }

  test("gopher filter: keep is exactly flags == 0 on the driver corpus shape") {
    import spark.implicits._
    val d = (0L until 200L).map { i =>
      val words = (0 until (10 + (i % 60)).toInt).map(j => s"wordish${(i + j) % 17}")
      (i, (if (i % 3 == 0) "the of and " else "") + words.mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.gopherFilter(d, "doc_id", "text")
    assert(out.filter($"keep" =!= ($"flags" === 0L)).count() == 0)
    // the rule set must discriminate, not all-pass or all-fail
    val kept = out.filter($"keep").count()
    assert(kept > 0 && kept < 200, s"kept $kept of 200")
  }
}
