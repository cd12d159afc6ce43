package graft

import graft.dedup.Dedup

class DedupSpec extends SparkSpecBase {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "the quick  brown fox jumps over the lazy dog "), // ws-normalized dup of 1
      (3L, "en", "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
      (4L, "en", "completely different content about spark engines and shuffles"),
      (5L, "fr", "the quick brown fox jumps over the lazy dog"))   // dup text, other block
      .toDF("doc_id", "lang", "text")
  }

  test("exact dedup groups whitespace-normalized duplicates, keeps min id") {
    import spark.implicits._
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() == 3) // 1≡2≡5 collapse into one survivor (global, unblocked)
    val survivor = out.filter($"n_copies" === 3).select("doc_id").as[Long].head()
    assert(survivor == 1L)
  }

  test("word-shingle jaccard finds the near-dup pair within its block") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", n = 3, threshold = 0.5)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical after normalization
    assert(pairs.contains((1L, 3L))) // one word differs
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // fr block isolated
  }

  test("minhash LSH surfaces exact-dup candidates") {
    import spark.implicits._
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text",
        shingleLen = 3, nHashes = 16, nBands = 4)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)))
    assert(cand.contains((1L, 5L))) // minhash has no block column — full-corpus candidates
  }

  test("simhash: identical docs hamming 0, near-dups close, pairs blocked") {
    import spark.implicits._
    val fp = Dedup.simHash(docs, "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 16)

    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", "lang", maxHamming = 3)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 5L)) // fr block isolated
  }

  test("packed simhash equals the per-bit majority computed by hand") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64, lit}
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark shuffles data between executor partitions again and again"),
      (3L, "a a a b")) // heavy multiplicity exercises token weighting
    val got = Dedup.simHash(texts.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    // reproduce with Spark's own xxhash64 (same seed/impl), majority per bit
    texts.foreach { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").toSeq
      val hashes = toks.toDF("t").select(xxhash64(col("t")))
        .collect().map(_.getLong(0))
      val want = (0 until 64).map { i =>
        val cnt = hashes.count(h => ((h >> i) & 1L) == 1L)
        if (2 * cnt > hashes.length) 1L << i else 0L
      }.sum
      assert(got(id) == want, s"doc $id")
    }
  }

  test("Md5Hash64 kernel == the portable hex/conv formulation == JVM md5 prefix") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val toks = Seq("spark", "table", " Mixed Case ", "émoji🎉", "", "123", "a b")
    val df = toks.toDF("t")
    val viaKernel = df.select(Dedup.portableHash64(col("t"))).collect().map(_.getLong(0))
    val viaExprs = df.select(
      shiftleft(conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(md5(col("t")), 9, 8), 16, 10).cast("long"))
    ).collect().map(_.getLong(0))
    val viaJvm = toks.map { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (0 until 8).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xffL))
    }
    assert(viaKernel.toSeq == viaExprs.toSeq)
    assert(viaKernel.toSeq == viaJvm)
  }

  test("duplicateSpans: cross-doc windows counted, within-doc repeats not") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h i j"),     // shares the a..h window with 2
      (2L, "a b c d e f g h x y"),
      (3L, "p q r s t u v w z0 z1"),   // unique
      (4L, "r r r r r r r r r r"))     // repeats internally, unique text
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(d, "doc_id", "text", span = 8)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // 10 tokens → 3 windows each; only window "a b c d e f g h" (pos 0)
    // is shared between docs 1 and 2
    assert(out.toList == List(
      (1L, 3L, 1L, 0.333333), (2L, 3L, 1L, 0.333333),
      (3L, 3L, 0L, 0.0), (4L, 3L, 0L, 0.0)))
  }

  test("removeDuplicateSpans: covered tokens dropped from every copy, " +
      "overlaps merged, short docs truncate") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f"),          // fully duplicated by 3
      (2L, "x y a b c q"),          // shares only window "a b c" (pos 2)
      (3L, "a b c d e f"),          // identical to 1
      (4L, "z q"),                  // shorter than span: one truncated window, unique
      (5L, null.asInstanceOf[String])) // null text: dropped
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text", span = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toList
    // docs 1/3: every window duplicated → everything removed (the
    // paper's shape: no copy survives). doc 2: window at pos 2 covers
    // tokens 2..4 → "x y q" kept. doc 4 untouched.
    assert(out == List(
      (1L, 6L, 6L, ""), (2L, 6L, 3L, "x y q"),
      (3L, 6L, 6L, ""), (4L, 2L, 0L, "z q")))
    Barrier.release(spark)
  }

  test("semanticPairs: pairs only within a cluster, above threshold") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.98f, 0.05f)), (2L, Array(0.95f, -0.05f)),
      (10L, Array(0.0f, 1.0f)), (11L, Array(0.05f, 0.98f)), (12L, Array(-0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val seeds = Seq((0L, Array(1.0, 0.0)), (10L, Array(0.0, 1.0))).toDF("cid", "cv")
    val pairs = Dedup.semanticPairs(vecs, "vec_id", "embedding", seeds,
        iters = 2, threshold = 0.9)
      .select($"ida", $"idb").as[(Long, Long)].collect().toSet
    // tight-cluster pairs survive; 12 is in cluster B but below 0.9
    // cosine to its members; nothing crosses clusters
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L)))
    Barrier.release(spark)
  }

  test("connectedGroups: transitive closure over pairs, min-id labels") {
    import spark.implicits._
    // component {1,2,3,4} is a CHAIN (diameter 3 — exercises multiple
    // propagation rounds), {10,11} a pair; 99 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("ida", "idb")
    val out = Dedup.connectedGroups(pairs, "ida", "idb", idOut = "doc_id")
      .orderBy($"doc_id")
      .as[(Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
    Barrier.release(spark)
  }

  test("survivorsByScore: max score wins, ties to min id, one keep per group") {
    import spark.implicits._
    val groups = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // group 1: scores 5,9,9 → survivor 2
      (10L, 10L, 2L), (11L, 10L, 2L))           // group 10: scores 4,4 → survivor 10 (tie)
      .toDF("doc_id", "group_id", "group_size")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 4L))
      .toDF("doc_id", "n_chars")
    val out = Dedup.survivorsByScore(groups, "doc_id", scores, "n_chars")
      .orderBy($"doc_id")
      .select("doc_id", "group_id", "keep").as[(Long, Long, Int)].collect().toList
    assert(out == List(
      (1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 0),
      (10L, 10L, 1), (11L, 10L, 0)))
  }

  test("survivorsByScore: unscored group members stay in the manifest (nulls last)") {
    import spark.implicits._
    val groups = Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), // 3 is missing from scores
      (10L, 10L, 2L), (11L, 10L, 2L))           // BOTH unscored → min id keeps
      .toDF("doc_id", "group_id", "group_size")
    val scores = Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "n_chars")
    val out = Dedup.survivorsByScore(groups, "doc_id", scores, "n_chars")
      .orderBy($"doc_id")
      .select("doc_id", "group_id", "keep").as[(Long, Long, Int)].collect().toList
    // doc 3 must appear (keep=0 — a scored sibling outranks it); the
    // all-null group keeps its smallest id deterministically
    assert(out == List(
      (1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 0),
      (10L, 10L, 1), (11L, 10L, 0)))
  }

  test("incrementalMatches: batch-vs-corpus collisions equal the self-join " +
      "candidates crossing the split; zero-match batch docs surface with n_dups=0") {
    import spark.implicits._
    // ids 1..5 plus a unique batch doc 7; batch = odd ids, corpus = even
    val all = docs.unionByName(Seq(
      (7L, "en", "entirely novel sentence with no shingle overlap anywhere"))
      .toDF("doc_id", "lang", "text"))
    val isBatch = $"doc_id" % 2 === 1
    val corpusSigs = Dedup.minHashSignatures(
      all.filter(!isBatch), "doc_id", "text", shingleLen = 3, nHashes = 16)
    val batchSigs = Dedup.minHashSignatures(
      all.filter(isBatch), "doc_id", "text", shingleLen = 3, nHashes = 16)
    val got = Dedup.incrementalMatches(corpusSigs, batchSigs, "doc_id",
        nHashes = 16, nBands = 4)
      .orderBy($"doc_id")
      .as[(Long, Long, Int)].collect().toList
    // reference: full self-join candidates, restricted to batch×corpus
    // pairs (no bucket hits the cap on 5 docs, so semantics coincide)
    val cand = Dedup.minHashCandidates(all, "doc_id", "text",
        shingleLen = 3, nHashes = 16, nBands = 4)
      .as[(Long, Long)].collect().toSet
    val expected = all.select("doc_id").as[Long].collect().filter(_ % 2 == 1).sorted
      .map { nid =>
        val n = cand.count { case (a, b) =>
          (a == nid && b % 2 == 0) || (b == nid && a % 2 == 0) }
        (nid, n.toLong, if (n > 0) 1 else 0)
      }.toList
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.exists(_._2 == 0L), "expected at least one zero-match batch doc")
    Barrier.release(spark)
  }

  test("embeddingPairs refuses a corpus-growing block (maxBlockSize guard)") {
    import spark.implicits._
    val vecs = (1 to 50).map(i => (i.toLong, "all-same-block", Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val ex = intercept[Exception] {
      Dedup.embeddingPairs(vecs, "vec_id", "embedding", "label", 0.5,
        maxBlockSize = 10).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("quadratic join refused")),
      s"got: ${messages(ex)}")
  }

  test("embedding cosine pairs above threshold within block") {
    import spark.implicits._
    val vecs = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
      (3L, 0, Array(0.0f, 1.0f)), (4L, 1, Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // 1~2 similar; 3 orthogonal; 4 other block
  }

  test("null block/vector rows never pair (join parity, round-12 advice)") {
    import spark.implicits._
    // the groupByKey kernels would group null keys TOGETHER (and NPE
    // on a null vector) where the join formulations they replaced
    // dropped them — both are filtered to the join's semantics
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    val vecs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, null, Seq(1.0f, 0.0f)),
        Row(2L, null, Seq(1.0f, 0.0f)),
        Row(3L, 0, null),
        Row(4L, 0, Seq(1.0f, 0.0f)),
        Row(5L, 0, Seq(1.0f, 0.0f))),
      vecSchema)
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", "label", 0.9)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 5L)),
      s"null-block (1,2) or null-vector (3) rows paired: $pairs")

    val fpSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("simhash", LongType)))
    val fp = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, null, 42L),
        Row(2L, null, 42L),
        Row(3L, "en", null),
        Row(4L, "en", 42L),
        Row(5L, "en", 42L)),
      fpSchema)
    val shPairs = Dedup.simHashPairsFromFingerprints(fp, "doc_id", "lang", 3)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(shPairs == Set((4L, 5L)),
      s"null-block or null-fingerprint rows paired: $shPairs")
  }

  test("pair kernels fail loudly on a non-integral id column") {
    import spark.implicits._
    // the kernels decode ids into Long — a plan-level cast would turn
    // a string id into an opaque runtime encoder error and silently
    // retype ida/idb; the contract check names the problem instead
    val vecs = Seq(("a", 0, Array(1.0f, 0.0f)), ("b", 0, Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingPairs(vecs, "vec_id", "embedding", "label", 0.9)
    }
    assert(ex.getMessage.contains("integral id"), ex.getMessage)
    val sigs = Seq(("a", 1L, 2L), ("b", 1L, 2L)).toDF("doc_id", "h0", "h1")
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.candidatesWithEstimate(sigs, "doc_id",
        nHashes = 2, nBands = 1, maxBucketSize = 10, minEst = 0.0)
    }
    assert(ex2.getMessage.contains("integral id"), ex2.getMessage)
  }
}
