package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.text.TextAnalysis
import QueryUtil._

/** Text-analysis suite over `documents` — see graft.text.TextAnalysis.
  * Every operator is a narrow projection; the oracles replicate the
  * arithmetic in DuckDB.
  */
object TextQueries {

  /** Shared by ta_quality_classifier and its persisted-model twin
    * (same fit, same scoring arithmetic — only where the weight table
    * lives differs).
    */
  private val QualityClassifierOracleSql: String =
    """WITH norm AS (
      |  SELECT doc_id, lang = 'en' AS is_pos,
      |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      |  FROM documents),
      |tokens AS (
      |  SELECT doc_id, is_pos, unnest(string_split(t, ' ')) AS tok FROM norm),
      |freq AS (
      |  SELECT tok,
      |    sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS cnt_pos,
      |    sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS cnt_neg
      |  FROM tokens GROUP BY 1),
      |tot AS (
      |  SELECT sum(cnt_pos)::DOUBLE AS n_pos, sum(cnt_neg)::DOUBLE AS n_neg,
      |    count(*)::DOUBLE AS v
      |  FROM freq),
      |scored AS (
      |  SELECT doc_id,
      |    round(ln(((cnt_pos + 1) / (n_pos + v)) / ((cnt_neg + 1) / (n_neg + v))), 6) AS w
      |  FROM tokens JOIN freq USING (tok), tot),
      |agg AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |    round(CAST(sum(CAST(w AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS score
      |  FROM scored GROUP BY doc_id)
      |SELECT doc_id, n_tokens, score,
      |  CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM agg ORDER BY doc_id""".stripMargin

  private val sqlNorm =
    """WITH norm AS (
      |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      |  FROM documents)""".stripMargin

  /** Shared by ta_unigram_lm and its persisted twin (same model, same
    * NLL arithmetic — the twin only changes where postings and the
    * frequency table are read from).
    */
  private lazy val UnigramLmOracleSql: String =
    s"""$sqlNorm,
       |tokens AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
       |freq AS (SELECT tok, count(*) AS cnt FROM tokens GROUP BY 1),
       |tot AS (SELECT sum(cnt)::DOUBLE AS n_total FROM freq),
       |scored AS (
       |  SELECT doc_id, round(-ln(cnt / n_total), 6) AS nll
       |  FROM tokens JOIN freq USING (tok), tot)
       |SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |  round(CAST(sum(CAST(nll AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_nll,
       |  max(nll) AS max_nll
       |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The per-doc (doc_id, tok, cnt) token-count projection — ONE
    * corpus-version ingest artifact serving both quality gates (the
    * classifier twin's scoring join and the unigram-LM twin's
    * postings side).
    */
  private def tokenCountsTable(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    persistedTable(s, "qctokcnt", dir) { p =>
      graft.streaming.StreamingQualityClassifier.buildTokenCounts(
          t(s, dir, "documents"), "doc_id", "text")
        .write.mode("overwrite").parquet(p)
    }

  val defs: Map[String, Q] = Map(
    "ta_langid" -> ((s, dir) => {
      TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("pred_lang"), col("lang_score"))
        .orderBy(col("doc_id"))
    }),

    "ta_quality" -> ((s, dir) => {
      TextAnalysis.quality(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_chars"), col("n_words"),
          col("mean_word_len"), col("stop_ratio"), col("punct_ratio"),
          col("alpha_ratio"))
        .orderBy(col("doc_id"))
    }),

    "ta_tokens" -> ((s, dir) => {
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens"), col("re_tokens"),
          col("chars_per_token"))
        .orderBy(col("doc_id"))
    }),

    "ta_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("fp_full"), col("fp_min"), col("fp_max"))
        .orderBy(col("doc_id"))
    }),

    // sequence packing for pretraining (concat-then-chunk layout):
    // lay docs head-to-tail per lang, cut fixed 4096-token bins.
    // Each row records the doc's start bin/offset AND end bin, so a
    // doc spanning a bin boundary is visible (end_pack_id > pack_id).
    //
    // Scale shape: a two-phase parallel prefix sum. Phase 1 cumsums
    // inside (lang, shard) where shard = md5(doc_id) % nShards, so the
    // window parallelism is nLangs × nShards, not nLangs (~5 — one
    // core per language would serialize the 100 TB corpus). Phase 2
    // offsets each shard by the token totals of the shards before it —
    // an nLangs × nShards-row aggregate, broadcast back. Raise nShards
    // with corpus size; the layout stays deterministic because the
    // concat order is (lang, shard, doc_id).
    "ta_pack" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      TextQueries.pack(t(s, dir, "documents"), nShards = PackShards)
        .orderBy(col("doc_id"))
    }),

    // byte-level BPE token accounting (graft.text.ByteBpeTokenizer —
    // the reference's tiktoken analogue, reference: gpt3_tokenizer.py).
    // Hash-oracled: the oracle exports the tokenizer's own merge
    // table and replays the greedy merge loop in a DuckDB recursive
    // CTE (see bpeOracleSql); BpeSpec adds round-trip, determinism,
    // and golden-divergence gates. ids_checksum makes any id-sequence
    // drift change the hash. NOTE: n_bpe_tokens runs ≈2× a production
    // GPT-2/tiktoken count (512-merge table vs 50k — divergence
    // quantified by BpeSpec's golden test; see the ByteBpeTokenizer
    // scaladoc before using these counts for budgets calibrated
    // against real models).
    "ta_tokens_bpe" -> ((s, dir) => {
      import s.implicits._
      val bpe = new graft.text.ByteBpeTokenizer()
      graft.Tables.fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val ids = bpe.encodeIds(text)
            (id, ids.length.toLong,
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
              ids.foldLeft(0L)((h, t) => (h * 31 + t) % 1000000007L))
          }
        }
        .toDF("doc_id", "n_bpe_tokens", "n_bytes", "ids_checksum")
        .withColumn("bytes_per_token", round(col("n_bytes") / col("n_bpe_tokens"), 6))
        .orderBy(col("doc_id"))
    }),

    // WordPiece token accounting (graft.text.WordPieceTokenizer — the
    // reference's BERT-family tokenizer analogue, reference:
    // all_MiniLM_L6_v2_tokenizer.py). Hash-oracled: the oracle
    // exports the tokenizer's own id-ordered vocabulary and replays
    // the greedy longest-match-first loop per distinct word in a
    // DuckDB recursive CTE (see wordPieceOracleSql); WordPieceSpec
    // adds golden, determinism, and public-format-load gates.
    // ids_checksum makes any id-sequence drift change the hash;
    // n_unk surfaces vocabulary coverage (the [UNK] rate a budget
    // estimator must know about).
    "ta_tokens_wordpiece" -> ((s, dir) => {
      import s.implicits._
      val wp = graft.text.WordPieceTokenizer()
      val unkId = wp.vocab.indexOf(graft.text.WordPieceTokenizer.Unk)
      graft.Tables.fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val ids = wp.encodeIds(text)
            (id, ids.length.toLong, ids.count(_ == unkId).toLong,
              text.length.toLong,
              ids.foldLeft(0L)((h, t) => (h * 31 + t) % 1000000007L))
          }
        }
        .toDF("doc_id", "n_wp_tokens", "n_unk", "n_chars", "ids_checksum")
        .orderBy(col("doc_id"))
    }),

    // benchmark decontamination: which held-out docs (doc_id%100==0 as
    // the stand-in benchmark) share 5-word shingles with the training
    // pool — the standard train/test contamination scan as a blocked
    // shingle join. Clean bench docs appear with zero counts (a
    // missing row must mean "absent", never "clean").
    "ta_contaminate" -> ((s, dir) => {
      val docs = graft.Tables.fanOut(t(s, dir, "documents"))
      def shingles(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"),
          explode(wordShingles(wsTokens(normText(col("text"))), 5)).as("g"))
      val bench = shingles(docs.filter(col("doc_id") % 100 === 0))
        .withColumnRenamed("doc_id", "bench_id")
      // Bloom-prune the train side BEFORE its shuffle: the benchmark
      // suite's shingle set is bounded (a fixed eval suite, ~1e6-1e7
      // keys) while train is the 100-TB corpus — without the bloom the
      // SMJ shuffles EVERY train shingle; with it only might-match
      // candidates reach the exchange (no false negatives, so the join
      // result — and the oracle hash — is identical). The filter is
      // SIZED from the counted bench side (12 bits/key ≈ 1% FP,
      // capped at 2^25 bits / 4 MiB ≈ the previous fixed size at ~3M
      // keys): a constant-4-MiB literal taxed every driver plan pass
      // regardless of data size — measured ~2.2 s/run at sf0.1.
      val train = graft.operators.BloomJoin.pruneFactSized(
        shingles(docs.filter(col("doc_id") % 100 =!= 0)), "g",
        bench.select(col("g")), "g", maxMBits = 1 << 25)
      val sizes = bench.groupBy(col("bench_id")).agg(count(lit(1)).as("n_shingles"))
      val hits = bench.join(train, "g")
        .groupBy(col("bench_id"))
        .agg(countDistinct(col("doc_id")).as("n_train_docs"),
          countDistinct(col("g")).as("n_hit_shingles"))
      sizes.join(hits, Seq("bench_id"), "left")
        .withColumn("n_train_docs", coalesce(col("n_train_docs"), lit(0L)))
        .withColumn("n_hit_shingles", coalesce(col("n_hit_shingles"), lit(0L)))
        .withColumn("contamination", round(col("n_hit_shingles") / col("n_shingles"), 6))
        .select(col("bench_id"), col("n_train_docs"), col("n_hit_shingles"),
          col("n_shingles"), col("contamination"))
        .orderBy(col("bench_id"))
    }),

    // BM25 lexical retrieval (graft.text.Bm25) — hybrid-search twin of
    // the vector top-k
    "ta_bm25" -> ((s, dir) => {
      graft.text.Bm25.score(t(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("spark", "join", "window"))
        .orderBy(desc("score"), col("doc_id"))
    }),

    // hybrid retrieval: vector top-20 ∪ BM25 top-20 fused by
    // reciprocal-rank fusion (graft.search.HybridSearch). Ranks are
    // computed on ROUNDED scores so cross-engine fp noise cannot
    // reorder them.
    "ta_hybrid" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.VectorFunctions.cosine
      val emb = t(s, dir, "embeddings")
      val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qv"))
      val vtop = emb.crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          round(cosine(col("embedding"), col("qv")), 6).as("s"))
        .orderBy(desc("s"), col("doc_id"))
        .limit(20)
      val vrank = vtop.withColumn("rank",
        row_number().over(Window.orderBy(desc("s"), col("doc_id"))))
      val brank = graft.text.Bm25.score(t(s, dir, "documents"), "doc_id", "text",
          queryTerms = Seq("spark", "join", "window"), topN = 20)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("score"), col("doc_id"))))
      graft.search.HybridSearch.rrf(Seq(vrank, brank), "doc_id")
        .orderBy(desc("score"), col("doc_id"))
    }),

    // corpus vocabulary statistics: top-25 word bigrams with document
    // frequency — the diagnostic that sizes dedup/shingle decisions
    "ta_ngram_freq" -> ((s, dir) => {
      val docs = graft.Tables.fanOut(t(s, dir, "documents"))
      docs
        .select(col("doc_id"), explode(wordShingles(wsTokens(normText(col("text"))), 2)).as("g"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), col("g"))
        .limit(25)
    }),

    // PII redaction (graft.text.Redact). The synthetic corpus carries
    // no PII, so deterministic PII-ish suffixes are injected first —
    // both engines build the identical string, scrub it, and the
    // redacted-text digest plus per-rule hit counts are hash-compared.
    "ta_redact" -> ((s, dir) => {
      val withPii = t(s, dir, "documents")
        .withColumn("text2", concat(
          col("text"), lit(" contact user"), col("doc_id"), lit("@example.com via 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 or 555-123-4567")))
      // barrier before the total-order sort: a range sort EXECUTES its
      // child twice (range sampling + the exchange), and here the
      // child is the corpus-wide regex kernel — the 100× sweep paid
      // the whole redact pass twice (~2× wall time). One narrow
      // materialized frame (6 small columns, text-free) sorts instead.
      graft.Barrier.checkpoint(
        graft.text.Redact.scrubWithCounts(withPii, "doc_id", "text2")
          .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_card"),
            col("n_phone"), md5(col("redacted")).as("redacted_hash")))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition signals (graft.text.TextAnalysis
    // .repetition): duplicate/top word + bigram fractions, the
    // boilerplate filters the length/stopword quality columns miss.
    // Zero shuffle — one narrow integer-exact pass.
    "ta_repetition" -> ((s, dir) => {
      TextAnalysis.repetition(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_words"), col("dup_word_ratio"),
          col("top_word_ratio"), col("dup_bigram_ratio"), col("top_bigram_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-rule document FILTER (TextAnalysis.gopherFilter): the
    // published keep/drop decision composed from the quality +
    // repetition signals — rule-failure bitmask + keep boolean, one
    // zero-shuffle kernel pass. ta_quality/ta_repetition emit the
    // signals; this emits the decision a curation pipeline acts on.
    "ta_gopher" -> ((s, dir) => {
      TextAnalysis.gopherFilter(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("stop_hits"), col("dup_word_ratio"), col("flags"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // corpus-unigram LM scoring (graft.text.UnigramLm) — the CCNet
    // perplexity-filter analogue: mean per-token negative
    // log-likelihood under the corpus' own unigram distribution
    "ta_unigram_lm" -> ((s, dir) => {
      graft.text.UnigramLm.score(t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // the PERSISTED twin of ta_unigram_lm: scoring reads the SAME
    // per-doc (doc_id, tok, cnt) ingest projection the classifier
    // gate uses (one corpus-version artifact, two quality gates) plus
    // a persisted unigram-frequency model derived artifact-to-
    // artifact (UnigramLm.buildFreq) — per run the text is never
    // read, the plan is counts ⋈ vocabulary. Bit-identical decimal
    // arithmetic (UnigramLmSpec pins it), so the oracle is shared
    // verbatim with ta_unigram_lm.
    "ta_unigram_lm_persisted" -> ((s, dir) => {
      val tokCnt = tokenCountsTable(s, dir)
      val freqPath = persistedArtifact("ulmfreq", dir) { p =>
        graft.text.UnigramLm.buildFreq(tokCnt)
          .write.mode("overwrite").parquet(p)
      }
      graft.text.UnigramLm.scoreFromTokenCounts(
          tokCnt, "doc_id", s.read.parquet(freqPath))
        .orderBy(col("doc_id"))
    }),

    // model-based quality filter (graft.text.QualityClassifier — the
    // fastText/DCLM classifier-gate analogue): Naive-Bayes token
    // log-odds fitted IN-PLAN against the reference-corpus seed
    // (lang='en', the CCNet-style target-distribution label), every
    // doc scored by mean token log-odds, keep = score > 0. The weight
    // join is a deliberate shuffle join — a web-scale vocabulary does
    // not broadcast.
    "ta_quality_classifier" -> ((s, dir) => {
      graft.text.QualityClassifier.score(
          t(s, dir, "documents"), "doc_id", "text", col("lang") === "en")
        .orderBy(col("doc_id"))
    }),

    // the PERSISTED-model twin: BOTH halves of the scoring plan are
    // corpus-version artifacts built once at ingest — the weight table
    // (the fit is a training job, not a query) AND the per-doc
    // (doc_id, tok, cnt) token-count projection (round-12 verdict #3:
    // re-running tokenize→explode over every document per scoring run
    // paid the full text scan each time). The query is the narrow
    // counts ⋈ weights join — text never read. Same fit, same decimal
    // arithmetic (cnt × w exactly equals cnt summed copies of w;
    // StreamingSpec pins the bit equality), so the oracle is shared
    // verbatim with ta_quality_classifier.
    "ta_quality_classifier_persisted" -> ((s, dir) => {
      val wPath = persistedArtifact("qcweights", dir) { p =>
        graft.streaming.StreamingQualityClassifier.fitWeights(
            t(s, dir, "documents"), "text", col("lang") === "en")
          .write.mode("overwrite").parquet(p)
      }
      graft.streaming.StreamingQualityClassifier.scoreFromTokenCounts(
          tokenCountsTable(s, dir), "doc_id", s.read.parquet(wPath))
        .orderBy(col("doc_id"))
    }),

    // temperature-based language rebalancing (Sampling.temperature —
    // the mT5 n^alpha recipe): per-lang keep rates DERIVED from corpus
    // counts in-plan, dominant languages downsampled toward the
    // alpha-tempered share. alpha=0.5, half-corpus budget.
    "ta_mix" -> ((s, dir) => {
      graft.operators.Sampling.temperature(
          t(s, dir, "documents"), "doc_id", "lang",
          alpha = 0.5, budgetFrac = 0.5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // deterministic hash-based stratified sampling
    // (graft.operators.Sampling) — the reproducible data-recipe mixer
    "ta_sample" -> ((s, dir) => {
      graft.operators.Sampling.stratified(
          t(s, dir, "documents"), "doc_id", "lang",
          rates = Map("en" -> 0.3, "zh" -> 0.8), defaultRate = 0.1)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // deterministic train/val/test assignment (Sampling.split):
    // salted-hash thresholds, stable under corpus growth and
    // independent of the sampling hash — a pure zero-shuffle
    // projection at any scale
    "ta_split" -> ((s, dir) => {
      graft.operators.Sampling.split(
          t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // per-source token budgeting (Sampling.tokenBudget — the
    // RefinedWeb/Dolma-style domain cap): rank docs within each
    // source by stopword-ratio quality, keep while the running
    // whitespace-token total stays within the budget. One shuffle on
    // source, then a per-group window.
    "ta_budget" -> ((s, dir) => {
      val q = TextAnalysis.quality(t(s, dir, "documents"), "doc_id", "text")
      graft.operators.Sampling.tokenBudget(
          q.select(col("doc_id"), col("source"), col("stop_ratio"), col("n_words")),
          "doc_id", "source", "stop_ratio", "n_words", budget = BudgetTokens)
        .select(col("doc_id"), col("source"), col("n_words"), col("cum_tokens"))
        .orderBy(col("doc_id"))
    }))

  /** Per-source token budget for ta_budget: small enough to bite at
    * every verify/bench scale (sf0.01's ~10-doc sources included).
    */
  val BudgetTokens = 300L

  /** Shard fan-out for ta_pack. 8 at test scale; at 100 TB set this to
    * ~(corpus tokens / executor-core budget) — the layout changes with
    * nShards (concat order is (lang, shard, doc_id)) but every value
    * is deterministic for a fixed nShards.
    */
  val PackShards = 8

  /** Two-phase parallel sequence packing (see the ta_pack entry).
    * Input needs (doc_id, lang, text); output is one row per doc with
    * its bin coordinates in the concat-then-chunk layout.
    */
  def pack(docs: org.apache.spark.sql.DataFrame, nShards: Int,
      binTokens: Int = 4096): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.Tables.fanOut(docs)
      .select(col("doc_id"), col("lang"),
        size(wsTokens(normText(col("text")))).cast("long").as("n_tokens"))
      .withColumn("shard",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(nShards.toLong)))
    // phase 1: local prefix sums, parallel across (lang, shard)
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    val local = toks.withColumn("local_cum", sum(col("n_tokens"))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // phase 2: per-shard token totals → exclusive prefix over shards
    // within each lang (nLangs × nShards rows — broadcast back)
    val offsets = local
      .groupBy(col("lang"), col("shard"))
      .agg(max(col("local_cum")).as("shard_total"))
      .withColumn("shard_offset",
        coalesce(sum(col("shard_total")).over(
          Window.partitionBy(col("lang")).orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("shard"), col("shard_offset"))
    local.join(broadcast(offsets), Seq("lang", "shard"))
      .withColumn("cum", col("shard_offset") + col("local_cum"))
      .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / binTokens))
      .withColumn("pack_offset", (col("cum") - col("n_tokens")) % binTokens)
      .withColumn("end_pack_id", floor((col("cum") - 1) / binTokens))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"),
        col("pack_offset"), col("end_pack_id"))
  }

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** ta_tokens_bpe oracle: byte-level BPE IS SQL-expressible once two
    * facts are used. (1) The greedy encode loop ("merge all
    * occurrences of the minimal-rank pair, repeat") is equivalent to
    * iterated leftmost-single-merge — a newly created pair (x, ab)
    * can only carry a HIGHER rank than (a, b) (it must be learned
    * after ab exists), so while (a, b) occurs it stays minimal; a
    * recursive CTE applies one leftmost merge per iteration over the
    * DISTINCT pre-tokens until no table pair remains. (2) The merge
    * table is a deterministic constant of the tokenizer, exported
    * here (ByteBpeTokenizer.mergesRaw) in rank order as list
    * literals — pair-key list (rank = position), merged-token list,
    * true vocab-id list — so both engines run the SAME table; rank
    * comparisons use list positions, ids come from the id list
    * (base-byte tokens are ord(char), GPT-2's id = byte-value rule).
    * Corpus-specific simplifications, same class as the chunker
    * oracles: pre-tokens are ' ?[a-z]+' (the full GPT-2 pre-token
    * regex needs a lookahead RE2 lacks, but only whitespace runs ever
    * reach that branch and this corpus has none), and only ASCII
    * merge entries are exported (non-ASCII sides can never match an
    * ASCII corpus; filtering preserves rank order).
    */
  private lazy val bpeOracleSql: String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val table = new graft.text.ByteBpeTokenizer().mergesRaw
      .filter { case (a, b, _) =>
        (a + b).forall(c => c >= 32 && c < 127)
      }
    val mk = table.map { case (a, b, _) => s"${lit(a)} || chr(1) || ${lit(b)}" }
      .mkString("[", ", ", "]")
    val mt = table.map { case (a, b, _) => lit(a + b) }.mkString("[", ", ", "]")
    val mid = table.map(_._3.toString).mkString("[", ", ", "]")
    s"""WITH RECURSIVE
       |mk AS (SELECT $mk AS l),
       |mt AS (SELECT $mt AS l),
       |mid AS (SELECT $mid AS l),
       |pre AS (
       |  SELECT doc_id, strlen(text) AS n_bytes,
       |    unnest(regexp_extract_all(text, ' ?[a-z]+')) AS pt,
       |    generate_subscripts(regexp_extract_all(text, ' ?[a-z]+'), 1) AS i
       |  FROM documents),
       |dw AS (SELECT DISTINCT pt FROM pre),
       |bpe AS (
       |  SELECT pt, string_split(pt, '') AS toks FROM dw
       |  UNION ALL
       |  SELECT pt,
       |    toks[1:bidx-1] || [toks[bidx] || toks[bidx+1]] || toks[bidx+2:len(toks)]
       |  FROM (
       |    SELECT pt, toks,
       |      list_position(positions,
       |        list_min(list_filter(positions, p -> p IS NOT NULL AND p <> 0))) AS bidx
       |    FROM (
       |      SELECT b.pt, b.toks,
       |        list_transform(range(1, len(b.toks)),
       |          k -> list_position(mk.l, b.toks[k] || chr(1) || b.toks[k+1])) AS positions
       |      FROM bpe b, mk) q1) q2
       |  WHERE bidx IS NOT NULL AND bidx <> 0),
       |term AS (
       |  SELECT pt, toks FROM bpe
       |  QUALIFY row_number() OVER (PARTITION BY pt ORDER BY len(toks)) = 1),
       |wids AS (
       |  SELECT t.pt,
       |    list_transform(t.toks,
       |      tk -> CASE WHEN len(tk) = 1 THEN ord(tk)
       |                 ELSE mid.l[list_position(mt.l, tk)] END) AS ids
       |  FROM term t, mt, mid),
       |docs AS (
       |  SELECT p.doc_id, max(p.n_bytes) AS n_bytes,
       |    flatten(list(w.ids ORDER BY p.i)) AS ids
       |  FROM pre p JOIN wids w USING (pt)
       |  GROUP BY p.doc_id)
       |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_bpe_tokens,
       |  CAST(n_bytes AS BIGINT) AS n_bytes,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ids),
       |    (h, t) -> (h * 31 + t) % 1000000007) AS BIGINT) AS ids_checksum,
       |  round(n_bytes / len(ids), 6) AS bytes_per_token
       |FROM docs ORDER BY doc_id""".stripMargin
  }

  /** ta_tokens_wordpiece oracle: greedy longest-match-first IS
    * SQL-expressible directly — per DISTINCT word a recursive CTE
    * advances a cursor, each iteration picking the LONGEST prefix of
    * the remainder present in the exported vocabulary (list_max over
    * the matching lengths; continuations carry the '##' prefix); a
    * position with no match collapses the word to [UNK] (id 1), the
    * BERT rule. The vocabulary is a deterministic constant of the
    * tokenizer, exported in id order so `list_position - 1` IS the
    * token id — both engines run the same table, like the BPE
    * oracle's merge lists. Corpus-specific simplifications (same
    * class as the chunker/BPE oracles): the basic-tokenize pass is a
    * single-space split — the corpus is verified lowercase ASCII
    * with no punctuation/accents/whitespace runs, so BERT's
    * lowercase + accent-strip + punct-split stages are all identity
    * — and the MaxWordChars=100 [UNK] cap is unreachable (longest
    * corpus word ≪ 100 chars).
    */
  private lazy val wordPieceOracleSql: String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val voc = graft.text.WordPieceTokenizer().vocab
      .map(lit).mkString("[", ", ", "]")
    s"""WITH RECURSIVE
       |voc AS (SELECT $voc AS l),
       |pre AS (
       |  SELECT doc_id, strlen(text) AS n_chars,
       |    unnest(string_split(text, ' ')) AS w,
       |    generate_subscripts(string_split(text, ' '), 1) AS i
       |  FROM documents),
       |dw AS (SELECT DISTINCT w FROM pre),
       |wp AS (
       |  SELECT w, CAST(1 AS BIGINT) AS pos, CAST([] AS BIGINT[]) AS ids,
       |    FALSE AS failed
       |  FROM dw
       |  UNION ALL
       |  SELECT w,
       |    CASE WHEN bestl IS NULL THEN len(w) + 1 ELSE pos + bestl END AS pos,
       |    CASE WHEN bestl IS NULL THEN ids
       |         ELSE list_append(ids, CAST(list_position(l,
       |           CASE WHEN pos = 1 THEN substr(w, 1, CAST(bestl AS INT))
       |                ELSE '##' || substr(w, CAST(pos AS INT), CAST(bestl AS INT)) END) - 1 AS BIGINT))
       |    END AS ids,
       |    (bestl IS NULL) AS failed
       |  FROM (
       |    SELECT w, pos, ids, voc.l AS l,
       |      list_max(list_filter(range(1, len(w) - pos + 2),
       |        ll -> list_contains(voc.l,
       |          CASE WHEN pos = 1 THEN substr(w, 1, CAST(ll AS INT))
       |               ELSE '##' || substr(w, CAST(pos AS INT), CAST(ll AS INT)) END))) AS bestl
       |    FROM wp, voc
       |    WHERE pos <= len(w) AND NOT failed) q1),
       |term AS (
       |  SELECT w, CASE WHEN failed THEN [CAST(1 AS BIGINT)] ELSE ids END AS ids
       |  FROM wp
       |  QUALIFY row_number() OVER (PARTITION BY w ORDER BY pos DESC, failed DESC) = 1),
       |docs AS (
       |  SELECT p.doc_id, max(p.n_chars) AS n_chars,
       |    flatten(list(t.ids ORDER BY p.i)) AS ids
       |  FROM pre p JOIN term t USING (w)
       |  GROUP BY p.doc_id)
       |SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_wp_tokens,
       |  CAST(len(list_filter(ids, x -> x = 1)) AS BIGINT) AS n_unk,
       |  CAST(n_chars AS BIGINT) AS n_chars,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ids),
       |    (h, t) -> (h * 31 + t) % 1000000007) AS BIGINT) AS ids_checksum
       |FROM docs ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ta_tokens_bpe" -> bpeOracleSql,
    "ta_tokens_wordpiece" -> wordPieceOracleSql,
    "ta_langid" ->
      s"""$sqlNorm,
         |scored AS (
         |  SELECT doc_id,
         |    len(list_filter(string_split(t, ' '), x -> x IN ${inList(MarkersDe)})) AS s_de,
         |    len(list_filter(string_split(t, ' '), x -> x IN ${inList(StopwordsEn)})) AS s_en,
         |    len(list_filter(string_split(t, ' '), x -> x IN ${inList(MarkersEs)})) AS s_es,
         |    len(list_filter(string_split(t, ' '), x -> x IN ${inList(MarkersFr)})) AS s_fr,
         |    len(list_filter(string_split(t, ' '), x -> x IN ${inList(MarkersZh)})) AS s_zh,
         |    CASE WHEN regexp_matches(t, '[\\x{4e00}-\\x{9fff}]')
         |      THEN len(list_filter(string_split(t, ''), c -> regexp_matches(c, '[\\x{4e00}-\\x{9fff}]')))
         |      ELSE 0 END AS n_cjk
         |  FROM norm)
         |SELECT doc_id,
         |  CASE WHEN n_cjk > 0 THEN 'zh'
         |    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
         |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |    ELSE 'zh' END AS pred_lang,
         |  greatest(s_de, s_en, s_es, s_fr, s_zh, n_cjk)::BIGINT AS lang_score
         |FROM scored ORDER BY doc_id""".stripMargin,

    "ta_quality" ->
      s"""$sqlNorm
         |SELECT doc_id,
         |  len(t)::BIGINT AS n_chars,
         |  len(string_split(t, ' '))::BIGINT AS n_words,
         |  round((len(t) - (len(string_split(t, ' ')) - 1)) * 1.0
         |    / len(string_split(t, ' ')), 6) AS mean_word_len,
         |  round(len(list_filter(string_split(t, ' '), x -> x IN ${inList(StopwordsEn)})) * 1.0
         |    / len(string_split(t, ' ')), 6) AS stop_ratio,
         |  round(len(regexp_replace(t, '[a-z0-9 ]', '', 'g')) * 1.0 / len(t), 6) AS punct_ratio,
         |  round(len(regexp_replace(t, '[^a-z]', '', 'g')) * 1.0 / len(t), 6) AS alpha_ratio
         |FROM norm ORDER BY doc_id""".stripMargin,

    "ta_tokens" ->
      s"""$sqlNorm
         |SELECT doc_id,
         |  len(string_split(t, ' '))::BIGINT AS ws_tokens,
         |  len(regexp_extract_all(t, '$BpeishPattern'))::BIGINT AS re_tokens,
         |  round(len(t) * 1.0 / len(regexp_extract_all(t, '$BpeishPattern')), 6) AS chars_per_token
         |FROM norm ORDER BY doc_id""".stripMargin,

    // single-window re-statement of the two-phase shard layout: cum
    // over (lang ORDER BY shard, doc_id) ≡ shard_offset + local_cum.
    // pack_offset is CAST to BIGINT — DuckDB's windowed sum is HUGEINT
    // and the raw modulo would hash as float64 vs Spark's int64.
    "ta_pack" ->
      s"""$sqlNorm,
         |toks AS (
         |  SELECT n.doc_id, d.lang,
         |    len(string_split(n.t, ' '))::BIGINT AS n_tokens,
         |    ('0x'||substr(md5(CAST(n.doc_id AS VARCHAR)), 1, 15))::BIGINT % $PackShards AS shard
         |  FROM norm n JOIN documents d USING (doc_id)),
         |packed AS (
         |  SELECT doc_id, lang, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY shard, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM toks)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(floor((cum - n_tokens) / 4096.0) AS BIGINT) AS pack_id,
         |  CAST((cum - n_tokens) % 4096 AS BIGINT) AS pack_offset,
         |  CAST(floor((cum - 1) / 4096.0) AS BIGINT) AS end_pack_id
         |FROM packed ORDER BY doc_id""".stripMargin,

    "ta_contaminate" ->
      s"""$sqlNorm,
         |tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
         |sh AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i : i+4], ' ')
         |      for i in range(1, greatest(len(toks)-3, 2))])) AS g
         |  FROM tok),
         |bench AS (SELECT doc_id AS bench_id, g FROM sh WHERE doc_id % 100 = 0),
         |train AS (SELECT doc_id, g FROM sh WHERE doc_id % 100 <> 0),
         |sizes AS (SELECT bench_id, count(*) AS n_shingles FROM bench GROUP BY 1),
         |hits AS (
         |  SELECT bench_id,
         |    count(DISTINCT t.doc_id) AS n_train_docs,
         |    count(DISTINCT b.g) AS n_hit_shingles
         |  FROM bench b JOIN train t USING (g) GROUP BY 1)
         |SELECT s.bench_id,
         |  coalesce(h.n_train_docs, 0) AS n_train_docs,
         |  coalesce(h.n_hit_shingles, 0) AS n_hit_shingles,
         |  s.n_shingles,
         |  round(coalesce(h.n_hit_shingles, 0) * 1.0 / s.n_shingles, 6) AS contamination
         |FROM sizes s LEFT JOIN hits h USING (bench_id)
         |ORDER BY bench_id""".stripMargin,

    "ta_bm25" ->
      s"""$sqlNorm,
         |toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT avg(dl) AS avgdl, count(*)::DOUBLE AS n_docs FROM dl),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |w AS (
         |  SELECT tf.doc_id,
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf /
         |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats)
         |SELECT doc_id, round(sum(w), 6) AS score
         |FROM w GROUP BY doc_id
         |ORDER BY sum(w) DESC, doc_id LIMIT 10""".stripMargin,

    "ta_hybrid" ->
      s"""$sqlNorm,
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |vscored AS (
         |  SELECT vec_id AS doc_id,
         |    round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
         |      (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
         |       sqrt(list_dot_product(qv, qv))), 6) AS s
         |  FROM embeddings, q),
         |vtop AS (SELECT doc_id, s FROM vscored ORDER BY s DESC, doc_id LIMIT 20),
         |vrank AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rank FROM vtop),
         |toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term FROM norm),
         |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT avg(dl) AS avgdl, count(*)::DOUBLE AS n_docs FROM dl),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
         |dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
         |w AS (
         |  SELECT tf.doc_id,
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf /
         |      (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS w
         |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats),
         |btop AS (
         |  SELECT doc_id, round(sum(w), 6) AS score FROM w GROUP BY doc_id
         |  ORDER BY sum(w) DESC, doc_id LIMIT 20),
         |brank AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM btop),
         |contrib AS (
         |  SELECT doc_id, 1.0 / (60 + rank) AS c FROM vrank
         |  UNION ALL SELECT doc_id, 1.0 / (60 + rank) AS c FROM brank)
         |SELECT doc_id, round(sum(c), 6) AS score, count(*) AS n_lists
         |FROM contrib GROUP BY doc_id
         |ORDER BY sum(c) DESC, doc_id LIMIT 10""".stripMargin,

    "ta_ngram_freq" ->
      s"""$sqlNorm,
         |tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
         |ng AS (
         |  SELECT doc_id,
         |    unnest(list_distinct([array_to_string(toks[i : i+1], ' ')
         |      for i in range(1, greatest(len(toks), 2))])) AS g
         |  FROM tok)
         |SELECT g, count(*) AS df FROM ng
         |GROUP BY g ORDER BY df DESC, g LIMIT 25""".stripMargin,

    "ta_redact" ->
      """WITH pii AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com via 10.0.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.7 or 555-123-4567' AS t2
        |  FROM documents),
        |scrubbed AS (
        |  SELECT doc_id, t2,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(t2, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |          '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |        '\b[0-9]{16}\b', '<CARD>', 'g'),
        |      '\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |  FROM pii)
        |SELECT doc_id,
        |  len(regexp_extract_all(t2, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))::BIGINT AS n_ip,
        |  len(regexp_extract_all(t2, '\b[0-9]{16}\b'))::BIGINT AS n_card,
        |  len(regexp_extract_all(t2, '\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b'))::BIGINT AS n_phone,
        |  md5(redacted) AS redacted_hash
        |FROM scrubbed ORDER BY doc_id""".stripMargin,

    "ta_repetition" ->
      s"""$sqlNorm,
         |tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
         |big AS (
         |  SELECT doc_id, toks,
         |    [array_to_string(toks[i : i+1], ' ')
         |     for i in range(1, greatest(len(toks), 2))] AS bi
         |  FROM tok),
         |wc AS (
         |  SELECT doc_id, x, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS x FROM tok) GROUP BY 1, 2),
         |wtop AS (SELECT doc_id, max(c) AS topw FROM wc GROUP BY 1),
         |bc AS (
         |  SELECT doc_id, x, count(*) AS c
         |  FROM (SELECT doc_id, unnest(bi) AS x FROM big) GROUP BY 1, 2),
         |btop AS (SELECT doc_id, max(c) AS topb FROM bc GROUP BY 1)
         |SELECT b.doc_id,
         |  len(toks)::BIGINT AS n_words,
         |  round((len(toks) - len(list_distinct(toks))) * 1.0 / len(toks), 6) AS dup_word_ratio,
         |  round(w.topw * 1.0 / len(toks), 6) AS top_word_ratio,
         |  round((len(bi) - len(list_distinct(bi))) * 1.0 / len(bi), 6) AS dup_bigram_ratio,
         |  round(t2.topb * 1.0 / len(bi), 6) AS top_bigram_ratio
         |FROM big b JOIN wtop w USING (doc_id) JOIN btop t2 USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // thresholds interpolated from the SAME TextAnalysis constants the
    // query uses (generated, not hand-synced); comparisons run on the
    // round-6 ratios in both engines so boundary docs cannot flip
    "ta_gopher" ->
      s"""$sqlNorm,
         |tok AS (SELECT doc_id, string_split(t, ' ') AS toks, t FROM norm),
         |sig AS (
         |  SELECT doc_id,
         |    len(toks)::BIGINT AS n_words,
         |    round((len(t) - (len(toks) - 1)) * 1.0 / len(toks), 6) AS mean_word_len,
         |    len(list_filter(toks, x -> x IN ${inList(StopwordsEn)}))::BIGINT AS stop_hits,
         |    round((len(toks) - len(list_distinct(toks))) * 1.0 / len(toks), 6) AS dup_word_ratio
         |  FROM tok),
         |flagged AS (
         |  SELECT *,
         |    (CASE WHEN n_words < ${TextAnalysis.GopherMinWords}
         |          OR n_words > ${TextAnalysis.GopherMaxWords} THEN 1 ELSE 0 END
         |     + CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 2 ELSE 0 END
         |     + CASE WHEN stop_hits < ${TextAnalysis.GopherMinStopHits} THEN 4 ELSE 0 END
         |     + CASE WHEN dup_word_ratio > ${TextAnalysis.GopherMaxDupWordRatio} THEN 8 ELSE 0 END
         |    )::BIGINT AS flags
         |  FROM sig)
         |SELECT doc_id, n_words, mean_word_len, stop_hits, dup_word_ratio,
         |  flags, flags = 0 AS keep
         |FROM flagged ORDER BY doc_id""".stripMargin,

    "ta_unigram_lm" -> UnigramLmOracleSql,

    // identical semantics to ta_unigram_lm (Σ-collapsed postings —
    // cnt copies of a DECIMAL NLL sum exactly to nll × cnt); the
    // entry pins the persisted projection + model path to the same
    // rows
    "ta_unigram_lm_persisted" -> UnigramLmOracleSql,

    // bit-for-bit replay of QualityClassifier.score: same add-one
    // smoothing, same division order, ln rounded to 6dp BEFORE the
    // exact DECIMAL per-doc sum (the ta_unigram_lm portability family)
    "ta_quality_classifier" -> QualityClassifierOracleSql,

    // identical semantics to ta_quality_classifier (same fit, same
    // arithmetic — the deterministic weight table round-trips through
    // parquet unchanged); the entry pins the save→load→score-only
    // model-artifact path to the same rows
    "ta_quality_classifier_persisted" -> QualityClassifierOracleSql,

    "ta_mix" ->
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(CAST(pow(n, 0.5) AS DECIMAL(38,6))) AS DOUBLE) AS z,
        |               CAST(sum(n) AS DOUBLE) AS nn FROM counts),
        |thr AS (
        |  SELECT lang,
        |    CAST(round(least(1.0, 0.5 * nn * (CAST(CAST(pow(n, 0.5) AS DECIMAL(38,6)) AS DOUBLE) / z) / n) * 1000000, 0) AS BIGINT) AS t
        |  FROM counts, tot)
        |SELECT doc_id, lang FROM documents JOIN thr USING (lang)
        |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 < t
        |ORDER BY doc_id""".stripMargin,

    "ta_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 <
        |  CASE WHEN lang = 'en' THEN 300000
        |       WHEN lang = 'zh' THEN 800000
        |       ELSE 100000 END
        |ORDER BY doc_id""".stripMargin,

    // same salted 60-bit md5 hash, same rounded cumulative thresholds
    "ta_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN ('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 < 800000 THEN 'train'
        |       WHEN ('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same normalization + stop_ratio arithmetic as ta_quality; the
    // window's ORDER BY is total (rounded ratio, then doc_id), so the
    // cumulative sum — and therefore the cut — replays exactly.
    // DuckDB's windowed BIGINT sum is HUGEINT: cast back.
    "ta_budget" ->
      s"""WITH norm AS (
         |  SELECT doc_id, source,
         |    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |    len(string_split(t, ' '))::BIGINT AS n_words,
         |    round(len(list_filter(string_split(t, ' '), x -> x IN ${inList(StopwordsEn)})) * 1.0
         |      / len(string_split(t, ' ')), 6) AS stop_ratio
         |  FROM norm),
         |b AS (
         |  SELECT doc_id, source, n_words,
         |    CAST(sum(n_words) OVER (PARTITION BY source
         |      ORDER BY stop_ratio DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum_tokens
         |  FROM q)
         |SELECT doc_id, source, n_words, cum_tokens FROM b
         |WHERE cum_tokens <= ${BudgetTokens}
         |ORDER BY doc_id""".stripMargin,

    "ta_fingerprint" ->
      s"""$sqlNorm,
         |fp AS (
         |  SELECT doc_id, t,
         |    [('0x'||substr(md5(substr(t, i, 8)), 1, 15))::BIGINT
         |     for i in range(1, greatest(len(t)-6, 2))] AS sh
         |  FROM norm)
         |SELECT doc_id,
         |  ('0x'||substr(md5(t), 1, 15))::BIGINT AS fp_full,
         |  list_min(sh) AS fp_min,
         |  list_max(sh) AS fp_max
         |FROM fp ORDER BY doc_id""".stripMargin)
}
