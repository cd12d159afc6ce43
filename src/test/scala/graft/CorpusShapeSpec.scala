package graft

import org.apache.spark.sql.functions._

/** The round-5 closed-form oracles (d_chunk/d_chunk_stats/
  * d_catalog_stats/d_sections/ta_tokens_bpe) are exact on the driver
  * corpus BECAUSE of its shape. This spec pins those assumptions per
  * corpus so a regenerated testdata set that breaks one fails HERE,
  * by name, instead of as an opaque oracle hash mismatch:
  *   - single-line texts (top-level separators never split);
  *   - lowercase letters + single spaces only, no edge spaces (every
  *     whitespace token = one word = one RegexTokenizer token; the
  *     simplified ' ?[a-z]+' BPE pre-token regex is exhaustive);
  *   - docs under the 120-token section budget (SectionRenderer's
  *     whole-doc shortcut fires for every rendered doc);
  *   - no empty texts (every doc chunks to >= 1 chunk).
  */
class CorpusShapeSpec extends SparkSpecBase {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("embeddings corpora are 64-dimensional (hardcoded in the vector oracles)") {
    // ann_lsh / knn_join / dd_embed_cosine / dd_semantic oracle SQL
    // iterates dim 64 literally; a regenerated corpus with another
    // width must fail here by name
    dirs.filter(d => new java.io.File(s"$d/embeddings.parquet").exists()).foreach { dir =>
      val bad = graft.Tables.load(spark, dir, "embeddings")
        .filter(size(col("embedding")) =!= 64).count()
      assert(bad == 0L, s"$dir has non-64-dim embeddings; regenerate the " +
        "dim-64 literals in AnnQueries/DedupQueries oracle SQL")
    }
  }

  test("documents corpora satisfy the closed-form oracle assumptions") {
    dirs.filter(d => new java.io.File(s"$d/documents.parquet").exists()).foreach { dir =>
      val docs = graft.Tables.load(spark, dir, "documents").select(col("text"))
      val bad = docs.filter(
        col("text").rlike("[^a-z ]") ||          // anything beyond lowercase+space
          col("text").contains("  ") ||          // double spaces → empty split parts
          col("text").startsWith(" ") || col("text").endsWith(" ") ||
          length(col("text")) === 0 ||
          size(split(col("text"), " ")) >= 120)  // section whole-doc shortcut bound
        .count()
      assert(bad == 0L, s"$dir violates a closed-form oracle assumption " +
        "(see DocQueries/TextQueries oracle scaladoc; re-derive the closed forms)")
    }
  }
}
