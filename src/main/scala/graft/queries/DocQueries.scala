package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.index.DocumentIndex
import graft.text.{SplitterConfig, TextSplitter}
import QueryUtil._

/** Document-layer suite: the reference's chunk → embed → query →
  * render pipeline (reference: local_document_index.py,
  * local_document_result.py) over the `documents` table.
  *
  * d_chunk / d_chunk_stats / d_sections / d_catalog_stats run the REAL
  * splitter + hashing embedder + renderer (imperative per-document
  * logic → rows-only oracle + ScalaTest specs). d_query_documents
  * proves the query SHAPE (top chunks → group by doc → mean score →
  * top docs) with engine-portable fixed slices and md5 pseudo-scores
  * so DuckDB can hash-check it end-to-end.
  */
object DocQueries {

  private val ChunkCfg = SplitterConfig(
    separators = Nil, keepSeparators = false, chunkSize = 64, chunkOverlap = 8)

  val defs: Map[String, Q] = Map(
    // reference: text_splitter.py:72-148 split, distributed via flatMap
    "d_chunk" -> ((s, dir) => {
      import s.implicits._
      val sp = new TextSplitter(ChunkCfg)
      graft.Tables.fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          sp.split(text).zipWithIndex.map { case (c, i) =>
            (id, i.toLong, c.startPos.toLong, c.endPos.toLong, c.tokens.length.toLong,
              c.startOverlap.length.toLong, c.endOverlap.length.toLong)
          }
        }
        .toDF("doc_id", "chunk_idx", "start_pos", "end_pos", "n_tokens",
          "n_start_overlap", "n_end_overlap")
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "d_chunk_stats" -> ((s, dir) => {
      import s.implicits._
      val sp = new TextSplitter(ChunkCfg)
      graft.Tables.fanOut(t(s, dir, "documents").select(col("doc_id"), col("text")))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          sp.split(text).map(c => (id, c.tokens.length.toLong))
        }
        .toDF("doc_id", "n_tokens")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("total_tokens"),
          max(col("n_tokens")).as("max_tokens"))
        .orderBy(col("doc_id"))
    }),

    // The vectra query_documents SHAPE with portable chunking/scoring
    // (reference: local_document_index.py:221-254).
    "d_query_documents" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), normText(col("text")).as("t"))
      val chunks = docs
        .select(col("doc_id"),
          explode(sequence(lit(0), ceil(length(col("t")) / 200.0).cast("int") - 1)).as("i"))
        .join(docs, "doc_id")
        .select(col("doc_id"), col("i"), col("t").substr(col("i") * 200 + 1, lit(200)).as("chunk"))
        .withColumn("score_raw", (portableHash(col("chunk")) % 1000000).cast("double") / 1000000.0)
      chunks
        .orderBy(desc("score_raw"), col("doc_id"), col("i"))
        .limit(50)
        .groupBy(col("doc_id"))
        .agg(round(avg(col("score_raw")), 6).as("score"), count(lit(1)).as("n_chunks"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(10)
    }),

    // query_documents under a Mongo metadata filter (reference:
    // local_document_index.py:221-254 query_documents with
    // options.filter → item_selector metadata filter applied to chunk
    // items pre-similarity). Chunk rows carry the per-document
    // metadata columns, the JSON filter compiles through
    // MetaFilter.parse to Catalyst predicates.
    "d_query_documents_filtered" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), normText(col("text")).as("t"))
      val chunks = docs
        .select(col("doc_id"),
          explode(sequence(lit(0), ceil(length(col("t")) / 200.0).cast("int") - 1)).as("i"))
        .join(docs, "doc_id")
        .select(col("doc_id"), col("lang"), col("source"), col("i"),
          col("t").substr(col("i") * 200 + 1, lit(200)).as("chunk"))
        .withColumn("score_raw", (portableHash(col("chunk")) % 1000000).cast("double") / 1000000.0)
      val filter = graft.filters.MetaFilter.parse(
        """{"$and": [{"$or": [{"lang": "en"}, {"lang": {"$in": ["de", "fr"]}}]},
          |          {"source": {"$ne": "src3"}}]}""".stripMargin)
      chunks.filter(filter.toColumn)
        .orderBy(desc("score_raw"), col("doc_id"), col("i"))
        .limit(50)
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(round(avg(col("score_raw")), 6).as("score"), count(lit(1)).as("n_chunks"))
        .orderBy(desc("score"), col("doc_id"))
        .limit(10)
    }),

    // reference: local_document_index.py:118-125 get_catalog_stats
    "d_catalog_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("uri"), col("text"))
      DocumentIndex.create(s).upsertDocuments(docs).catalogStats
    }),

    // reference: local_document_result.py:26-183 render_sections over
    // the top documents of a corpus-wide query
    "d_sections" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id").cast("string").as("uri"), col("text"))
      val idx = DocumentIndex.create(s, ChunkCfg).upsertDocuments(docs)
      idx.renderSections("spark table join query",
          maxTokens = 120, maxSections = 2, maxDocuments = 50)
        .select(col("uri"), col("section_idx").cast("long"),
          col("token_count").cast("long"), round(col("score"), 6).as("score"),
          length(col("text")).cast("long").as("text_len"))
        .orderBy(col("uri"), col("section_idx"))
    }))

  val oracles: Map[String, String] = Map(
    "d_query_documents" ->
      """WITH norm AS (
        |  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id, i, substr(t, (i*200+1)::INT, 200) AS chunk
        |  FROM norm, unnest(range(0, CAST(ceil(len(t)/200.0) AS BIGINT))) AS u(i)),
        |scored AS (
        |  SELECT doc_id, i,
        |    (('0x'||substr(md5(chunk), 1, 15))::BIGINT % 1000000) / 1000000.0 AS score_raw
        |  FROM chunks),
        |topc AS (
        |  SELECT doc_id, score_raw FROM scored
        |  ORDER BY score_raw DESC, doc_id, i LIMIT 50)
        |SELECT doc_id, round(avg(score_raw), 6) AS score, count(*) AS n_chunks
        |FROM topc GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "d_query_documents_filtered" ->
      """WITH norm AS (
        |  SELECT doc_id, lang, source,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id, lang, source, i, substr(t, (i*200+1)::INT, 200) AS chunk
        |  FROM norm, unnest(range(0, CAST(ceil(len(t)/200.0) AS BIGINT))) AS u(i)),
        |scored AS (
        |  SELECT doc_id, lang, source, i,
        |    (('0x'||substr(md5(chunk), 1, 15))::BIGINT % 1000000) / 1000000.0 AS score_raw
        |  FROM chunks
        |  WHERE (lang = 'en' OR lang IN ('de', 'fr')) AND source <> 'src3'),
        |topc AS (
        |  SELECT doc_id, lang, source, score_raw FROM scored
        |  ORDER BY score_raw DESC, doc_id, i LIMIT 50)
        |SELECT doc_id, lang, source,
        |  round(avg(score_raw), 6) AS score, count(*) AS n_chunks
        |FROM topc GROUP BY doc_id, lang, source
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)
    // d_chunk, d_chunk_stats, d_catalog_stats, d_sections: rows-only
    // (recursive splitter / renderer are not SQL-expressible; their
    // semantics are covered by TextSplitterSpec / SectionRendererSpec).
}
