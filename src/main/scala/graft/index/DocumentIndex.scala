package graft.index

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.filters.MetaFilter
import graft.functions.VectorFunctions._
import graft.text.{SplitterConfig, TextSplitter}

/** One chunk row of the document index. */
final case class DocChunk(
    chunk_id: String,
    document_id: String,
    uri: String,
    start_pos: Int,
    end_pos: Int,
    n_tokens: Int,
    vector: Array[Float])

/** Spark-native re-expression of the reference's LocalDocumentIndex
  * (reference: local_document_index.py:61-305).
  *
  * The reference keeps a catalog.json (uri↔id) plus one LocalIndex of
  * chunk items per folder, ingesting one document per call. Here both
  * halves are DataFrames — `catalog(document_id, uri)` and a
  * `VectorIndex` of chunk rows — and ingestion is BULK: a whole corpus
  * DataFrame is split + embedded in one `flatMap` pass on executors
  * (reference: upsert_document splits and embeds driver-side, one doc
  * at a time — the shape that cannot scale). document_id is the md5 of
  * the uri, which keeps ids stable across re-ingestion (the reference
  * uses uuid4; deterministic ids are strictly more useful and equally
  * unique per uri).
  */
final class DocumentIndex private (
    val catalog: DataFrame,
    val chunks: VectorIndex,
    val splitter: TextSplitter,
    val embedder: Embedder) {

  /** reference: local_document_index.py:76-78 get_document_id. */
  def getDocumentId(uri: String): DataFrame =
    catalog.filter(col("uri") === uri).select(col("document_id"))

  /** reference: local_document_index.py:80-82 get_document_uri. */
  def getDocumentUri(documentId: String): DataFrame =
    catalog.filter(col("document_id") === documentId).select(col("uri"))

  /** Bulk upsert of (uri, text, ...metadata) rows: latest wins per
    * uri (reference: local_document_index.py:127-219 upsert_document,
    * minus the per-document driver loop). Split + embed happen inside
    * flatMap — narrow; the only shuffles are the two left_anti joins
    * that retire previous versions, plus a guarded fan-out repartition
    * that only fires when the input scan has fewer splits than cores
    * (see Tables.fanOut).
    *
    * Every column beyond (uri, text) is per-document metadata. The
    * reference merges the metadata dict into each chunk item and
    * writes a `{id}.json` side file
    * (local_document_index.py:190-205, local_document.py:26-53); here
    * the metadata rides as typed columns on BOTH the chunk rows (so
    * MetaFilter predicates apply pre-similarity at query time, pushed
    * to the parquet scan) and the catalog (so results are decorated
    * without touching chunk payloads). Columnar pruning makes unused
    * metadata free — the side-file split falls out of the format.
    */
  def upsertDocuments(docs: DataFrame): DocumentIndex = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.types._
    val sp = splitter
    val em = embedder
    val metaCols: Seq[String] =
      docs.columns.toSeq.filterNot(c => c == "uri" || c == "text")
    val chunkSchema = StructType(Seq(
      StructField("chunk_id", StringType, nullable = false),
      StructField("document_id", StringType, nullable = false),
      StructField("uri", StringType, nullable = true),
      StructField("start_pos", IntegerType, nullable = false),
      StructField("end_pos", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false), nullable = true))
      ++ metaCols.map(c => docs.schema(c)))
    // Per partition: split every document, then group chunks into
    // token-budgeted batches for the embedder — one model call per
    // batch, the shape a real batch-inference backend needs
    // (reference: local_document_index.py:156-184 batches by
    // max_tokens before calling create_embeddings).
    // doc-type-aware splitting (reference:
    // local_document_index.py:148-152): an explicit doc_type metadata
    // column wins, else the uri extension; separator tables are cached
    // per type per partition.
    val dtIdx = metaCols.indexOf("doc_type")
    // fanOut: split+embed is the compute-bound stage of ingestion; a
    // single-split local corpus would otherwise chunk on one core
    // (no-op when the scan already has >= cores splits)
    val newChunks: DataFrame =
      graft.Tables.fanOut(
        docs.select((Seq(col("uri").cast("string"), col("text").cast("string"))
          ++ metaCols.map(col)): _*))
        .mapPartitions { it =>
          val spByType = scala.collection.mutable.Map.empty[String, graft.text.TextSplitter]
          def splitterFor(uri: String, explicit: String): graft.text.TextSplitter = {
            val dt = if (explicit != null && explicit.nonEmpty) explicit
              else DocumentIndex.extensionOf(uri)
            if (dt.isEmpty) sp
            else spByType.getOrElseUpdate(dt, sp.forDocType(dt))
          }
          val pending = it.flatMap { row =>
            val uri = row.getString(0)
            val text = row.getString(1)
            val meta = Seq.tabulate(row.length - 2)(j => row.get(j + 2))
            val explicitType =
              if (dtIdx >= 0) Option(row.get(2 + dtIdx)).map(_.toString).orNull
              else null
            val docId = DocumentIndex.docIdFor(uri)
            splitterFor(uri, explicitType).split(text).zipWithIndex.map { case (c, i) =>
              (s"$docId-$i", docId, uri, c, meta)
            }
          }
          // flush a batch when its token total would exceed the budget
          // (single linear pass; an earlier fold re-copied the batch
          // vector per element — quadratic per batch)
          new Iterator[Seq[(String, String, String, graft.text.TextChunk, Seq[Any])]] {
            private val it = pending.buffered
            def hasNext: Boolean = it.hasNext
            def next(): Seq[(String, String, String, graft.text.TextChunk, Seq[Any])] = {
              val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, graft.text.TextChunk, Seq[Any])]
              var tokens = 0
              while (it.hasNext && (batch.isEmpty ||
                  tokens + it.head._4.tokens.length <= em.maxBatchTokens)) {
                val item = it.next()
                tokens += item._4.tokens.length
                batch += item
              }
              batch.toSeq
            }
          }.flatMap { batch =>
            val vecs = em.embedBatch(batch.map(_._4.tokens))
            batch.zip(vecs).map { case ((cid, docId, uri, c, meta), v) =>
              Row.fromSeq(Seq(cid, docId, uri, c.startPos, c.endPos,
                c.tokens.length, v) ++ meta)
            }
          }
        }(Encoders.row(chunkSchema))
    // Catalog keeps the document text (columnar, read only by section
    // rendering) — the analogue of the reference's per-document
    // `{id}.txt` files (reference: local_document_index.py:207-208) —
    // plus the metadata columns (the `{id}.json` analogue).
    val newCatalog = docs
      .select((Seq(col("uri").cast("string"), col("text").cast("string"))
        ++ metaCols.map(col)): _*)
      .dropDuplicates("uri")
      .withColumn("document_id", md5(col("uri")))
      .select((Seq(col("document_id"), col("uri"), col("text"))
        ++ metaCols.map(col)): _*)
    val keptCatalog = catalog.join(newCatalog.select("uri"), Seq("uri"), "left_anti")
    val keptChunks = chunks.items.join(newCatalog.select("document_id"), Seq("document_id"), "left_anti")
    val chunkDf = newChunks.withColumn("norm", normD(col("vector")))
    // allowMissingColumns: re-ingesting with new metadata keys
    // null-fills the old rows, same as a reference side file that
    // lacks the key
    new DocumentIndex(
      keptCatalog.unionByName(newCatalog, allowMissingColumns = true),
      VectorIndex.build(
        keptChunks.unionByName(chunkDf, allowMissingColumns = true),
        "chunk_id", "vector"),
      splitter, embedder)
  }

  /** reference: local_document_index.py:88-116 delete_document. */
  def deleteDocument(uri: String): DocumentIndex = {
    val docId = md5(lit(uri))
    new DocumentIndex(
      catalog.filter(col("uri") =!= uri),
      VectorIndex.build(chunks.items.filter(col("document_id") =!= docId), "chunk_id", "vector"),
      splitter, embedder)
  }

  /** Top-documents query (reference:
    * local_document_index.py:221-254 query_documents): top `maxChunks`
    * chunks by cosine → group by document → mean chunk score → top
    * `maxDocuments`. The chunk top-k is a TakeOrderedAndProject (no
    * global sort); the per-document aggregation then touches at most
    * `maxChunks` rows.
    */
  def queryDocuments(queryText: String, maxDocuments: Int = 10, maxChunks: Int = 50,
      filter: Option[MetaFilter] = None): DataFrame = {
    val qv = embedder.embed(splitter.tokenizer.encode(queryText.replace('\n', ' ')))
    // the metadata filter applies to CHUNK rows pre-similarity
    // (reference: query_items(embedding, max_chunks, options.filter) —
    // chunk items carry the merged document metadata)
    val topChunks = chunks.queryItems(qv.map(_.toDouble).toIndexedSeq, maxChunks, filter)
    val metaCols = catalog.columns.toSeq
      .filterNot(Set("document_id", "uri", "text"))
    // ≤ maxChunks aggregated rows is the broadcast side; the catalog
    // grows with the corpus and must stream
    val scores = topChunks
      .groupBy(col("document_id"))
      .agg(avg(col("score")).as("score"), count(lit(1)).as("n_chunks"))
    catalog.drop("text")
      .join(broadcast(scores), Seq("document_id"))
      .orderBy(desc("score"), col("document_id"))
      .limit(maxDocuments)
      .select((Seq(col("document_id"), col("uri"), col("score"), col("n_chunks"))
        ++ metaCols.map(col)): _*)
  }

  /** Render token-budgeted sections for the top documents of a query
    * (reference: local_document_result.py:26-183 render_sections, as
    * invoked by vectra-cli.py's `query --format sections`). The group
    * work (one document's ≤ maxChunks chunks + its text) runs per-key
    * in `flatMapGroups` on executors — no driver loop.
    */
  def renderSections(queryText: String, maxTokens: Int = 2000, maxSections: Int = 1,
      maxDocuments: Int = 10, maxChunks: Int = 50): DataFrame = {
    val spark = catalog.sparkSession
    import spark.implicits._
    val qv = embedder.embed(splitter.tokenizer.encode(queryText.replace('\n', ' ')))
    val topChunks = chunks.queryItems(qv.map(_.toDouble).toIndexedSeq, maxChunks)
      .select(col("document_id"), col("start_pos"), col("end_pos"), col("score"))
    val tok = splitter.tokenizer
    val topDocs = queryDocuments(queryText, maxDocuments, maxChunks)
      .select(col("document_id"))
    topChunks
      .join(broadcast(topDocs), "document_id")
      .join(catalog.select(col("document_id"), col("uri"), col("text")), "document_id")
      .select(col("document_id"), col("uri"), col("text"),
        col("start_pos"), col("end_pos"), col("score"))
      .as[(String, String, String, Int, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (docId, rows) =>
        val rs = rows.toVector.sortBy(r => (-r._6, r._4))
        val uri = rs.head._2
        val text = rs.head._3
        graft.text.SectionRenderer.render(
            text, rs.map(r => graft.text.ScoredChunk(r._4, r._5, r._6)),
            maxTokens, maxSections, tok)
          .zipWithIndex.map { case (sec, i) =>
            (docId, uri, i, sec.text, sec.tokenCount, sec.score)
          }
      }
      .toDF("document_id", "uri", "section_idx", "text", "token_count", "score")
  }

  /** reference: local_document_index.py:76-78/local_document.py — load
    * a document's stored text (the `{id}.txt` analogue).
    */
  def loadText(uri: String): DataFrame =
    catalog.filter(col("uri") === uri).select(col("text"))

  /** reference: local_document_index.py:118-125 get_catalog_stats. */
  def catalogStats: DataFrame =
    catalog.agg(count(lit(1)).as("documents"))
      .crossJoin(chunks.items.agg(count(lit(1)).as("chunks")))
      .withColumn("version", lit(1L))

  /** Temp-write + swap per component (see VectorIndex.writeSwap): an
    * index re-saved over the path it was loaded from must not clobber
    * its own lazily-read inputs.
    */
  def save(path: String): Unit = {
    VectorIndex.writeSwap(catalog, s"$path/catalog")
    chunks.save(s"$path/chunks")
  }
}

object DocumentIndex {

  /** The uri extension used as the default doc_type (reference:
    * local_document_index.py:148-152 — `uri[pos+1:].lower()`), guarded
    * to plausible extensions so "doc 42" or "a.b/c" don't match.
    */
  def extensionOf(uri: String): String = {
    val pos = uri.lastIndexOf('.')
    if (pos < 0) ""
    else {
      val ext = uri.substring(pos + 1).toLowerCase
      if (ext.nonEmpty && ext.length <= 10 && ext.forall(c => c.isLetterOrDigit || c == '#'))
        ext
      else ""
    }
  }

  def docIdFor(uri: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(uri.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Empty index (reference: create_index + catalog bootstrap,
    * local_document_index.py:84-86/277-305).
    */
  def create(spark: SparkSession,
      config: SplitterConfig = SplitterConfig(keepSeparators = true, chunkSize = 512, chunkOverlap = 0),
      embedder: Embedder = new HashingEmbedder(64)): DocumentIndex = {
    import spark.implicits._
    val emptyCatalog = Seq.empty[(String, String, String)].toDF("document_id", "uri", "text")
    val emptyChunks = Seq.empty[DocChunk].toDF().withColumn("norm", lit(0.0))
    new DocumentIndex(emptyCatalog,
      VectorIndex.build(emptyChunks, "chunk_id", "vector"),
      new TextSplitter(config), embedder)
  }

  def load(spark: SparkSession, path: String,
      config: SplitterConfig = SplitterConfig(keepSeparators = true, chunkSize = 512, chunkOverlap = 0),
      embedder: Embedder = new HashingEmbedder(64)): DocumentIndex =
    new DocumentIndex(
      spark.read.parquet(s"$path/catalog"),
      VectorIndex.load(spark, s"$path/chunks", "chunk_id", "vector"),
      new TextSplitter(config), embedder)
}
