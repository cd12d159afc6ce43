package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion from a directory tree
  * (reference: file_fetcher.py — a recursive os.walk that feeds one
  * file at a time into the document index; web_fetcher.py is its
  * zero-egress HTTP twin, stubbed here).
  *
  * Spark-native shape: `binaryFile` with recursiveFileLookup gives a
  * distributed (path, content) scan — ingestion of a 100 TB corpus is
  * just another DataFrame, partitioned by files, feeding
  * DocumentIndex.upsertDocuments. The doc_type column (extension)
  * drives the splitter's separator table exactly like the reference's
  * uri extension sniffing (reference: local_document_index.py:148-152).
  */
object FileFetcher {

  /** Recursively read a directory into (uri, doc_type, text). */
  def fetchDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(
        col("path").as("uri"),
        lower(element_at(split(col("path"), "\\."), -1)).as("doc_type"),
        col("content").cast("string").as("text"),
        col("length").as("n_bytes"))

  /** HTML → plain text as a pure column expression
    * (reference: web_fetcher.py htmlToMarkdown via BeautifulSoup +
    * markdownify — external libs; the engine contract is "markup in,
    * indexable text out", which a codegen'd regexp chain satisfies):
    * drop script/style blocks, strip tags, decode the common entities,
    * collapse whitespace.
    */
  def htmlToText(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noBlocks = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Convert the html rows of a fetched corpus to structure-preserving
    * markdown (graft.sources.HtmlToMarkdown; reference:
    * web_fetcher.py:62-100 html_to_markdown) and retag them doc_type
    * "md", so the splitter's markdown separator table chunks them on
    * headings/paragraphs. Non-html rows pass through untouched. A
    * narrow typed map — no shuffle.
    */
  def htmlAsMarkdown(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cols = docs.columns.toSeq
    docs.select(col("uri"), col("doc_type"), col("text"),
        col("n_bytes"))
      .as[(String, String, String, Long)]
      .map { case (uri, dt, text, n) =>
        if (dt == "html" || dt == "htm")
          (uri, "md", HtmlToMarkdown.convert(text, uri), n)
        else (uri, dt, text, n)
      }
      .toDF(cols: _*)
  }

  /** Zero-egress stand-in for the reference's WebFetcher: same output
    * schema (uri, doc_type, text) and the same htmlToMarkdown
    * transform (reference: web_fetcher.py:52-56), fed from a local
    * mirror directory instead of HTTP.
    */
  def fetchWebMirror(spark: SparkSession, mirrorDir: String): DataFrame =
    htmlAsMarkdown(fetchDir(spark, mirrorDir, "*.html"))
}
