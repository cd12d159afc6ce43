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

  /** Zero-egress stand-in for the reference's WebFetcher: same output
    * schema, fed from a local mirror directory instead of HTTP.
    */
  def fetchWebMirror(spark: SparkSession, mirrorDir: String): DataFrame =
    fetchDir(spark, mirrorDir, "*.html")
}
