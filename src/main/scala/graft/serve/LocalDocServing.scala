package graft.serve

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.filters.MetaFilter

/** Driver-side snapshot serving for the DOCUMENT layer — the
  * queryDocuments twin of [[LocalVectorServing]], closing the serving
  * tier over the reference's document surface
  * (local_document_index.py:219-248: top-k chunks → group by document
  * → mean score → top documents).
  *
  * Spark builds and maintains the scored chunk table (the
  * d_query_documents_persisted layout); a serving process snapshots a
  * bounded shard of it and answers queryDocuments in microseconds of
  * local arithmetic — no job, no scheduler. `maxLocalChunks` enforces
  * boundedness loudly, exactly like LocalVectorServing's item guard.
  *
  * Semantics are pinned row-identical to the oracle-checked
  * d_query_documents_persisted entry (ServingSpec): chunk selection
  * orders by (score desc, doc_id asc, chunk index asc), the per-doc
  * mean accumulates left-to-right in that same selection order (the
  * single-partition order Spark's aggregate consumes after the
  * top-k), rounds HALF_UP to 6 dp, and the final ordering is
  * (score desc, doc_id asc). Metadata filters evaluate per chunk row
  * with MetaFilter.matches pre-selection — the
  * d_query_documents_filtered shape on the same snapshot.
  */
final class LocalDocServing private (
    schema: StructType,
    rows: Array[Row],           // sorted by (score desc, doc_id asc, i asc)
    docIds: Array[Long],
    scores: Array[Double]) {

  private val fieldOf: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  private def getter(r: Row): String => Any =
    f => fieldOf.get(f).map(i => if (r.isNullAt(i)) null else r.get(i)).orNull

  /** Number of chunk rows in the snapshot. */
  def size: Int = rows.length

  /** Top-`topChunks` chunks → per-doc mean → top-`topDocs` documents:
    * (doc_id, mean score rounded to 6 dp, n_chunks), ordered by
    * (score desc, doc_id asc).
    */
  def queryDocuments(topChunks: Int = 50, topDocs: Int = 10,
      filter: Option[MetaFilter] = None): Seq[(Long, Double, Long)] = {
    // rows are pre-sorted in selection order — the top chunks under a
    // filter are the first `topChunks` survivors
    val sums = scala.collection.mutable.LinkedHashMap.empty[Long, (Double, Long)]
    var taken = 0
    var p = 0
    while (p < rows.length && taken < topChunks) {
      if (filter.forall(MetaFilter.matches(_, getter(rows(p))))) {
        val d = docIds(p)
        val (s, c) = sums.getOrElse(d, (0.0, 0L))
        sums(d) = (s + scores(p), c + 1)
        taken += 1
      }
      p += 1
    }
    sums.iterator.map { case (d, (s, c)) =>
      val mean = BigDecimal(s / c)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (d, mean, c)
    }.toSeq
      .sortBy { case (d, m, _) => (-m, d) }
      .take(topDocs)
  }
}

object LocalDocServing {

  /** Default shard bound: 1M chunk rows — the same deliberate-raise
    * contract as LocalVectorServing.DefaultMaxLocalItems.
    */
  val DefaultMaxLocalChunks: Int = 1 << 20

  /** Snapshot a (bounded) scored chunk frame into driver memory. The
    * frame must carry `doc_id`, a chunk index `i`, and `score_raw`
    * (the d_query_documents chunk-table layout); extra columns ride
    * along for metadata filtering. Two driver jobs at load time
    * (count guard + collect), zero jobs per query.
    */
  def load(chunks: DataFrame,
      maxLocalChunks: Int = DefaultMaxLocalChunks): LocalDocServing = {
    val n = chunks.count()
    require(n <= maxLocalChunks,
      s"LocalDocServing: chunk table has $n rows > maxLocalChunks=$maxLocalChunks " +
        "— a corpus this size belongs on the Spark serving path " +
        "(DocServing / d_query_documents_persisted), or shard it")
    val sorted = chunks
      .orderBy(col("score_raw").desc, col("doc_id"), col("i"))
      .collect()
    val schema = chunks.schema
    val docIdx = schema.fieldIndex("doc_id")
    val scoreIdx = schema.fieldIndex("score_raw")
    val docIds = sorted.map(r => r.getAs[Number](docIdx).longValue())
    val scores = sorted.map(r => r.getAs[Number](scoreIdx).doubleValue())
    new LocalDocServing(schema, sorted, docIds, scores)
  }
}
