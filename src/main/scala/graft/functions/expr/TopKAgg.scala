package graft.functions.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k strongest (score, id) pairs,
  * strongest = highest score, ties broken by lowest id. The heap
  * dequeues the WEAKEST entry so insertion is O(log k).
  */
final class TopKBuffer(val k: Int) {
  // dequeue-max ordering on (weakness): lowest score / highest id first
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(Ordering.by((t: (Double, Long)) => (-t._1, t._2)))

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wid) = heap.head
      if (score > ws || (score == ws && id < wid)) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => insert(s, i) }

  /** Strongest-first, deterministic. */
  def sorted: Seq[(Double, Long)] =
    heap.toSeq.sortBy(t => (-t._1, t._2))
}

/** Per-group top-k as a TypedImperativeAggregate
  * (`graft.functions.GraftFunctions.topK`): the Spark-native
  * replacement for the window `row_number() <= k` idiom on large data.
  * The window formulation shuffles and SORTS every row of every group;
  * this aggregate keeps a k-element heap per group with map-side
  * partial aggregation, so the shuffle carries at most k pairs per
  * (group × map partition) — at 100 TB that is the difference between
  * sorting the corpus and streaming over it.
  *
  * Result: array<struct<score:double, id:bigint>>, strongest first,
  * ties by lowest id — the same total order as the window idiom, so
  * the two formulations are interchangeable under the DuckDB oracle.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.insert(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk"
}
