package graft.functions.expr

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k strongest (score, id) pairs,
  * strongest = highest score, ties broken by lowest id. A binary heap
  * ordered by WEAKNESS (root = weakest kept entry) over two PRIMITIVE
  * parallel arrays — the previous scala PriorityQueue[(Double, Long)]
  * boxed both fields per insert and its `Ordering.by` allocated a
  * tuple on EVERY sift comparison; at knn-join pair counts (~1.4e8
  * update calls per 100× query, most of them rejections) that
  * allocation traffic was a measurable slice of the candidate stage
  * (round-17). The kept SET is defined by the strict total order
  * (score desc, id asc) alone, so it is insertion-order-independent
  * and bit-identical to the old buffer; the common case — a pair
  * weaker than the current k-th best — is now two primitive compares
  * and no allocation.
  */
final class TopKBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** (s1, i1) strictly weaker than (s2, i2): lower score, ties to the
    * HIGHER id (the weakest of two equal scores is the one top-k's
    * (score desc, id asc) law would emit later).
    */
  @inline private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(score: Double, id: Long): Unit = {
    if (n < k) {
      var c = n
      scores(c) = score; ids(c) = id
      n += 1
      // sift up while weaker than the parent
      while (c > 0 && weaker(scores(c), ids(c), scores((c - 1) >> 1), ids((c - 1) >> 1))) {
        val p = (c - 1) >> 1
        val ts = scores(c); val ti = ids(c)
        scores(c) = scores(p); ids(c) = ids(p)
        scores(p) = ts; ids(p) = ti
        c = p
      }
    } else if (weaker(scores(0), ids(0), score, id)) {
      // beats the weakest kept entry: replace the root, sift down
      scores(0) = score; ids(0) = id
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1
        val r = l + 1
        var w = c // weakest of parent and children
        if (l < n && weaker(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && weaker(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) done = true
        else {
          val ts = scores(c); val ti = ids(c)
          scores(c) = scores(w); ids(c) = ids(w)
          scores(w) = ts; ids(w) = ti
          c = w
        }
      }
    }
  }

  def size: Int = n

  /** Iterate kept entries in internal (heap) order. */
  def foreachEntry(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.foreachEntry((s, i) => insert(s, i))

  /** Strongest-first, deterministic. */
  def sorted: Seq[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
      .sortBy(t => (-t._1, t._2))
  }
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
    out.writeInt(buffer.size)
    buffer.foreachEntry { (s, i) => out.writeDouble(s); out.writeLong(i) }
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
