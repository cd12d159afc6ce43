package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Static bloom bit math shared by the aggregate (build) and the
  * probe expression — k positions per key via double hashing on a
  * splitmix-style mix of the 64-bit key (Kirsch & Mitzenmacher 2006:
  * two derived hashes simulate k independent ones with no measurable
  * false-positive penalty).
  */
object BloomFilter {

  def positions(key: Long, mBits: Int, k: Int): Array[Int] = {
    val h = mix(key)
    val h2 = deriv(h)
    Array.tabulate(k)(i => Math.floorMod(h + i * h2, mBits.toLong).toInt)
  }

  @inline private def mix(key: Long): Long = {
    val h = key * -7046029254386353131L
    h ^ (h >>> 32)
  }

  @inline private def deriv(h: Long): Long = (h >>> 17) | 1L

  /** Allocation-free hot paths (set runs per build row, mightContain
    * per fact row inside WholeStageCodegen — a per-row position array
    * was measurable GC pressure on a 60M-row probe). Position order is
    * identical to positions().
    */
  def set(words: Array[Long], key: Long, mBits: Int, k: Int): Unit = {
    val h = mix(key)
    val h2 = deriv(h)
    var i = 0
    while (i < k) {
      val p = Math.floorMod(h + i * h2, mBits.toLong).toInt
      words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Probe entry for both interpreted eval and generated code —
    * `bytes` is the serialized word array the aggregate emitted.
    */
  def mightContain(bytes: Array[Byte], key: Long, mBits: Int, k: Int): Boolean = {
    val h = mix(key)
    val h2 = deriv(h)
    var i = 0
    while (i < k) {
      val p = Math.floorMod(h + i * h2, mBits.toLong).toInt
      if ((readWord(bytes, p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(words: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](words.length * 8)
    var w = 0
    while (w < words.length) {
      var b = 0
      while (b < 8) {
        out(w * 8 + b) = (words(w) >>> (b * 8)).toByte
        b += 1
      }
      w += 1
    }
    out
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    var w = 0
    while (w < words.length) {
      words(w) = readWord(bytes, w)
      w += 1
    }
    words
  }

  private def readWord(bytes: Array[Byte], w: Int): Long = {
    var v = 0L
    var b = 0
    while (b < 8) {
      v |= (bytes(w * 8 + b) & 0xffL) << (b * 8)
      b += 1
    }
    v
  }
}

/** Bloom-filter build aggregate over a LongType key: the buffer is
  * the raw word array (update = set bits, merge = bitwise OR — both
  * associative, so map-side partial aggregation works and the shuffle
  * carries one mBits/8-byte blob per partition, never the keys).
  * Result: the serialized filter as BinaryType.
  *
  * This is the build side of the classic runtime-filter join: Spark's
  * own optimizer injects the same shape (its BloomFilterAggregate is
  * internal, not callable); graft exposes it as a first-class operator
  * so a pipeline can build the filter ONCE and reuse it across
  * queries (operators.BloomJoin).
  */
case class BloomFilterAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a bigint key, got ${t.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomFilter.set(buffer, v.asInstanceOf[Long], mBits, k)
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = BloomFilter.toBytes(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = BloomFilter.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomFilter.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_agg"
}

/** Probe: true iff `key` might be in the serialized filter `bloom`.
  * No false negatives — a `fact.filter(mightContain)` before the real
  * join can only drop rows the join would drop anyway. Codegen emits
  * a static call; the probe stays inside WholeStageCodegen on the
  * fact-scan hot path.
  */
case class BloomMightContain(
    bloom: Expression,
    key: Expression,
    mBits: Int,
    k: Int)
  extends BinaryExpression {

  override def left: Expression = bloom
  override def right: Expression = key
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (bloom.dataType, key.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (b, kt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got (${b.sql}, ${kt.sql})")
    }

  override def nullSafeEval(bloomVal: Any, keyVal: Any): Any =
    BloomFilter.mightContain(
      bloomVal.asInstanceOf[Array[Byte]], keyVal.asInstanceOf[Long], mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.expr.BloomFilter.mightContain($b, $v, $mBits, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloom = newLeft, key = newRight)
}
