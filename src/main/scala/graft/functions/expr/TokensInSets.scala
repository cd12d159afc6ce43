package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-set variant of TokensInSet: counts (with multiplicity) how
  * many array elements fall in EACH of several constant string sets,
  * in one pass over the tokens — langId scores five language marker
  * sets per row, and five separate probes each re-walk the token
  * array (and, pre-kernel, each ran an interpreted HOF lambda).
  * Output: array<int>, one counter per set, in input order.
  *
  * The probe structure is a token → set-bitmask HashMap (a token can
  * belong to several sets — "de" is a French marker and a German word
  * is not, but overlaps do occur), held as a plan reference object.
  */
case class TokensInSets(child: Expression, sets: Seq[Seq[String]]) extends UnaryExpression {

  require(sets.nonEmpty && sets.size <= 30, "1..30 sets (bitmask-packed)")

  override def prettyName: String = "tokens_in_sets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.catalogString}")
  }

  @transient private lazy val probe: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    sets.zipWithIndex.foreach { case (set, i) =>
      set.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](sets.size)
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val mask = probe.get(arr.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(m)
            counts(b) += 1
            m &= m - 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mapRef = ctx.addReferenceObj("probeMap", probe, "java.util.HashMap")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val mask = ctx.freshName("mask")
      val m = ctx.freshName("m")
      val b = ctx.freshName("b")
      val nSets = sets.size
      s"""
         |int[] $counts = new int[$nSets];
         |int $len = $a.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    Integer $mask = (Integer) $mapRef.get($a.getUTF8String($i));
         |    if ($mask != null) {
         |      int $m = $mask.intValue();
         |      while ($m != 0) {
         |        int $b = java.lang.Integer.numberOfTrailingZeros($m);
         |        $counts[$b]++;
         |        $m &= $m - 1;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokensInSets =
    copy(child = newChild)
}
