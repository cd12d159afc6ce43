package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-shingle generator: from a token array,
  * produce the array of space-joined n-grams
  * (window i..i+n-1 for i in 0 until max(len-n+1, 1); the last window
  * truncates when fewer than n tokens exist — same semantics as
  * `transform(sequence(...), i -> array_join(slice(tokens,i,n)))`,
  * which is interpreted per element as a CodegenFallback HOF and
  * dominated the dedup suite's profile).
  *
  * Dedup shingles a whole corpus (every token of every document), so
  * this inner loop IS the map-stage cost of MinHash/Jaccard dedup at
  * 100 TB; one tight UTF8String loop per row keeps it inside
  * WholeStageCodegen.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input and n >= 1")
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val len = tokens.numElements()
    val m = math.max(len - (n - 1), 1)
    val out = new Array[AnyRef](math.min(m, math.max(len, 1)))
    var i = 0
    while (i < out.length) {
      var s = if (i < len) tokens.getUTF8String(i) else UTF8String.EMPTY_UTF8
      var j = 1
      while (j < n && i + j < len) {
        s = UTF8String.concat(s, WordShingles.Space, tokens.getUTF8String(i + j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, tokens => {
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val space = ctx.addReferenceObj("space", WordShingles.Space, classOf[UTF8String].getName)
      s"""
         |int $len = $tokens.numElements();
         |int $m = java.lang.Math.max($len - ${n - 1}, 1);
         |if ($len == 0) $m = 1;
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s =
         |    $i < $len ? $tokens.getUTF8String($i)
         |              : org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8;
         |  for (int $j = 1; $j < $n && $i + $j < $len; $j++) {
         |    $s = org.apache.spark.unsafe.types.UTF8String.concat($s, $space,
         |      $tokens.getUTF8String($i + $j));
         |  }
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private[expr] val Space: UTF8String = UTF8String.fromString(" ")
}
