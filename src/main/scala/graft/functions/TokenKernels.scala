package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Tight-loop kernels over token arrays (`array<int>`), the payload column
  * of the target table. Spark's higher-order functions (`aggregate`,
  * `transform`) are CodegenFallback — every element pays an interpreted,
  * boxed lambda call, which at 10^12 sequences × ~10^3 tokens is the
  * difference between memory-bandwidth scans and hours of lambda
  * dispatch. These kernels run inside whole-stage codegen as one virtual
  * call per ROW with a primitive loop per element.
  */
object TokenKernels {

  /** Σ tokens[i] as BIGINT with the exact semantics of
    * `aggregate(tokens, 0L, (a, x) -> a + CAST(x AS BIGINT))`: a null
    * ELEMENT nulls the whole sum (null + x stays null in SQL), so the
    * kernel is hash-identical to the HOF form, never merely close.
    * Boxed return: null = null result. */
  def sumBoxed(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      acc += a.getInt(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Codegen'd `tok_sum(array<int>) -> bigint`. */
case class TokSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<int>, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null array, or a null element
  override def prettyName: String = "tok_sum"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else TokenKernels.sumBoxed(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("tokSum")
      s"""
         |java.lang.Long $boxed = graft.functions.TokenKernels.sumBoxed($a);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
