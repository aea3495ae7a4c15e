package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** The SparkEntry token fixture as one primitive loop:
    * tokens[i] = CAST((id0 * factor + i) % 50257 AS INT) for
    * i ∈ [0, 64 + id0 % 1985). Exactly the SQL form
    * `transform(sequence(0, CAST(64 + id0 % 1985 AS INT) - 1, 1),
    *            i -> CAST((id0 * factor + i) % 50257 AS INT))`
    * — `%` is Java remainder on both sides, and the incremental wrap is
    * exact because n_tok < 50257. The HOF form is CodegenFallback: every
    * element pays an interpreted boxed lambda (measured single-task
    * generation dominating q10/q37 walls); this is one virtual call per
    * row. */
  def tokenSeq(id0: Long, factor: Int): ArrayData = {
    val n = (64L + id0 % 1985L).toInt
    val out = new Array[Int](n)
    var v = (id0 * factor) % 50257L
    var i = 0
    while (i < n) {
      out(i) = v.toInt
      v += 1L
      if (v == 50257L) v = 0L
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** `array_join(transform(tokens, x -> cast(x as string)), ',')` as one
    * primitive loop writing ASCII digits directly (null elements skipped,
    * matching array_join's no-replacement semantics). Returns null only
    * for a null array — same as the HOF form. */
  def tokensCsv(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val sb = new java.lang.StringBuilder(n * 6)
    var first = true
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        if (!first) sb.append(',')
        sb.append(a.getInt(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen'd token-fixture generator: `token_seq(id0, factor) -> array<int>`
  * (see [[TokenKernels.tokenSeq]]). */
case class TokenSeq(child: Expression, factor: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs bigint, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_seq"

  override protected def nullSafeEval(v: Any): Any =
    TokenKernels.tokenSeq(v.asInstanceOf[Long], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.tokenSeq($c, $factor)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd `tokens_csv(array<int>) -> string` (see
  * [[TokenKernels.tokensCsv]]). */
case class TokensCsv(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<int>, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "tokens_csv"

  override protected def nullSafeEval(v: Any): Any =
    TokenKernels.tokensCsv(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernels.tokensCsv($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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
