package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics kernel: token count, subword estimate and
  * per-table stopword hits from a single tokenization — replacing one
  * interpreted `aggregate(split(...))` higher-order expression PER METRIC
  * (the quality/langid projections ran up to six of them per row).
  *
  * Semantics replicate the SQL reference forms exactly (parity-asserted
  * in OpsSpec): `trim` strips spaces only (Spark StringTrim), tokens are
  * `split(_, '\\s+', -1)` with Java-regex ASCII whitespace and
  * leading/trailing empty tokens kept, lengths count codepoints, and
  * stopword matching is binary equality on the `lower(trim(text))`
  * tokenization (UTF8String.toLowerCase). */
object TextKernels {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Stopword tables compiled to byte-equality hash sets. */
  def compile(tables: Seq[Seq[String]]): Array[java.util.HashSet[UTF8String]] =
    tables.map { t =>
      val s = new java.util.HashSet[UTF8String](t.size * 2)
      t.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  def stats(s: UTF8String, stopSets: Array[java.util.HashSet[UTF8String]]): InternalRow = {
    val trimmed = s.trim() // Spark trim: 0x20 only
    val blank = trimmed.numBytes() == 0

    // pass 1: token count + subword estimate over trim(text)
    val bytes = trimmed.getBytes
    var nTokens = 0
    var subword = 0L
    var i = 0
    var tokStart = 0
    def emit(from: Int, to: Int): Unit = {
      nTokens += 1
      var chars = 0
      var p = from
      while (p < to) { chars += 1; p += UTF8String.numBytesForFirstByte(bytes(p)) }
      // greatest(1, ceil(chars / 4.0))
      subword += math.max(1, (chars + 3) / 4)
    }
    while (i < bytes.length) {
      if (isWs(bytes(i))) {
        emit(tokStart, i)
        var j = i + 1
        while (j < bytes.length && isWs(bytes(j))) j += 1
        tokStart = j; i = j
      } else i += 1
    }
    emit(tokStart, bytes.length)

    // pass 2: stopword hits over lower(trim(text)) — lowercasing cannot
    // produce or remove whitespace, so the token count matches pass 1
    val hits = new Array[Int](stopSets.length)
    if (stopSets.length > 0) {
      val lower = trimmed.toLowerCase.getBytes
      var p = 0
      var ts = 0
      def vote(from: Int, to: Int): Unit = {
        val tok = UTF8String.fromBytes(lower, from, to - from)
        var t = 0
        while (t < stopSets.length) {
          if (stopSets(t).contains(tok)) hits(t) += 1
          t += 1
        }
      }
      while (p < lower.length) {
        if (isWs(lower(p))) {
          vote(ts, p)
          var j = p + 1
          while (j < lower.length && isWs(lower(j))) j += 1
          ts = j; p = j
        } else p += 1
      }
      vote(ts, lower.length)
    }

    new GenericInternalRow(Array[Any](nTokens, subword, blank, new GenericArrayData(hits)))
  }
}

/** Codegen'd one-pass text statistics:
  * struct(n_tokens INT, subword_est BIGINT, blank BOOLEAN,
  *        stop_hits ARRAY<INT> — one entry per stopword table). */
case class TextStats(child: Expression, tables: Seq[Seq[String]]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("subword_est", LongType, nullable = false),
    StructField("blank", BooleanType, nullable = false),
    StructField("stop_hits", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val compiled = TextKernels.compile(tables)

  override protected def nullSafeEval(v: Any): Any =
    TextKernels.stats(v.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSets", compiled,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.stats($c, (java.util.HashSet[]) $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
