package graft.maintain

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 3-D space-filling-curve key.
  * Children are pre-normalized Long coordinates in [0, 2^21); `doGenCode`
  * emits a static call so the whole rewrite pipeline stays inside
  * whole-stage codegen (a Scala UDF here would box every row of a 100 TB
  * rewrite). */
case class CurveKey3(first: Expression, second: Expression, third: Expression, hilbert: Boolean)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = if (hilbert) "hilbert_key" else "zorder_key"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val (x, y, z) = (a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])
    if (hilbert) SpaceCurve.hilbert3(x, y, z, SpaceCurve.BitsPerDim)
    else SpaceCurve.zOrder3(x, y, z, SpaceCurve.BitsPerDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (hilbert) "hilbert3" else "zOrder3"
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.maintain.SpaceCurve.$fn($a, $b, $c, ${SpaceCurve.BitsPerDim})")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Lexicographic-order-preserving string→coordinate (first 8 bytes, top
  * 21 bits); codegen'd static call like CurveKey3. */
case class StringPrefixBits(child: Expression, skip: Int, pmin: Long, pmax: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "string_prefix_bits"

  override protected def nullSafeEval(v: Any): Any =
    SpaceCurve.stringPrefixBits(v.asInstanceOf[UTF8String], skip, pmin, pmax, SpaceCurve.BitsPerDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.maintain.SpaceCurve.stringPrefixBits($c, $skip, ${pmin}L, ${pmax}L, ${SpaceCurve.BitsPerDim})")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ClusterKey {
  import SpaceCurve.MaxCoord
  import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}

  /** Categorical coordinate: equal values collapse to one point (cluster
    * together); cross-value order is hash order, which is fine for a
    * categorical dimension. */
  def categoricalCoord(c: Column): Column = pmod(xxhash64(c), lit(MaxCoord + 1))

  /** Numeric coordinate range-normalized from [lo, hi] to [0, 2^21). */
  def numericCoord(c: Column, lo: Long, hi: Long): Column = {
    val span = math.max(hi - lo, 1L)
    least(greatest((c.cast("long") - lit(lo)) * lit(MaxCoord) / lit(span), lit(0L)), lit(MaxCoord))
      .cast("long")
  }

  /** Fitted encoding for one string column: skip the longest common
    * prefix, rescale the 7-byte window from [pmin, pmax] onto the full
    * coordinate range. */
  final case class StrEnc(skip: Int, pmin: Long, pmax: Long)
  object StrEnc {
    val identity: StrEnc = StrEnc(0, 0L, (1L << 56) - 1)
    def fromRange(mn: String, mx: String): StrEnc = {
      val skip = SpaceCurve.lcpLen(mn, mx)
      StrEnc(skip, SpaceCurve.stringPrefix7(mn, skip), SpaceCurve.stringPrefix7(mx, skip))
    }
  }

  /** Order-preserving range-normalized string coordinate. */
  def stringCoord(c: Column, e: StrEnc = StrEnc.identity): Column =
    ofExpr(StringPrefixBits(toExpr(c), e.skip, e.pmin, e.pmax))

  /** Encoding parameters fitted from manifest stats — computed driver-side
    * for free before a rewrite; without fitting, domains with a shared
    * prefix ("doc-%012d") or narrow byte ranges (ASCII digits) collapse
    * into a sliver of the coordinate space and the curve degenerates. */
  final case class Fit(src: StrEnc, doc: StrEnc, nTokLo: Long, nTokHi: Long)
  object Fit { val default: Fit = Fit(StrEnc.identity, StrEnc.identity, 64L, 2048L) }

  /** Fit the curve encodings from per-file stats in the manifest. */
  def fit(segments: Seq[graft.meta.SegmentMeta]): Fit = {
    import graft.meta.StatVal
    def strRange(colName: String): Option[(String, String)] = {
      val mins = segments.flatMap(_.stats.get(colName).flatMap(_.min)).collect { case StatVal.S(v) => v }
      val maxs = segments.flatMap(_.stats.get(colName).flatMap(_.max)).collect { case StatVal.S(v) => v }
      if (mins.isEmpty || maxs.isEmpty) None else Some((mins.min, maxs.max))
    }
    def longRange(colName: String): Option[(Long, Long)] = {
      val mins = segments.flatMap(_.stats.get(colName).flatMap(_.min)).collect { case StatVal.L(v) => v }
      val maxs = segments.flatMap(_.stats.get(colName).flatMap(_.max)).collect { case StatVal.L(v) => v }
      if (mins.isEmpty || maxs.isEmpty) None else Some((mins.min, maxs.max))
    }
    val src = strRange("source").map((StrEnc.fromRange _).tupled).getOrElse(StrEnc.identity)
    val doc = strRange("doc_id").map((StrEnc.fromRange _).tupled).getOrElse(StrEnc.identity)
    val (lo, hi) = longRange("n_tok").getOrElse((64L, 2048L))
    Fit(src, doc, lo, hi)
  }

  /** The clustering key for the token table: (source, n_tok, doc_id) per
    * the north rule, as a single LongType sort column. String coordinates
    * are ORDER-PRESERVING (fitted prefix windows, not hashes) so per-file
    * min/max STRING stats line up with curve order and per-source scans
    * prune files after clustering. */
  def tokenTableKey(curve: String, f: Fit = Fit.default): Column = {
    val src = stringCoord(col("source"), f.src)
    val ntk = numericCoord(col("n_tok"), f.nTokLo, f.nTokHi)
    val doc = stringCoord(col("doc_id"), f.doc)
    ofExpr(CurveKey3(toExpr(src), toExpr(ntk), toExpr(doc), hilbert = curve == "hilbert"))
  }
}
