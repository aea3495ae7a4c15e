package graft.maintain

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Range partitioning WITHOUT the range exchange's hidden second read.
  *
  * `repartitionByRange` samples its child to learn boundaries — and the
  * sampling job EXECUTES the full child, so a compaction bin is read and
  * decoded twice per rewrite (measured: the sample pass roughly doubles
  * scan bytes, ~40 % of zorder rewrite wall time — the token payload is
  * ~95 % of the bytes and the sampler decodes it just to throw it away).
  * This helper splits the two concerns the exchange fuses:
  *
  *  1. boundaries come from an EXPLICIT sample over a NARROW projection
  *     (cluster-key columns only — parquet column pruning skips the
  *     payload), collected once driver-side;
  *  2. routing is a codegen'd binary search over those boundary literals
  *     ([[RangeBucketLabel]]) feeding a plain hash `repartition(n, lbl)`
  *     — whose label values are chosen with [[RangeBuckets.labelsFor]]
  *     to INVERT Spark's `HashPartitioning` (pmod(murmur3(label), n) ==
  *     range index), so range r lands exactly in shuffle partition r and
  *     the hash exchange becomes a range exchange with zero sampling.
  *
  * Net: one full read of the bin instead of two; identical clustering
  * semantics (contiguous (key, salt) ranges per output file, nulls
  * low-ordered via the caller's coalesce).
  */
object RangeBuckets {

  /** labels(r) routes range r to shuffle partition r under Spark's
    * `HashPartitioning(Seq(lbl: Int), n)`: the label L(r) is the smallest
    * non-negative Int with pmod(murmur3_42(L), n) == r, found by direct
    * evaluation of the SAME Catalyst expression HashPartitioning uses —
    * no reimplementation to drift. Expected search cost O(n ln n). */
  def labelsFor(n: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    require(n >= 1)
    val out = Array.fill(n)(-1)
    var found = 0
    var k = 0
    while (found < n) {
      val pid = Pmod(new Murmur3Hash(Seq(Literal(k))), Literal(n)).eval(null).asInstanceOf[Int]
      if (out(pid) < 0) { out(pid) = k; found += 1 }
      k += 1
    }
    out
  }

  /** n−1 lexicographic (key, salt) quantile boundaries from a collected
    * sample (equi-depth). Duplicate adjacent boundaries are legal — they
    * just leave a bucket empty, and empty output part files are dropped
    * by the swap. */
  def boundsFromSample(sample: Array[(Long, Long)], n: Int): (Array[Long], Array[Long]) = {
    if (n <= 1 || sample.isEmpty) return (Array.empty, Array.empty)
    val s = sample.sorted
    val bk = new Array[Long](n - 1)
    val bs = new Array[Long](n - 1)
    var i = 0
    while (i < n - 1) {
      val idx = math.min((((i + 1).toLong * s.length) / n).toInt, s.length - 1)
      bk(i) = s(idx)._1
      bs(i) = s(idx)._2
      i += 1
    }
    (bk, bs)
  }

  /** r = count of boundaries strictly below (k, s) lexicographically
    * (binary search); returns labels(r). Hot boundary keys split across
    * buckets by the salt component, exactly like the (key, salt) range
    * exchange did. */
  def bucketLabel(k: Long, s: Long, bk: Array[Long], bs: Array[Long],
                  labels: Array[Int]): Int = {
    var lo = 0
    var hi = bk.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bk(mid) < k || (bk(mid) == k && bs(mid) < s)) lo = mid + 1 else hi = mid
    }
    labels(lo)
  }
}

/** Codegen'd boundary binary search + partition-label lookup; the
  * boundary/label arrays ride into generated code as reference objects
  * (the [[graft.functions.NearestCentroids]] pattern). Seq fields keep
  * expression equality structural. */
case class RangeBucketLabel(key: Expression, salt: Expression,
                            boundsK: Seq[Long], boundsS: Seq[Long], labels: Seq[Int])
    extends BinaryExpression {
  require(boundsK.length == boundsS.length && labels.length == boundsK.length + 1)

  @transient private lazy val bkArr: Array[Long] = boundsK.toArray
  @transient private lazy val bsArr: Array[Long] = boundsS.toArray
  @transient private lazy val lblArr: Array[Int] = labels.toArray

  override def left: Expression = key
  override def right: Expression = salt
  override def dataType: DataType = IntegerType
  override def prettyName: String = "range_bucket_label"

  override protected def nullSafeEval(k: Any, s: Any): Any =
    RangeBuckets.bucketLabel(k.asInstanceOf[Long], s.asInstanceOf[Long], bkArr, bsArr, lblArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bk = ctx.addReferenceObj("rangeBoundsK", bkArr, "long[]")
    val bs = ctx.addReferenceObj("rangeBoundsS", bsArr, "long[]")
    val lb = ctx.addReferenceObj("rangeLabels", lblArr, "int[]")
    defineCodeGen(ctx, ev, (k, s) =>
      s"graft.maintain.RangeBuckets.bucketLabel($k, $s, $bk, $bs, $lb)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(key = l, salt = r)
}
