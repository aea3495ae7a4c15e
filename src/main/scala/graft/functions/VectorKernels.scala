package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Tight-loop kernels for the embedding operators (same rationale as
  * HashKernels: Spark's higher-order functions never codegen, and the
  * dot products here run once per CANDIDATE PAIR — the innermost loop of
  * ANN scoring and near-dup verification).
  *
  * Both kernels accumulate in the same left-to-right order as the SQL
  * `aggregate(zip_with(...))` reference forms, so results are
  * bit-identical (asserted in OpsSpec), not merely close.
  */
object VectorKernels {

  /** Σ a(i)·b(i) over the common prefix length (inputs always have equal
    * length in our pipelines; elements must be non-null). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Top-`n` nearest centroids of `v` by cosine, as 1-based centroid ids
    * ordered by (cosine desc, id asc) — the ties and ordering of the
    * former Window.partitionBy(id) formulation, without its n×NC shuffle:
    * the centroid matrix rides along as a broadcast-sized literal and the
    * argmax is one tight loop per row, so IVF assignment (and every Lloyd
    * iteration) is a pure projection. Zero-norm vectors or centroids score
    * −2.0 (< any real cosine), so a degenerate all-zero centroid can never
    * capture the corpus via NaN ordering (0/0 sorts first under desc). */
  def nearestCentroids(v: ArrayData, cents: Array[Array[Double]],
                       norms: Array[Double], n: Int): ArrayData = {
    val nc = cents.length
    val dims = v.numElements()
    var vn = 0.0
    var i = 0
    while (i < dims) { val x = v.getDouble(i); vn += x * x; i += 1 }
    vn = math.sqrt(vn)
    val scores = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cent = cents(c)
      // a dims mismatch (wrong-width vector vs the trained quantizer) is
      // quarantined like the dirty-vector case: sentinel score, NOT a
      // truncated partial dot product — a silently-partial cosine against a
      // full centroid norm gave deterministic but WRONG assignments
      if (vn == 0.0 || norms(c) == 0.0 || cent.length != dims) scores(c) = -2.0
      else {
        val m = dims
        var acc = 0.0
        var j = 0
        while (j < m) { acc += v.getDouble(j) * cent(j); j += 1 }
        val s = acc / vn / norms(c)
        // NaN (dirty vector: NaN/Inf elements) would make every comparison
        // below false and leave best = -1 — map it to the same sentinel as
        // zero-norm so a dirty row still gets a deterministic assignment
        scores(c) = if (java.lang.Double.isNaN(s)) -2.0 else s
      }
      c += 1
    }
    val k = math.min(n, nc)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nc)
    var r = 0
    while (r < k) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c2 = 0
      while (c2 < nc) {
        if (!taken(c2) && scores(c2) > bestScore) { best = c2; bestScore = scores(c2) }
        c2 += 1
      }
      taken(best) = true
      out(r) = best + 1 // 1-based centroid_id, ties broken by smaller id
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Multi-probe hyperplane LSH blocks for a vector: element 0 is the home
    * block (sign pattern over `planes` deterministic pseudo-gaussian
    * hyperplanes, weights w(i,p) = (pmod(xxhash64(i,p), 2001) − 1000)/1000);
    * element q ≥ 1 flips the bit of the plane with the q-th smallest
    * (|projection|, plane) pair — the least-confident signs. Ordering by
    * the PAIR makes probe positions distinct even under tied projections
    * (e.g. the zero vector), so `probes` always buys `probes` distinct
    * blocks. Bit of plane p sits at (planes − 1 − p); exactly the SQL
    * reference form in Dedup.probeBlocksSql. */
  def probeBlocks(v: ArrayData, planes: Int, probes: Int): ArrayData = {
    val dims = v.numElements()
    val projs = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      val hp = 42L // seed; per-element chain below matches xxhash64(i, p)
      var acc = 0.0
      var i = 0
      while (i < dims) {
        var h = XXH64.hashInt(i, hp)
        h = XXH64.hashInt(p, h)
        val w = (Math.floorMod(h, 2001L) - 1000L).toDouble / 1000.0
        acc += v.getDouble(i) * w
        i += 1
      }
      projs(p) = acc
      p += 1
    }
    var block = 0L
    p = 0
    while (p < planes) { block = block * 2 + (if (projs(p) >= 0.0) 1L else 0L); p += 1 }

    val out = new Array[Long](probes)
    out(0) = block
    if (probes > 1) {
      val order = Array.range(0, planes)
        .sortBy(pp => (math.abs(projs(pp)), pp)) // distinct positions under ties
      var q = 1
      while (q < probes) {
        out(q) = block ^ (1L << (planes - 1 - order(q - 1)))
        q += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd dot product of two array<double> columns. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<double> columns, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd top-`n` nearest-centroid ids (array<int>, 1-based, ordered
  * by cosine desc then id). The centroid matrix is a literal carried into
  * generated code as a reference object — the broadcast-argmax shape that
  * replaces the Window-over-crossJoin IVF assignment (a multi-PB exchange
  * per Lloyd iteration at 10^10 vectors × 256 centroids). Centroids are
  * held as Seq-of-Seq so expression equality/canonicalization stays
  * structural. */
case class NearestCentroids(child: Expression, cents: Seq[Seq[Double]], n: Int)
    extends UnaryExpression {
  require(cents.nonEmpty && n >= 1)
  @transient private lazy val matrix: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    matrix.map(c => math.sqrt(c.map(x => x * x).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCentroids(v.asInstanceOf[ArrayData], matrix, norms, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centsMatrix", matrix, "double[][]")
    val nm = ctx.addReferenceObj("centsNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.nearestCentroids($c, $m, $nm, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd multi-probe hyperplane-LSH block keys (array<bigint>,
  * element 0 = home block). */
case class ProbeBlocks(child: Expression, planes: Int, probes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 62 && probes >= 1 && probes <= planes)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName needs array<double>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "probe_blocks"

  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.probeBlocks(v.asInstanceOf[ArrayData], planes, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorKernels.probeBlocks($c, $planes, $probes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
