package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashKernels, VectorKernels}

/** Property-style checks of the native kernels against independently
  * written slow references (seeded randomness — deterministic, repo
  * convention per BitmapSpec). The kernels run in every hot path; a silent
  * divergence here would corrupt results while staying plan-green. */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("intersectCount == set-intersection size on random distinct arrays") {
    for (_ <- 1 to 300) {
      val universe = (1 to rnd.nextInt(40) + 1).map(_ => rnd.nextLong() % 50).distinct
      val a = rnd.shuffle(universe).take(rnd.nextInt(universe.size + 1))
      val b = rnd.shuffle(universe).take(rnd.nextInt(universe.size + 1))
      val got = HashKernels.intersectCount(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(got == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
    // zero values and empties are honest set members
    assert(HashKernels.intersectCount(
      new GenericArrayData(Array(0L, 5L)), new GenericArrayData(Array(0L))) == 1)
    assert(HashKernels.intersectCount(
      new GenericArrayData(Array.empty[Long]), new GenericArrayData(Array(1L))) == 0)
  }

  test("nearestCentroids == brute-force cosine ranking with id tie-break") {
    def refNearest(v: Array[Double], cents: Array[Array[Double]], n: Int): Seq[Int] = {
      def norm(x: Array[Double]) = math.sqrt(x.map(d => d * d).sum)
      val vn = norm(v)
      val scored = cents.zipWithIndex.map { case (c, i) =>
        val cn = norm(c)
        val s = if (vn == 0.0 || cn == 0.0) -2.0
                else c.zip(v).map { case (x, y) => x * y }.sum / vn / cn
        (s, i + 1)
      }
      scored.sortBy { case (s, id) => (-s, id) }.take(n).map(_._2).toSeq
    }
    for (trial <- 1 to 100) {
      val dims = rnd.nextInt(6) + 2
      val nc = rnd.nextInt(7) + 2
      val cents = Array.fill(nc)(Array.fill(dims)(
        if (rnd.nextInt(10) == 0) 0.0 else rnd.nextGaussian()))
      // occasionally a whole-zero centroid (the NaN-capture regression)
      if (trial % 7 == 0) java.util.Arrays.fill(cents(0), 0.0)
      val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val v = if (trial % 11 == 0) Array.fill(dims)(0.0)
              else Array.fill(dims)(rnd.nextGaussian())
      val n = rnd.nextInt(nc) + 1
      val got = VectorKernels.nearestCentroids(
        new GenericArrayData(v), cents, norms, n)
      assert(got.toIntArray().toSeq == refNearest(v, cents, n), s"trial $trial")
    }
  }

  test("simhashMd5 == independent slow reference (string ops + BigInteger bits)") {
    def ref(text: String): Long = {
      val words = text.split("\\s+").filter(_.nonEmpty)
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](64)
      words.foreach { w =>
        val d = md.digest(w.getBytes("UTF-8"))
        for (b <- 0 until 64) {
          val bit = (d(b / 8) >> (7 - b % 8)) & 1
          counts(b) += (if (bit == 1) 1 else -1)
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
    }
    val texts = Seq("", " ", "  a  ", "hello world", "héllo wörld ✓ 😀",
      "a\tb\nc\rd\fe", "same same same different") ++
      (1 to 50).map(_ => (1 to rnd.nextInt(20)).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString).mkString(" "))
    texts.foreach { t =>
      assert(HashKernels.simhashMd5(UTF8String.fromString(t)) == ref(t), s"text='$t'")
    }
  }

  test("RangeBuckets.bucketLabel matches a naive scan on random bounds/keys") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(40)
      val bk = Array.fill(n - 1)(rnd.nextLong() % 1000L).sorted
      val bs = Array.fill(n - 1)(rnd.nextLong() % 100L)
      // enforce lexicographic boundary order (sort pairs)
      val pairs = bk.zip(bs).sorted
      val (pk, ps) = (pairs.map(_._1), pairs.map(_._2))
      val labels = Array.range(0, n)
      def naive(k: Long, sa: Long): Int =
        labels(pk.indices.count(i => pk(i) < k || (pk(i) == k && ps(i) < sa)))
      for (_ <- 1 to 50) {
        val k = rnd.nextLong() % 1200L
        val sa = rnd.nextLong() % 120L
        assert(graft.maintain.RangeBuckets.bucketLabel(k, sa, pk, ps, labels) == naive(k, sa))
      }
    }
  }

  test("RangeBuckets.labelsFor is a bijection onto [0, n) for many n") {
    for (n <- Seq(1, 2, 3, 7, 16, 63, 128, 997)) {
      val l = graft.maintain.RangeBuckets.labelsFor(n)
      assert(l.length == n && l.distinct.length == n)
      assert(l.forall(_ >= 0))
    }
  }

  test("dateBin floor semantics: bin start <= ts < bin start + stride, origin-anchored") {
    import graft.functions.TimeKernels.dateBin
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 2000) {
      val stride = 1L + rnd.nextInt(1000000000)
      val origin = rnd.nextLong() % (1L << 40)
      val ts = rnd.nextLong() % (1L << 44) // pre-origin values included
      val b = dateBin(stride, ts, origin)
      assert(b <= ts && ts < b + stride, s"bin $b not containing $ts (stride $stride)")
      assert(java.lang.Math.floorMod(b - origin, stride) == 0L, "bin not on the origin grid")
      // idempotent: binning a bin start is the identity
      assert(dateBin(stride, b, origin) == b)
    }
    intercept[IllegalArgumentException](dateBin(0L, 1L, 0L))
    intercept[IllegalArgumentException](dateBin(-5L, 1L, 0L))
  }
}
