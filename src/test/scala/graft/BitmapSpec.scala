package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.coverage.{Bitmap, BucketMath}
import graft.meta.TimeBucket

/** Coverage-algebra tests porting the reference's edge cases
  * (coverage.rs:327-576) plus property-style checks against a reference
  * Set[Int] model (seeded sampling), and bucket-math boundary tests
  * (bucket.rs:151-349). */
class BitmapSpec extends AnyFunSuite {

  private def sampleSets(seed: Int, n: Int = 200): Seq[Set[Int]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val size = rnd.nextInt(60)
      (0 until size).map(_ => rnd.nextInt(301)).toSet
    }
  }

  test("build/cardinality/contains vs Set model") {
    sampleSets(1).foreach { s =>
      val b = Bitmap(s)
      assert(b.cardinality == s.size.toLong)
      (0 to 301).foreach(i => assert(b.contains(i) == s.contains(i)))
    }
  }

  test("union / intersect / andNot vs Set model") {
    sampleSets(2).zip(sampleSets(3)).foreach { case (s1, s2) =>
      val (b1, b2) = (Bitmap(s1), Bitmap(s2))
      assert(b1.union(b2) == Bitmap(s1 union s2))
      assert(b1.intersect(b2) == Bitmap(s1 intersect s2))
      assert(b1.andNot(b2) == Bitmap(s1 diff s2))
    }
  }

  test("serialize round-trip") {
    sampleSets(4).foreach { s =>
      val b = Bitmap(s)
      assert(Bitmap.deserialize(b.serialize()) == b)
    }
  }

  test("coverage_ratio: empty expected is vacuously 1.0") {
    assert(Bitmap(Seq(1, 2, 3)).coverageRatio(Bitmap.empty) == 1.0)
    assert(Bitmap.empty.coverageRatio(Bitmap.range(0, 9)) == 0.0)
    assert(Bitmap(Seq(0, 1, 3)).coverageRatio(Bitmap.range(0, 3)) == 0.75)
  }

  test("missing runs with split length (coverage.rs run splitting)") {
    val present = Bitmap(Seq(0, 1, 5, 9))
    val expected = Bitmap.range(0, 9)
    assert(present.missingRuns(expected, Long.MaxValue) == Seq((2, 4), (6, 8)))
    assert(present.missingRuns(expected, 2L) == Seq((2, 3), (4, 4), (6, 7), (8, 8)))
    assert(present.missingRuns(expected, 0L) == Nil) // max_len=0 → empty
  }

  test("max gap length") {
    val present = Bitmap(Seq(0, 1, 5, 9))
    assert(present.maxGapLen(Bitmap.range(0, 9)) == 3L)
    assert(Bitmap.range(0, 9).maxGapLen(Bitmap.range(0, 9)) == 0L)
  }

  test("last run with min len; min_len=0 → None") {
    val present = Bitmap(Seq(0, 1, 2, 5, 6, 9))
    val expected = Bitmap.range(0, 9)
    assert(present.lastRunWithMinLen(expected, 2L).contains((5, 6)))
    assert(present.lastRunWithMinLen(expected, 3L).contains((0, 2)))
    assert(present.lastRunWithMinLen(expected, 4L).isEmpty)
    assert(present.lastRunWithMinLen(expected, 0L).isEmpty)
  }

  test("last window at or before (window over gaps)") {
    val present = Bitmap(Seq(0, 1, 2, 3, 7, 8, 9))
    assert(present.lastWindowAtOrBefore(9, 3L).contains((7, 9)))
    assert(present.lastWindowAtOrBefore(8, 3L).isEmpty ||
      present.lastWindowAtOrBefore(8, 3L).contains((1, 3))) // 7-8 too short, falls to 1-3
    assert(present.lastWindowAtOrBefore(9, 4L).contains((0, 3)))
    assert(present.lastWindowAtOrBefore(9, 5L).isEmpty)
    assert(present.lastWindowAtOrBefore(9, 0L).isEmpty)
  }

  test("bucket math: euclidean floor with pre-epoch clamp") {
    val b1m = TimeBucket.parse("1m")
    assert(BucketMath.bucketIdFromSeconds(0L, b1m) == 0)
    assert(BucketMath.bucketIdFromSeconds(59L, b1m) == 0)
    assert(BucketMath.bucketIdFromSeconds(60L, b1m) == 1)
    assert(BucketMath.bucketIdFromSeconds(-1L, b1m) == 0)   // clamp
    assert(BucketMath.bucketIdFromSeconds(-61L, b1m) == 0)  // clamp
  }

  test("bucket range: half-open end via end-1us trick") {
    val b1m = TimeBucket.parse("1m")
    // [0s, 60s) -> bucket 0 only; [0s, 60.000001s) -> buckets 0..1
    assert(BucketMath.bucketRangeMicros(0L, 60000000L, b1m) == ((0, 0)))
    assert(BucketMath.bucketRangeMicros(0L, 60000001L, b1m) == ((0, 1)))
    assert(BucketMath.bucketRangeMicros(1000000L, 61000000L, b1m) == ((0, 1)))
    intercept[IllegalArgumentException](BucketMath.bucketRangeMicros(5L, 5L, b1m))
  }

  test("sparse coverage fixture: rows at 1s/61s/180s => buckets {0,1,3}, gap at 2") {
    val b1m = TimeBucket.parse("1m")
    val present = Bitmap(Seq(1L, 61L, 180L).map(BucketMath.bucketIdFromSeconds(_, b1m)))
    assert(present == Bitmap(Seq(0, 1, 3)))
    val expected = BucketMath.expectedBucketsMicros(0L, 240000000L, b1m)
    assert(expected == Bitmap.range(0, 3))
    assert(present.coverageRatio(expected) == 0.75)
    assert(present.maxGapLen(expected) == 1L)
    assert(present.missingRuns(expected, Long.MaxValue) == Seq((2, 2)))
  }
}
