package graft.coverage

import graft.meta.TimeBucket

/** Bucket-id arithmetic, mirroring the reference's Euclidean floor division
  * semantics with pre-epoch clamping (coverage/bucket.rs:30-37, 66-75) and
  * the half-open `[start, end)` → inclusive id range via the `end − 1µs`
  * trick (bucket.rs:101-129; the reference uses 1ns, our timestamps are
  * Spark-native microseconds).
  */
object BucketMath {

  /** bucket_id = floor_div(epoch_seconds, bucket_len_seconds); pre-epoch
    * values clamp to 0 like the reference's release behavior. Result must
    * fit the non-negative Int domain (u32 analog). */
  def bucketIdFromSeconds(epochSeconds: Long, bucket: TimeBucket): Int = {
    val len = bucket.lengthSeconds
    val id = Math.floorDiv(epochSeconds, len)
    if (id < 0) 0
    else {
      require(id <= Int.MaxValue, s"bucket id $id overflows bucket domain")
      id.toInt
    }
  }

  def bucketIdFromMicros(epochMicros: Long, bucket: TimeBucket): Int =
    bucketIdFromSeconds(Math.floorDiv(epochMicros, 1000000L), bucket)

  /** Inclusive bucket-id range for the half-open micros range [start, end). */
  def bucketRangeMicros(startMicros: Long, endMicros: Long, bucket: TimeBucket): (Int, Int) = {
    require(startMicros < endMicros, s"invalid range [$startMicros,$endMicros)")
    val lo = bucketIdFromMicros(startMicros, bucket)
    val hi = bucketIdFromMicros(endMicros - 1L, bucket)
    (lo, hi)
  }

  /** All expected buckets for [start, end) as a bitmap
    * (reference: bucket.rs:136-149 expected_buckets_for_range). */
  def expectedBucketsMicros(startMicros: Long, endMicros: Long, bucket: TimeBucket): Bitmap = {
    val (lo, hi) = bucketRangeMicros(startMicros, endMicros, bucket)
    Bitmap.range(lo, hi)
  }
}
