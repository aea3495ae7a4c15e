package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines (north-rule
  * addition; no analog in the reference): every row lands in a stable
  * bucket derived from a key hash, so train/val/test membership is
  * reproducible across runs, machines and engines — never `rand()`, which
  * resamples on every evaluation and can't be audited after the fact.
  *
  * Scale shape: one codegen'd projection, zero shuffle — membership is a
  * pure function of the key. Filtering a split composes with partition
  * and stats pruning like any other predicate.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from xxhash64(key) — the production
    * path (fastest; Spark-specific hash). */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0)
    pmod(xxhash64(key), lit(buckets.toLong)).cast("int")
  }

  /** Stable bucket in [0, buckets) from the first 8 hex digits of
    * md5(key) — engine-portable (any system with md5 reproduces the
    * split byte-for-byte; the correctness oracle recomputes it in SQL).
    * 32 bits of hash is ample for percentage-level splits. */
  def md5Bucket(key: Column, buckets: Int): Column = {
    require(buckets > 0)
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets).cast("int")
  }

  /** Label rows train/val/test by md5 bucket percentage: [0, trainPct) →
    * train, [trainPct, trainPct+valPct) → val, rest → test. */
  def split(df: DataFrame, keyCol: String, trainPct: Int = 90, valPct: Int = 5,
            splitCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100)
    val b = md5Bucket(col(keyCol), 100)
    df.withColumn(splitCol,
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }
}
