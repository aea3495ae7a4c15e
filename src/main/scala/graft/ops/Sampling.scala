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

  /** Per-group quota: keep the first `n` rows of each group under
    * `orderCols` ("at most N docs per domain", "top-N by quality per
    * source" — the standard source-balancing step before training).
    * Emits the original columns plus `rk` (1-based rank, long).
    *
    * Declared as row_number-over-window + rank filter ON PURPOSE: Spark's
    * InferWindowGroupLimit rewrite turns exactly this shape into a
    * WindowGroupLimit exec that keeps a bounded per-group top-N heap on
    * the MAP side before the shuffle — the scan never materializes a full
    * per-group sort, so a 10⁹-row hot domain costs the same shuffle volume
    * as an N-row one. PlanAuditSpec asserts the rewrite fires. */
  def perGroupQuota(df: DataFrame, groupCol: String, n: Int,
                    orderCols: Column*): DataFrame = {
    require(n > 0)
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rk",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(orderCols: _*))
          .cast("long"))
      .where(col("rk") <= n)
  }

  /** Token-budget corpus selection: order the corpus by `orderCols`
    * (e.g. quality desc) and keep the maximal prefix whose cumulative
    * `weightCol` (token count) stays ≤ `budget` — the "take the best B
    * tokens" step of data-mixing recipes. Weights must be non-negative.
    * Emits the original columns plus `cum` (inclusive running total, long).
    *
    * A global ordered prefix sum cannot be one window (a single global
    * partition serializes the corpus through one task), so this is the
    * two-pass distributed prefix sum over ONE pinned range-partitioned
    * RDD — the same machinery as [[Packing.packStreamScalable]], minus
    * the per-group maps: pass 1 ships one long per partition to the
    * driver (O(partitions) driver state), pass 2 re-scans adding each
    * partition's base. Partitions whose base already exceeds the budget
    * are skipped without reading a row, so pass 2 touches only the
    * selected prefix — at 100 TB with a 1 % budget that is 1 % of the
    * files. */
  def takeUntilBudget(df: DataFrame, weightCol: String, budget: Long,
                      orderCols: Seq[Column], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df.withColumn("__w", col(weightCol).cast("long"))
      .repartitionByRange(p, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val wIdx = sorted.schema.fieldIndex("__w")
    // ONE physical RDD serves both passes (see packStreamScalable: two
    // separate plans could range-sample different bounds and shift rows
    // across a partition boundary between the passes)
    val sortedRdd = sorted.rdd
    val partTotals: Array[(Int, Long)] = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(wIdx)) s += r.getLong(wIdx))
      Iterator.single(pid -> s)
    }.collect()
    val bases: Map[Int, Long] = {
      var acc = 0L
      partTotals.sortBy(_._1).map { case (pid, total) =>
        val b = (pid, acc); acc += total; b
      }.toMap.map(identity)
    }
    val basesB = spark.sparkContext.broadcast(bases)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields.dropRight(1) :+
        org.apache.spark.sql.types.StructField("cum",
          org.apache.spark.sql.types.LongType, nullable = false))
    val nKeep = outSchema.fields.length - 1
    val selected = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val base = basesB.value.getOrElse(pid, 0L)
      if (base > budget) Iterator.empty // whole partition past the budget
      else {
        var cum = base
        it.map { r =>
          cum += (if (r.isNullAt(wIdx)) 0L else r.getLong(wIdx))
          org.apache.spark.sql.Row.fromSeq(r.toSeq.take(nKeep) :+ cum)
        }.takeWhile(_.getLong(nKeep) <= budget) // weights ≥ 0 ⇒ cum monotone
      }
    }
    spark.createDataFrame(selected, outSchema)
  }
}
