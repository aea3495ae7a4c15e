package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for pretraining pipelines (north-rule addition): the
  * GPT-style concat-then-chunk layout. Documents are concatenated in a
  * deterministic order (groupCol, idCol) into one token stream per group,
  * and the stream is chunked into fixed `maxTokens` training sequences.
  * The operator emits, per document:
  *   - `stream_pos` — its start offset in the group's token stream;
  *   - `seq_id`     — the training sequence its first token lands in
  *                    (floor(stream_pos / maxTokens)).
  * Both are pure prefix-sum arithmetic, so the assignment is reproducible
  * across engines (the correctness oracle recomputes it with SQL window
  * functions).
  *
  * Two implementations with identical results:
  *   - [[packStream]]: one Spark window (partitionBy group, orderBy id) —
  *     the declarative reference form. Its scale ceiling is the HOT GROUP:
  *     Window.partitionBy puts each group in ONE task, so a group holding
  *     10^11 of the corpus's 10^12 rows serializes through one core.
  *   - [[packStreamScalable]]: the classic two-pass distributed prefix
  *     sum over a (group, id) range partitioning — pass 1 computes per
  *     (partition, group) token totals (tiny: O(partitions) rows to the
  *     driver), pass 2 re-scans adding each partition's base offsets.
  *     No per-group task bottleneck: a hot group spans many range
  *     partitions. This is the 100 TB path; mapPartitions is justified
  *     here because a cross-partition running sum is genuinely
  *     per-partition imperative logic (Catalyst has no distributed-scan
  *     primitive for it).
  */
object Packing {

  /** Declarative reference form: one window per group. */
  def packStream(df: DataFrame, groupCol: String, idCol: String,
                 nTokCol: String, maxTokens: Int): DataFrame = {
    require(maxTokens > 0)
    val w = Window.partitionBy(groupCol).orderBy(idCol)
    df.select(col(groupCol), col(idCol), col(nTokCol))
      .withColumn("stream_pos",
        coalesce(sum(col(nTokCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", floor(col("stream_pos") / maxTokens))
  }

  /** Two-pass distributed prefix sum; result equals [[packStream]] row
    * for row (asserted in OpsSpec). `partitions` defaults to the session
    * shuffle parallelism. */
  def packStreamScalable(df: DataFrame, groupCol: String, idCol: String,
                         nTokCol: String, maxTokens: Int,
                         partitions: Int = 0): DataFrame = {
    require(maxTokens > 0)
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    // ONE sort-shuffle by (group, id); both passes read this layout. The
    // ORIGINAL group/nTok columns ride along untouched (same output
    // schema as packStream); column 3 is the long view of nTok the sums
    // use. Caching would help the double scan at small scale but hurt at
    // 100 TB (the second scan is columnar and cheap; the cache is not).
    val sorted = df.select(col(groupCol), col(idCol), col(nTokCol),
        col(nTokCol).cast("long").as("__n"))
      .repartitionByRange(p, col(groupCol), col(idCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
    // group key for the driver maps: any stable string form works (keys
    // only ever compare within this job); null group -> sentinel
    def gkey(r: Row): String = if (r.isNullAt(0)) "\u0000null" else String.valueOf(r.get(0))
    // null nTok contributes 0 (the window form's sum() skips nulls too)
    def nval(r: Row): Long = if (r.isNullAt(3)) 0L else r.getLong(3)

    // ONE physical RDD serves both passes (Dataset.rdd is a lazy val, but
    // hoisting makes it explicit): the range-partitioner samples once and
    // the shuffle output is reused, so pass 1 and pass 2 see the IDENTICAL
    // row-to-partition assignment even when upstream ordering is
    // nondeterministic — two separate plans could sample different bounds
    // and silently shift rows across the partition boundary.
    val sortedRdd = sorted.rdd

    // pass 1: per-(partition, group) token totals — O(partitions × groups
    // present per partition) rows, collected to the driver
    val partTotals: Array[(Int, Seq[(String, Long)])] =
      sortedRdd.mapPartitionsWithIndex { (pid, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r => val g = gkey(r); sums(g) = sums.getOrElse(g, 0L) + nval(r) }
        Iterator.single(pid -> sums.toSeq)
      }.collect()

    // driver: base offset of each (partition, group) = totals of the SAME
    // group in all EARLIER partitions (range partitioning guarantees a
    // group's rows sit in a contiguous partition span, ordered by id)
    val bases: Map[(Int, String), Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
      val out = Map.newBuilder[(Int, String), Long]
      partTotals.sortBy(_._1).foreach { case (pid, sums) =>
        sums.foreach { case (g, total) =>
          out += ((pid, g) -> acc.getOrElse(g, 0L))
          acc(g) = acc.getOrElse(g, 0L) + total
        }
      }
      out.result()
    }
    val basesB = spark.sparkContext.broadcast(bases)

    // pass 2: local running sum + broadcast base per (partition, group)
    val outSchema = StructType(sorted.schema.fields.take(3) ++ Seq(
      StructField("stream_pos", LongType, nullable = false),
      StructField("seq_id", LongType, nullable = false)))
    val packed = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      val base = basesB.value
      val local = scala.collection.mutable.Map.empty[String, Long]
      it.map { r =>
        val g = gkey(r)
        val start = base.getOrElse((pid, g), 0L) + local.getOrElse(g, 0L)
        local(g) = local.getOrElse(g, 0L) + nval(r)
        Row(r.get(0), r.get(1), r.get(2), start, start / maxTokens)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }
}
