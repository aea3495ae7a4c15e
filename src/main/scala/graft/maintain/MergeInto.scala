package graft.maintain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.{SegmentMeta, StatVal}
import graft.table.TsTable

/** Catalyst-planned MERGE INTO (upsert) for revised sequences — new vs the
  * reference (north rule): copy-on-write over only the files whose key
  * range can contain an update key.
  *
  * Plan shape (all declarative Dataset ops; Catalyst picks broadcast vs
  * shuffle join, AQE handles skew):
  *  1. FILE PRUNING: candidate files = live segments whose [min,max] stats
  *     on the key column intersect the update keyset. Evaluated by joining
  *     the (tiny, broadcast) file-range list against the distinct update
  *     keys — one metadata-sized job; at 10^12 rows this is what keeps
  *     MERGE from rewriting the table.
  *  2. REWRITE: rows from candidate files left-anti-joined against update
  *     keys (survivors), unioned with matched updates and brand-new keys,
  *     re-clustered with the table's curve, written as new files.
  *  3. COMMIT: Remove(candidates) + Add(new) in one atomic commit
  *     (snapshot isolation for concurrent readers).
  *
  * Untouched files are never read or rewritten, so their token arrays are
  * byte-identical trivially; rewritten survivors pass through a single
  * parquet read/write with pinned schema (no coercion).
  */
object MergeInto {

  final case class Report(candidates: Int, filesOut: Int, updated: Long, inserted: Long,
                          survivors: Long, version: Long)

  def merge(spark: SparkSession, table: TsTable, updates: DataFrame,
            key: String = "doc_id", targetFileSize: Long = 512L * 1024 * 1024): Report = {
    table.refresh()
    val live = table.state.liveSegments
    val curve = table.clusterSpec.map(_.curve).getOrElse("none")

    // --- 1. stats-based candidate selection ------------------------------
    val ranges: Seq[(String, String, String)] = live.flatMap { seg =>
      seg.stats.get(key) match {
        case Some(graft.meta.ColStats(Some(StatVal.S(mn)), Some(StatVal.S(mx)), _)) =>
          Some((seg.segmentId, mn, mx))
        case _ => None
      }
    }
    val statless = live.filter(s => !ranges.exists(_._1 == s.segmentId)).map(_.segmentId)

    import spark.implicits._
    val keysDf = updates.select(col(key)).distinct()
    val rangesDf = ranges.toDF("segment_id", "kmin", "kmax")
    // broadcast the file ranges (manifest-sized), shuffle only the keys
    val hitIds = keysDf
      .join(broadcast(rangesDf),
        col(key) >= col("kmin") && col(key) <= col("kmax"), "inner")
      .select("segment_id").distinct().as[String].collect().toSet

    val candidateIds = hitIds ++ statless // stat-less files must be rewritten (sound)
    val candidates = live.filter(s => candidateIds.contains(s.segmentId))

    // --- 2. rewrite -------------------------------------------------------
    val updCount = updates.count()
    if (candidates.isEmpty && updCount == 0)
      return Report(0, 0, 0, 0, 0, table.version)

    val target =
      if (candidates.isEmpty) updates.sparkSession.emptyDataFrame
      else spark.read.parquet(candidates.map(s => s"${table.root}/${s.path}"): _*)

    val (merged, survivors, updated, inserted) = if (candidates.isEmpty) {
      (updates, 0L, 0L, updCount)
    } else {
      val surv = target.join(updates.select(col(key)), Seq(key), "left_anti")
      val matchedCount = target.join(updates.select(col(key)), Seq(key), "left_semi").count()
      val survCount = target.count() - matchedCount
      (surv.unionByName(updates), survCount, matchedCount, updCount - matchedCount)
    }

    // size the output by estimated bytes/row of the inputs (4 KiB default)
    val inRows = math.max(candidates.map(_.rowCount).sum, 1L)
    val bytesPerRow =
      if (candidates.nonEmpty) candidates.flatMap(_.fileSize).sum.toDouble / inRows
      else 4096.0
    val outRows = survivors + updCount
    val outFiles = math.max(1, math.ceil(outRows * bytesPerRow / targetFileSize).toInt)
    val clustered = Compaction.clusterSorted(merged, curve, outFiles, ClusterKey.fit(live))
    val added = table.swapSegments(clustered, candidates.map(_.segmentId))
    Report(candidates.size, added.size, updated, inserted, survivors, table.version)
  }
}
