package graft.maintain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.{ColStats, PathNorm, StatVal}
import graft.table.{DeletionVectors, RowTracking, TsTable}

/** Maintenance by ROW IDENTITY — the operators row tracking unlocks.
  * A change-feed consumer (or any revision pipeline) that knows WHICH
  * rows to touch by `_row_id` should not have to re-derive a key
  * predicate; and for never-rewritten files the id→position mapping is
  * pure arithmetic (`pos = id − baseRowId`), so an id-addressed delete
  * attaches deletion vectors with ZERO data reads on those files — the
  * only scan is over rewritten (materialized-id) candidates, and it is
  * pruned to the id column. No analog in the reference (append-only log,
  * no row identity) nor in Delta (row tracking there is read-only).
  */
object RowIdOps {

  /** Merge-on-read DELETE of the given row ids (a one-column DataFrame or
    * any frame whose FIRST column is the id). Plan shape at 10^12 rows:
    *
    *  1. Candidates: manifest interval intersection against the id set's
    *     [min, max] — positional files via [base, base+rows), rewritten
    *     files via `_row_id` footer stats. Metadata only.
    *  2. Positional matches: a broadcast interval join of the id set
    *     against the candidate manifest — `(file, id − base)` computed
    *     WITHOUT reading a byte of data.
    *  3. Materialized matches: one scan of only the rewritten candidates,
    *     column-pruned to `_row_id` + parquet position, semi-joined to
    *     the id set.
    *  4. Rows already masked by a DV are excluded (a replayed id set is
    *     idempotent), then the standard MOR attach commits per-file
    *     bitmap sidecars — fully-matched files drop metadata-only.
    *
    * Clustered tables only: a time-series DELETE must recompute coverage
    * from surviving rows, which requires the scan this operator exists to
    * avoid — use [[DeleteWhere.deleteMor]] with a predicate there. */
  def deleteByRowIds(spark: SparkSession, table: TsTable, ids: DataFrame): DeleteWhere.Report = {
    table.refresh()
    require(table.rowTrackingEnabled, "deleteByRowIds needs row tracking enabled")
    require(table.timeSpec.isEmpty,
      "deleteByRowIds supports clustered tables; time-series tables recompute " +
        "coverage from survivors — use DeleteWhere.deleteMor with a predicate")
    val RowId = RowTracking.RowIdCol
    val live = table.state.liveSegments
    val totalLive = live.map(_.liveRowCount).sum
    val del = ids.select(col(ids.columns.head).cast("long").as(RowId))
      .where(col(RowId).isNotNull).dropDuplicates(RowId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cnt = del.count()
      if (cnt == 0 || live.isEmpty)
        return DeleteWhere.Report(0, live.size, 0, 0L, totalLive, table.version)
      val bounds = del.agg(min(col(RowId)), max(col(RowId))).head
      val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))

      // 1. metadata-only candidate selection (same rule as scanRowIdRange)
      val (materialized, positional) = live.partition(_.stats.contains(RowId))
      val posCand = positional.filter(s =>
        s.baseRowId.exists(b => b <= mx && b + s.rowCount - 1 >= mn))
      val matCand = materialized.filter(_.stats.get(RowId).exists {
        case ColStats(Some(StatVal.L(a)), Some(StatVal.L(b)), _) => a <= mx && b >= mn
        case _ => true // stat shape unknown -> sound
      })
      val candidates = posCand ++ matCand
      if (candidates.isEmpty)
        return DeleteWhere.Report(0, live.size, 0, 0L, totalLive, table.version)

      // 2. positional arm: pure arithmetic, zero data reads
      def canon(s: graft.meta.SegmentMeta): String =
        PathNorm.canonical(PathNorm.resolve(table.root, s.path))
      val posBase: Option[DataFrame] =
        if (posCand.isEmpty) None
        else {
          import spark.implicits._
          val intervals = posCand.map(s =>
            (canon(s), s.baseRowId.get, s.baseRowId.get + s.rowCount - 1))
            .toDF("__f", "__lo", "__hi")
          Some(del.join(broadcast(intervals),
              col(RowId) >= col("__lo") && col(RowId) <= col("__hi"))
            .select(col("__f"), (col(RowId) - col("__lo")).as("__i"),
              lit(true).as("__m"), lit(null).cast("long").as("__b")))
        }

      // 3. materialized arm: id-column-pruned scan of only those files
      val matBase: Option[DataFrame] =
        if (matCand.isEmpty) None
        else Some(table.segmentScanWithRowIds(spark, matCand)
          .select(col("_metadata.file_path").as("__f"),
            col("_metadata.row_index").as("__i"), col(RowId))
          .join(del, Seq(RowId), "left_semi")
          .select(col("__f"), col("__i"),
            lit(true).as("__m"), lit(null).cast("long").as("__b")))

      // 4. already-deleted positions are excluded, then standard MOR attach
      val base = (posBase.toSeq ++ matBase.toSeq).reduce(_ unionByName _)
      val filtered = DeletionVectors.predicate(table.root, candidates,
        col("__f"), col("__i")).map(base.where).getOrElse(base)
      DeleteWhere.morAttach(spark, table, candidates,
        live.size - candidates.size, totalLive, filtered,
        changeRows = Some(() => {
          val raw = table.toLogical(DeleteWhere.cdcScanOf(spark, table, candidates))
          DeletionVectors.liveRowFilter(table.root, candidates)
            .map(raw.where).getOrElse(raw)
            .join(del, Seq(RowId), "left_semi")
        }))
    } finally del.unpersist(false)
  }
}
