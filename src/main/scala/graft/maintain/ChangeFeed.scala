package graft.maintain

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import graft.log.LogAction
import graft.table.TsTable

/** Change data feed — the WRITER-RECORDED row-level change stream (Delta
  * CDF / `table_changes` analog; the reference's log is append-only and has
  * no mutation record to feed from). Complements [[SnapshotDiff]]: the diff
  * RECONSTRUCTS net changes between two states with a keyed join; the feed
  * REPLAYS the exact per-commit changes the writers recorded, needs no key,
  * costs a pruned read of only the change record, and composes with
  * streaming (TableStreamSource `readChangeFeed`).
  *
  * Record model (all carried in the SAME atomic commit as the change):
  *  - row-changing verbs (DELETE / UPDATE / MERGE) write their row images
  *    as `_cdc/` parquet sidecars and reference them with AddCdcFile
  *    actions — `_change_type` ∈ {insert, delete, update_pre, update_post}
  *    (an UPDATE emits both images, [[SnapshotDiff]]'s vocabulary);
  *  - pure appends write NO sidecar: the feed synthesizes their inserts
  *    from the committed segments themselves (the ingest hot path pays
  *    zero extra bytes — Delta's add-file synthesis, the property that
  *    keeps CDF free for the 99 % append workload);
  *  - row-preserving rewrites (compaction / re-clustering) carry a
  *    DataNeutral marker and are skipped;
  *  - a commit that removes or re-masks rows with NO record (mutations
  *    from before `enableCdf`, RESTORE) fails the read with the repair
  *    spelled out — never a silently incomplete feed.
  *
  * Output = the table's logical columns + `_change_type` +
  * `_commit_version` + `_commit_timestamp`. CDC files hold frozen PHYSICAL
  * column names (like data files), so the feed reads correctly across
  * RENAME COLUMN; columns added after a record was written null-fill via
  * the declared-schema read, and type widening applies exactly as on data
  * files.
  *
  * Row tracking composes: when the table tracks rows, the feed ALSO
  * carries `_row_id` — synthesized inserts compute it from the committed
  * segments' bases (still zero extra bytes), writer-recorded images carry
  * the changed row's id (update_pre/update_post pairs link by it, so a
  * consumer applies updates join-free), and records that predate
  * enablement (or MERGE-inserted rows, whose ids are minted at commit)
  * read as NULL.
  *
  * Scale: the plan is a union of per-commit pruned parquet reads — cost
  * proportional to the CHANGE RECORD, not the table; no join, no shuffle,
  * no driver data. Ranges spanning thousands of commits should be read in
  * chunks (the streaming source does exactly that per micro-batch).
  */
object ChangeFeed {

  val ChangeTypeCol = "_change_type"
  val VersionCol = "_commit_version"
  val TimestampCol = "_commit_timestamp"

  /** Changes AFTER `sinceVersion` up to and including `toVersion` — the
    * commits sinceVersion+1..toVersion ([[SnapshotDiff]]'s range shape). */
  def read(spark: SparkSession, table: TsTable, sinceVersion: Long,
           toVersion: Long): DataFrame = {
    require(sinceVersion <= toVersion,
      s"change-feed range is backwards: v$sinceVersion > v$toVersion")
    table.refresh()
    require(toVersion <= table.version,
      s"cannot read changes to v$toVersion: table is at v${table.version}")
    val meta = table.meta
    val logical = meta.schema.getOrElse(throw new IllegalStateException(
      "table has no adopted schema yet — nothing can have changed"))
    val phys = meta.physicalize(logical)

    val tracked = meta.rowTracking
    val perCommit: Seq[DataFrame] =
      (sinceVersion + 1 to toVersion).flatMap { v =>
        val c = table.store.readCommit(v)
        commitChanges(spark, table, phys, logical, c.actions, v, tracked).map(
          _.withColumn(VersionCol, lit(v))
           .withColumn(TimestampCol,
             lit(new java.sql.Timestamp(c.timestampMillis))))
      }
    if (perCommit.isEmpty) {
      val outSchema = StructType(logical.fields ++
        (if (tracked) Seq(StructField(graft.table.RowTracking.RowIdCol, LongType)) else Nil) ++
        Seq(
          StructField(ChangeTypeCol, StringType),
          StructField(VersionCol, LongType, nullable = false),
          StructField(TimestampCol, TimestampType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    } else perCommit.reduce(_.unionByName(_))
  }

  /** One commit's change rows (logical names + `_change_type`), or None
    * when the commit changed no rows (meta-only, coverage, txn,
    * DataNeutral rewrite, or an all-empty change set). */
  private def commitChanges(spark: SparkSession, table: TsTable,
                            phys: StructType, logical: StructType,
                            actions: Seq[LogAction], v: Long,
                            tracked: Boolean): Option[DataFrame] = {
    val RowId = graft.table.RowTracking.RowIdCol
    val cdcPaths = actions.collect { case LogAction.AddCdcFile(p, _) =>
      graft.meta.PathNorm.resolve(table.root, p) }
    def aliased(df: DataFrame, extra: Seq[org.apache.spark.sql.Column]): DataFrame =
      df.select(logical.fieldNames.zip(phys.fieldNames)
        .map { case (log, ph) => col(ph).as(log) } ++ extra: _*)
    if (cdcPaths.nonEmpty) {
      // writer-recorded record = the COMPLETE change set for the commit
      // (MERGE's inserts ride the same sidecar as its update images).
      // Tracked reads declare `_row_id` in the record schema: records from
      // tracked writers carry it, pre-enablement records null-fill.
      val cdcSchema = StructType(phys.fields ++
        (if (tracked) Seq(StructField(RowId, LongType)) else Nil) :+
        StructField(ChangeTypeCol, StringType))
      return Some(aliased(spark.read.schema(cdcSchema).parquet(cdcPaths: _*),
        (if (tracked) Seq(col(RowId)) else Nil) :+ col(ChangeTypeCol)))
    }
    if (actions.contains(LogAction.DataNeutral)) return None // row-preserving rewrite
    val adds = actions.collect { case LogAction.AddSegment(s) => s }
    val removes = actions.collect { case LogAction.RemoveSegment(id) => id }
    // same soundness guard as SnapshotDiff's fast path: a remove-free
    // commit whose adds carry deletion vectors (RESTORE re-adding DV'd
    // segments) masks rows and has no record either
    if (removes.nonEmpty || adds.exists(_.dvPath.isDefined))
      throw new IllegalStateException(
        s"commit v$v of ${table.root} changed rows without a change record " +
          "(a mutation from before enableCdf, or a RESTORE). The feed cannot " +
          "replay it; start the read after it, or reconstruct the net change " +
          "with SnapshotDiff.diff")
    if (adds.isEmpty) None // metadata-only commit
    else {
      val paths = adds.map(s => graft.meta.PathNorm.resolve(table.root, s.path))
      // synthesized-insert ids: the standard coalesce(materialized,
      // base + position) binding over the commit's own AddSegments — zero
      // extra bytes, like the synthesis itself (the materialized arm
      // matters for re-added rewritten files, e.g. a published branch
      // compaction). A pre-enablement append (no bases in ITS commit)
      // emits NULL.
      if (!tracked)
        Some(aliased(spark.read.schema(phys).parquet(paths: _*),
          Seq(lit("insert").as(ChangeTypeCol))))
      else if (adds.forall(_.baseRowId.isDefined)) {
        val readSchema = StructType(phys.fields ++ Seq(
          StructField(RowId, LongType),
          StructField(graft.table.RowTracking.RowCommitCol, LongType)))
        val withIds = graft.table.RowTracking.attach(
          spark.read.schema(readSchema).parquet(paths: _*), table.root, adds)
        Some(aliased(withIds, Seq(col(RowId), lit("insert").as(ChangeTypeCol))))
      } else
        Some(aliased(spark.read.schema(phys).parquet(paths: _*),
          Seq(lit(null).cast(LongType).as(RowId), lit("insert").as(ChangeTypeCol))))
    }
  }
}
