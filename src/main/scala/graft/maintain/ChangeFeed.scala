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

    val perCommit: Seq[DataFrame] =
      (sinceVersion + 1 to toVersion).flatMap { v =>
        val c = table.store.readCommit(v)
        commitChanges(spark, table, phys, logical, c.actions, v).map(
          _.withColumn(VersionCol, lit(v))
           .withColumn(TimestampCol,
             lit(new java.sql.Timestamp(c.timestampMillis))))
      }
    if (perCommit.isEmpty) {
      val outSchema = StructType(logical.fields ++ Seq(
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
                            actions: Seq[LogAction], v: Long): Option[DataFrame] = {
    val cdcPaths = actions.collect { case LogAction.AddCdcFile(p, _) =>
      graft.meta.PathNorm.resolve(table.root, p) }
    def aliased(df: DataFrame, extra: Seq[org.apache.spark.sql.Column]): DataFrame =
      df.select(logical.fieldNames.zip(phys.fieldNames)
        .map { case (log, ph) => col(ph).as(log) } ++ extra: _*)
    if (cdcPaths.nonEmpty) {
      // writer-recorded record = the COMPLETE change set for the commit
      // (MERGE's inserts ride the same sidecar as its update images)
      val cdcSchema = StructType(phys.fields :+ StructField(ChangeTypeCol, StringType))
      return Some(aliased(spark.read.schema(cdcSchema).parquet(cdcPaths: _*),
        Seq(col(ChangeTypeCol))))
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
    else Some(aliased(
      spark.read.schema(phys).parquet(
        adds.map(s => graft.meta.PathNorm.resolve(table.root, s.path)): _*),
      Seq(lit("insert").as(ChangeTypeCol))))
  }
}
