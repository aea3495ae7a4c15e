package graft.table

import java.nio.file.{Files, Paths}
import java.util.UUID
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import graft.coverage.{Bitmap, BucketMath}
import graft.log._
import graft.meta._
import graft.scan.TsFileIndex

/** The table handle: transaction-log + replayed state + scan/append/
  * maintenance entry points. Spark-native rebuild of the reference's
  * `TimeSeriesTable` (crates/timeseries-table-core/src/table.rs:53-57).
  *
  * Metadata (log replay, coverage bitmaps, commit protocol) is driver-side
  * and O(files); every data-plane operation (stats, coverage construction,
  * rewrite, scan) is a distributed Spark job. Readers are snapshot-isolated:
  * `scan` captures CURRENT once and then touches only immutable files.
  */
final class TsTable private (val root: String, val store: LogStore) {

  @volatile private var cachedState: TableState = TableState.rebuild(store)

  /** Serializes intra-process validate+commit critical sections (see
    * occLoop) — the in-JVM half of the Delta-style "lock locally,
    * OCC globally" commit discipline. */
  private val commitLock = new Object

  def state: TableState = cachedState
  def version: Long = cachedState.version

  /** The shared OCC commit loop EVERY writer verb goes through. `body`
    * validates against the refreshed snapshot, assembles actions, and
    * commits via [[commitAndAdvance]] (throw to abort; retryable commit
    * races surface as Conflict/CommitFileExists). The whole
    * validate+commit section runs under [[commitLock]], so in-JVM writers
    * (e.g. 4 concurrent compaction bins + an append + a MOR delete on one
    * table instance) serialize instead of burning each other's OCC retry
    * budgets on pure self-races. Cross-process losers rebase-retry with
    * jittered backoff OUTSIDE the lock. Slow abort cleanup (staged-file
    * deletion) belongs in the CALLER's catch, outside the lock. */
  private def occLoop(maxRetries: Int)(body: TableState => Long): Long = {
    var attempt = 0
    while (true) {
      val res: Option[Long] = commitLock.synchronized {
        refresh()
        try Some(body(cachedState))
        catch {
          case _: ConflictException | _: CommitFileExistsException if attempt < maxRetries =>
            attempt += 1; None
        }
      }
      res match {
        case Some(v) => return v
        case None => Thread.sleep(5L + scala.util.Random.nextInt(25 * attempt))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Commit `actions` over snapshot `st` and advance the cached state.
    * The monotonic guard makes the assignment safe even if a future
    * caller commits outside [[commitLock]]: a slow writer's post-commit
    * assignment can never regress a newer snapshot already visible to
    * readers. Returns the committed version. */
  private def commitAndAdvance(st: TableState, actions0: Seq[LogAction]): Long = {
    val actions = assignRowTracking(st, actions0)
    val v = store.commitWithExpectedVersion(st.version, actions)
    val ns = actions.foldLeft(st)(_ apply _).copy(version = v)
    if (ns.version > cachedState.version) cachedState = ns
    v
  }

  /** Row-tracking id allocation — the ONE commit-time hook every writer
    * verb funnels through (append, swap, DV attach, restore, publish,
    * merge). Each AddSegment that carries no baseRowId yet (fresh
    * append/rewrite output) is assigned `[hw, hw + rowCount)` plus
    * `rowVersion = this commit's version`; DV re-attach and RESTORE
    * re-adds COPY their SegmentMeta and thus keep their ranges untouched.
    * The bumped high-water mark rides the SAME commit (reusing the
    * commit's own UpdateTableMeta when it carries one). Runs inside the
    * OCC loop, so a rebase re-assigns from the new snapshot's high water —
    * two racing appends can never mint overlapping id ranges. Pure
    * metadata: no data file is read or written here. */
  private def assignRowTracking(st: TableState, actions: Seq[LogAction]): Seq[LogAction] = {
    // honor the POST-commit flag: the enabling commit backfills its own adds
    val metaIdx = actions.lastIndexWhere(_.isInstanceOf[LogAction.UpdateTableMeta])
    val effMeta =
      if (metaIdx >= 0) actions(metaIdx).asInstanceOf[LogAction.UpdateTableMeta].meta
      else st.tableMeta.orNull
    if (effMeta == null || !effMeta.rowTracking) return actions
    var hw = math.max(effMeta.rowIdHighWater,
      st.tableMeta.map(_.rowIdHighWater).getOrElse(0L))
    val v = st.version + 1
    var assigned = false
    val out = actions.map {
      case LogAction.AddSegment(s) if s.baseRowId.isEmpty =>
        val b = hw; hw += s.rowCount; assigned = true
        LogAction.AddSegment(s.copy(baseRowId = Some(b), rowVersion = Some(v)))
      case a => a
    }
    if (!assigned) return actions
    val newMeta = effMeta.copy(rowIdHighWater = hw)
    if (metaIdx >= 0) out.updated(metaIdx, LogAction.UpdateTableMeta(newMeta))
    else out :+ LogAction.UpdateTableMeta(newMeta)
  }

  /** Reload state only if CURRENT advanced (reference table.rs:205-251). */
  def refresh(): Boolean = {
    val cur = store.currentVersion()
    if (cur != cachedState.version) { cachedState = TableState.rebuildAt(store, cur); true }
    else false
  }

  def meta: TableMeta = cachedState.tableMeta.getOrElse(
    throw CorruptLogException("table has no metadata"))

  def timeSpec: Option[TimeIndexSpec] = meta.kind match {
    case TableKind.TimeSeries(s) => Some(s)
    case _ => None
  }
  def clusterSpec: Option[ClusterSpec] = meta.kind match {
    case TableKind.Clustered(s) => Some(s)
    case _ => None
  }

  // ---------------------------------------------------------------- scan

  /** DataFrame over the current snapshot via our manifest-backed FileIndex:
    * file pruning from per-file stats + Spark's native vectorized Parquet
    * scan (reference R1, ts_table_provider.rs:240-295). */
  def scan(spark: SparkSession): DataFrame = scanState(spark, cachedState)

  /** Time travel: scan the table as of a pinned version. */
  def scanAt(spark: SparkSession, version: Long): DataFrame =
    scanState(spark, TableState.rebuildAt(store, version))

  /** Structured Streaming tail of this table: initial snapshot, then each
    * append commit as a micro-batch (graft.streaming.TableStreamSource —
    * the Spark-native form of the reference's sql_stream_reader.rs). */
  def readStream(spark: SparkSession, options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("graft-table").options(options).load(root)

  /** One row per commit (newest first): version, timestamp, action
    * counts, and a derived operation label — the audit/debug view of the
    * transaction log (DESCRIBE HISTORY analog). Driver-side metadata only:
    * commit JSONs are KBs; rows are materialized via createDataFrame. */
  def history(spark: SparkSession, limit: Int = Int.MaxValue): DataFrame = {
    import spark.implicits._
    val cur = store.currentVersion()
    val lo = math.max(1L, cur - limit + 1)
    // snapshot expiration drops commit files at or below its checkpoint;
    // history covers what the log still holds
    val rows = (lo to cur).reverseIterator
      .filter(v => Files.exists(store.commitPath(v)))
      .map { v =>
      val c = store.readCommit(v)
      val adds = c.actions.count(_.isInstanceOf[LogAction.AddSegment])
      val removes = c.actions.count(_.isInstanceOf[LogAction.RemoveSegment])
      // a DV attach re-adds the SAME segment ids it removes (upsert); a
      // compaction/merge swap always adds fresh ids
      val removedIds = c.actions.collect { case LogAction.RemoveSegment(id) => id }.toSet
      val dvUpsert = adds > 0 && removes > 0 && c.actions.forall {
        case LogAction.AddSegment(s) => removedIds.contains(s.segmentId)
        case _ => true
      }
      val meta = c.actions.exists(_.isInstanceOf[LogAction.UpdateTableMeta])
      val cov = c.actions.exists(_.isInstanceOf[LogAction.UpdateTableCoverage])
      val txn = c.actions.collectFirst { case LogAction.SetTxn(app, b) => s"$app#$b" }
      val rowsAdded = c.actions.collect { case LogAction.AddSegment(s) => s.rowCount }.sum
      val op =
        if (dvUpsert) "DELETE (DV)"                       // merge-on-read delete
        else if (adds > 0 && removes > 0) "REWRITE"       // compaction/merge/delete swap
        else if (removes > 0) "DELETE"                    // metadata-only removal
        else if (adds > 0 && txn.isDefined) "STREAMING APPEND"
        else if (adds > 0) "APPEND"
        else if (meta && v == 1L) "CREATE"
        else if (cov) "COVERAGE"
        else "METADATA"
      (v, new java.sql.Timestamp(c.timestampMillis), op, adds, removes, rowsAdded,
        meta, cov, txn.orNull)
    }.toSeq
    rows.toDF("version", "timestamp", "operation", "files_added", "files_removed",
      "rows_added", "meta_updated", "coverage_updated", "txn")
  }

  /** One row per live data file — the Iceberg `files` / Delta DESCRIBE
    * DETAIL metadata table, manifest-only (no filesystem or data IO, so
    * it costs the same on a 100 TB table as on a test fixture). Column
    * stats surface as `stats[col] -> (min, max, null_count)` in canonical
    * string form (exact for longs/strings/bools; Double.toString for
    * doubles), ready for SQL over the table's own layout: small-file
    * histograms, clustering drift, DV debt. */
  def files(spark: SparkSession): DataFrame = {
    import spark.implicits._
    def render(v: StatVal): String = v match {
      case StatVal.L(x) => x.toString
      case StatVal.D(x) => x.toString
      case StatVal.S(x) => x
      case StatVal.B(x) => x.toString
    }
    refresh()
    // stats sidecars are keyed by physical name; surface LOGICAL names
    // (identity for never-renamed tables)
    val inv = colMap.map(_.swap)
    cachedState.liveSegments.map { s =>
      (s.segmentId, s.path, s.format, s.rowCount, s.liveRowCount,
        s.fileSize.getOrElse(-1L), s.dvPath.orNull, s.dvCardinality,
        s.coveragePath.orNull,
        s.stats.map { case (c0, cs) =>
          val c = inv.getOrElse(c0, c0)
          c -> Map(
            "min" -> cs.min.map(render).orNull,
            "max" -> cs.max.map(render).orNull,
            "null_count" -> cs.nullCount.toString)
        })
    }.toDF("segment_id", "path", "format", "row_count", "live_rows",
      "size_bytes", "dv_path", "dv_cardinality", "coverage_path", "stats")
  }

  /** Named refs — tags and branches — as one DataFrame (Iceberg `refs`
    * metadata table): tags pin base == head; a branch spans its fork
    * point to its current head. Driver-side metadata only. */
  def refs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    refresh()
    val tagRows = tags.toSeq.sortBy(_._1).map { case (n, v) => (n, "tag", v, v) }
    val brRows = branches.map { n =>
      val bl = BranchLog.open(store.tableRoot, n)
      (n, "branch", bl.base, bl.currentVersion())
    }
    (tagRows ++ brRows).toDF("name", "type", "base_version", "head_version")
  }

  private[graft] def scanState(spark: SparkSession, st: TableState): DataFrame = {
    val live = st.liveSegments
    val logSchema = st.tableMeta.flatMap(_.schema).getOrElse {
      if (live.isEmpty)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], new StructType())
      spark.read.parquet(abs(live.head)).schema
    }
    if (live.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logSchema)
    // RENAME COLUMN mapping: the relation reads the files' frozen PHYSICAL
    // names; one alias projection on top restores the logical view. Filters
    // and column pruning push through the aliases (Catalyst substitutes
    // them), so TsFileIndex still prunes on physical stats keys and the
    // parquet scan still sees pushed filters. Identity (zero-cost) for
    // never-renamed tables.
    val cmap = st.tableMeta.map(_.colMap).getOrElse(Map.empty)
    val schema = st.tableMeta.map(_.physicalize(logSchema)).getOrElse(logSchema)
    // merge-on-read deletes: the snapshot splits into two relations so
    // only the DV'd files pay the per-row filter — the clean majority
    // scans exactly as a DV-free table (no _metadata columns, no lookup
    // call, full whole-stage codegen), and Catalyst pushes query filters
    // and column pruning through the union into both branches. A snapshot
    // without DVs plans the single-relation path, zero overhead.
    val (dvSegs, cleanSegs) = live.partition(_.dvPath.isDefined)
    val phys =
      if (dvSegs.isEmpty)
        spark.baseRelationToDataFrame(relationFor(spark, live, schema))
      else {
        val dvScan = spark.baseRelationToDataFrame(relationFor(spark, dvSegs, schema))
          .where(DeletionVectors.liveRowFilter(root, dvSegs).get)
        if (cleanSegs.isEmpty) dvScan
        else spark.baseRelationToDataFrame(relationFor(spark, cleanSegs, schema))
          .unionByName(dvScan)
      }
    if (cmap.isEmpty) phys
    else phys.select(logSchema.fieldNames.toIndexedSeq
      .map(n => col(cmap.getOrElse(n, n)).as(n)): _*)
  }

  /** The manifest-backed BaseRelation for a snapshot (None when empty) —
    * also the batch half of the "graft-table" data source, so
    * `spark.read.format("graft-table").load(root)` and SQL
    * `CREATE TEMPORARY VIEW t USING graft-table OPTIONS (path '…')` scan
    * through the same pruned FileIndex as `TsTable.scan`. */
  private[graft] def relationAt(spark: SparkSession, st: TableState): Option[HadoopFsRelation] = {
    // physical schema: a bare BaseRelation has no projection hook, so the
    // DSv1 provider REFUSES renamed tables (same contract gap as DVs) —
    // pinning physical here keeps the relation self-consistent regardless
    val schema = st.tableMeta.flatMap(_.physicalSchema).getOrElse {
      if (st.liveSegments.isEmpty) return None // schema not yet adopted
      else spark.read.parquet(st.liveSegments.map(abs).head).schema
    }
    Some(relationFor(spark, st.liveSegments, schema))
  }

  private def relationFor(spark: SparkSession, segs: Seq[SegmentMeta],
                          schema: StructType): HadoopFsRelation = {
    val index = new TsFileIndex(spark, new HPath(root), segs, schema)
    HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }

  /** Native range scan (reference R16, table/scan.rs:311-354): half-open
    * [startMicros, endMicros) on the time column; file pruning via stats,
    * row filtering by Spark (null timestamps drop, matching the reference's
    * null⇒false mask, scan.rs:149-157). */
  def scanRange(spark: SparkSession, startMicros: Long, endMicros: Long): DataFrame = {
    if (startMicros >= endMicros) throw InvalidRangeException(startMicros, endMicros)
    val ts = timeSpec.getOrElse(throw new IllegalStateException("not a time-series table")).timestampColumn
    val df = scan(spark)
    // literal typed to the column (TIMESTAMP vs TIMESTAMP_NTZ) so the
    // comparison stays cast-free on the column side and the predicate
    // pushes down to the parquet row groups
    val isNtz = df.schema.fields.find(_.name == ts)
      .exists(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
    def l(us: Long): Column =
      if (isNtz) lit(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L),
        java.time.ZoneOffset.UTC))
      else lit(microsToTs(us))
    df.where(col(ts) >= l(startMicros) && col(ts) < l(endMicros))
  }

  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Manifest path → scannable path: root-relative for the table's own
    * files, passthrough for a shallow clone's absolute source references. */
  private def abs(seg: SegmentMeta): String = graft.meta.PathNorm.resolve(root, seg.path)

  /** Parquet write options for data segments: a column bloom filter on the
    * table's identity key (last cluster column — doc_id in the token
    * layout). Space-curve clustering interleaves the key bits, so per-file
    * [min,max] stops pruning MERGE candidates; the bloom answers "can key k
    * be in this file" from footer metadata alone (KeyBloom). Adaptive
    * sizing keeps the filter proportional to each file's actual NDV.
    *
    * Round-6 additions (guide §6):
    *  - zstd: interleaved warm A/B vs snappy on the token payload measured
    *    equal-or-faster encode at equal size in every window (and ~2×
    *    faster in disk-pressured windows — fewer dirty bytes to write
    *    back); better ratio on text/doc payloads generally.
    *  - 8 MB row groups: the parquet default (128 MB) gives a compacted
    *    64 MB file ONE row group, and Spark's scan can only assign a row
    *    group to the split holding its midpoint — a compacted table
    *    scanned with 6/32 cores (measured: full-scan 0.71 s → 0.33 s at
    *    bench scale, restoring parity with the pre-compaction layout).
    *    Scale-independent: intra-file parallelism at ANY cluster size
    *    (a 512 MB production file gets 64 independently scannable groups);
    *    cost measured +1 % file bytes. Override via
    *    SPARK_GRAFT_ROWGROUP_BYTES. */
  private[graft] def segmentWriteOptions: Map[String, String] = {
    val rowGroupBytes = sys.env.getOrElse("SPARK_GRAFT_ROWGROUP_BYTES",
      (8L * 1024 * 1024).toString)
    Map(
      "compression" -> "zstd",
      "parquet.block.size" -> rowGroupBytes) ++
    (clusterSpec.map(_.columns.last) match {
      case Some(key) => Map(
        s"parquet.bloom.filter.enabled#$key" -> "true",
        "parquet.bloom.filter.adaptive.enabled" -> "true")
      case None => Map.empty
    })
  }

  /** The column KeyBloom pruning can test, when blooms are being written. */
  private[graft] def bloomKeyColumn: Option[String] = clusterSpec.map(_.columns.last)

  // -------------------------------------------------------------- append

  /** Append a DataFrame as one or more new immutable segments — the 9-step
    * pipeline of the reference (table/append.rs:92-350), Spark-first:
    * the data plane (write, stats, coverage, identity) runs as Spark jobs
    * and footer reads; only the commit is driver file IO. OCC with rebase
    * retry on version conflicts. Returns the committed version.
    *
    * `txn = Some((appId, batchId))` makes the append idempotent per
    * application: the (appId, batchId) watermark commits atomically with
    * the AddSegments (LogAction.SetTxn), and an append whose batchId is ≤
    * the table's watermark for that appId is skipped — including on the
    * OCC rebase path, so a crashed-and-replayed streaming batch can never
    * double-land even if the first attempt's commit won a race. */
  def append(df: DataFrame, maxRetries: Int = 3,
             txn: Option[(String, Long)] = None): Long = {
    // cheap pre-check: skip the data write entirely when the batch is
    // already in the table (the authoritative check re-runs inside commit)
    txn.foreach { case (app, batch) =>
      refresh()
      if (cachedState.txns.get(app).exists(_ >= batch)) return cachedState.version
    }
    val spark = df.sparkSession
    val commitId = UUID.randomUUID().toString.take(8)
    val stagingRel = s".staging-$commitId"
    val stagingAbs = s"$root/$stagingRel"

    // liveness beacon: keeps the staging tree's mtime fresh for the whole
    // write-stats-coverage-commit span, so Expire's crashed-writer
    // reclamation can never race a live append whose upstream stages
    // outlast the grace period
    val heartbeat = StagingHeartbeat.start(stagingAbs)
    try {

    // (1) write data files once; all retries below are metadata-only.
    // toPhysical: appended data arrives under LOGICAL names; files are
    // written under the frozen physical names (identity unless renamed).
    // The rename is by-name, so a stale writer still using a PHYSICAL
    // (pre-rename) column name would pass through it unchanged and land —
    // gate the logical view by name FIRST (types/order enforce at commit)
    if (colMap.nonEmpty) {
      val logicalNames = cachedState.tableMeta.flatMap(_.schema)
        .map(_.fieldNames.toSet).getOrElse(Set.empty)
      val off = df.columns.filterNot(logicalNames.contains)
      if (off.nonEmpty)
        throw SchemaMismatchException(
          s"append columns ${off.mkString(", ")} are not in the table's logical schema " +
            s"(renamed columns must use their CURRENT names: ${colMap.keys.mkString(", ")})")
    }
    toPhysical(df).write.options(segmentWriteOptions).mode("overwrite").parquet(stagingAbs)
    val written0 = listParquet(stagingAbs)

    // (2) per-file stats from footers only — no data scan. Empty input is
    // a successful NO-OP (zero-row part files are discarded, never
    // committed as segments); a streaming txn batch still advances its
    // watermark so replays of the empty batch stay idempotent — this is
    // what lets the streaming sinks hand every batch straight to append
    // without a pre-flight isEmpty job.
    val conf = spark.sparkContext.hadoopConfiguration
    val statsAll = FooterStats.readAll(conf, written0)
    val (liveStats, emptyStats) = statsAll.partition(_._2.rowCount > 0)
    emptyStats.foreach(f => Files.deleteIfExists(Paths.get(stripScheme(f._1))))
    if (liveStats.isEmpty) {
      // stop (join) the beacon BEFORE deleting its tree: a touch racing
      // the recursive delete could recreate .heartbeat mid-walk and make
      // the final dir delete throw (stop() is idempotent; the finally
      // re-stop is a no-op)
      heartbeat.stop()
      deleteRecursively(Paths.get(stripScheme(stagingAbs)))
      return txn match {
        case Some((app, batch)) => commitTxnOnly(app, batch)
        case None => refresh(); cachedState.version
      }
    }
    val written = liveStats.map(_._1)
    val fileStats = liveStats

    // CHECK constraints gate the append while the files are still in
    // staging — a rejected batch deletes its scratch tree and commits
    // nothing (stats fast path; see enforceChecks)
    try enforceChecks(spark, fileStats.map { case (p, fs) => (p, fs.stats, fs.rowCount) })
    catch { case e: Throwable =>
      heartbeat.stop()
      deleteRecursively(Paths.get(stripScheme(stagingAbs)))
      throw e
    }

    // canonical on-disk schema (reference adopts from the Parquet footer,
    // append.rs:130-151). Round 6: Spark embeds the exact StructType JSON
    // in the footer metadata of every file it writes, and the footers were
    // just read for stats — reuse that instead of paying a listing + a
    // schema-inference Spark job per append (driver-tail cost on EVERY
    // append; the fallback read covers foreign files staged without the
    // key, and any malformed JSON falls through to inference too)
    // asNullable: file sources report every field nullable, so the
    // embedded writer schema must be normalized identically or the
    // adopt-then-enforce comparison would reject a second append whose
    // builder pipeline produced non-null columns (e.g. generator kernels)
    val diskSchema = liveStats.head._2.sparkSchemaJson
      .flatMap(j => scala.util.Try(org.apache.spark.sql.graft.Bridge.asNullable(
        org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType])).toOption)
      .getOrElse(spark.read.parquet(stagingAbs).schema)

    // (3) time-series extras: coverage bitmaps + entity identity
    val tsExtras = timeSpec.map { spec =>
      val tsCol = spec.timestampColumn
      if (!diskSchema.fieldNames.contains(tsCol))
        throw SchemaMismatchException(s"time column '$tsCol' missing from appended data")
      val identity = extractEntityIdentity(spark, stagingAbs, spec, fileStats)
      val perFileCov = computeCoverage(spark, Seq(stagingAbs), spec)
      (identity, perFileCov)
    }

    // move staged files into data/ under deterministic names
    val moved: Seq[(String, String)] = written.zipWithIndex.map { case (src, i) =>
      val rel = f"data/$commitId-$i%05d.parquet"
      val dst = s"$root/$rel"
      Files.createDirectories(Paths.get(s"$root/data"))
      Files.move(Paths.get(stripScheme(src)), Paths.get(stripScheme(dst)))
      src -> rel
    }
    // stop (join) the beacon before deleting its tree — a touch racing the
    // recursive delete could recreate .heartbeat mid-walk, fail the dir
    // delete, and abort an append whose data files are already in data/
    heartbeat.stop()
    deleteRecursively(Paths.get(stripScheme(stagingAbs)))

    val segs = moved.zip(fileStats).map { case ((src, rel), (_, fs)) =>
      val segId = SegmentMeta.segmentIdV1(rel, Paths.get(stripScheme(s"$root/$rel")))
      val cov = tsExtras.flatMap(_._2.get(graft.meta.PathNorm.canonical(src))).map { bm =>
        val covRel = s"_coverage/segments/segcov-$segId.cov"
        writeBytes(s"$root/$covRel", bm.serialize())
        covRel
      }
      SegmentMeta(segId, rel, "parquet", fs.rowCount, Some(fs.fileSize), fs.stats, cov)
    }

    // checks were enforced against THIS snapshot's constraint set while
    // the files sat in staging; a rebase below may land on a snapshot
    // with a check added since, and must re-gate the (now-moved) files
    val checksValidated = cachedState.tableMeta.map(_.checks).getOrElse(Nil)

    def deleteSegFiles(): Unit = segs.foreach { seg =>
      Files.deleteIfExists(Paths.get(stripScheme(s"$root/${seg.path}")))
      seg.coveragePath.foreach(cp =>
        Files.deleteIfExists(Paths.get(stripScheme(s"$root/$cp"))))
    }
    try {
      occLoop(maxRetries) { st =>
        if (st.tableMeta.map(_.checks).getOrElse(Nil) != checksValidated)
          enforceChecks(spark, segs.map(s => (s"$root/${s.path}", s.stats, s.rowCount)))
        // authoritative idempotency check against the snapshot we commit
        // on; the sentinel unwinds to the cleanup below, OUTSIDE the lock
        txn.foreach { case (app, batch) =>
          if (st.txns.get(app).exists(_ >= batch)) throw TsTable.TxnReplayed(st.version)
        }
        commitAppend(spark, st, segs, diskSchema, tsExtras, txn)
      }
    } catch {
      case TsTable.TxnReplayed(v) =>
        // A replay (e.g. two drivers raced the same batch and this one
        // lost the OCC commit) must delete the data files it already
        // moved into data/ — no commit references them, and Expire only
        // reclaims segments the log has seen, so they would leak forever.
        deleteSegFiles()
        v
      case e: Throwable =>
        // Non-retryable rejection (CoverageOverlap / SchemaMismatch /
        // EntityIdentity / uncovered-segments precondition) or retry
        // budget exhausted: same leak rule as above (round-2 finding).
        deleteSegFiles()
        throw e
    }

    } finally heartbeat.stop()
  }

  private def commitAppend(
      spark: SparkSession,
      st: TableState,
      segs: Seq[SegmentMeta],
      diskSchema: StructType,
      tsExtras: Option[(Option[Map[String, String]], Map[String, Bitmap])],
      txn: Option[(String, Long)] = None): Long = {

    var m = st.tableMeta.getOrElse(meta)
    var metaChanged = false

    // schema adopt-or-enforce: dynamic-then-frozen, exact match
    // (reference append.rs:144-163, schema_compat.rs:96-150). The disk
    // schema is PHYSICAL (staged post-toPhysical); enforce against the
    // physicalized table schema so renamed columns compare apples-to-apples
    // (identity when colMap is empty — adoption always happens pre-rename)
    m.schema match {
      case None =>
        m = m.copy(schemaJson = Some(diskSchema.json)); metaChanged = true
      case Some(existing) =>
        if (m.physicalize(existing) != diskSchema)
          throw SchemaMismatchException(
            s"schema mismatch: table has ${existing.simpleString}, append has ${diskSchema.simpleString}")
    }

    // entity identity pin-or-enforce (reference append.rs:166-196)
    tsExtras.flatMap(_._1).foreach { identity =>
      m.entityIdentity match {
        case None =>
          m = m.copy(entityIdentity = Some(identity)); metaChanged = true
        case Some(pinned) =>
          if (pinned != identity)
            throw EntityIdentityException(s"entity identity mismatch: table pinned $pinned, append has $identity")
      }
    }

    // coverage overlap check + new table snapshot (reference append.rs:200-290)
    val coverageAction = tsExtras.map { case (_, perFile) =>
      val spec = timeSpec.get
      // precondition: every existing segment must carry a coverage sidecar,
      // else the overlap check would be unsound (reference append.rs:50-61)
      val uncovered = st.liveSegments.filter(_.coveragePath.isEmpty)
      if (uncovered.nonEmpty)
        throw new IllegalStateException(
          s"cannot append: ${uncovered.size} existing segments lack coverage sidecars")
      val tableCov = loadTableCoverage(st, heal = false)
      val appendCov = perFile.values.foldLeft(Bitmap.empty)(_ union _)
      val overlap = appendCov.intersect(tableCov)
      if (!overlap.isEmpty)
        throw CoverageOverlapException(segs.head.path, overlap.cardinality, overlap.runList.head._1)
      val newCov = tableCov.union(appendCov)
      val newVersion = st.version + 1
      val covRel = s"_coverage/table/$newVersion-tblcov-${UUID.randomUUID().toString.take(8)}.cov"
      writeBytes(s"$root/$covRel", newCov.serialize())
      LogAction.UpdateTableCoverage(spec.bucket.spec, covRel)
    }

    val actions: Seq[LogAction] =
      (if (metaChanged) Seq(LogAction.UpdateTableMeta(m)) else Nil) ++
      segs.map(LogAction.AddSegment) ++ coverageAction.toSeq ++
      txn.map { case (app, batch) => LogAction.SetTxn(app, batch) }.toSeq

    // through commitAndAdvance so the row-tracking hook stamps the new
    // segments' id ranges in the same commit
    commitAndAdvance(st, actions)
  }

  /** Append an existing Parquet file by path (reference CLI `append
    * --parquet`, table/append.rs:370-455): validates the PAR1 magic
    * (transaction_log/segments.rs:98-137), copies the file under
    * `data/` when outside the table root refusing overwrite
    * (storage/table_location.rs:51-130), then runs the standard append
    * pipeline on its rows. */
  def appendParquetFile(spark: SparkSession, path: String): Long = {
    val src = Paths.get(stripScheme(path))
    val size = Files.size(src)
    if (size < 8L) throw SchemaMismatchException(s"'$path' too small to be parquet")
    val ch = java.nio.channels.FileChannel.open(src)
    val (head, tail) = try {
      val h = java.nio.ByteBuffer.allocate(4); ch.read(h, 0L)
      val t = java.nio.ByteBuffer.allocate(4); ch.read(t, size - 4)
      (new String(h.array(), "US-ASCII"), new String(t.array(), "US-ASCII"))
    } finally ch.close()
    if (head != "PAR1" || tail != "PAR1")
      throw SchemaMismatchException(s"'$path' is not a parquet file (bad magic)")
    // explicit logical-schema rejection for foreign files (INT96, exotic
    // decimals, nullable map keys) — BEFORE the copy, so a rejected file
    // never lands in data/
    LogicalSchema.validateFooterSchema(spark.sparkContext.hadoopConfiguration, src.toString)
    val inRoot = src.toAbsolutePath.startsWith(Paths.get(stripScheme(root)).toAbsolutePath)
    val local =
      if (inRoot) src
      else {
        val dst = Paths.get(stripScheme(root), "data", src.getFileName.toString)
        Files.createDirectories(dst.getParent)
        try Files.copy(src, dst)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(s"refusing to overwrite existing ${dst.getFileName}") }
        dst
      }
    // no coalesce: Spark splits the file by row groups across
    // spark.sql.files.maxPartitionBytes, so a multi-GB foreign file is
    // re-staged at cluster parallelism and append commits it as several
    // segments (append supports multi-segment commits; a one-task funnel
    // here serialized multi-GB ingests through a single core)
    try append(spark.read.parquet(local.toString))
    finally if (!inRoot) Files.deleteIfExists(local)
    // ^ the copy is only a TRANSPORT: append() stages the rows into its
    // own commit-named data files, so the copied original is referenced
    // by no commit and Expire would never reclaim it — delete it whether
    // the append landed or was rejected (in-root sources stay the
    // caller's files and are left alone)
  }

  /** Copy-on-write swap: write `df` as new segments and atomically commit
    * RemoveSegment(removeIds) + AddSegment(new) in ONE commit — the
    * maintenance primitive behind compaction, clustering and MERGE.
    * Concurrent readers pinned at the old version keep seeing the old
    * files (nothing is deleted here; snapshot expiration deletes later).
    * OCC: on conflict, rebase and re-verify every removed id is still
    * live — if another job already swapped one, this swap aborts. */
  /** When `recomputeCoverage` (DELETE on a time-series table): the new
    * table-coverage snapshot (union of surviving + new segment sidecars)
    * commits ATOMICALLY with the Remove+Add actions, so no crash window
    * can leave a stale snapshot that falsely rejects later appends into
    * the vacated range. Orphan .cov files from lost OCC races are benign
    * (same policy as append's pre-commit sidecar writes). */
  private[graft] def swapSegments(df: DataFrame, removed: Seq[SegmentMeta],
                                  maxRetries: Int = 3,
                                  recomputeCoverage: Boolean = false,
                                  txn: Option[(String, Long)] = None,
                                  extraActions: Seq[LogAction] = Nil): (Seq[SegmentMeta], Long) = {
    val spark = df.sparkSession
    val checksValidated = cachedState.tableMeta.map(_.checks).getOrElse(Nil)
    val removeIds = removed.map(_.segmentId)
    val expectedDv = removed.map(s => s.segmentId -> s.dvPath).toMap
    val segs = stageSegments(df)
    // same orphan rule as append: the rewritten files were moved into
    // data/ above, so every abort path (lost race on a removed segment,
    // retry budget exhausted, rejected re-gate) must delete them + their
    // sidecars before propagating — no commit references them and
    // Expire's orphan scan only reclaims log-seen segments. The cleanup
    // runs in the catch below, OUTSIDE the commit lock, so a large
    // aborting swap never stalls other writers' sub-ms commits.
    try {
      // The expensive rewrite job already ran OUTSIDE the lock; the rare
      // re-gate of a concurrently-added CHECK is the only data-touching
      // work that can run under it.
      val v = occLoop(maxRetries) { st =>
        // streaming-upsert idempotency (mirrors append): a replayed batch
        // unwinds to the cleanup catch below, outside the commit lock
        txn.foreach { case (app, batch) =>
          if (st.txns.get(app).exists(_ >= batch)) throw TsTable.TxnReplayed(st.version)
        }
        val missing = removeIds.filterNot(st.segments.contains)
        if (missing.nonEmpty)
          throw new IllegalStateException(
            s"swap aborted: segments already rewritten by a concurrent job: $missing")
        // a concurrent MOR delete keeps the segment ID but changes its
        // deletion vector — committing this rewrite (whose bytes were read
        // under the OLD DV) would silently resurrect the just-deleted rows,
        // so the swap verifies the DV pointer it read under, not mere id
        // presence (the mirror of commitDvAttach's expectedDv guard)
        val dvRaced = removeIds.filter(id => st.segments(id).dvPath != expectedDv(id))
        if (dvRaced.nonEmpty)
          throw new IllegalStateException(
            s"swap aborted: segments re-DV'd by a concurrent DELETE/MERGE: $dvRaced")
        // a CHECK added since this rewrite validated must re-gate it (the
        // staged rows could predate the constraint); unchanged checks skip
        if (st.tableMeta.map(_.checks).getOrElse(Nil) != checksValidated)
          enforceChecks(spark, segs.map(s => (s"$root/${s.path}", s.stats, s.rowCount)))
        val actions: Seq[LogAction] =
          removeIds.map(LogAction.RemoveSegment) ++ segs.map(LogAction.AddSegment) ++
            (if (recomputeCoverage) coverageActionFor(st, removeIds, segs).toSeq else Nil) ++
            txn.map { case (app, batch) => LogAction.SetTxn(app, batch) }.toSeq ++
            extraActions // change-feed records / DataNeutral marker ride the same commit
        commitAndAdvance(st, actions)
      }
      (segs, v)
    } catch { case e: Throwable => deleteStaged(segs); throw e }
  }

  /** Write `df` as new committed-ready segments under data/ (staging dir,
    * zero-row parts discarded, footer stats, coverage sidecars for
    * time-series tables) and return their metas. NO log commit happens
    * here: the caller commits the AddSegments (swapSegments, mergeMor) and
    * owns [[deleteStaged]] cleanup on every abort path — until the commit
    * lands these files are unreferenced orphans invisible to readers. */
  private[graft] def stageSegments(df: DataFrame): Seq[SegmentMeta] = {
    val spark = df.sparkSession
    val commitId = UUID.randomUUID().toString.take(8)
    val stagingAbs = s"$root/.staging-$commitId"
    // same liveness beacon as append: a long rewrite must not lose its
    // staging tree to a concurrent Expire's crashed-writer reclamation
    val heartbeat = StagingHeartbeat.start(stagingAbs)
    try {
      // toPhysical: rewrite inputs arrive physical (segmentScan) or
      // logical (a maintenance op that applied user expressions); the
      // rename is by-name, so a physical frame passes through untouched
      // and a logical one lands under the files' frozen physical names
      toPhysical(df).write.options(segmentWriteOptions).mode("overwrite").parquet(stagingAbs)
      val written0 = listParquet(stagingAbs)
      val conf = spark.sparkContext.hadoopConfiguration
      // zero-row part files (a rewrite partition whose every row was
      // filtered away) are DISCARDED like the append path does — committing
      // one would create a rowCount=0 segment with no coverage sidecar,
      // which wedges the time-series append precondition forever. An
      // all-empty rewrite degenerates to a pure-Remove commit.
      val statsAll = FooterStats.readAll(conf, written0)
      val (liveOut, emptyOut) = statsAll.partition(_._2.rowCount > 0)
      emptyOut.foreach(f => Files.deleteIfExists(Paths.get(stripScheme(f._1))))
      val written = liveOut.map(_._1)
      val fileStats = liveOut
      val moved = written.zipWithIndex.map { case (src, i) =>
        val rel = f"data/$commitId-$i%05d.parquet"
        Files.createDirectories(Paths.get(s"$root/data"))
        Files.move(Paths.get(stripScheme(src)), Paths.get(stripScheme(s"$root/$rel")))
        rel
      }
      // same beacon-before-delete ordering as append (see there)
      heartbeat.stop()
      deleteRecursively(Paths.get(stripScheme(stagingAbs)))
      // time-series tables: rewritten segments need coverage sidecars so the
      // append overlap-check precondition keeps holding after compaction
      val covByPath: Map[String, String] = timeSpec match {
        case Some(spec) if moved.nonEmpty =>
          computeCoverage(spark, moved.map(rel => s"$root/$rel"), spec).map { case (p, bm) =>
            val rel = p.stripPrefix(graft.meta.PathNorm.canonical(root) + "/")
            val segId = SegmentMeta.segmentIdV1(rel, Paths.get(p))
            val covRel = s"_coverage/segments/segcov-$segId.cov"
            writeBytes(s"$root/$covRel", bm.serialize())
            rel -> covRel
          }
        case _ => Map.empty
      }
      val segs = moved.zip(fileStats).map { case (rel, (_, fs)) =>
        val segId = SegmentMeta.segmentIdV1(rel, Paths.get(stripScheme(s"$root/$rel")))
        SegmentMeta(segId, rel, "parquet", fs.rowCount, Some(fs.fileSize), fs.stats,
          covByPath.get(rel))
      }
      // CHECK constraints also gate rewrites/merge-adds staged here: the
      // stats fast path clears pass-through rewrites (existing rows were
      // validated at their own write), and it is the only net that can
      // catch an UPDATE whose SET drives rows out of bounds
      try enforceChecks(spark, segs.map(s => (s"$root/${s.path}", s.stats, s.rowCount)))
      catch { case e: Throwable => deleteStaged(segs); throw e }
      segs
    } finally heartbeat.stop()
  }

  /** Delete staged-but-uncommitted segments (+ sidecars) after an abort. */
  private[graft] def deleteStaged(segs: Seq[SegmentMeta]): Unit =
    segs.foreach { seg =>
      Files.deleteIfExists(Paths.get(stripScheme(s"$root/${seg.path}")))
      seg.coveragePath.foreach(cp =>
        Files.deleteIfExists(Paths.get(stripScheme(s"$root/$cp"))))
    }

  // ------------------------------------------------------ change data feed

  /** Whether row-changing writers record a change feed (TableMeta flag). */
  def cdfEnabled: Boolean = cachedState.tableMeta.exists(_.cdfEnabled)

  /** Turn the change feed on/off — one metadata commit. The feed is
    * readable from the first commit AFTER the enabling one; mutations
    * before it have no record and [[graft.maintain.ChangeFeed]] refuses
    * ranges that cross them (Delta delta.enableChangeDataFeed analog). */
  def enableCdf(maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      if (m.cdfEnabled) None else Some(m.copy(cdfEnabled = true)) }
  def disableCdf(maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      if (!m.cdfEnabled) None else Some(m.copy(cdfEnabled = false)) }

  // ---------------------------------------------------------- row tracking

  /** Whether rows carry stable ids (TableMeta flag). */
  def rowTrackingEnabled: Boolean = cachedState.tableMeta.exists(_.rowTracking)

  /** Turn row tracking on: ONE metadata commit that flips the flag and
    * backfills every live segment with a baseRowId range (the commit hook
    * assigns them — Delta's backfill semantics: pre-enable history has no
    * ids, and existing rows are identified as-of enablement). Main-handle
    * only: a branch enabling tracking independently could mint id ranges
    * that collide with main's at publish. Re-enabling after a disable
    * keeps previously assigned ranges — ids stay stable across the
    * round-trip. Refuses when the schema already claims the reserved
    * column names. */
  def enableRowTracking(maxRetries: Int = 3): Long = {
    requireMainHandle("enable row tracking")
    occLoop(maxRetries) { st =>
      val m = st.tableMeta.getOrElse(throw CorruptLogException("table has no metadata"))
      if (m.rowTracking) st.version
      else {
        m.schema.foreach { s =>
          val clash = s.fieldNames.toSet
            .intersect(Set(RowTracking.RowIdCol, RowTracking.RowCommitCol))
          if (clash.nonEmpty) throw SchemaMismatchException(
            s"row tracking reserves column names ${clash.mkString(", ")}")
        }
        val backfill: Seq[LogAction] =
          st.liveSegments.filter(_.baseRowId.isEmpty).map(LogAction.AddSegment)
        commitAndAdvance(st,
          backfill :+ LogAction.UpdateTableMeta(m.copy(rowTracking = true)))
      }
    }
  }

  /** Turn row tracking off (the high-water mark and assigned ranges are
    * kept, so a later re-enable resumes without id reuse). */
  def disableRowTracking(maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      if (!m.rowTracking) None else Some(m.copy(rowTracking = false)) }

  /** Scan the current snapshot with `_row_id` / `_row_commit` appended —
    * the row-tracking read surface. Ids resolve as
    * coalesce(materialized column, baseRowId + row position); the DV
    * filter applies AFTER the binding (positions are physical), and the
    * logical (rename-aware) projection applies last. */
  def scanWithRowIds(spark: SparkSession): DataFrame =
    scanStateWithRowIds(spark, cachedState)

  private[graft] def scanStateWithRowIds(spark: SparkSession, st: TableState): DataFrame = {
    val m = st.tableMeta.getOrElse(throw CorruptLogException("table has no metadata"))
    require(m.rowTracking, "row tracking is not enabled on this table")
    val logSchema = m.schema.getOrElse(
      throw new IllegalStateException("table has no schema yet"))
    val outSchema = StructType(logSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(RowTracking.RowIdCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(RowTracking.RowCommitCol, org.apache.spark.sql.types.LongType)))
    val live = st.liveSegments
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
    val withIds = RowTracking.attach(segmentScanTracked(spark, live, m), root, live)
    val filtered = DeletionVectors.liveRowFilter(root, live)
      .map(withIds.where).getOrElse(withIds)
    val cmap = m.colMap
    filtered.select(logSchema.fieldNames.toIndexedSeq
      .map(n => col(cmap.getOrElse(n, n)).as(n))
      ++ Seq(col(RowTracking.RowIdCol), col(RowTracking.RowCommitCol)): _*)
  }

  /** Row-id range scan `[lo, hi]` — the point-lookup/incremental-fetch
    * surface of row tracking. File pruning is EXACT and metadata-only:
    * a positional (never-rewritten) file's id range is
    * [baseRowId, baseRowId + rowCount) straight from the manifest, and a
    * rewritten file carries `_row_id` min/max in its footer stats — so a
    * consumer fetching the rows behind a batch of change-feed ids reads
    * only the files that can hold them, at any table size. The residual
    * range filter applies post-attach (ids bind before the DV conjunct). */
  def scanRowIdRange(spark: SparkSession, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty row-id range [$lo, $hi]")
    val st = cachedState
    val m = st.tableMeta.getOrElse(throw CorruptLogException("table has no metadata"))
    require(m.rowTracking, "row tracking is not enabled on this table")
    val hit = st.liveSegments.filter { s =>
      val posOverlap = s.baseRowId.exists(b => b <= hi && b + s.rowCount - 1 >= lo)
      val statOverlap = s.stats.get(RowTracking.RowIdCol).exists {
        case graft.meta.ColStats(Some(StatVal.L(mn)), Some(StatVal.L(mx)), _) =>
          mn <= hi && mx >= lo
        case _ => false
      }
      // a rewritten file's positional range is meaningless (ids are
      // materialized; the base was minted but unused) — stats decide when
      // present, the manifest range otherwise
      if (s.stats.contains(RowTracking.RowIdCol)) statOverlap else posOverlap
    }
    val empty = {
      val logSchema = m.schema.getOrElse(new StructType())
      StructType(logSchema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(RowTracking.RowIdCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(RowTracking.RowCommitCol, org.apache.spark.sql.types.LongType)))
    }
    if (hit.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
    val withIds = RowTracking.attach(segmentScanTracked(spark, hit, m), root, hit)
    val filtered = DeletionVectors.liveRowFilter(root, hit)
      .map(withIds.where).getOrElse(withIds)
      .where(col(RowTracking.RowIdCol) >= lo && col(RowTracking.RowIdCol) <= hi)
    val logSchema = m.schema.get
    val cmap = m.colMap
    filtered.select(logSchema.fieldNames.toIndexedSeq
      .map(n => col(cmap.getOrElse(n, n)).as(n))
      ++ Seq(col(RowTracking.RowIdCol), col(RowTracking.RowCommitCol)): _*)
  }

  /** Physical relation over `segs` whose dataSchema includes the two
    * (nullable, usually file-absent) materialized tracking columns —
    * Spark's parquet missing-column handling fills NULL for fresh files,
    * and rewritten files supply their frozen values. */
  private def segmentScanTracked(spark: SparkSession, segs: Seq[SegmentMeta],
                                 m: TableMeta): DataFrame = {
    val phys = m.physicalSchema.getOrElse(
      throw new IllegalStateException("table has no schema yet"))
    val readSchema = StructType(
      phys.fields.filterNot(f =>
        f.name == RowTracking.RowIdCol || f.name == RowTracking.RowCommitCol) ++ Seq(
        org.apache.spark.sql.types.StructField(RowTracking.RowIdCol, org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(RowTracking.RowCommitCol, org.apache.spark.sql.types.LongType)))
    spark.baseRelationToDataFrame(relationFor(spark, segs, readSchema))
  }

  /** Maintenance read of `segs` with tracking columns attached and
    * MATERIALIZED (physical names; rows physical — callers layer DV
    * filters as with [[segmentScan]]). Row-preserving rewrites feed this
    * straight to [[stageSegments]], freezing each surviving row's id and
    * last-modified version into the new files. */
  private[graft] def segmentScanWithRowIds(spark: SparkSession,
                                           segs: Seq[SegmentMeta]): DataFrame = {
    val m = cachedState.tableMeta.getOrElse(throw CorruptLogException("table has no metadata"))
    RowTracking.attach(segmentScanTracked(spark, segs, m), root, segs)
  }

  /** Stage a change-record DataFrame (logical table columns +
    * `_change_type`) as parquet under `_cdc/` and return the AddCdcFile
    * actions the caller must carry in the SAME commit as the change —
    * exactly the staged-then-committed discipline of [[stageSegments]],
    * without footer-stats/coverage/check machinery (the feed is not
    * scannable table state). Until that commit lands the files are
    * unreferenced; the caller owns [[deleteCdcStaged]] on every abort path
    * (Expire's unreferenced-sweep is the crashed-writer backstop). */
  private[graft] def stageCdc(df: DataFrame): Seq[LogAction.AddCdcFile] = {
    val commitId = UUID.randomUUID().toString.take(8)
    val stagingAbs = s"$root/.staging-cdc-$commitId"
    val heartbeat = StagingHeartbeat.start(stagingAbs)
    try {
      // physical column names on disk, like the data files — the feed
      // reader maps back through the read-time column mapping, so a CDC
      // file written before a RENAME still reads under the new name
      toPhysical(df).write.mode("overwrite").parquet(stagingAbs)
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val stats = FooterStats.readAll(conf, listParquet(stagingAbs))
      val (live, empty) = stats.partition(_._2.rowCount > 0)
      empty.foreach(f => Files.deleteIfExists(Paths.get(stripScheme(f._1))))
      Files.createDirectories(Paths.get(stripScheme(s"$root/_cdc")))
      val actions = live.zipWithIndex.map { case ((src, fs), i) =>
        val rel = f"_cdc/cdc-$commitId-$i%05d.parquet"
        Files.move(Paths.get(stripScheme(src)), Paths.get(stripScheme(s"$root/$rel")))
        LogAction.AddCdcFile(rel, fs.rowCount)
      }
      heartbeat.stop()
      deleteRecursively(Paths.get(stripScheme(stagingAbs)))
      actions
    } finally heartbeat.stop()
  }

  /** Abort cleanup for [[stageCdc]] output whose commit never landed. */
  private[graft] def deleteCdcStaged(actions: Seq[LogAction.AddCdcFile]): Unit =
    actions.foreach(a => Files.deleteIfExists(Paths.get(stripScheme(s"$root/${a.path}"))))

  /** CHECK constraint: add an ingest-quality gate (name → SQL predicate)
    * as a metadata-only commit. SQL CHECK semantics: a row passes when
    * the predicate is TRUE or NULL; only provably-FALSE rows violate.
    * Existing data is validated first (one scan; rejected if any row
    * violates), so the invariant "every committed row satisfies every
    * check" holds from the moment the commit lands — and rewrites can
    * rely on it. */
  def addCheck(spark: SparkSession, name: String, predicateSql: String,
               maxRetries: Int = 3): Long = {
    import org.apache.spark.sql.functions.{expr, lit, not}
    val cond = expr(predicateSql)
    commitMetaUpdate(maxRetries) { (st, m) =>
      require(!m.checks.exists(_._1 == name), s"check '$name' already exists")
      // validate INSIDE the OCC loop, so a write racing this commit gets
      // re-validated on the rebase (a write that lands after our commit
      // is gated by enforceChecks instead — no unvalidated window)
      if (st.liveSegments.nonEmpty) {
        val bad = scanState(spark, st).where(not(cond) === lit(true)).count()
        if (bad > 0) throw CheckViolationException(name, predicateSql, bad)
      } else if (m.schema.isDefined) {
        scanState(spark, st).where(cond).queryExecution.analyzed // fail fast on bad columns
      }
      Some(m.copy(checks = m.checks :+ (name -> predicateSql)))
    }
  }

  /** Tag a version with a stable name (metadata-only commit). Tags are
    * human-stable time-travel handles; [[graft.maintain.Expire]] refuses
    * to reclaim history a tag still points into. Default target: the
    * current version. */
  def setTag(name: String, version: Option[Long] = None, maxRetries: Int = 3): Long =
    updateTags(name, current => {
      val v = version.getOrElse(current)
      require(v >= 1 && v <= current, s"tag target v$v out of range [1, $current]")
      // the target must still be REPLAYABLE — commits/checkpoint AND data
      // files: tagging a version expiration already reclaimed (even
      // partially — a surviving checkpoint can outlive swept files) would
      // wedge every later expire and fail scanAtTag far from the cause
      val target =
        try TableState.rebuildAt(store, v)
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"cannot tag v$v: its history was already reclaimed by snapshot " +
              s"expiration (${e.getMessage})", e)
        }
      val missing = target.liveSegments
        .flatMap(s => (Seq(s.path) ++ s.coveragePath.toSeq ++ s.dvPath.toSeq))
        .filterNot(rel => Files.exists(Paths.get(stripScheme(s"$root/$rel"))))
      require(missing.isEmpty,
        s"cannot tag v$v: ${missing.size} referenced file(s) already reclaimed by " +
          s"snapshot expiration, e.g. ${missing.take(3).mkString(", ")}")
      Some(v)
    }, maxRetries)

  /** Remove a tag (metadata-only commit). */
  def dropTag(name: String, maxRetries: Int = 3): Long =
    updateTags(name, _ => None, maxRetries, mustExist = true)

  def tags: Map[String, Long] = cachedState.tableMeta.map(_.tags).getOrElse(Map.empty)

  /** Time-travel scan by tag name. */
  def scanAtTag(spark: SparkSession, name: String): DataFrame = {
    refresh()
    val v = tags.getOrElse(name,
      throw new IllegalArgumentException(s"no such tag: '$name' (have: ${tags.keys.toSeq.sorted.mkString(", ")})"))
    scanAt(spark, v)
  }

  /** Time travel by wall clock (`AS OF TIMESTAMP` — Delta/Iceberg analog):
    * the snapshot a reader at `tsMillis` would have seen, i.e. the LAST
    * commit whose recorded `timestamp` is ≤ `tsMillis`. Resolution scans
    * only the commit timestamps the log still holds (KB-sized JSONs,
    * driver-side, the same cost class as `history` — snapshot expiration
    * keeps the retained window bounded at any table scale) and tolerates
    * non-monotone stamps from cross-process writer clock skew by taking
    * the max qualifying version, not the first. Refused with a clear
    * error when `tsMillis` predates the earliest retained commit (its
    * state was reclaimed — same contract as expired `scanAt`). */
  def versionAsOf(tsMillis: Long): Long = {
    refresh()
    val cur = store.currentVersion()
    require(cur >= 1, "table has no commits yet")
    var best = -1L
    var earliest = Long.MaxValue
    var earliestV = -1L
    var v = cur
    while (v >= 1 && Files.exists(store.commitPath(v))) {
      val ts = store.readCommit(v).timestampMillis
      if (ts < earliest) { earliest = ts; earliestV = v }
      if (ts <= tsMillis && v > best) best = v
      v -= 1
    }
    if (best >= 0) best
    else throw new IllegalArgumentException(
      s"no snapshot at or before timestamp $tsMillis " +
        s"(${java.time.Instant.ofEpochMilli(tsMillis)}): earliest retained commit is " +
        s"v$earliestV at ${java.time.Instant.ofEpochMilli(earliest)} — older history was " +
        "reclaimed by snapshot expiration")
  }

  /** Time-travel scan as of a wall-clock instant (epoch millis). */
  def scanAsOf(spark: SparkSession, tsMillis: Long): DataFrame =
    scanAt(spark, versionAsOf(tsMillis))

  /** SHALLOW CLONE (Delta CLONE / Iceberg snapshot-ref analog): a new,
    * fully independent table at `destRoot` whose first commit references
    * this table's live data files IN PLACE via absolute manifest paths —
    * zero data bytes move, so cloning a 100 TB table costs one metadata
    * commit plus KB-sized sidecar copies (DV bitmaps, coverage). The clone
    * is a complete table: scans prune through the copied stats, every
    * writer verb works, and maintenance rewrites (compaction, CoW
    * DELETE/UPDATE/MERGE) progressively re-materialize touched files under
    * the clone's own root — copy-on-write divergence, the source never
    * sees clone writes and vice versa. The clone's Expire deletes only
    * files it owns ([[graft.meta.PathNorm.ownedBy]]): external references
    * age out of its manifest without touching the source's bytes.
    *
    * Caveat (same as Delta shallow clones, documented public behavior):
    * the source's own Expire does not know about clones — expiring source
    * history that removed files a clone still references breaks that
    * clone's reads. Tag the source version (`setTag`) to hold it, or
    * compact the clone (`Compaction.run`) to make it self-contained.
    *
    * Tags are not copied (they name SOURCE log versions); txn watermarks
    * ARE, so a streaming writer repointed at the clone keeps exactly-once.
    */
  def cloneTo(destRoot: String, at: Option[Long] = None): TsTable = {
    requireMainHandle("cloneTo")
    refresh()
    val v = at.getOrElse(version)
    require(v >= 1 && v <= version, s"clone source version v$v out of range [1, $version]")
    require(graft.meta.PathNorm.canonical(destRoot) != graft.meta.PathNorm.canonical(root),
      "clone target must differ from the source root")
    val st =
      try TableState.rebuildAt(store, v)
      catch { case e: Exception =>
        throw new IllegalArgumentException(
          s"cannot clone at v$v: its history was already reclaimed by snapshot " +
            s"expiration (${e.getMessage})", e)
      }
    val destStore = LogStore(destRoot)
    if (destStore.currentVersion() != 0L)
      throw ConflictException(0L, destStore.currentVersion())
    destStore.initDirs()
    // per-segment sidecars (DV bitmaps, coverage runs) are KBs — copy them
    // so the clone's MOR reads and coverage queries never reach back into
    // the source's mutable sidecar namespace
    def copySidecar(rel: String): Unit = {
      val src = Paths.get(stripScheme(s"$root/$rel"))
      val dst = Paths.get(stripScheme(s"$destRoot/$rel"))
      Files.createDirectories(dst.getParent)
      if (Files.exists(src))
        Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val segs = st.liveSegments.map { seg =>
      seg.dvPath.foreach(copySidecar)
      seg.coveragePath.foreach(copySidecar)
      // already-absolute paths (clone of a clone) pass through unchanged
      seg.copy(path = graft.meta.PathNorm.resolve(root, seg.path))
    }
    st.tableCoverage.foreach(c => copySidecar(c.coveragePath))
    val actions: Seq[LogAction] =
      st.tableMeta.map(m => LogAction.UpdateTableMeta(m.copy(tags = Map.empty))).toSeq ++
        segs.map(LogAction.AddSegment) ++
        st.tableCoverage.map(c => LogAction.UpdateTableCoverage(c.bucketSpec, c.coveragePath)).toSeq ++
        st.txns.toSeq.sortBy(_._1).map { case (a, b) => LogAction.SetTxn(a, b) }
    destStore.commitWithExpectedVersion(0L, actions)
    new TsTable(destRoot, destStore)
  }

  // ------------------------------------------------------------ branches

  /** Create a branch forked at `at` (default: the current version) and
    * return a writable handle on it — the write-audit-publish (WAP)
    * entry point. Every writer verb on the returned handle (append,
    * MERGE, DELETE/UPDATE, compaction, streaming ingest) commits to the
    * branch log under `_branches/<name>/`, invisible to main readers;
    * data files share the table's `data/` root (UUID names never
    * collide) and [[graft.maintain.Expire]] retains them while the
    * branch lives. Audit = any read/CHECK against the branch handle;
    * publish = [[publishBranch]]; abandon = [[dropBranch]]. */
  def createBranch(name: String, at: Option[Long] = None): TsTable = {
    requireMainHandle("createBranch")
    refresh()
    val v = at.getOrElse(version)
    require(v >= 1 && v <= version, s"branch fork point v$v out of range [1, $version]")
    // same replayability guard as tags: forking at a version expiration
    // already reclaimed would wedge every later expire
    try TableState.rebuildAt(store, v)
    catch { case e: Exception =>
      throw new IllegalArgumentException(
        s"cannot branch at v$v: its history was already reclaimed by snapshot " +
          s"expiration (${e.getMessage})", e)
    }
    BranchLog.create(store.tableRoot, name, v)
    branch(name)
  }

  /** Writable handle on an existing branch. */
  def branch(name: String): TsTable = {
    requireMainHandle("branch")
    new TsTable(root, BranchLog.open(store.tableRoot, name))
  }

  def branches: Seq[String] = BranchLog.list(store.tableRoot)

  /** The branch this handle writes to, if it is a branch handle. */
  def branchName: Option[String] = store match {
    case b: BranchLog => Some(b.branch); case _ => None
  }

  /** Delete a branch and its commit files. Data files the branch added
    * become unreferenced and are reclaimed by the next expire sweep
    * (age-guarded, like any crashed-writer debris). */
  def dropBranch(name: String): Boolean = {
    requireMainHandle("dropBranch")
    BranchLog.drop(store.tableRoot, name)
  }

  /** Publish a branch onto main as ONE atomic squash commit — the
    * fast-forward half of WAP. The net effect between the branch's fork
    * state and its head (segment removes/upserts/adds, meta, coverage
    * pointer, txn watermarks) lands in a single OCC commit, so main
    * readers flip from pre-branch to post-branch state atomically and a
    * publish racing another writer either wins wholly or not at all.
    * Fast-forward only: if main advanced past the fork point the publish
    * fails (re-branch from the new head and replay) — a cross-writer
    * rebase would silently re-order snapshot history. Changed segments
    * (e.g. a DV attached on the branch) are emitted as Remove+Add like
    * every data-change commit, so a streaming tail of main skips them
    * rather than re-delivering rows. */
  def publishBranch(name: String, maxRetries: Int = 5, dropAfter: Boolean = true): Long = {
    requireMainHandle("publishBranch")
    val bl = BranchLog.open(store.tableRoot, name)
    val head = bl.currentVersion()
    val headState = TableState.rebuildAt(bl, head)
    val baseState = TableState.rebuildAt(store, bl.base)
    val committed = occLoop(maxRetries) { st =>
      if (st.version != bl.base)
        throw new IllegalStateException(
          s"non-fast-forward publish: branch '$name' forked at v${bl.base} but main " +
            s"is at v${st.version}; re-branch from the new head and replay")
      val b = Seq.newBuilder[LogAction]
      baseState.segments.keysIterator.filterNot(headState.segments.contains)
        .toSeq.sorted.foreach(id => b += LogAction.RemoveSegment(id))
      headState.liveSegments.foreach { s =>
        baseState.segments.get(s.segmentId) match {
          case Some(old) if old == s => () // untouched on the branch
          case Some(_) => b += LogAction.RemoveSegment(s.segmentId); b += LogAction.AddSegment(s)
          case None => b += LogAction.AddSegment(s)
        }
      }
      headState.tableMeta.filterNot(baseState.tableMeta.contains)
        .foreach(m => b += LogAction.UpdateTableMeta(m))
      headState.tableCoverage.filterNot(baseState.tableCoverage.contains)
        .foreach(c => b += LogAction.UpdateTableCoverage(c.bucketSpec, c.coveragePath))
      headState.txns.toSeq.sortBy(_._1).foreach { case (app, batch) =>
        if (baseState.txns.get(app).forall(_ < batch)) b += LogAction.SetTxn(app, batch)
      }
      val actions = b.result()
      if (actions.isEmpty) st.version else commitAndAdvance(st, actions)
    }
    if (dropAfter) dropBranch(name)
    committed
  }

  private def requireMainHandle(op: String): Unit = store match {
    case b: BranchLog => throw new IllegalStateException(
      s"$op must run on the main table handle, not branch '${b.branch}' (nested branches are not supported)")
    case _ => ()
  }

  private def updateTags(name: String, f: Long => Option[Long], maxRetries: Int,
                         mustExist: Boolean = false): Long =
    commitMetaUpdate(maxRetries) { (st, m) =>
      if (mustExist) require(m.tags.contains(name), s"no such tag: '$name'")
      val newTags = f(st.version) match {
        case Some(v) => m.tags + (name -> v)
        case None => m.tags - name
      }
      if (newTags == m.tags) None else Some(m.copy(tags = newTags))
    }

  /** Shared OCC loop for metadata-only commits (schema evolution, checks,
    * tags): refresh, validate+transform the CURRENT meta via `f` inside
    * the loop (so a rebase re-validates against what it actually commits
    * over; throw to abort, None for a no-op), commit one UpdateTableMeta,
    * rebase-retry on conflicts. */
  private def commitMetaUpdate(maxRetries: Int = 3)
                              (f: (TableState, TableMeta) => Option[TableMeta]): Long =
    occLoop(maxRetries) { st =>
      val m = st.tableMeta.getOrElse(throw new IllegalStateException(
        "no table metadata yet — create the table first"))
      f(st, m) match {
        case None     => st.version
        case Some(nm) => commitAndAdvance(st, Seq(LogAction.UpdateTableMeta(nm)))
      }
    }

  /** Drop a CHECK constraint (metadata-only). */
  def dropCheck(name: String, maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      require(m.checks.exists(_._1 == name), s"no such check: '$name'")
      Some(m.copy(checks = m.checks.filterNot(_._1 == name)))
    }

  /** Enforce the table's CHECK constraints over freshly staged files.
    * Stats fast path, sound by the Tri algebra's one reliable direction:
    * eval(NOT check) == AlwaysFalse over a file's footer stats means NO
    * row makes the predicate FALSE (TRUE or NULL both pass, per SQL
    * CHECK), so the file skips the row-level scan — on appends of clean
    * data with tight stats this costs driver arithmetic only. Files the
    * stats can't clear get ONE filtered count over just those files. */
  private def enforceChecks(spark: SparkSession,
                            files: Seq[(String, Map[String, graft.meta.ColStats], Long)]): Unit = {
    val checks = cachedState.tableMeta.map(_.checks).getOrElse(Nil)
    if (checks.isEmpty || files.isEmpty) return
    import org.apache.spark.sql.functions.{expr, lit, not}
    checks.foreach { case (name, sql) =>
      val cond = expr(sql)
      val resolved: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
        try scan(spark).where(cond).queryExecution.analyzed.collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
        } catch { case _: Exception => None } // schema not adopted yet → row-check all
      // staged files (and their footer stats) carry PHYSICAL names; the
      // check predicate is LOGICAL — re-key stats and alias the row scan
      // (both identity for never-renamed tables)
      val inv = colMap.map(_.swap)
      def logStats(stats: Map[String, graft.meta.ColStats]) =
        if (inv.isEmpty) stats else stats.map { case (k, v) => inv.getOrElse(k, k) -> v }
      val suspects = files.filter { case (_, stats, rc) =>
        resolved match {
          case Some(c) =>
            graft.scan.StatsPruning.eval(
              org.apache.spark.sql.catalyst.expressions.Not(c), logStats(stats), rc) !=
              graft.scan.StatsPruning.AlwaysFalse
          case None => true
        }
      }
      if (suspects.nonEmpty) {
        val bad = toLogical(spark.read.parquet(suspects.map(_._1): _*))
          .where(not(cond) === lit(true)).count()
        if (bad > 0) throw CheckViolationException(name, sql, bad)
      }
    }
  }

  /** Manifest-backed PHYSICAL scan over an explicit segment subset — the
    * read every maintenance job (compaction bin, MERGE/DELETE/UPDATE
    * candidates) must use instead of a bare `spark.read.parquet(paths)`:
    * the manifest already knows each file's path and size, so the scan
    * plans with ZERO filesystem listing (a bare parquet read of a 161-file
    * bin was paying two ~1 s distributed listing jobs per rewrite — pure
    * scheduler overhead at any scale, and a real object-store LIST storm
    * at 100 TB). Schema is pinned to the MANIFEST, never footer-inferred:
    * after an ADD COLUMN the live set mixes old- and new-footer files, and
    * a footer-inferred read can adopt an OLD file's schema — silently
    * DROPPING the evolved column from a rewrite; pinning also NULL-fills
    * it on old files and skips the footer-sample job. Rows are physical
    * (no DV filter) — callers layer
    * [[DeletionVectors.liveRowFilter]] exactly as before. */
  private[graft] def segmentScan(spark: SparkSession, segs: Seq[SegmentMeta]): DataFrame = {
    require(segs.nonEmpty, "segmentScan over an empty segment set")
    // PHYSICAL names throughout: maintenance reads feed maintenance
    // writes, and files are physical end-to-end — a rewrite never has to
    // know a rename happened. Callers that apply USER expressions
    // (predicates, SET clauses, merge keys — logical names) sandwich with
    // toLogical/toPhysical.
    val schema = cachedState.tableMeta.flatMap(_.physicalSchema)
      .getOrElse(spark.read.parquet(abs(segs.head)).schema)
    spark.baseRelationToDataFrame(relationFor(spark, segs, schema))
  }

  // ------------------------------------------------- column mapping view

  /** logical → physical column mapping (empty = never renamed). */
  private[graft] def colMap: Map[String, String] =
    cachedState.tableMeta.map(_.colMap).getOrElse(Map.empty)

  /** Rename a user-facing (logical) DataFrame to physical names for a
    * write, or a physical read back to logical for user expressions.
    * Identity (the same DataFrame object) when no rename ever happened. */
  private[graft] def toPhysical(df: DataFrame): DataFrame = renameCols(df, colMap)
  private[graft] def toLogical(df: DataFrame): DataFrame =
    renameCols(df, colMap.map(_.swap))
  private def renameCols(df: DataFrame, m: Map[String, String]): DataFrame =
    if (m.isEmpty) df
    else m.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d }

  /** A segment's footer stats re-keyed to LOGICAL names, for evaluating
    * user predicates (stats sidecars are keyed physical, like the files). */
  private[graft] def logicalStats(seg: SegmentMeta): Map[String, graft.meta.ColStats] = {
    val inv = colMap.map(_.swap)
    if (inv.isEmpty) seg.stats
    else seg.stats.map { case (k, v) => inv.getOrElse(k, k) -> v }
  }

  /** Schema evolution: ADD COLUMN as a metadata-only commit (one
    * UpdateTableMeta action — no data file is touched, so evolving a
    * 100 TB table costs one log write). The new column is forced
    * nullable: files written before the evolution have no values for it
    * and every scan fills NULL there via Spark's parquet missing-column
    * handling (the relation's dataSchema is the MANIFEST schema, not the
    * file footers'). Appends after the commit must carry the full evolved
    * schema — the adopt-or-enforce check keeps exact-match semantics, so
    * an old-schema writer fails loudly instead of silently dropping the
    * column. OCC rebase-retry like every other metadata commit. */
  def addColumn(name: String, dataType: org.apache.spark.sql.types.DataType,
                maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      val sch = m.schema.getOrElse(throw new IllegalStateException(
        "no schema adopted yet — append once before evolving the schema"))
      require(!sch.fieldNames.contains(name), s"column '$name' already exists")
      // a renamed column's frozen physical name still occupies the files —
      // a new logical column with that name would collide on every write
      require(!m.colMap.valuesIterator.contains(name),
        s"'$name' is the physical name of a renamed column; pick another name")
      val evolved = StructType(sch.fields :+
        org.apache.spark.sql.types.StructField(name, dataType, nullable = true))
      Some(m.copy(schemaJson = Some(evolved.json)))
    }

  /** Schema evolution: RENAME COLUMN as a metadata-only commit, via a
    * column mapping (Delta columnMapping / Iceberg rename-by-field-id
    * analog). Physical names are FROZEN at column creation: the files —
    * past AND future — keep the original name, and every scan restores
    * the logical view with one alias projection (filters and pruning push
    * through it), so renaming a column on a 100 TB table costs one log
    * write and zero data IO forever. Maintenance rewrites stay physical
    * end-to-end and never need to know. Refused for columns the table's
    * layout identity depends on (time index, entity, cluster columns) and
    * for columns a CHECK still references (drop the check first) — the
    * same conservative guards as DROP COLUMN. Pre-rename snapshots
    * time-travel under the old name (each snapshot scans via its own
    * meta). The DSv1 `format("graft-table")` batch relation has no
    * projection hook and refuses renamed tables loudly, like DV'd ones. */
  def renameColumn(oldName: String, newName: String, maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      val sch = m.schema.getOrElse(throw new IllegalStateException(
        "no schema adopted yet — append once before evolving the schema"))
      require(sch.fieldNames.contains(oldName), s"no such column: '$oldName'")
      require(newName.nonEmpty && newName != oldName, s"bad target name: '$newName'")
      require(!sch.fieldNames.contains(newName), s"column '$newName' already exists")
      require(!(m.colMap - oldName).valuesIterator.contains(newName),
        s"'$newName' is the physical name of another renamed column")
      m.kind match {
        case TableKind.TimeSeries(s) =>
          require(oldName != s.timestampColumn,
            s"cannot rename the time-index column '$oldName'")
          require(!s.entityColumns.contains(oldName),
            s"cannot rename entity column '$oldName'")
        case TableKind.Clustered(s) =>
          require(!s.columns.contains(m.physicalName(oldName)),
            s"cannot rename cluster column '$oldName'")
      }
      val word = java.util.regex.Pattern.compile(
        "\\b" + java.util.regex.Pattern.quote(oldName) + "\\b",
        java.util.regex.Pattern.CASE_INSENSITIVE)
      m.checks.find { case (_, sql) => word.matcher(sql).find() }.foreach { case (cn, sql) =>
        throw new IllegalStateException(
          s"cannot rename '$oldName': CHECK '$cn' ($sql) references it — drop the check first")
      }
      val evolved = StructType(sch.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
      val physical = m.physicalName(oldName) // frozen across chained renames
      val cmap = (m.colMap - oldName) ++
        (if (physical == newName) Map.empty[String, String] // renamed back
         else Map(newName -> physical))
      Some(m.copy(schemaJson = Some(evolved.json), colMap = cmap))
    }

  /** Schema evolution: DROP COLUMN as a metadata-only commit. Files keep
    * the column physically (no rewrite — dropping a column from a 100 TB
    * table costs one log write) but every scan and maintenance read pins
    * the MANIFEST schema, so the column vanishes everywhere at once;
    * a later compaction rewrites files without it as a side effect.
    * Appends after the commit must carry the narrowed schema. Refused
    * for columns the table's identity depends on (time index, entity,
    * cluster columns) and for columns a CHECK constraint still
    * references (drop the check first). */
  def dropColumn(name: String, maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      val sch = m.schema.getOrElse(throw new IllegalStateException(
        "no schema adopted yet — append once before evolving the schema"))
      require(sch.fieldNames.contains(name), s"no such column: '$name'")
      m.kind match {
        case TableKind.TimeSeries(s) =>
          require(name != s.timestampColumn, s"cannot drop the time-index column '$name'")
          require(!s.entityColumns.contains(name), s"cannot drop entity column '$name'")
        case TableKind.Clustered(s) =>
          // spec columns are stored under physical names (frozen); map the
          // logical drop target through the rename mapping before comparing
          require(!s.columns.contains(m.physicalName(name)),
            s"cannot drop cluster column '$name'")
      }
      // conservative word-boundary test: a check MIGHT reference the
      // column → refuse (false positives only cost an explicit drop-check)
      val word = java.util.regex.Pattern.compile(
        "\\b" + java.util.regex.Pattern.quote(name) + "\\b",
        java.util.regex.Pattern.CASE_INSENSITIVE)
      m.checks.find { case (_, sql) => word.matcher(sql).find() }.foreach { case (cn, sql) =>
        throw new IllegalStateException(
          s"cannot drop '$name': CHECK '$cn' ($sql) references it — drop the check first")
      }
      val evolved = StructType(sch.fields.filterNot(_.name == name))
      require(evolved.fields.nonEmpty, "cannot drop the last column")
      Some(m.copy(schemaJson = Some(evolved.json), colMap = m.colMap - name))
    }

  /** Schema evolution: ALTER COLUMN TYPE as a metadata-only commit —
    * WIDENING conversions only (the Delta type-widening / Iceberg
    * type-promotion matrix): int→long, int/float→double, int/long/decimal
    * →wider decimal. Existing files keep their narrow physical type and
    * no byte is rewritten at any table scale: Spark's vectorized parquet
    * reader natively up-converts when the manifest-pinned read schema is
    * wider than the footer type (probed on this Spark: INT32 reads as
    * LONG/DOUBLE/DECIMAL(20,0) with exact values), so every scan,
    * maintenance read, and the streaming source see the widened type
    * uniformly across file eras. Appends must arrive with the NEW type
    * (exact-match enforcement, same as any schema drift). Pruning: old
    * files' stats sidecars keep their narrow-typed min/max — predicates
    * that compile against the widened type simply stop pruning those
    * files (sound, never wrong) until the next compaction rewrites them
    * with widened stats. Lossy conversions (long→double, narrowing) are
    * refused. The time-index column is refused (layout identity); cluster
    * columns are fine — the curve key range-normalizes numerics in DOUBLE
    * space whatever the declared width. */
  def alterColumnType(name: String, newType: org.apache.spark.sql.types.DataType,
                      maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      import org.apache.spark.sql.types._
      val sch = m.schema.getOrElse(throw new IllegalStateException(
        "no schema adopted yet — append once before evolving the schema"))
      val field = sch.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no such column: '$name'"))
      def widens(from: DataType, to: DataType): Boolean = (from, to) match {
        case (ByteType, ShortType | IntegerType | LongType) => true
        case (ShortType, IntegerType | LongType)            => true
        case (IntegerType, LongType)                        => true
        case (ByteType | ShortType | IntegerType | FloatType, DoubleType) => true
        case (ByteType | ShortType | IntegerType, d: DecimalType) =>
          d.precision - d.scale >= 10
        case (LongType, d: DecimalType) => d.precision - d.scale >= 20
        case (f: DecimalType, t: DecimalType) =>
          t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
        // element widening inside arrays (token ids int→long is THE
        // training-data case); parquet's repeated pages up-convert the
        // same way scalar pages do (probed exact on this Spark)
        case (ArrayType(fe, fn), ArrayType(te, tn)) => tn == fn && widens(fe, te)
        case _ => false
      }
      require(widens(field.dataType, newType),
        s"cannot change '$name' from ${field.dataType.simpleString} to " +
          s"${newType.simpleString}: only widening conversions are metadata-safe " +
          "(int→long, int/float→double, →wider decimal)")
      m.kind match {
        case TableKind.TimeSeries(s) =>
          require(name != s.timestampColumn,
            s"cannot retype the time-index column '$name'")
        case _ => ()
      }
      val evolved = StructType(sch.fields.map(f =>
        if (f.name == name) f.copy(dataType = newType) else f))
      Some(m.copy(schemaJson = Some(evolved.json)))
    }

  /** Clustering evolution: ALTER CLUSTER BY as a metadata-only commit
    * (Iceberg sort-order-evolution analog). Existing files keep their old
    * layout and old-key footer blooms — scans stay correct because stats
    * pruning reads per-file min/max of whatever column is filtered and
    * MERGE bloom refinement answers "maybe" for files without a bloom on
    * the new key (KeyBloom missing-bloom ⇒ true, sound). The NEXT
    * compaction re-clusters under the new spec: curve fitting, salting,
    * and write-time blooms all read the live meta, so one log write
    * re-routes every future maintenance job — re-clustering a 100 TB
    * table is then incremental (predicate-scoped `compact --where` can
    * migrate hot slices first). Refused for time-series tables, whose
    * layout identity IS the time index. */
  def alterClusterBy(columns: Seq[String], curve: String, maxRetries: Int = 3): Long =
    commitMetaUpdate(maxRetries) { (_, m) =>
      m.kind match {
        case TableKind.TimeSeries(_) =>
          throw new IllegalStateException(
            "time-series tables cluster by their time index; ALTER CLUSTER BY applies to clustered tables")
        case TableKind.Clustered(old) =>
          require(columns.nonEmpty, "cluster spec needs at least one column")
          require(columns.distinct.size == columns.size,
            s"duplicate cluster columns: ${columns.mkString(",")}")
          val sch = m.schema.getOrElse(throw new IllegalStateException(
            "no schema adopted yet — append once before evolving the cluster spec"))
          columns.foreach(c => require(sch.fieldNames.contains(c),
            s"no such column: '$c'"))
          // spec columns are stored PHYSICAL (curve fitting and the write
          // path read stats/files, which are physical); callers pass
          // logical names — identical unless the column was renamed
          val next = ClusterSpec(columns.map(m.physicalName), curve) // validates the curve name
          if (next == old) None else Some(m.copy(kind = TableKind.Clustered(next)))
      }
    }

  /** Watermark-only commit for an empty streaming batch: the (app, batch)
    * txn advances with no segments, so a replay of the empty batch is
    * still recognized as already-applied. */
  private[graft] def commitTxnOnly(app: String, batch: Long, maxRetries: Int = 3): Long =
    occLoop(maxRetries) { st =>
      if (st.txns.get(app).exists(_ >= batch)) st.version
      else commitAndAdvance(st, Seq(LogAction.SetTxn(app, batch)))
    }

  /** Metadata-only removal commit (DELETE WHERE whose candidates all
    * matched): RemoveSegment actions (plus an atomic coverage recommit for
    * time-series tables), OCC with rebase-retry; aborts if a concurrent
    * job already rewrote one of the segments. */
  private[graft] def commitRemovals(removeIds: Seq[String], maxRetries: Int = 3,
                                    recomputeCoverage: Boolean = false,
                                    extraActions: Seq[LogAction] = Nil): Long =
    occLoop(maxRetries) { st =>
      val missing = removeIds.filterNot(st.segments.contains)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"remove aborted: segments already rewritten by a concurrent job: $missing")
      commitAndAdvance(st, removeIds.map(LogAction.RemoveSegment) ++
        (if (recomputeCoverage) coverageActionFor(st, removeIds, Nil).toSeq else Nil) ++
        extraActions)
    }

  /** Merge-on-read DELETE commit: upsert `upserts` (same segment ids, new
    * dvPath/dvCardinality/coveragePath) and drop `removeIds` (files whose
    * every live row matched), atomically. Each upsert is emitted as
    * RemoveSegment + AddSegment — state-wise a plain upsert, but the
    * Remove makes the commit a data-change commit, which the streaming
    * source already skips (TableStreamSource skipChangeCommits): a DV
    * attach must never re-emit rows a stream has delivered.
    *
    * OCC: rebase-retry on version conflicts, but ABORT if any affected
    * segment was concurrently rewritten or re-DV'd — the caller's bitmaps
    * were unioned against `expectedDv` and would silently drop that
    * writer's deletes if applied over a different base. */
  private[graft] def commitDvAttach(upserts: Seq[SegmentMeta], removeIds: Seq[String],
                                    expectedDv: Map[String, Option[String]],
                                    maxRetries: Int = 3,
                                    recomputeCoverage: Boolean = false,
                                    adds: Seq[SegmentMeta] = Nil,
                                    sparkForChecks: Option[SparkSession] = None,
                                    txn: Option[(String, Long)] = None,
                                    extraActions: Seq[LogAction] = Nil): Long = {
    val affected = upserts.map(_.segmentId) ++ removeIds
    val checksValidated = cachedState.tableMeta.map(_.checks).getOrElse(Nil)
    occLoop(maxRetries) { st =>
      // streaming-upsert idempotency (mirrors append): a replayed batch
      // unwinds to the CALLER's cleanup catch, outside the commit lock
      txn.foreach { case (app, batch) =>
        if (st.txns.get(app).exists(_ >= batch)) throw TsTable.TxnReplayed(st.version)
      }
      // re-gate appended segments if a CHECK landed since they were staged
      // (upserts/removes reference rows that were already committed-valid)
      if (adds.nonEmpty && sparkForChecks.isDefined &&
          st.tableMeta.map(_.checks).getOrElse(Nil) != checksValidated)
        enforceChecks(sparkForChecks.get,
          adds.map(a => (s"$root/${a.path}", a.stats, a.rowCount)))
      val missing = affected.filterNot(st.segments.contains)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"DV attach aborted: segments already rewritten by a concurrent job: $missing")
      val rebased = affected.filter(id => st.segments(id).dvPath != expectedDv(id))
      if (rebased.nonEmpty)
        throw new IllegalStateException(
          s"DV attach aborted: segments re-DV'd by a concurrent DELETE: $rebased")
      commitAndAdvance(st,
        (removeIds ++ upserts.map(_.segmentId)).map(LogAction.RemoveSegment) ++
          (upserts ++ adds).map(LogAction.AddSegment) ++
          (if (recomputeCoverage)
            coverageActionFor(st, affected, upserts ++ adds).toSeq else Nil) ++
          txn.map { case (app, batch) => LogAction.SetTxn(app, batch) }.toSeq ++
          extraActions)
    }
  }

  /** RESTORE commit: make the live set equal `targetSegs` (an earlier
    * version's snapshot) as a NEW data-change commit — history is never
    * rewritten, so concurrent readers keep snapshot isolation and the
    * restore itself is time-travelable / restorable-away. The diff against
    * the current state is recomputed INSIDE the OCC loop, so a rebase
    * retry reconciles against the state it actually commits over:
    *  - live id absent from target (or present with different meta, e.g. a
    *    deletion vector attached since) → RemoveSegment;
    *  - target segment absent from live (or differing) → AddSegment
    *    (re-add of the original SegmentMeta, sidecar pointers included);
    *  - identical id+meta → untouched.
    * Time-series tables get coverage recomputed in the same commit. */
  private[graft] def commitRestore(targetSegs: Seq[SegmentMeta], maxRetries: Int = 3,
                                   recomputeCoverage: Boolean = false): Long = {
    val targetById = targetSegs.map(s => s.segmentId -> s).toMap
    require(targetById.size == targetSegs.size,
      "target snapshot has duplicate segment ids — corrupt manifest?")
    occLoop(maxRetries) { st =>
      val live = st.liveSegments
      val liveById = live.map(s => s.segmentId -> s).toMap
      val removes = live.filterNot(s => targetById.get(s.segmentId).contains(s))
        .map(_.segmentId)
      val adds = targetSegs.filterNot(s => liveById.get(s.segmentId).contains(s))
      if (removes.isEmpty && adds.isEmpty) st.version // already there
      else commitAndAdvance(st,
        removes.map(LogAction.RemoveSegment) ++ adds.map(LogAction.AddSegment) ++
          (if (recomputeCoverage) coverageActionFor(st, removes, adds).toSeq else Nil))
    }
  }

  /** Coverage snapshot for the state AFTER removing `removeIds` and adding
    * `added`: union of the surviving + new segments' sidecars, written as
    * a fresh sidecar whose pointer action commits WITH the swap. None for
    * non-time-series tables. */
  private def coverageActionFor(st: TableState, removeIds: Seq[String],
                                added: Seq[SegmentMeta]): Option[LogAction] = {
    val spec = timeSpec.getOrElse(return None)
    val removed = removeIds.toSet
    val survivors = st.liveSegments.filterNot(s => removed(s.segmentId))
    val cov = (survivors ++ added).flatMap(_.coveragePath).foldLeft(Bitmap.empty) { (acc, rel) =>
      acc.union(Bitmap.deserialize(Files.readAllBytes(Paths.get(stripScheme(s"$root/$rel")))))
    }
    val covRel = s"_coverage/table/${st.version + 1}-tblcov-${UUID.randomUUID().toString.take(8)}.cov"
    writeBytes(s"$root/$covRel", cov.serialize())
    Some(LogAction.UpdateTableCoverage(spec.bucket.spec, covRel))
  }

  /** Per-file coverage bitmaps — ONE distributed job that never ships raw
    * (file, bucket) rows to the driver: each partition folds its rows into
    * per-file distinct-bucket sets and emits them as serialized partial
    * bitmaps; partials merge by file via union (the Spark form of the
    * reference's rayon partial-bitmap merge, coverage.rs:324-352), so the
    * driver receives exactly one run-length bitmap per staged file. The
    * old distinct+collect shipped every distinct (file, bucket) pair — at
    * 1 s buckets a year-spanning append is ~3×10^7 driver rows; now the
    * driver cost is O(files × runs), runs-compressed. Bucket id =
    * floorDiv(epochSeconds, len) with pre-epoch clamp to 0, matching
    * BucketMath / the reference's release-mode clamp (bucket.rs:66-75). */
  private def computeCoverage(spark: SparkSession, paths: Seq[String],
                              spec: TimeIndexSpec): Map[String, Bitmap] = {
    import spark.implicits._
    val lenSec = spec.bucket.lengthSeconds
    val job = spark.read.parquet(paths: _*)
      // null timestamps carry NO coverage (reference flatten,
      // coverage.rs:179-246). The filter must run on the COLUMN: inside
      // the bucket expression greatest() SKIPS nulls, so a null ts would
      // otherwise clamp to bucket 0 and falsely claim epoch coverage
      // (and collide two unrelated appends that both hold a null row)
      .where(col(spec.timestampColumn).isNotNull)
      .select(
        input_file_name().as("f"),
        // greatest(...,0) clamps pre-epoch (reference bucket.rs:66-75);
        // integer `div` truncation == floor on the clamped non-negative domain
        // CAST handles TIMESTAMP_NTZ columns; session tz is UTC so the
        // cast is value-preserving
        expr(s"greatest(unix_micros(CAST(`${spec.timestampColumn}` AS TIMESTAMP)), 0L) div ${1000000L * lenSec}L")
          .as("b"))
      // dedup FIRST through Spark's hash aggregate — map-side partial,
      // Tungsten-managed, spillable. Folding raw rows straight into
      // per-task sets would pin unbounded unspillable heap on exactly the
      // fine-bucket wide-range shape this path exists for; after distinct
      // each partition holds only unique (file, bucket) pairs, so a plain
      // buffer per file suffices (no per-row set membership checks).
      .distinct()
      .as[(String, Long)]
      .mapPartitions { it =>
        val perFile = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
        it.foreach { case (f, b) =>
          if (b > Int.MaxValue) throw BucketDomainOverflowException(b)
          perFile.getOrElseUpdate(f, scala.collection.mutable.ArrayBuffer.empty) += b.toInt
        }
        perFile.iterator.map { case (f, s) => (f, Bitmap(s).serialize()) }
      }
      .groupByKey(_._1)
      .mapGroups { (f, it) =>
        (f, it.foldLeft(Bitmap.empty)((acc, p) => acc.union(Bitmap.deserialize(p._2))).serialize())
      }
    // surface the typed overflow error the way the driver-side build did,
    // not buried as the cause of a generic SparkException
    val partials =
      try job.collect()
      catch {
        case e: Exception =>
          var c: Throwable = e
          while (c != null && !c.isInstanceOf[BucketDomainOverflowException]) c = c.getCause
          if (c != null) throw c else throw e
      }
    partials.map { case (f, bytes) => normalizeFileUri(f) -> Bitmap.deserialize(bytes) }.toMap
  }

  /** Entity identity via footer-stats fast path (min==max per column ⇒
    * constant), falling back to a distinct().limit(2) scan — the same
    * two-tier scheme as the reference (formats/parquet/entity_identity.rs). */
  private def extractEntityIdentity(
      spark: SparkSession, stagingAbs: String, spec: TimeIndexSpec,
      fileStats: Seq[(String, FooterStats.FileStats)]): Option[Map[String, String]] = {
    if (spec.entityColumns.isEmpty) return None
    val identity = spec.entityColumns.map { c =>
      val perFile = fileStats.map(_._2.stats.get(c))
      val fast = perFile.forall {
        case Some(ColStats(Some(StatVal.S(mn)), Some(StatVal.S(mx)), nulls)) => mn == mx && nulls == 0
        case _ => false
      }
      val headVal = perFile.headOption.flatten.flatMap(_.min)
      if (fast && perFile.flatMap(_.flatMap(_.min)).distinct.size == 1) {
        c -> headVal.get.asInstanceOf[StatVal.S].v
      } else {
        val d = spark.read.parquet(stagingAbs).select(col(c)).distinct().limit(2).collect()
        if (d.length != 1) throw EntityIdentityException(
          s"entity column '$c' must have exactly one value across the appended segment, found ${d.length}")
        if (d(0).isNullAt(0)) throw EntityIdentityException(s"entity column '$c' is null")
        c -> d(0).get(0).toString
      }
    }.toMap
    Some(identity)
  }

  // ------------------------------------------------------------ coverage

  /** Load the table coverage snapshot with the reference's three-tier
    * scheme (table/coverage.rs:29-180): snapshot pointer → recover by
    * unioning per-segment sidecars → optional heal rewrite. */
  def loadTableCoverage(st: TableState = cachedState, heal: Boolean = false): Bitmap = {
    val spec = timeSpec.getOrElse(return Bitmap.empty)
    st.tableCoverage match {
      case Some(ptr) =>
        if (ptr.bucketSpec != spec.bucket.spec)
          throw CorruptLogException(
            s"coverage pointer bucket '${ptr.bucketSpec}' != table bucket '${spec.bucket.spec}'")
        val p = Paths.get(stripScheme(s"$root/${ptr.coveragePath}"))
        if (Files.exists(p)) Bitmap.deserialize(Files.readAllBytes(p))
        else recoverCoverage(st, heal)
      case None =>
        if (st.liveSegments.isEmpty) Bitmap.empty else recoverCoverage(st, heal)
    }
  }

  private def recoverCoverage(st: TableState, heal: Boolean): Bitmap = {
    val cov = st.liveSegments.flatMap(_.coveragePath).foldLeft(Bitmap.empty) { (acc, rel) =>
      acc.union(Bitmap.deserialize(Files.readAllBytes(Paths.get(stripScheme(s"$root/$rel")))))
    }
    if (heal) {
      val covRel = s"_coverage/table/${st.version}-tblcov-healed.cov"
      writeBytes(s"$root/$covRel", cov.serialize()) // best-effort, no commit
    }
    cov
  }

  /** Metadata-only coverage analytics (reference table/coverage.rs:279-360):
    * half-open [startMicros, endMicros), answered from bitmaps without
    * touching data files. */
  def coverageRatioForRange(startMicros: Long, endMicros: Long): Double = {
    if (startMicros >= endMicros) throw InvalidRangeException(startMicros, endMicros)
    val spec = timeSpec.getOrElse(throw new IllegalStateException("not a time-series table"))
    loadTableCoverage().coverageRatio(
      BucketMath.expectedBucketsMicros(startMicros, endMicros, spec.bucket))
  }

  def maxGapLenForRange(startMicros: Long, endMicros: Long): Long = {
    if (startMicros >= endMicros) throw InvalidRangeException(startMicros, endMicros)
    val spec = timeSpec.getOrElse(throw new IllegalStateException("not a time-series table"))
    loadTableCoverage().maxGapLen(
      BucketMath.expectedBucketsMicros(startMicros, endMicros, spec.bucket))
  }

  def lastFullyCoveredWindow(endMicros: Long, lenBuckets: Long): Option[(Int, Int)] = {
    val spec = timeSpec.getOrElse(throw new IllegalStateException("not a time-series table"))
    val endBucket = BucketMath.bucketIdFromMicros(endMicros, spec.bucket)
    loadTableCoverage().lastWindowAtOrBefore(endBucket, lenBuckets)
  }

  // --------------------------------------------------------------- utils

  private def listParquet(dir: String): Seq[String] = {
    val d = Paths.get(stripScheme(dir))
    import scala.jdk.CollectionConverters._
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
    finally s.close()
  }

  private[graft] def writeBytes(path: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(stripScheme(path))
    Files.createDirectories(p.getParent)
    Files.write(p, bytes)
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** Canonical local path for matching input_file_name() URIs against
    * staging paths: input_file_name yields "file:///abs/x" while staging
    * paths can be RELATIVE (a CLI `--table ./events` root) — bare scheme
    * stripping would never match those, committing time-series segments
    * without coverage sidecars and wedging later appends. PathNorm
    * absolutizes + normalizes both producers. */
  private def normalizeFileUri(p: String): String = graft.meta.PathNorm.canonical(p)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try { import scala.jdk.CollectionConverters._; s.iterator().asScala.foreach(deleteRecursively) }
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}

object TsTable {
  /** Unwinds a writer verb's txn-idempotency early exit out of
    * [[TsTable.occLoop]] so staged-file cleanup runs outside the commit
    * lock. Carries the version the watermark was already at — the verb
    * (append, MERGE) catches this, deletes its unreferenced files, and
    * reports the batch as already-applied. */
  private[graft] final case class TxnReplayed(version: Long) extends RuntimeException

  /** Bootstrap: verify version==0, commit v1 = UpdateTableMeta
    * (reference table.rs:156-202). */
  def create(root: String, meta: TableMeta): TsTable = {
    val store = LogStore(root)
    if (store.currentVersion() != 0L)
      throw ConflictException(0L, store.currentVersion())
    store.initDirs()
    store.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta)))
    new TsTable(root, store)
  }

  /** Open an existing table (reference table.rs:115-147). */
  def open(root: String): TsTable = {
    val store = LogStore(root)
    if (store.currentVersion() == 0L)
      throw CorruptLogException(s"no table at $root")
    val t = new TsTable(root, store)
    t.meta // force: reject tables without metadata
    t
  }
}
