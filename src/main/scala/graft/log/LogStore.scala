package graft.log

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import graft.meta.Json

/** Typed errors mirroring the reference's taxonomy
  * (python/src/timeseries_table_format/_native.pyi:7-20). */
final case class ConflictException(expected: Long, found: Long)
  extends RuntimeException(s"commit conflict: expected version $expected, found $found")
final case class CommitFileExistsException(version: Long)
  extends RuntimeException(s"commit file for version $version already exists (lost race)")
final case class CorruptLogException(msg: String) extends RuntimeException(msg)

/** Append-only transaction log with optimistic concurrency.
  *
  * Layout mirrors the reference (storage/layout.rs:39-62):
  *   `_timeseries_log/CURRENT`              — "N\n"
  *   `_timeseries_log/0000000001.json`      — Commit v1… (10-digit pad)
  *   `_timeseries_log/0000000010.ckpt.json` — state checkpoint (ours; the
  *     reference lists checkpoints as roadmap, docs/blog/how-i-built-this.md:38-39)
  *
  * Commit protocol (reference log_store.rs:116-207 semantics, reproduced):
  *   1. advisory guard: read CURRENT; mismatch → Conflict{expected,found}
  *      (lets callers rebase/retry without touching the FS further);
  *   2. REAL guard: atomic create-new (`O_CREAT|O_EXCL`) of the commit file —
  *      a lost race surfaces as CommitFileExists, deliberately distinct from
  *      Conflict so a Delta-style rebase-retry loop can tell them apart;
  *   3. CURRENT updated via temp-file + atomic rename. Crash between 2 and 3
  *      leaves an orphan commit > CURRENT which readers ignore (same
  *      documented recovery gap as log_store.rs:130-146).
  *
  * All of this is DRIVER-side metadata IO — tiny JSON files. Data-plane work
  * is Spark jobs; at 1000 executors the log is never a shuffle participant.
  */
class LogStore(val tableRoot: Path) {
  val logDir: Path = tableRoot.resolve("_timeseries_log")
  /** Where this log's head pointer lives — a branch overlay ([[BranchLog]])
    * redirects it into the branch directory while sharing the main log's
    * committed prefix. */
  protected def currentFile: Path = logDir.resolve("CURRENT")

  def commitPath(version: Long): Path = logDir.resolve(f"$version%010d.json")
  def checkpointPath(version: Long): Path = logDir.resolve(f"$version%010d.ckpt.json")

  def initDirs(): Unit = {
    Files.createDirectories(logDir)
    Files.createDirectories(tableRoot.resolve("data"))
    Files.createDirectories(tableRoot.resolve("_coverage").resolve("segments"))
    Files.createDirectories(tableRoot.resolve("_coverage").resolve("table"))
  }

  /** 0 when the table has no commits yet. */
  def currentVersion(): Long = {
    if (!Files.exists(currentFile)) return 0L
    val s = Files.readString(currentFile).trim
    if (s.isEmpty) throw CorruptLogException("CURRENT is empty")
    try java.lang.Long.parseLong(s)
    catch { case _: NumberFormatException =>
      throw CorruptLogException(s"CURRENT is not a number: '$s'") }
  }

  def readCommit(version: Long): Commit = {
    val p = commitPath(version)
    if (!Files.exists(p))
      throw CorruptLogException(s"missing commit file for version $version")
    val c = try Commit.fromJson(Json.parse(Files.readString(p)))
    catch { case e: Exception if !e.isInstanceOf[CorruptLogException] =>
      throw CorruptLogException(s"unreadable commit $version: ${e.getMessage}") }
    if (c.version != version)
      throw CorruptLogException(s"commit file $version declares version ${c.version}")
    c
  }

  /** OCC commit; returns the new version. */
  def commitWithExpectedVersion(expected: Long, actions: Seq[LogAction]): Long = {
    val found = currentVersion()
    if (found != expected) throw ConflictException(expected, found)
    val newVersion = expected + 1
    val commit = Commit(newVersion, expected, System.currentTimeMillis(), actions)
    initDirs()
    val target = commitPath(newVersion)
    try {
      Files.write(target, (Json.write(commit.toJson) + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw CommitFileExistsException(newVersion)
    }
    try writeCurrentAtomic(newVersion)
    catch { case e: Throwable =>
      // abort must be CLEAN: the commit file was durably created above, so
      // a failure here (disk full, interrupt) would otherwise strand an
      // orphan commit for newVersion while CURRENT still names `expected` —
      // every later commit then passes the version check but hits
      // CREATE_NEW on the orphan (CommitFileExists) forever, and the
      // caller's cleanup paths may already have deleted the data files the
      // orphan references, so adopting it by hand would be wrong too.
      // Deleting the just-created commit file makes the failed commit
      // invisible and the table retryable.
      try Files.deleteIfExists(target) catch { case _: Exception => () }
      throw e
    }
    newVersion
  }

  /** temp + fsync + atomic rename (reference storage/io.rs:81-131). The
    * force() before the move is what makes the claim true: rename alone
    * can become durable before the temp file's DATA does, leaving an
    * empty CURRENT after power loss — an unopenable table. */
  private def writeCurrentAtomic(version: Long): Unit = {
    val tmp = Files.createTempFile(currentFile.getParent, ".CURRENT", ".tmp")
    val ch = java.nio.channels.FileChannel.open(tmp, StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(s"$version\n".getBytes("UTF-8")))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Latest checkpoint at version ≤ maxVersion, if any. */
  def latestCheckpointVersion(maxVersion: Long): Option[Long] = {
    if (!Files.exists(logDir)) return None
    val it = Files.list(logDir)
    try {
      import scala.jdk.CollectionConverters._
      it.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.endsWith(".ckpt.json") => n.stripSuffix(".ckpt.json").toLong }
        .filter(_ <= maxVersion)
        .maxOption
    } finally it.close()
  }
}

object LogStore {
  def apply(root: String): LogStore = new LogStore(Paths.get(root))
}
