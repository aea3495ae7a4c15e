package graft.maintain

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.JsonNode
import graft.meta.Json

/** Per-task metrics for one unit (bin) of a maintenance job. */
final case class BinMetrics(rowsIn: Long, bytesIn: Long, filesIn: Int,
                            rowsOut: Long, bytesOut: Long, filesOut: Int,
                            millis: Long)

/** One journal entry: a bin either committed (with the version it landed
  * at) or is still pending. */
final case class BinRecord(binId: String, inputSegments: Seq[String],
                           committedVersion: Option[Long], metrics: Option[BinMetrics])

/** Checkpoint-resumable per-partition(bin) lineage journal (north rule):
  * `_maintenance/<job-id>/bin-<id>.json`, written atomically AFTER the
  * bin's commit succeeds. A re-run of the same job id skips bins whose
  * journal entry exists — combined with per-bin atomic Remove+Add commits
  * this makes maintenance idempotent under crash/restart: a bin is either
  * fully swapped (journal present or commit replayable) or untouched.
  * Journal IO is O(bins) driver-side metadata, never data-plane.
  */
final class LineageJournal(tableRoot: String, jobId: String) {
  private val dir = Paths.get(tableRoot, "_maintenance", jobId)

  def completedBins(): Set[String] = {
    if (!Files.isDirectory(dir)) return Set.empty
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case n if n.startsWith("bin-") && n.endsWith(".json") =>
        n.stripPrefix("bin-").stripSuffix(".json") }
      .toSet
    finally s.close()
  }

  def record(r: BinRecord): Unit = {
    Files.createDirectories(dir)
    val n = Json.obj()
    n.put("bin_id", r.binId)
    val in = n.putArray("input_segments"); r.inputSegments.foreach(in.add)
    r.committedVersion.foreach(n.put("committed_version", _))
    r.metrics.foreach { m =>
      val mm = n.putObject("metrics")
      mm.put("rows_in", m.rowsIn);   mm.put("bytes_in", m.bytesIn);   mm.put("files_in", m.filesIn)
      mm.put("rows_out", m.rowsOut); mm.put("bytes_out", m.bytesOut); mm.put("files_out", m.filesOut)
      mm.put("millis", m.millis)
    }
    val tmp = Files.createTempFile(dir, ".bin", ".tmp")
    Files.writeString(tmp, Json.write(n))
    Files.move(tmp, dir.resolve(s"bin-${r.binId}.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def readAll(): Seq[BinRecord] = {
    if (!Files.isDirectory(dir)) return Nil
    import scala.jdk.CollectionConverters._
    val s = Files.list(dir)
    try s.iterator().asScala.filter(_.getFileName.toString.startsWith("bin-")).map { p =>
      val n: JsonNode = Json.parse(Files.readString(p))
      BinRecord(
        Json.getStr(n, "bin_id"),
        Json.elems(n.get("input_segments")).map(_.asText()),
        Json.optLong(n, "committed_version"),
        Option(n.get("metrics")).map(m => BinMetrics(
          Json.getLong(m, "rows_in"), Json.getLong(m, "bytes_in"), Json.getLong(m, "files_in").toInt,
          Json.getLong(m, "rows_out"), Json.getLong(m, "bytes_out"), Json.getLong(m, "files_out").toInt,
          Json.getLong(m, "millis"))))
    }.toSeq
    finally s.close()
  }
}
