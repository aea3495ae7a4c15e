package graft.meta

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types.{DataType, StructType}

/** Bucket granularity for coverage bucketing.
  *
  * Mirrors the reference's `TimeBucket::{Seconds,Minutes,Hours,Days}(u32)`
  * with the same parser surface: `"1h"`, `"15m"`, unit aliases
  * (s/sec/secs/second/seconds, m/min/..., h/hr/..., d/day/days),
  * case-insensitive, rejecting 0, overflow, and unknown units like `1w`
  * (reference: crates/timeseries-table-core/src/metadata/table_metadata.rs:217-300).
  */
final case class TimeBucket(count: Long, unit: TimeBucket.Unit) {
  require(count > 0, "bucket count must be > 0")
  require(count <= 0xffffffffL, "bucket count exceeds u32 domain")
  def lengthSeconds: Long = count * unit.seconds
  def spec: String = s"$count${unit.suffix}"
}

object TimeBucket {
  sealed abstract class Unit(val suffix: String, val seconds: Long)
  case object Seconds extends Unit("s", 1L)
  case object Minutes extends Unit("m", 60L)
  case object Hours   extends Unit("h", 3600L)
  case object Days    extends Unit("d", 86400L)

  private val aliases: Map[String, Unit] = Map(
    "s" -> Seconds, "sec" -> Seconds, "secs" -> Seconds,
    "second" -> Seconds, "seconds" -> Seconds,
    "m" -> Minutes, "min" -> Minutes, "mins" -> Minutes,
    "minute" -> Minutes, "minutes" -> Minutes,
    "h" -> Hours, "hr" -> Hours, "hrs" -> Hours,
    "hour" -> Hours, "hours" -> Hours,
    "d" -> Days, "day" -> Days, "days" -> Days,
  )

  /** Parse `"15m"` etc.; throws IllegalArgumentException on bad input. */
  def parse(s: String): TimeBucket = {
    val t = s.trim.toLowerCase
    val (digits, unit) = t.span(_.isDigit)
    require(digits.nonEmpty, s"bucket spec '$s' has no count")
    val count =
      try java.lang.Long.parseLong(digits)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"bucket count overflow in '$s'") }
    require(count > 0, s"bucket count must be positive in '$s'")
    require(count <= 0xffffffffL, s"bucket count overflow in '$s'")
    val u = aliases.getOrElse(unit.trim,
      throw new IllegalArgumentException(s"unknown bucket unit '$unit' in '$s'"))
    TimeBucket(count, u)
  }
}

/** Time-index spec pinned at table creation.
  * Reference: metadata/table_metadata.rs:323-344. */
final case class TimeIndexSpec(
    timestampColumn: String,
    entityColumns: Seq[String],
    bucket: TimeBucket,
    timezone: Option[String])

/** Clustering spec for the token table: Z-order / Hilbert columns.
  * New (north rule); not in the reference. */
final case class ClusterSpec(columns: Seq[String], curve: String) {
  require(Set("zorder", "hilbert", "lexico", "none").contains(curve),
    s"unknown curve '$curve'")
}

/** Table kind: the reference pins v0.1 to TimeSeries; we add Clustered for
  * the token table (reference: metadata/table_metadata.rs:27-34). */
sealed trait TableKind
object TableKind {
  final case class TimeSeries(spec: TimeIndexSpec) extends TableKind
  final case class Clustered(spec: ClusterSpec)    extends TableKind
}

/** Table metadata — the payload of an UpdateTableMeta action (full
  * replacement, last-writer-wins on replay).
  * Reference: metadata/table_metadata.rs:59-63 (entity identity pinning),
  * transaction_log/table_state.rs:95-105 (last-meta-wins). */
final case class TableMeta(
    name: String,
    kind: TableKind,
    schemaJson: Option[String],                    // Spark StructType JSON once adopted
    entityIdentity: Option[Map[String, String]],   // pinned from first entity append
    // CHECK constraints (name → SQL predicate), enforced on every write
    // that stages new segments. SQL semantics: a row passes when the
    // predicate is TRUE or NULL; only provably-FALSE rows violate.
    checks: Seq[(String, String)] = Nil,
    // named snapshots (tag → log version): human-stable time-travel
    // handles; snapshot expiration refuses to reclaim a tagged version
    tags: Map[String, Long] = Map.empty,
    // column mapping (RENAME COLUMN): logical name → physical name as
    // written in the parquet files. Physical names are FROZEN at column
    // creation (Delta columnMapping discipline), so a rename is one
    // metadata commit and no file is ever rewritten for it. Empty for
    // never-renamed tables — every code path treats that as identity.
    colMap: Map[String, String] = Map.empty,
    // change data feed (Delta delta.enableChangeDataFeed analog): when
    // true, every row-changing writer records its row-level changes as
    // `_cdc/` sidecars in the SAME commit; the feed is readable from the
    // first commit AFTER the flag lands (earlier mutations have no record)
    cdfEnabled: Boolean = false,
    // row tracking (Delta delta.enableRowTracking analog): when true,
    // every committed segment gets a baseRowId range from rowIdHighWater
    // (bumped atomically in the same commit) and row-preserving rewrites
    // materialize `_row_id`/`_row_commit`, so every row carries a stable
    // id and a last-modified version across compaction/clustering/CoW
    rowTracking: Boolean = false,
    rowIdHighWater: Long = 0L) {

  def schema: Option[StructType] =
    schemaJson.map(j => DataType.fromJson(j).asInstanceOf[StructType])

  /** The on-disk (parquet) schema: the logical schema with renamed
    * columns swapped to their frozen physical names. */
  def physicalSchema: Option[StructType] = schema.map(physicalize)
  def physicalize(s: StructType): StructType =
    if (colMap.isEmpty) s
    else StructType(s.fields.map(f => f.copy(name = colMap.getOrElse(f.name, f.name))))
  def physicalName(logical: String): String = colMap.getOrElse(logical, logical)

  def toJson: JsonNode = {
    val n = Json.obj()
    n.put("name", name)
    kind match {
      case TableKind.TimeSeries(s) =>
        val k = n.putObject("time_series")
        k.put("timestamp_column", s.timestampColumn)
        val ec = k.putArray("entity_columns"); s.entityColumns.foreach(ec.add)
        k.put("bucket", s.bucket.spec)
        s.timezone.foreach(k.put("timezone", _))
      case TableKind.Clustered(s) =>
        val k = n.putObject("clustered")
        val cc = k.putArray("columns"); s.columns.foreach(cc.add)
        k.put("curve", s.curve)
    }
    schemaJson.foreach(n.put("schema", _))
    entityIdentity.foreach { m =>
      val e = n.putObject("entity_identity")
      m.toSeq.sortBy(_._1).foreach { case (k, v) => e.put(k, v) }
    }
    if (checks.nonEmpty) {
      val c = n.putObject("checks")
      checks.sortBy(_._1).foreach { case (k, v) => c.put(k, v) }
    }
    if (tags.nonEmpty) {
      val tg = n.putObject("tags")
      tags.toSeq.sortBy(_._1).foreach { case (k, v) => tg.put(k, v) }
    }
    if (colMap.nonEmpty) {
      val cm = n.putObject("column_mapping")
      colMap.toSeq.sortBy(_._1).foreach { case (k, v) => cm.put(k, v) }
    }
    if (cdfEnabled) n.put("cdf_enabled", true)
    if (rowTracking || rowIdHighWater != 0L) {
      n.put("row_tracking", rowTracking)
      n.put("row_id_high_water", rowIdHighWater)
    }
    n
  }
}

object TableMeta {
  def fromJson(n: JsonNode): TableMeta = {
    val kind =
      if (n.has("time_series")) {
        val k = n.get("time_series")
        TableKind.TimeSeries(TimeIndexSpec(
          Json.getStr(k, "timestamp_column"),
          Json.elems(k.get("entity_columns")).map(_.asText()),
          TimeBucket.parse(Json.getStr(k, "bucket")),
          Json.optStr(k, "timezone")))
      } else if (n.has("clustered")) {
        val k = n.get("clustered")
        TableKind.Clustered(ClusterSpec(
          Json.elems(k.get("columns")).map(_.asText()),
          Json.getStr(k, "curve")))
      } else throw new IllegalArgumentException(s"commit meta missing table kind: $n")
    val identity = Option(n.get("entity_identity")).map { e =>
      Json.fields(e).map { case (k, v) => k -> v.asText() }
    }
    val checks = Option(n.get("checks"))
      .map(c => Json.fields(c).map { case (k, v) => k -> v.asText() }.toSeq.sortBy(_._1))
      .getOrElse(Nil)
    val tags = Option(n.get("tags"))
      .map(tg => Json.fields(tg).map { case (k, v) => k -> v.asLong() })
      .getOrElse(Map.empty[String, Long])
    val colMap = Option(n.get("column_mapping"))
      .map(cm => Json.fields(cm).map { case (k, v) => k -> v.asText() })
      .getOrElse(Map.empty[String, String])
    val cdf = Option(n.get("cdf_enabled")).exists(_.asBoolean())
    val rowTracking = Option(n.get("row_tracking")).exists(_.asBoolean())
    val rowIdHw = Json.optLong(n, "row_id_high_water").getOrElse(0L)
    TableMeta(Json.getStr(n, "name"), kind, Json.optStr(n, "schema"), identity, checks,
      tags, colMap, cdf, rowTracking, rowIdHw)
  }
}
