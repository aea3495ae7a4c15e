package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.log._
import graft.meta._

/** Ports of the reference's log-store / state-replay test matrix
  * (transaction_log/log_store.rs:210-436, table_state.rs:156-373,
  * tests/log_integration_tests.rs). */
class CoreLogSpec extends AnyFunSuite {

  private def tmpStore(): LogStore =
    new LogStore(Files.createTempDirectory("graft-log"))

  private def meta(name: String = "t"): TableMeta =
    TableMeta(name, TableKind.TimeSeries(
      TimeIndexSpec("ts", Seq("symbol"), TimeBucket.parse("1m"), None)), None, None)

  private def seg(id: String, path: String, rows: Long = 10,
                  tsMin: Long = 0, tsMax: Long = 100): SegmentMeta =
    SegmentMeta(id, path, "parquet", rows, Some(1234L),
      Map("ts" -> ColStats(Some(StatVal.L(tsMin)), Some(StatVal.L(tsMax)), 0L)), None)

  test("commit increments version and CURRENT") {
    val s = tmpStore()
    assert(s.currentVersion() == 0L)
    val v1 = s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    assert(v1 == 1L)
    assert(s.currentVersion() == 1L)
    val v2 = s.commitWithExpectedVersion(1L, Seq(LogAction.AddSegment(seg("a", "data/a.parquet"))))
    assert(v2 == 2L)
  }

  test("stale expected version raises Conflict with expected and found") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    val e = intercept[ConflictException] {
      s.commitWithExpectedVersion(0L, Seq(LogAction.AddSegment(seg("a", "p"))))
    }
    assert(e.expected == 0L && e.found == 1L)
  }

  test("commit-file race raises CommitFileExists, distinct from Conflict") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    // simulate a racer that already created commit 2 but CURRENT not yet advanced
    Files.writeString(s.commitPath(2L), "{}")
    intercept[CommitFileExistsException] {
      s.commitWithExpectedVersion(1L, Seq(LogAction.AddSegment(seg("a", "p"))))
    }
  }

  test("orphan commit beyond CURRENT is ignored by readers (crash-window recovery)") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    val orphan = Commit(2L, 1L, 0L, Seq(LogAction.AddSegment(seg("x", "p"))))
    Files.writeString(s.commitPath(2L), Json.write(orphan.toJson))
    val st = TableState.rebuild(s)
    assert(st.version == 1L && st.segments.isEmpty)
  }

  test("corrupt CURRENT raises typed errors") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    Files.writeString(s.logDir.resolve("CURRENT"), "")
    intercept[CorruptLogException](s.currentVersion())
    Files.writeString(s.logDir.resolve("CURRENT"), "not-a-number\n")
    intercept[CorruptLogException](s.currentVersion())
  }

  test("missing intermediate commit raises CorruptLog") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    s.commitWithExpectedVersion(1L, Seq(LogAction.AddSegment(seg("a", "p"))))
    Files.delete(s.commitPath(1L))
    intercept[CorruptLogException](TableState.rebuild(s))
  }

  test("replay: add upserts by id, remove deletes, last meta wins, coverage last-one-wins") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta("first"))))
    s.commitWithExpectedVersion(1L, Seq(
      LogAction.AddSegment(seg("a", "data/a.parquet", rows = 10)),
      LogAction.UpdateTableCoverage("1m", "_coverage/table/2-x.cov")))
    s.commitWithExpectedVersion(2L, Seq(
      LogAction.AddSegment(seg("a", "data/a.parquet", rows = 99)), // same id replaces
      LogAction.AddSegment(seg("b", "data/b.parquet")),
      LogAction.UpdateTableMeta(meta("second")),
      LogAction.UpdateTableCoverage("1m", "_coverage/table/3-y.cov")))
    s.commitWithExpectedVersion(3L, Seq(LogAction.RemoveSegment("b")))
    val st = TableState.rebuild(s)
    assert(st.version == 4L)
    assert(st.tableMeta.get.name == "second")
    assert(st.segments.keySet == Set("a"))
    assert(st.segments("a").rowCount == 99L)
    assert(st.tableCoverage.get.coveragePath == "_coverage/table/3-y.cov")
  }

  test("pinned-version replay gives snapshot isolation under concurrent commits") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    s.commitWithExpectedVersion(1L, Seq(LogAction.AddSegment(seg("a", "data/a.parquet"))))
    val pinned = TableState.rebuildAt(s, 2L)
    // concurrent "compaction" rewrites segment a -> c at version 3
    s.commitWithExpectedVersion(2L, Seq(
      LogAction.RemoveSegment("a"), LogAction.AddSegment(seg("c", "data/c.parquet"))))
    val again = TableState.rebuildAt(s, 2L)
    assert(again == pinned)
    assert(pinned.segments.keySet == Set("a"))
    assert(TableState.rebuild(s).segments.keySet == Set("c"))
  }

  test("checkpoint bounds replay: commits before the checkpoint are not needed") {
    val s = tmpStore()
    s.commitWithExpectedVersion(0L, Seq(LogAction.UpdateTableMeta(meta())))
    s.commitWithExpectedVersion(1L, Seq(LogAction.AddSegment(seg("a", "p1"))))
    s.commitWithExpectedVersion(2L, Seq(LogAction.AddSegment(seg("b", "p2"))))
    val st3 = TableState.rebuildAt(s, 3L)
    Files.writeString(s.checkpointPath(3L), Json.write(st3.toJson))
    Files.delete(s.commitPath(1L)) // ancient history gone
    Files.delete(s.commitPath(2L))
    s.commitWithExpectedVersion(3L, Seq(LogAction.AddSegment(seg("c", "p3"))))
    val st = TableState.rebuild(s)
    assert(st.version == 4L && st.segments.keySet == Set("a", "b", "c"))
  }

  test("JSON round-trip for every log type") {
    val m = meta().copy(schemaJson = Some("""{"type":"struct","fields":[]}"""),
      entityIdentity = Some(Map("symbol" -> "NVDA")))
    val actions: Seq[LogAction] = Seq(
      LogAction.UpdateTableMeta(m),
      LogAction.AddSegment(seg("a", "data/a.parquet").copy(
        stats = Map(
          "ts" -> ColStats(Some(StatVal.L(5)), Some(StatVal.L(9)), 1L),
          "source" -> ColStats(Some(StatVal.S("cc")), Some(StatVal.S("web")), 0L),
          "price" -> ColStats(Some(StatVal.D(1.5)), Some(StatVal.D(2.5)), 0L)),
        coveragePath = Some("_coverage/segments/x.cov"))),
      LogAction.RemoveSegment("zzz"),
      LogAction.UpdateTableCoverage("15m", "_coverage/table/1-a.cov"))
    val c = Commit(7L, 6L, 123456789L, actions)
    val back = Commit.fromJson(Json.parse(Json.write(c.toJson)))
    assert(back == c)
  }

  test("TimeBucket parser matrix (table_metadata.rs:446-570 analog)") {
    assert(TimeBucket.parse("1h") == TimeBucket(1, TimeBucket.Hours))
    assert(TimeBucket.parse("15m").lengthSeconds == 900L)
    assert(TimeBucket.parse("2DAYS") == TimeBucket(2, TimeBucket.Days))
    assert(TimeBucket.parse("30 sec") == TimeBucket(30, TimeBucket.Seconds))
    assert(TimeBucket.parse("90s").spec == "90s")
    intercept[IllegalArgumentException](TimeBucket.parse("0m"))
    intercept[IllegalArgumentException](TimeBucket.parse("1w"))
    intercept[IllegalArgumentException](TimeBucket.parse("1ms"))
    intercept[IllegalArgumentException](TimeBucket.parse("h"))
    intercept[IllegalArgumentException](TimeBucket.parse("99999999999999999999s"))
    intercept[IllegalArgumentException](TimeBucket.parse("4294967296s")) // > u32
  }
}
