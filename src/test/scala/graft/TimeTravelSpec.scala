package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import graft.data.TokenGen
import graft.maintain.{Compaction, Expire}
import graft.meta._
import graft.table.TsTable

/** AS OF TIMESTAMP time travel: versionAsOf / scanAsOf resolve a wall
  * clock instant to the last commit at or before it. */
class TimeTravelSpec extends SparkFunSuite {

  private def tokenMeta = TableMeta("tokens",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None)

  private def commitTs(t: TsTable, v: Long): Long =
    t.store.readCommit(v).timestampMillis

  /** Next append lands on a strictly later millisecond than `ts`. */
  private def tickPast(ts: Long): Unit =
    while (System.currentTimeMillis() <= ts) Thread.sleep(1)

  test("versionAsOf: boundary semantics across three appends") {
    val t = TsTable.create(tmpDir("asof"), tokenMeta)
    t.append(TokenGen.generate(spark, 100, numFiles = 1))
    val v1 = t.version; val ts1 = commitTs(t, v1)
    tickPast(ts1)
    t.append(TokenGen.generate(spark, 50, idStart = 1000L, numFiles = 1))
    val v2 = t.version; val ts2 = commitTs(t, v2)
    tickPast(ts2)
    t.append(TokenGen.generate(spark, 25, idStart = 2000L, numFiles = 1))
    val v3 = t.version; val ts3 = commitTs(t, v3)

    // exact stamp → that version; between stamps → the earlier one;
    // far future → latest; before the first commit → error
    assert(t.versionAsOf(ts1) == v1)
    assert(t.versionAsOf(ts2 - 1) == v1)
    assert(t.versionAsOf(ts2) == v2)
    assert(t.versionAsOf(ts3) == v3)
    assert(t.versionAsOf(ts3 + 3600_000L) == v3)
    val e = intercept[IllegalArgumentException] {
      t.versionAsOf(commitTs(t, 1L) - 1)
    }
    assert(e.getMessage.contains("earliest retained commit"))

    assert(t.scanAsOf(spark, ts1).count() == 100)
    assert(t.scanAsOf(spark, ts2).count() == 150)
    assert(t.scanAsOf(spark, System.currentTimeMillis()).count() == 175)
  }

  test("clock-skew tolerance: a non-monotone stamp never shadows a later commit") {
    val t = TsTable.create(tmpDir("asof-skew"), tokenMeta)
    t.append(TokenGen.generate(spark, 100, numFiles = 1))
    val v1 = t.version; val ts1 = commitTs(t, v1)
    tickPast(ts1 + 2)
    t.append(TokenGen.generate(spark, 50, idStart = 1000L, numFiles = 1))
    val v2 = t.version
    // simulate a cross-process writer whose clock ran BEHIND: rewrite v2's
    // recorded stamp to ts1 - 5 (earlier than its predecessor's)
    val p = t.store.commitPath(v2)
    val skewed = Files.readString(p)
      .replace(s""""timestamp":${commitTs(t, v2)}""", s""""timestamp":${ts1 - 5}""")
    Files.writeString(p, skewed, StandardOpenOption.TRUNCATE_EXISTING)
    assert(commitTs(t, v2) == ts1 - 5)

    // the max-qualifying-version rule: at ts1 both commits qualify
    // (v2's skewed stamp is ≤ ts1) and the LATER version wins — a reader
    // at ts1 must never see v2's rows vanish behind v1
    assert(t.versionAsOf(ts1) == v2)
    // before every stamp (create's AND the skewed one) → error, not v1
    val minTs = math.min(commitTs(t, 1L), ts1 - 5)
    val e = intercept[IllegalArgumentException] { t.versionAsOf(minTs - 1) }
    assert(e.getMessage.contains("earliest retained commit"))
  }

  test("expired history: as-of before the retained window errors; inside it resolves") {
    val t = TsTable.create(tmpDir("asof-exp"), tokenMeta)
    t.append(TokenGen.generate(spark, 200, numFiles = 2))
    val tsOld = commitTs(t, t.version)
    tickPast(tsOld)
    Compaction.run(spark, t, targetFileSize = 8L * 1024 * 1024)
    t.append(TokenGen.generate(spark, 50, idStart = 9000L, numFiles = 1))
    val keepFrom = t.version
    val tsNew = commitTs(t, keepFrom)
    Expire.expire(t, keepFrom, stagingGraceMs = 0L)

    // the pre-expire instant's commits were reclaimed
    intercept[IllegalArgumentException] { t.versionAsOf(tsOld) }
    // the retained window still resolves (and scans)
    assert(t.versionAsOf(tsNew) == keepFrom)
    assert(t.scanAsOf(spark, System.currentTimeMillis()).count() == 250)
  }
}
