package graft

import org.apache.spark.sql.functions._
import graft.data.TokenGen
import graft.maintain.{Compaction, DeleteWhere, Expire}
import graft.meta._
import graft.table.TsTable

/** Tags: named snapshots — stable time-travel handles protected from
  * snapshot expiration. */
class TagSpec extends SparkFunSuite {

  private def tokenMeta = TableMeta("tokens",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None)

  test("set/drop/list; scanAtTag replays the pinned snapshot across later writes") {
    val t = TsTable.create(tmpDir("tag"), tokenMeta)
    t.append(TokenGen.generate(spark, 200, numFiles = 2))
    t.setTag("golden")
    val want = t.scan(spark).orderBy("doc_id").collect().toSeq

    t.append(TokenGen.generate(spark, 50, idStart = 9000L))
    DeleteWhere.deleteMor(spark, t, col("n_tok") < 1000)
    assert(t.scanAtTag(spark, "golden").orderBy("doc_id").collect().toSeq == want)

    // retarget (same name, new version) and list; the tag points at the
    // DATA version current when it was set (the tag commit itself adds one)
    val dataV = t.version
    t.setTag("golden") // now points at dataV
    assert(t.tags("golden") == dataV && t.version == dataV + 1)
    t.setTag("v1", Some(2L))
    assert(t.tags.keySet == Set("golden", "v1"))
    t.dropTag("v1")
    assert(t.tags.keySet == Set("golden"))
    intercept[IllegalArgumentException] { t.dropTag("v1") }
    intercept[IllegalArgumentException] { t.scanAtTag(spark, "nope") }
    intercept[IllegalArgumentException] { t.setTag("bad", Some(t.version + 10)) }
  }

  test("expire preserves tagged versions: checkpointed replay + files kept; untagged history reclaimed") {
    val t = TsTable.create(tmpDir("tag-exp"), tokenMeta)
    t.append(TokenGen.generate(spark, 200, numFiles = 2))
    val pinned = t.version
    val want = t.scan(spark).orderBy("doc_id").collect().toSeq
    t.setTag("keep", Some(pinned))
    Compaction.run(spark, t, targetFileSize = 8L * 1024 * 1024)

    val r = Expire.expire(t, t.version, stagingGraceMs = 0L)
    // the tag's commits are gone but its checkpoint + files survive
    assert(r.commitsDropped > 0)
    assert(t.scanAtTag(spark, "keep").orderBy("doc_id").collect().toSeq == want)
    // current state intact too
    assert(t.scan(spark).count() == 200)
    // restore to the tagged (expired) version works off its checkpoint
    graft.maintain.Restore.restore(t, pinned)
    assert(t.scan(spark).orderBy("doc_id").collect().toSeq == want)

    // once the tag drops, a later expire reclaims what only it referenced
    t.dropTag("keep")
    Compaction.run(spark, t, targetFileSize = 8L * 1024 * 1024)
    Expire.expire(t, t.version, stagingGraceMs = 0L)
    assert(t.scan(spark).count() == 200)
    intercept[Exception] { t.scanAtTag(spark, "keep") }

    // tagging an already-expired version is refused up front (it could
    // never replay, and would wedge every later expire)
    val e2 = intercept[IllegalArgumentException] { t.setTag("late", Some(pinned)) }
    assert(e2.getMessage.contains("reclaimed"))
  }

  test("expire retains a tag-pinned deletion vector; the superseded re-DV sidecar is swept") {
    val root = tmpDir("tag-dv")
    val t = TsTable.create(root, tokenMeta)
    t.append(TokenGen.generate(spark, 600, numFiles = 2))

    // first MOR delete attaches DV d1; pin it with a tag
    DeleteWhere.deleteMor(spark, t, col("source") === "src00")
    val tagState = graft.log.TableState.rebuildAt(t.store, t.version)
    val d1 = tagState.liveSegments.flatMap(_.dvPath)
    assert(d1.nonEmpty, "first MOR delete must attach at least one DV")
    t.setTag("pin")
    val wantAtPin = t.scan(spark).count()

    // second MOR delete supersedes d1 with a unioned d2 on the same segments
    DeleteWhere.deleteMor(spark, t, col("source") === "src01")
    val d2 = graft.log.TableState.rebuildAt(t.store, t.version)
      .liveSegments.flatMap(_.dvPath).filterNot(d1.contains)
    assert(d2.nonEmpty, "re-DV must write a new sidecar")

    // compaction materializes every DV away; expire everything untagged
    Compaction.run(spark, t, targetFileSize = 64L * 1024 * 1024, dvDebtThreshold = 0.0)
    assert(t.state.liveSegments.forall(_.dvPath.isEmpty))
    Thread.sleep(10) // grace-0 sweep uses strict mtime < now
    Expire.expire(t, t.version, stagingGraceMs = 0L)

    def exists(rel: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/$rel"))
    assert(d1.forall(exists), "tag-pinned DV sidecar must survive expire")
    assert(!d2.exists(exists), "superseded DV referenced by no retained version must be swept")

    // the tag still reads EXACTLY its snapshot (src00 masked, src01 present)
    val atPin = t.scanAtTag(spark, "pin")
    assert(atPin.count() == wantAtPin)
    assert(atPin.where(col("source") === "src00").count() == 0)
    assert(atPin.where(col("source") === "src01").count() > 0)
  }
}
