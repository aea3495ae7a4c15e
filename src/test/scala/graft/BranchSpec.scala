package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.data.TokenGen
import graft.maintain.{Compaction, DeleteWhere, Expire}
import graft.meta._
import graft.table.TsTable

/** Branches + write-audit-publish: a branch is a forked transaction log
  * (`_branches/<name>/`) sharing main's committed prefix; a branch handle
  * is a fully capable writer; publish squashes the branch's net effect
  * into ONE atomic fast-forward commit on main. */
class BranchSpec extends SparkFunSuite {

  private def tokenMeta = TableMeta("tokens",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None)

  private def dataFiles(root: String): Set[String] = {
    val d = Paths.get(root.stripPrefix("file:"), "data")
    if (!Files.isDirectory(d)) return Set.empty
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(Files.isRegularFile(_)).map(_.getFileName.toString).toSet
    } finally s.close()
  }

  test("branch writes are isolated from main; publish is one atomic squash commit") {
    val t = TsTable.create(tmpDir("br-iso"), tokenMeta)
    t.append(TokenGen.generate(spark, 200, numFiles = 2))
    val baseV = t.version
    val baseRows = t.scan(spark).count()

    val b = t.createBranch("wap")
    assert(t.branches == Seq("wap") && b.branchName.contains("wap") && t.branchName.isEmpty)
    b.append(TokenGen.generate(spark, 60, idStart = 9000L))
    b.append(TokenGen.generate(spark, 40, idStart = 9500L))

    // isolation both ways: main unchanged, branch sees base + its writes
    t.refresh()
    assert(t.version == baseV && t.scan(spark).count() == baseRows)
    assert(b.scan(spark).count() == baseRows + 100)
    val want = b.scan(spark).orderBy("doc_id").collect().toSeq

    // the datasource surface sees the same split: bare load = main,
    // option("branch") = the audited fork
    assert(spark.read.format("graft-table").load(t.root).count() == baseRows)
    assert(spark.read.format("graft-table").option("branch", "wap")
      .load(t.root).count() == baseRows + 100)

    val v = t.publishBranch("wap")
    assert(v == baseV + 1, s"squash publish must be ONE commit (got v$v over base v$baseV)")
    assert(t.scan(spark).orderBy("doc_id").collect().toSeq == want)
    assert(t.branches.isEmpty, "publish drops the branch by default")
  }

  test("audit rejection: CHECK constraints gate branch appends; dropped branch files are reclaimed") {
    val t = TsTable.create(tmpDir("br-audit"), tokenMeta)
    t.append(TokenGen.generate(spark, 100))
    t.addCheck(spark, "tok_positive", "n_tok >= 0")
    val mainFiles = dataFiles(t.root)
    val mainRows = t.scan(spark).count()

    val b = t.createBranch("audit-me")
    // the branch handle inherits table meta — its appends enforce the check
    val bad = TokenGen.generate(spark, 10, idStart = 5000L).withColumn("n_tok", lit(-1))
    intercept[graft.table.CheckViolationException] { b.append(bad) }
    b.append(TokenGen.generate(spark, 10, idStart = 6000L)) // audit-passing batch
    assert(b.scan(spark).count() == mainRows + 10)

    // audit verdict: reject — drop the branch; next sweep reclaims its files
    assert(t.dropBranch("audit-me"))
    assert(!t.dropBranch("audit-me"))
    t.refresh()
    assert(t.scan(spark).count() == mainRows)
    Expire.expire(t, t.version, stagingGraceMs = 0L)
    assert(dataFiles(t.root) == mainFiles,
      "dropped branch's data files must be swept as unreferenced")
  }

  test("publish is fast-forward only: a main commit after the fork rejects the publish") {
    val t = TsTable.create(tmpDir("br-ff"), tokenMeta)
    t.append(TokenGen.generate(spark, 100))
    val b = t.createBranch("stale")
    b.append(TokenGen.generate(spark, 10, idStart = 7000L))
    t.append(TokenGen.generate(spark, 20, idStart = 8000L)) // main diverges

    val e = intercept[IllegalStateException] { t.publishBranch("stale") }
    assert(e.getMessage.contains("non-fast-forward"))
    // the branch survives a failed publish and is still readable/droppable
    assert(t.branches == Seq("stale") && b.scan(spark).count() == 110)
    t.dropBranch("stale")
  }

  test("maintenance on a branch: compaction + MOR delete publish as one net swap") {
    val t = TsTable.create(tmpDir("br-maint"), tokenMeta)
    t.append(TokenGen.generate(spark, 300, numFiles = 6))
    val baseV = t.version

    val b = t.createBranch("maint")
    DeleteWhere.deleteMor(spark, b, expr("substring(doc_id, -1, 1) = '0'"))
    Compaction.run(spark, b, targetFileSize = 8L * 1024 * 1024)
    val want = b.scan(spark).orderBy("doc_id").collect().toSeq
    assert(want.size == 270)

    t.publishBranch("maint")
    assert(t.version == baseV + 1)
    assert(t.scan(spark).orderBy("doc_id").collect().toSeq == want)
    // the swap replaced the original segments in the SAME commit
    assert(dataFiles(t.root).nonEmpty)
  }

  test("expire retains live-branch lineage (base checkpoint + file retention); branch publishes after expire") {
    val t = TsTable.create(tmpDir("br-exp"), tokenMeta)
    t.append(TokenGen.generate(spark, 200, numFiles = 2))
    val b = t.createBranch("survivor")
    b.append(TokenGen.generate(spark, 50, idStart = 9000L))
    val wantBranch = b.scan(spark).orderBy("doc_id").collect().toSeq

    // churn main history ABOVE the fork is forbidden (non-FF publish), so
    // exercise expire at the fork point itself: compact BELOW the branch is
    // impossible — instead expire with watermark == current == base
    val r = Expire.expire(t, t.version, stagingGraceMs = 0L)
    assert(r.unreferencedFilesDeleted == 0, "branch-added files must survive the sweep")
    // branch still replays (base checkpoint or retained commits) and publishes
    assert(b.scan(spark).orderBy("doc_id").collect().toSeq == wantBranch)
    t.publishBranch("survivor")
    assert(t.scan(spark).count() == 250)
  }

  test("branch handles reject branch-management verbs (no nested branches)") {
    val t = TsTable.create(tmpDir("br-nest"), tokenMeta)
    t.append(TokenGen.generate(spark, 10))
    val b = t.createBranch("one")
    intercept[IllegalArgumentException] { Expire.expire(b, b.version) } // shared main log
    intercept[IllegalStateException] { b.createBranch("two") }
    intercept[IllegalStateException] { b.branch("one") }
    intercept[IllegalStateException] { b.publishBranch("one") }
    intercept[IllegalStateException] { b.dropBranch("one") }
    intercept[IllegalArgumentException] { t.createBranch("one") } // duplicate name
    intercept[IllegalArgumentException] { t.branch("nope") }      // unknown name
    intercept[IllegalArgumentException] { t.createBranch("bad/name") }
    t.dropBranch("one")
  }
}
