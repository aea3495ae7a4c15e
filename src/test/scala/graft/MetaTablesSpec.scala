package graft

import org.apache.spark.sql.functions._
import graft.data.TokenGen
import graft.maintain.DeleteWhere
import graft.meta._
import graft.table.TsTable

/** Metadata tables: `files` (per-live-file manifest rows + stats) and
  * `refs` (tags + branches) — manifest-only DataFrames. */
class MetaTablesSpec extends SparkFunSuite {

  private def tokenMeta = TableMeta("tokens",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None)

  test("files: row counts, stats bounds, and DV-adjusted live_rows match the data") {
    val t = TsTable.create(tmpDir("meta-files"), tokenMeta)
    t.append(TokenGen.generate(spark, 120, numFiles = 3))
    val f0 = t.files(spark)
    assert(f0.count() == 3)
    assert(f0.agg(sum("row_count")).head.getLong(0) == 120)
    assert(f0.where(col("dv_path").isNotNull).count() == 0)

    // stats bounds must cover the data exactly (footer-stat fast path)
    val Array(minDoc, maxDoc) = f0
      .agg(min(expr("stats['doc_id']['min']")), max(expr("stats['doc_id']['max']")))
      .head.toSeq.map(_.asInstanceOf[String]).toArray
    val Array(wantMin, wantMax) = t.scan(spark)
      .agg(min("doc_id"), max("doc_id")).head.toSeq.map(_.asInstanceOf[String]).toArray
    assert(minDoc == wantMin && maxDoc == wantMax)

    // a MOR delete shows up as dv_path + live_rows, physical row_count fixed
    val del = DeleteWhere.deleteMor(spark, t, expr("substring(doc_id, -1, 1) = '0'"))
    assert(del.rowsDeleted == 12)
    val f1 = t.files(spark)
    assert(f1.agg(sum("row_count")).head.getLong(0) == 120, "physical counts never change")
    assert(f1.agg(sum("live_rows")).head.getLong(0) == 108)
    assert(f1.agg(sum("dv_cardinality")).head.getLong(0) == 12)
    assert(f1.where(col("dv_path").isNotNull).count() > 0)
  }

  test("refs: tags pin base==head, branches span fork..head") {
    val t = TsTable.create(tmpDir("meta-refs"), tokenMeta)
    t.append(TokenGen.generate(spark, 50))
    val dataV = t.version
    t.setTag("golden")
    val b = t.createBranch("wip")
    b.append(TokenGen.generate(spark, 10, idStart = 900L))

    val refs = t.refs(spark).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(refs == Set(
      ("golden", "tag", dataV, dataV),
      ("wip", "branch", dataV + 1, dataV + 2))) // fork after the tag commit; one branch append

    t.dropBranch("wip"); t.dropTag("golden")
    assert(t.refs(spark).count() == 0)
  }
}
