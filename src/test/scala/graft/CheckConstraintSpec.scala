package graft

import org.apache.spark.sql.functions._
import graft.data.TokenGen
import graft.maintain.{Compaction, MergeInto, UpdateWhere}
import graft.meta._
import graft.table.{CheckViolationException, TsTable}

/** CHECK constraints: ingest-quality gates enforced on every write that
  * stages segments, with a sound footer-stats fast path. */
class CheckConstraintSpec extends SparkFunSuite {

  private def tokenMeta = TableMeta("tokens",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None)

  test("append gated: violating batch rejected whole, clean batch lands; NULL passes") {
    val t = TsTable.create(tmpDir("chk"), tokenMeta)
    t.append(TokenGen.generate(spark, 100, numFiles = 1))
    t.addCheck(spark, "tok_bounds", "n_tok BETWEEN 64 AND 2048")

    // clean append: stats prove the bound, batch lands
    t.append(TokenGen.generate(spark, 50, idStart = 5000L))
    assert(t.scan(spark).count() == 150)

    // violating append: rejected whole, nothing committed, no debris
    val v0 = t.version
    val bad = TokenGen.generate(spark, 10, idStart = 6000L)
      .withColumn("n_tok", lit(999999))
    val e = intercept[CheckViolationException] { t.append(bad) }
    assert(e.violations == 10 && e.check == "tok_bounds")
    assert(t.version == v0 && t.scan(spark).count() == 150)

    // NULL predicate passes (SQL CHECK): null n_tok rows are accepted
    t.append(TokenGen.generate(spark, 5, idStart = 7000L)
      .withColumn("n_tok", lit(null).cast("int")))
    assert(t.scan(spark).count() == 155)
  }

  test("addCheck validates existing data; dropCheck re-opens the gate") {
    val t = TsTable.create(tmpDir("chk2"), tokenMeta)
    t.append(TokenGen.generate(spark, 100, numFiles = 1))
    val e = intercept[CheckViolationException] {
      t.addCheck(spark, "impossible", "n_tok > 100000")
    }
    assert(e.violations == 100)
    intercept[Exception] { t.addCheck(spark, "bad_col", "no_such_column > 0") }

    t.addCheck(spark, "src", "source LIKE 'src%'")
    intercept[IllegalArgumentException] { t.addCheck(spark, "src", "true") }
    val vBad = intercept[CheckViolationException] {
      t.append(TokenGen.generate(spark, 5, idStart = 8000L)
        .withColumn("source", lit("other")))
    }
    assert(vBad.check == "src")
    t.dropCheck("src")
    t.append(TokenGen.generate(spark, 5, idStart = 8000L)
      .withColumn("source", lit("other")))
    assert(t.scan(spark).where("source = 'other'").count() == 5)
  }

  test("rewrites pass the stats fast path; an out-of-bounds UPDATE is caught") {
    val t = TsTable.create(tmpDir("chk3"), tokenMeta)
    t.append(TokenGen.generate(spark, 200, numFiles = 4))
    t.addCheck(spark, "tok_bounds", "n_tok BETWEEN 64 AND 2048")

    // compaction / merge restage validated rows — both must pass
    Compaction.run(spark, t, targetFileSize = 8L * 1024 * 1024)
    MergeInto.mergeMor(spark, t,
      TokenGen.generate(spark, 10, idStart = 100L).withColumn("source", lit("src00")))
    assert(t.scan(spark).count() == 200)

    // an UPDATE whose SET drives rows out of bounds is rejected whole,
    // on both the COW and the MOR path
    intercept[CheckViolationException] {
      UpdateWhere.update(spark, t, col("source") === "src00",
        Map("n_tok" -> lit(500000)))
    }
    intercept[CheckViolationException] {
      UpdateWhere.updateMor(spark, t, col("source") === "src00",
        Map("n_tok" -> lit(500000)))
    }
    t.refresh()
    assert(t.scan(spark).where("n_tok > 2048").count() == 0, "no partial write survived")
    // in-bounds update passes
    UpdateWhere.update(spark, t, col("source") === "src00", Map("n_tok" -> lit(2048)))
    assert(t.scan(spark).where("n_tok = 2048").count() > 0)
  }
}
