package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}

/** Round-6 optimization parity gates: the codegen'd token_seq / tokens_csv
  * kernels replaced the interpreted HOF forms inside SparkEntry's declared
  * queries, so this spec holds kernel and HOF outputs bit-identical — any
  * drift would silently change oracle-gated results. */
class EntryKernelParitySpec extends SparkFunSuite {

  private def tokenSeqCol(id0: org.apache.spark.sql.Column, factor: Int) =
    ofExpr(graft.functions.TokenSeq(toExpr(id0), factor))
  private def tokensCsvCol(t: org.apache.spark.sql.Column) =
    ofExpr(graft.functions.TokensCsv(toExpr(t)))

  test("token_seq == transform(sequence(...)) HOF for both factors across the id domain") {
    import spark.implicits._
    // boundary-heavy ids: wrap points of (id*factor) % 50257, the % 1985
    // length cycle, and the q11/q74 offset range
    val ids = (Seq(0L, 1L, 2L, 9L, 1620L, 1984L, 1985L, 50256L, 50257L, 99999L,
      1621L * 1985L, 10000000L, 10000097L, 15000000L) ++ (0L until 400L).map(_ * 7919L)).distinct
    for (factor <- Seq(31, 37)) {
      val df = ids.toDF("id0").select(
        col("id0"),
        tokenSeqCol(col("id0"), factor).as("kernel"),
        expr(s"transform(sequence(0, CAST(64 + id0 % 1985 AS INT) - 1, 1), " +
          s"i -> CAST((id0 * $factor + i) % 50257 AS INT))").as("hof"))
      assert(df.where(not(col("kernel") <=> col("hof"))).count() == 0,
        s"token_seq mismatch at factor $factor")
    }
  }

  test("md5(tokens_csv) == md5(array_join(transform(...))) including null elements") {
    import spark.implicits._
    val df = (0L until 500L).map(_ * 131L).toDF("id0")
      .select(tokenSeqCol(col("id0"), 31).as("tokens"))
      .select(
        md5(tokensCsvCol(col("tokens")).cast("binary")).as("kernel"),
        expr("md5(cast(array_join(transform(tokens, x -> cast(x as string)), ',') as binary))")
          .as("hof"))
    assert(df.where(not(col("kernel") <=> col("hof"))).count() == 0)
    // null-element / null-array / empty-array semantics match array_join's
    val edge = spark.sql(
      """SELECT tokens FROM VALUES (array(1, NULL, 3)), (CAST(NULL AS ARRAY<INT>)),
        |            (array()), (array(0)) AS t(tokens)""".stripMargin)
      .select(
        tokensCsvCol(col("tokens")).as("kernel"),
        expr("array_join(transform(tokens, x -> cast(x as string)), ',')").as("hof"))
    val rows = edge.collect()
    assert(rows.forall(r => r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getString(0) == r.getString(1))))
  }

  test("SparkEntry tokSum reference form == tok_sum kernel on fixture arrays") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = (0L until 300L).map(_ * 997L).toDF("id0")
      .select(tokenSeqCol(col("id0"), 31).as("tokens"))
      .select(expr(SparkEntry.tokSum).as("hof"), expr("tok_sum(tokens)").as("kernel"))
    assert(df.where(not(col("hof") <=> col("kernel"))).count() == 0)
  }
}
