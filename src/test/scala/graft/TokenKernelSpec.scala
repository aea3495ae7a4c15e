package graft

import org.apache.spark.sql.functions._

/** tok_sum kernel: bit-identical to the HOF `aggregate` reference form,
  * including null-element and null-array semantics, on both the codegen
  * and interpreted paths. */
class TokenKernelSpec extends SparkFunSuite {

  test("tok_sum == aggregate(tokens, 0L, (a, x) -> a + x) on generated data") {
    graft.functions.GraftFunctions.register(spark)
    val df = graft.data.TokenGen.generate(spark, 500)
      .select(col("doc_id"),
        expr("aggregate(tokens, 0L, (a, x) -> a + CAST(x AS BIGINT))").as("hof"),
        expr("tok_sum(tokens)").as("kernel"))
    assert(df.where(not(col("hof") <=> col("kernel"))).count() == 0)
    // overflow-free domain check: values are genuinely large longs
    assert(df.agg(max("kernel")).head().getLong(0) > Int.MaxValue.toLong / 100)
  }

  test("tok_sum null semantics: null element nulls the sum; null array stays null; empty = 0") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT tok_sum(a) AS k,
        |       aggregate(a, 0L, (acc, x) -> acc + CAST(x AS BIGINT)) AS h
        |FROM VALUES (array(1, 2, 3)), (array(1, NULL, 3)),
        |            (CAST(NULL AS ARRAY<INT>)), (array()) AS t(a)""".stripMargin)
    val rows = df.collect()
    assert(rows.forall(r => r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1))))
    assert(rows(0).getLong(0) == 6L && rows(1).isNullAt(0) &&
      rows(2).isNullAt(0) && rows(3).getLong(0) == 0L)
  }

  test("tok_sum rejects non-array<int> input; interpreted eval matches codegen") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT tok_sum(array(1.0, 2.0))").collect()
    }
    assert(e.getMessage.contains("array<int>") || e.getMessage.contains("DATATYPE"))
    // interpreted path (wholeStage off) must agree with codegen
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(spark.sql("SELECT tok_sum(sequence(1, 1000))").head().getLong(0) == 500500L)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(spark.sql("SELECT tok_sum(sequence(1, 1000))").head().getLong(0) == 500500L)
  }
}
