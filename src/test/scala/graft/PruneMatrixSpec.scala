package graft

import org.apache.spark.sql.functions._
import graft.meta._
import graft.table.TsTable

/** Prune-matrix parity with the reference's DataFusion-layer tests
  * (ts_table_provider/tests.rs + tests/ts_table_provider_tests.rs, §5
  * layer 3): prune on >, >=, <, <=, =, BETWEEN, IN, OR, NOT; NO prune on
  * !=, NOT IN, unrecognized predicates; transform comparisons
  * (date_trunc / to_date / ts ± interval) prune AND return correct rows;
  * multi-segment min/max; empty tables; count(*). All measured via the
  * physical scan's numFiles metric so the test observes the real plan. */
class PruneMatrixSpec extends SparkFunSuite {

  import org.apache.spark.sql.DataFrame

  private def filesRead(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
  }

  // two files: hours [10:00,11:00) and [12:00,13:00) on 2024-03-01
  private lazy val table: TsTable = {
    import spark.implicits._
    val root = tmpDir("prune-matrix")
    val t = TsTable.create(root, TableMeta("prices",
      TableKind.TimeSeries(TimeIndexSpec("ts", Nil, TimeBucket.parse("1m"), None)), None, None))
    def hourDf(h: Int) =
      (0 until 60).map(m => (s"2024-03-01 %02d:%02d:00".format(h, m), h * 100.0 + m))
        .toDF("tss", "price")
        .select(to_timestamp(col("tss")).as("ts"), col("price"))
    t.append(hourDf(10).coalesce(1))
    t.append(hourDf(12).coalesce(1))
    t
  }

  private def scan = table.scan(spark)
  private def ts(s: String) = to_timestamp(lit(s))

  test("prune on comparison operators") {
    assert(filesRead(scan.where(col("ts") > ts("2024-03-01 11:30:00"))) == 1)
    assert(filesRead(scan.where(col("ts") >= ts("2024-03-01 12:00:00"))) == 1)
    assert(filesRead(scan.where(col("ts") < ts("2024-03-01 11:00:00"))) == 1)
    assert(filesRead(scan.where(col("ts") <= ts("2024-03-01 10:30:00"))) == 1)
    assert(filesRead(scan.where(col("ts") === ts("2024-03-01 12:15:00"))) == 1)
    // flipped literal side
    assert(filesRead(scan.where(ts("2024-03-01 11:30:00") > col("ts"))) == 1)
  }

  test("prune on BETWEEN / NOT BETWEEN / IN / OR / NOT") {
    assert(filesRead(scan.where(col("ts").between(
      ts("2024-03-01 09:00:00"), ts("2024-03-01 10:30:00")))) == 1)
    assert(filesRead(scan.where(!col("ts").between(
      ts("2024-03-01 00:00:00"), ts("2024-03-01 11:00:00")))) == 1)
    assert(filesRead(scan.where(col("ts").isin(
      java.sql.Timestamp.valueOf("2024-03-01 12:30:00")))) == 1)
    assert(filesRead(scan.where(
      col("ts") < ts("2024-03-01 09:00:00") || col("ts") > ts("2024-03-01 12:30:00"))) == 1)
    assert(filesRead(scan.where(!(col("ts") >= ts("2024-03-01 11:00:00")))) == 1)
  }

  test("no prune on != / NOT IN / unrecognized predicates (sound)") {
    assert(filesRead(scan.where(col("ts") =!= ts("2024-03-01 10:30:00"))) == 2)
    assert(filesRead(scan.where(!col("ts").isin(
      java.sql.Timestamp.valueOf("2024-03-01 10:30:00")))) == 2)
    assert(filesRead(scan.where(hash(col("ts")) > 0 || hash(col("ts")) <= 0)) == 2)
  }

  test("date_trunc comparisons prune files and return correct rows") {
    val q = scan.where(date_trunc("hour", col("ts")) === ts("2024-03-01 12:00:00"))
    assert(q.count() == 60)
    assert(filesRead(q) == 1)
    // unaligned Eq literal is impossible -> 0 files
    val q2 = scan.where(date_trunc("hour", col("ts")) === ts("2024-03-01 12:30:00"))
    assert(q2.count() == 0)
    assert(filesRead(q2) == 0)
    val q3 = scan.where(date_trunc("minute", col("ts")) >= ts("2024-03-01 12:59:00"))
    assert(q3.count() == 1)
    assert(filesRead(q3) == 1)
    val q4 = scan.where(date_trunc("hour", col("ts")) < ts("2024-03-01 11:00:00"))
    assert(q4.count() == 60)
    assert(filesRead(q4) == 1)
  }

  test("to_date comparisons prune (whole table is one day)") {
    val q = scan.where(to_date(col("ts")) === lit(java.sql.Date.valueOf("2024-03-01")))
    assert(q.count() == 120 && filesRead(q) == 2)
    val q2 = scan.where(to_date(col("ts")) === lit(java.sql.Date.valueOf("2024-03-02")))
    assert(q2.count() == 0 && filesRead(q2) == 0)
    val q3 = scan.where(to_date(col("ts")) < lit(java.sql.Date.valueOf("2024-03-01")))
    assert(q3.count() == 0 && filesRead(q3) == 0)
  }

  test("ts ± interval comparisons prune") {
    // ts + 2h > 14:30  ≡  ts > 12:30 → second file only
    val q = scan.where(col("ts") + expr("INTERVAL 2 HOURS") > ts("2024-03-01 14:30:00"))
    assert(q.count() == 29)
    assert(filesRead(q) == 1)
  }

  test("multi-segment min/max, empty result, count(*)") {
    val none = scan.where(col("ts") > ts("2024-03-02 00:00:00"))
    assert(none.count() == 0 && filesRead(none) == 0)
    assert(scan.count() == 120)
  }

  test("projection order preserved; limit works through the relation") {
    val cols = scan.select("price", "ts").columns.toSeq
    assert(cols == Seq("price", "ts"))
    assert(scan.limit(7).count() == 7)
  }

  test("IsNull / IsNotNull pruning from null counts") {
    import spark.implicits._
    val root = tmpDir("prune-null")
    val t = TsTable.create(root, TableMeta("n",
      TableKind.Clustered(ClusterSpec(Seq("doc_id"), "none")), None, None))
    // file A: no nulls in v; file B: all nulls in v
    t.append(Seq((1L, Some(1.0)), (2L, Some(2.0))).toDF("id", "v").coalesce(1))
    t.append(Seq((3L, None: Option[Double]), (4L, None)).toDF("id", "v").coalesce(1))
    assert(filesRead(t.scan(spark).where(col("v").isNull)) == 1)    // A pruned
    assert(filesRead(t.scan(spark).where(col("v").isNotNull)) == 1) // B pruned
    assert(filesRead(t.scan(spark).where(col("v") > 0.5)) == 1)     // all-null file pruned
  }

  test("empty table scans as zero rows with schema") {
    val root = tmpDir("prune-empty")
    val t = TsTable.create(root, TableMeta("e",
      TableKind.TimeSeries(TimeIndexSpec("ts", Nil, TimeBucket.parse("1h"), None)), None, None))
    assert(t.scan(spark).count() == 0)
  }
}
