package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.data.TokenGen
import graft.maintain.Compaction
import graft.meta._
import graft.streaming.StreamingIngest
import graft.table.TsTable

/** Structured Streaming ingestion: micro-batches land as transactional
  * appends, idempotent under batch replay, compactable afterwards. */
case class Tok(doc_id: String, tokens: Array[Int], n_tok: Int, source: String)

class StreamingSpec extends SparkFunSuite {

  private def tokenMeta = TableMeta("tokens",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None)

  test("stream -> foreachBatch append -> scan; then compaction over streamed segments") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("stream-tbl")
    val t = TsTable.create(root, tokenMeta)

    val rows = TokenGen.generate(spark, 300).as[Tok].collect().toSeq
    val mem = MemoryStream[Tok]
    mem.addData(rows.take(100))
    mem.addData(rows.slice(100, 300))

    StreamingIngest.ingestAvailable(mem.toDF(), t, tmpDir("stream-ckpt"))
    t.refresh()
    assert(t.scan(spark).count() == 300)

    // streamed segments are ordinary segments: clustering preserves rows
    t.append(TokenGen.generate(spark, 300, idStart = 10000, numFiles = 6))
    Compaction.run(spark, t, targetFileSize = 64L * 1024 * 1024)
    assert(t.scan(spark).count() == 600)
    val got = t.scan(spark).where(col("doc_id") === rows.head.doc_id)
      .select("tokens").as[Array[Int]].collect()
    assert(got.length == 1 && got(0).sameElements(rows.head.tokens))
  }

  test("batch replay is idempotent: re-running the sink does not duplicate rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpDir("stream-idem")
    val t = TsTable.create(root, tokenMeta)
    val ckpt = tmpDir("stream-idem-ckpt")

    val rows = TokenGen.generate(spark, 50).as[Tok].collect().toSeq
    val mem = MemoryStream[Tok]
    mem.addData(rows)
    StreamingIngest.ingestAvailable(mem.toDF(), t, ckpt)
    t.refresh()
    assert(t.scan(spark).count() == 50)

    // new stream, FRESH checkpoint (worst case: offsets lost) but same
    // journal -> batch 0 is recognized and skipped
    val mem2 = MemoryStream[Tok]
    mem2.addData(rows)
    StreamingIngest.ingestAvailable(mem2.toDF(), t, tmpDir("stream-idem-ckpt2"))
    t.refresh()
    assert(t.scan(spark).count() == 50, "replayed batch must not duplicate")
  }
}
