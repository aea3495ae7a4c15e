package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.maintain.{ChangeFeed, Compaction, DeleteWhere, Expire, MergeInto, UpdateWhere}
import graft.meta.{ClusterSpec, TableKind, TableMeta}
import graft.table.TsTable

/** Change data feed: writer-recorded row-level changes per commit —
  * delete/update/merge records, insert synthesis for pure appends,
  * DataNeutral compaction skips, unrecorded-change refusal, expire sweep. */
class ChangeFeedSpec extends SparkFunSuite {

  private def docsMeta = TableMeta("docs",
    TableKind.Clustered(ClusterSpec(Seq("source", "n_chars", "doc_id"), "zorder")), None, None)

  private def docs(n: Int): DataFrame = spark.range(0, n).select(
    col("id").as("doc_id"),
    concat(lit("text-"), col("id")).as("text"),
    (col("id") % 97 + 10).cast("long").as("n_chars"),
    concat(lit("s"), pmod(col("id"), lit(5))).as("source"))

  private def feed(t: TsTable, from: Long, to: Long): DataFrame =
    ChangeFeed.read(spark, t, from, to)

  test("pure appends synthesize inserts with commit version/timestamp") {
    val t = TsTable.create(tmpDir("cdf-append"), docsMeta)
    t.append(docs(100))
    val v1 = t.version
    t.append(docs(50).withColumn("doc_id", col("doc_id") + 1000L))
    val f = feed(t, 0, t.version)
    assert(f.count() == 150)
    assert(f.where(col("_change_type") =!= "insert").count() == 0)
    // versions attribute rows to their commit
    assert(f.where(col("_commit_version") === v1).count() == 100)
    assert(f.where(col("_commit_version") === t.version).count() == 50)
    assert(f.where(col("_commit_timestamp").isNull).count() == 0)
    // incremental read: only the second commit
    assert(feed(t, v1, t.version).count() == 50)
  }

  test("DELETE WHERE records deleted rows (copy-on-write and MOR)") {
    val t = TsTable.create(tmpDir("cdf-del"), docsMeta)
    t.append(docs(500))
    t.enableCdf()
    val v0 = t.version
    val rep = DeleteWhere.delete(spark, t, col("doc_id") < 50)
    assert(rep.rowsDeleted == 50)
    val f = feed(t, v0, t.version)
    assert(f.count() == 50)
    assert(f.where(col("_change_type") === "delete").count() == 50)
    assert(f.agg(max("doc_id")).head.getLong(0) == 49)
    // full width: non-key columns are carried in the record
    assert(f.where(col("text") === "text-7").count() == 1)

    // merge-on-read flavor
    val v1 = t.version
    val repMor = DeleteWhere.deleteMor(spark, t, col("doc_id") >= 450)
    assert(repMor.rowsDeleted == 50)
    val fMor = feed(t, v1, t.version)
    assert(fMor.count() == 50)
    assert(fMor.where(col("_change_type") === "delete").count() == 50)
    assert(fMor.agg(min("doc_id")).head.getLong(0) == 450)
  }

  test("UPDATE WHERE records pre and post images (CoW and MOR)") {
    val t = TsTable.create(tmpDir("cdf-upd"), docsMeta)
    t.append(docs(300))
    t.enableCdf()
    val v0 = t.version
    val rep = UpdateWhere.update(spark, t, col("doc_id") < 10,
      Map("text" -> lit("patched")))
    assert(rep.rowsUpdated == 10)
    val f = feed(t, v0, t.version).cache()
    assert(f.count() == 20)
    assert(f.where(col("_change_type") === "update_pre")
      .where(col("text").startsWith("text-")).count() == 10)
    assert(f.where(col("_change_type") === "update_post")
      .where(col("text") === "patched").count() == 10)
    f.unpersist()

    val v1 = t.version
    val repMor = UpdateWhere.updateMor(spark, t, col("doc_id") >= 290,
      Map("text" -> lit("mor-patched")))
    assert(repMor.rowsUpdated == 10)
    val fMor = feed(t, v1, t.version)
    assert(fMor.where(col("_change_type") === "update_pre").count() == 10)
    assert(fMor.where(col("_change_type") === "update_post")
      .where(col("text") === "mor-patched").count() == 10)
  }

  test("MERGE records update_pre/update_post/insert (CoW and MOR)") {
    for (mor <- Seq(false, true)) {
      val t = TsTable.create(tmpDir(s"cdf-merge-$mor"), docsMeta)
      t.append(docs(200))
      t.enableCdf()
      val v0 = t.version
      // 20 updates of existing keys + 5 brand-new keys
      val upd = docs(20).withColumn("text", lit("merged"))
        .unionByName(docs(5)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", lit("merged-new")))
      if (mor) MergeInto.mergeMor(spark, t, upd, key = "doc_id")
      else MergeInto.merge(spark, t, upd, key = "doc_id")
      val f = feed(t, v0, t.version).cache()
      assert(f.where(col("_change_type") === "update_pre").count() == 20, s"mor=$mor")
      assert(f.where(col("_change_type") === "update_post")
        .where(col("text") === "merged").count() == 20, s"mor=$mor")
      assert(f.where(col("_change_type") === "insert")
        .where(col("text") === "merged-new").count() == 5, s"mor=$mor")
      // pre images carry the OLD text
      assert(f.where(col("_change_type") === "update_pre")
        .where(col("text").startsWith("text-")).count() == 20, s"mor=$mor")
      f.unpersist()
      // table contents agree with the feed's post-state
      assert(t.scan(spark).count() == 205)
    }
  }

  test("MERGE delete-by-key records deletes") {
    val t = TsTable.create(tmpDir("cdf-mergedel"), docsMeta)
    t.append(docs(200))
    t.enableCdf()
    val v0 = t.version
    import spark.implicits._
    val rep = MergeInto.mergeDelete(spark, t,
      Seq(3L, 7L, 11L).toDF("doc_id"), key = "doc_id")
    assert(rep.rowsDeleted == 3)
    val f = feed(t, v0, t.version)
    assert(f.where(col("_change_type") === "delete").count() == 3)
    assert(f.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(3L, 7L, 11L))
  }

  test("compaction is DataNeutral: skipped by the feed") {
    val t = TsTable.create(tmpDir("cdf-compact"), docsMeta)
    t.append(docs(1000).repartition(8))
    t.enableCdf()
    val v0 = t.version
    DeleteWhere.deleteMor(spark, t, col("doc_id") < 10) // DV to materialize
    val rep = Compaction.run(spark, t, targetFileSize = 512L * 1024 * 1024)
    assert(rep.binsExecuted >= 1)
    // feed over the whole range = just the 10 deletes; the rewrite is silent
    val f = feed(t, v0, t.version)
    assert(f.count() == 10)
    assert(f.where(col("_change_type") === "delete").count() == 10)
    // feed over ONLY the compaction commits = empty, not an error
    val vAfterDelete = v0 + 1
    assert(feed(t, vAfterDelete, t.version).count() == 0)
  }

  test("mutations without a record refuse the read; ranges after them work") {
    val t = TsTable.create(tmpDir("cdf-refuse"), docsMeta)
    t.append(docs(100))
    // CDF off: this delete has no record
    DeleteWhere.delete(spark, t, col("doc_id") < 5)
    val vBad = t.version
    val e = intercept[IllegalStateException](feed(t, 0, t.version).count())
    assert(e.getMessage.contains("without a change record"))
    // reads starting after the unrecorded commit are fine
    t.enableCdf()
    t.append(docs(7).withColumn("doc_id", col("doc_id") + 5000L))
    assert(feed(t, vBad, t.version).count() == 7)
  }

  test("feed survives RENAME COLUMN: records read under current logical names") {
    val t = TsTable.create(tmpDir("cdf-rename"), docsMeta)
    t.append(docs(100))
    t.enableCdf()
    val v0 = t.version
    DeleteWhere.delete(spark, t, col("doc_id") === 42L)
    t.renameColumn("text", "body")
    val f = feed(t, v0, t.version)
    assert(f.columns.contains("body") && !f.columns.contains("text"))
    assert(f.where(col("_change_type") === "delete")
      .select("body").head.getString(0) == "text-42")
  }

  test("expire sweeps change records of dropped commits, keeps retained ones") {
    val t = TsTable.create(tmpDir("cdf-expire"), docsMeta)
    t.append(docs(100))
    t.enableCdf()
    DeleteWhere.delete(spark, t, col("doc_id") === 1L)
    val vOld = t.version
    t.append(docs(10).withColumn("doc_id", col("doc_id") + 9000L))
    DeleteWhere.delete(spark, t, col("doc_id") === 2L)
    val vKeep = t.version
    def cdcFiles(): Seq[String] = {
      val d = java.nio.file.Paths.get(t.root.stripPrefix("file:"), "_cdc")
      if (!java.nio.file.Files.isDirectory(d)) Nil
      else { val s = java.nio.file.Files.list(d)
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toSeq } finally s.close() }
    }
    assert(cdcFiles().size == 2)
    Expire.expire(t, keepFromVersion = vKeep, stagingGraceMs = 0)
    // the v<=vOld record is gone with its commit; vKeep's record survives
    assert(cdcFiles().size == 1)
    assert(feed(t, vKeep - 1, vKeep).count() == 1)
    val e = intercept[Exception](feed(t, vOld - 1, vOld).count())
    assert(e.getMessage.contains("missing commit"))
  }

  test("streaming readChangeFeed: snapshot as inserts, then incremental changes") {
    import org.apache.spark.sql.streaming.Trigger
    val t = TsTable.create(tmpDir("cdf-stream"), docsMeta)
    t.append(docs(100))
    t.enableCdf()
    val out = tmpDir("cdf-stream-out"); val ckpt = tmpDir("cdf-stream-ckpt")
    def drain(): DataFrame = {
      val q = t.readStream(spark, Map("readChangeFeed" -> "true")).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out)
    }
    // initial snapshot: 100 inserts pinned at the current version
    val got1 = drain()
    assert(got1.count() == 100)
    assert(got1.where(col("_change_type") === "insert").count() == 100)
    assert(got1.select("_commit_version").distinct().head.getLong(0) == t.version)

    // incremental: a delete and an update stream as change records
    DeleteWhere.delete(spark, t, col("doc_id") < 5)
    UpdateWhere.update(spark, t, col("doc_id") === 50L, Map("text" -> lit("streamed")))
    val got2 = drain()
    assert(got2.count() == 100 + 5 + 2)
    assert(got2.where(col("_change_type") === "delete").count() == 5)
    assert(got2.where(col("_change_type") === "update_post")
      .where(col("text") === "streamed").count() == 1)

    // a compaction is silent; a fresh append streams as inserts
    Compaction.run(spark, t, targetFileSize = 512L * 1024 * 1024)
    t.append(docs(3).withColumn("doc_id", col("doc_id") + 7000L))
    val got3 = drain()
    assert(got3.count() == 107 + 3)
    assert(got3.where(col("_change_type") === "insert")
      .where(col("doc_id") >= 7000L).count() == 3)
  }

  test("delete-all leaves exactly its record under _cdc, no staging debris") {
    val t = TsTable.create(tmpDir("cdf-clean"), docsMeta)
    t.append(docs(50))
    t.enableCdf()
    val v0 = t.version
    DeleteWhere.delete(spark, t, lit(true)) // all files fully matched → metadata-only removes
    assert(feed(t, v0, t.version).where(col("_change_type") === "delete").count() == 50)
    val rootP = java.nio.file.Paths.get(t.root.stripPrefix("file:"))
    val cdcCount = java.nio.file.Files.list(rootP.resolve("_cdc")).count()
    assert(cdcCount >= 1) // the successful delete's record (one per part file)
    val staging = java.nio.file.Files.list(rootP)
    try { import scala.jdk.CollectionConverters._
      assert(!staging.iterator().asScala.exists(
        _.getFileName.toString.startsWith(".staging-cdc")))
    } finally staging.close()
  }
}
