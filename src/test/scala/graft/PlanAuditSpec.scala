package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.data.TokenGen
import graft.meta._
import graft.table.TsTable

/** Physical-plan audits: lock in the plan shapes that make the engine
  * viable at 100 TB — predicate pushdown to the parquet scan, column
  * pruning in ReadSchema, broadcast joins for small dims, whole-stage
  * codegen over the hot paths, and no accidental cartesian products. A
  * regression here is a performance bug even when results stay correct. */
class PlanAuditSpec extends SparkFunSuite {

  private def executed(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private lazy val table: TsTable = {
    val root = tmpDir("plan-audit")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 2000, numFiles = 4))
    t
  }

  test("TsTable scan: filters push to parquet, projection prunes ReadSchema") {
    val q = table.scan(spark).where(col("n_tok") > 500).select("doc_id", "n_tok")
    val plan = executed(q)
    assert(plan.contains("PushedFilters: [IsNotNull(n_tok), GreaterThan(n_tok,500)]"),
      s"filter not pushed to scan:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:string,n_tok:int>"),
      s"tokens column not pruned from scan:\n$plan")
    // whole-stage-codegen spans print as "*(n) Op" in the physical plan
    assert(plan.contains("*("), s"scan+filter not codegen'd:\n$plan")
  }

  test("relational queries: broadcast joins chosen, no cartesian products") {
    val dir = "/root/testdata/sf0.001"
    val p3 = executed(SparkEntry.queries("q03_join")(spark, dir))
    assert(p3.contains("BroadcastHashJoin"), s"q03 lost its broadcast join:\n${p3.take(1500)}")
    assert(!p3.contains("CartesianProduct"))
    val p8 = executed(SparkEntry.queries("q08_3way_join")(spark, dir))
    assert(p8.contains("BroadcastHashJoin"))
    assert(!p8.contains("CartesianProduct"))
  }

  test("dedup pipelines: keyed joins only — never a cartesian product") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pMh = executed(graft.ops.Dedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.5))
    assert(!pMh.contains("CartesianProduct"), "minhash LSH degenerated to all-pairs")
    val pSh = executed(graft.ops.Dedup.simhashPairs(docs, "text", "doc_id"))
    assert(!pSh.contains("CartesianProduct"), "simhash blocking degenerated to all-pairs")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pNd = executed(graft.ops.Dedup.embeddingNearDupPairs(emb, "embedding", "vec_id",
      threshold = 0.9, planes = 8, probes = 2))
    assert(!pNd.contains("CartesianProduct"), "embedding LSH degenerated to all-pairs")
  }

  test("incremental dedup: keyed index joins only; pii scrub is a pure projection") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isBatch = graft.ops.Sampling.md5Bucket(col("doc_id"), 5) === 0
    val corpus = docs.where(!isBatch)
    val idx = graft.ops.Dedup.minhashIndex(corpus, "text", "doc_id")
    val p = executed(graft.ops.Dedup.dedupAgainstIndex(docs.where(isBatch), "text", "doc_id",
      idx, corpus, "text", "doc_id", threshold = 0.5))
    assert(!p.contains("CartesianProduct"), "incremental dedup degenerated to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "incremental dedup lost its keyed joins")
    // scrubPii: one codegen'd projection, zero exchange
    val scrub = graft.ops.TextOps.scrubPii(docs, "text", "doc_id")
    val ps = executed(scrub)
    assert(!ps.contains("Exchange"), s"pii scrub must not shuffle:\n$ps")
    assert(ps.contains("*("), s"pii scrub not codegen'd:\n$ps")
  }

  test("IVF centroid assignment is a pure projection: no exchange, no window") {
    // round-2 finding: assignment exploded corpus x centroids and ranked
    // with Window.partitionBy(id) — an n x NC shuffle per Lloyd iteration.
    // The broadcast-argmax kernel must keep assignment shuffle-free.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val cents = graft.ops.Ann.centroids(emb, 8, lloydIters = 0)
    val assigned = graft.ops.Ann.buildIvfIndexWith(emb, cents)
    val plan = executed(assigned)
    assert(!plan.contains("Window"), s"assignment ranks with a window again:\n$plan")
    assert(!plan.contains("Exchange"), s"assignment shuffles the corpus:\n$plan")
    assert(plan.contains("nearest_centroids"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("nearest_centroids") && l.trim.startsWith("*(")),
      s"argmax kernel fell out of codegen:\n$plan")
  }

  test("native hash kernels run inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(graft.ops.Dedup.minhashSignature("text", 64, 5).as("sig"),
      graft.ops.Dedup.simhash("text").as("sh"))
    val plan = executed(q)
    // the kernel projection prints inside a "*(n)" codegen span — the SQL
    // higher-order-function forms they replaced never codegen
    assert(plan.contains("minhash_signature") && plan.contains("simhash64"), plan)
    assert(plan.linesIterator.exists(l =>
      l.contains("minhash_signature") && l.trim.startsWith("*(")),
      s"minhash kernel projection fell out of codegen:\n$plan")
  }

  test("sampling is a zero-shuffle projection; vocab top-k is partial-agg + TakeOrdered") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pS = executed(graft.ops.Sampling.split(docs.select("doc_id"), "doc_id"))
    assert(!pS.contains("Exchange"), s"split membership must not shuffle:\n$pS")
    assert(pS.contains("*("), s"split projection fell out of codegen:\n$pS")

    val toks = docs.select(split(col("text"), " ").as("tokens"))
    val pV = executed(graft.ops.TextOps.vocabTopK(toks, "tokens", 10))
    assert(pV.contains("TakeOrderedAndProject"),
      s"top-k must not globally sort:\n$pV")
    // map-side partial aggregation before the exchange
    assert(pV.indexOf("HashAggregate") != pV.lastIndexOf("HashAggregate"),
      s"vocab count lacks partial aggregation:\n$pV")
  }

  test("per-group quota runs as a map-side WindowGroupLimit, not a full sort") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = executed(graft.ops.Sampling.perGroupQuota(
      docs, "source", 10, col("n_chars").desc, col("doc_id")))
    // InferWindowGroupLimit must rewrite the rank filter into bounded
    // per-group top-N heaps on BOTH sides of the exchange — without it a
    // 10⁹-row hot domain ships and sorts all its rows for 10 survivors
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter not rewritten to WindowGroupLimit:\n$plan")
    assert(plan.indexOf("WindowGroupLimit") != plan.lastIndexOf("WindowGroupLimit"),
      s"missing map-side (partial) WindowGroupLimit before the exchange:\n$plan")
  }

  test("budget selection prunes partitions past the budget: pass 2 reads only the prefix") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, 100L)).toDF("doc_id", "n_tok")
    // budget = 2.5% of total: with 16 range partitions only the first
    // should produce rows, and skipped partitions exit without scanning
    val sel = graft.ops.Sampling.takeUntilBudget(df, "n_tok", 10000L,
      Seq(col("doc_id")), partitions = 16)
    assert(sel.count() == 100)
    val nonEmpty = sel.groupBy(spark_partition_id()).count().count()
    assert(nonEmpty == 1, s"budget prefix should live in one range partition, got $nonEmpty")
  }

  test("decontamination broadcasts the benchmark gram set — corpus side never shuffles pre-count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = executed(graft.ops.TextOps.contaminationHits(
      docs.where(col("doc_id") % 50 =!= 0), "text", "doc_id",
      docs.where(col("doc_id") % 50 === 0), "text", n = 4))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set not broadcast:\n$plan")
    // the only exchanges allowed: broadcast of the bench side + the final
    // per-doc count aggregation — the exploded corpus must not sort-merge
    assert(!plan.contains("SortMergeJoin"),
      s"corpus grams shuffled into a sort-merge join:\n$plan")
  }

  test("token aggregation over the table scan stays inside codegen") {
    val q = table.scan(spark)
      .select(sum(expr("aggregate(tokens, 0L, (a, x) -> a + x)")).as("s"))
    val plan = executed(q)
    assert(plan.contains("*(") && plan.contains("HashAggregate"),
      s"token aggregate fell out of codegen:\n$plan")
    // partial aggregation before the exchange (map-side combine)
    assert(plan.indexOf("HashAggregate") >= 0 &&
      plan.indexOf("HashAggregate") != plan.lastIndexOf("HashAggregate"),
      "no partial aggregation stage")
  }

  test("DV'd snapshot: only grazed files pay the filter; pushdown reaches both branches") {
    val root = tmpDir("plan-dv")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    // two disjoint-range appends so the MOR delete grazes only batch 1
    t.append(TokenGen.generate(spark, 500, numFiles = 2))
    t.append(TokenGen.generate(spark, 500, idStart = 90000L, numFiles = 2))
    graft.maintain.DeleteWhere.deleteMor(spark, t,
      col("doc_id") < "doc-000000000100")
    assert(t.state.liveSegments.count(_.dvPath.isDefined) > 0)
    assert(t.state.liveSegments.count(_.dvPath.isEmpty) > 0)

    val q = t.scan(spark).where(col("n_tok") > 500).select("doc_id", "n_tok")
    val plan = executed(q)
    assert(plan.contains("Union"), s"DV'd snapshot must plan a two-branch union:\n$plan")
    // the user predicate pushes into BOTH parquet scans
    assert("GreaterThan\\(n_tok,500\\)".r.findAllIn(plan).size >= 2,
      s"pushdown did not reach both union branches:\n$plan")
    // exactly one branch's SCAN evaluates the DV filter; the clean branch
    // reads without _metadata columns or the lookup call
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 2, s"expected two parquet scans:\n$plan")
    assert(scans.count(_.contains("dv_deleted")) == 1,
      s"DV filter must reach exactly one branch's scan:\n$plan")
    assert(scans.count(_.contains("_tmp_metadata_row_index")) == 1,
      s"clean branch must not materialize _metadata:\n$plan")
  }

  test("MOR merge matched-pass: keyed join on the merge key, never NLJ/cartesian") {
    val root = tmpDir("plan-mor")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 800, numFiles = 2))
    val upd = TokenGen.generate(spark, 50, idStart = 100L).withColumn("source", lit("rev"))
    graft.maintain.MergeInto.mergeMor(spark, t, upd)
    // audit the equivalent matched-pass plan shape (the operator's join)
    val keysDf = upd.select("doc_id")
    val raw = spark.read.parquet(t.state.liveSegments.map(s => s"$root/${s.path}"): _*)
    val probe = raw.select(col("_metadata.file_path").as("__f"),
        col("_metadata.row_index").as("__i"), col("doc_id"))
      .join(keysDf.withColumn("__hit", lit(true)), Seq("doc_id"), "left")
    val plan = executed(probe)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"matched pass must stay keyed:\n$plan")
    assert(plan.contains("Join"), s"expected a keyed join:\n$plan")
    // the real operator's effects: one commit, bytes untouched, DVs present
    assert(t.state.liveSegments.exists(_.dvPath.isDefined))
  }

  test("snapshot diff: fast path plans no join; general path joins keyed (no NLJ)") {
    val root = tmpDir("plan-diff")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 400, numFiles = 2))
    val v1 = t.version
    t.append(TokenGen.generate(spark, 100, idStart = 90000L, numFiles = 1))
    val fast = graft.maintain.SnapshotDiff.diff(spark, t, v1, t.version, "doc_id")
    val fastPlan = executed(fast)
    assert(!fastPlan.toLowerCase.contains("join"),
      s"append-only diff must read only the added files:\n$fastPlan")

    graft.maintain.DeleteWhere.delete(spark, t, col("n_tok") < 300)
    val gen = graft.maintain.SnapshotDiff.diff(spark, t, v1, t.version, "doc_id")
    val genPlan = executed(gen)
    assert(genPlan.contains("Join") || genPlan.contains("join"), "general path must join")
    assert(!genPlan.contains("BroadcastNestedLoopJoin") && !genPlan.contains("CartesianProduct"),
      s"diff join must stay keyed:\n$genPlan")
  }
}
