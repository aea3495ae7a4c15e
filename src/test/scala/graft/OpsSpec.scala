package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Training-pipeline operators tested on planted fixtures: known
  * duplicates must be found, known non-duplicates must not, and the
  * approximate paths (LSH, IVF) are measured against their exact
  * counterparts. */
class OpsSpec extends SparkFunSuite {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup keeps min id per key") {
    val d = docs((1L, "aaa"), (5L, "aaa"), (3L, "bbb"), (2L, "aaa"))
    val out = Dedup.exact(d, "text", "doc_id").orderBy("text").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("aaa", 1L), ("bbb", 3L)))
  }

  test("minhash LSH finds planted near-duplicates, not unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill every afternoon"
    val nearDup = base.replace("warm", "cold") // one-word edit
    val unrelated = "completely different content about spark catalyst optimizer rules and parquet row group statistics pruning"
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base)) // 4 = exact dup of 1
    val pairs = Dedup.minhashLshPairs(d, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must be found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), "near dup must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("simhash: identical texts have distance 0; near-dups within threshold") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the windowsill"
    val d = docs((1L, base), (2L, base), (3L, base.replace("lazy", "busy")))
    val pairs = Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 10)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 0L)
    assert(m.get((1L, 3L)).exists(_ <= 10L))
  }

  test("native kernels match the SQL reference forms bit-for-bit") {
    // edge cases the byte-walk must get right: empty, whitespace-only,
    // leading/trailing separators (Java split keeps the empty tokens),
    // text shorter than the shingle, multi-byte UTF-8 codepoints, tabs/
    // newlines, plus a realistic paragraph
    val texts = Seq(
      "", " ", "   ", "a", "ab", "a b", " lead", "trail ", "\tt\nab\fc\rd ",
      "héllo wörld élan naïve – ünïcode ✓ 😀 text",
      "the quick brown fox jumps over the lazy dog 0123456789",
      ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 8).trim)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = d.select(
      Dedup.minhashSignature("text", 64, 5).as("nat_mh"),
      Dedup.minhashSignatureSql("text", 64, 5).as("sql_mh"),
      Dedup.simhash("text").as("nat_sh"),
      Dedup.simhashSql("text").as("sql_sh")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash kernel diverged from SQL form")
      assert(r.getLong(2) == r.getLong(3), "simhash kernel diverged from SQL form")
    }
    // shingle-hash kernel: same distinct set as xxhash64 over the SQL
    // shingle array (order-insensitive)
    import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}
    d.select(
        sort_array(ofExpr(graft.functions.ShingleHashes(toExpr(col("text")), 4))).as("nat"),
        sort_array(array_distinct(transform(
          array_distinct(Dedup.shingles(col("text"), 4)), s => xxhash64(s)))).as("sql"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), "shingle-hash kernel diverged")
      }
    // and on generated corpus text (short docs: the SQL reference form is
    // the interpreted slow path — that's why the kernel exists)
    val gen = graft.data.TokenGen.generate(spark, 60, lenSpread = 40)
      .select(concat_ws(" ", col("doc_id"), col("source"),
        expr("array_join(transform(tokens, t -> CAST(t AS STRING)), ' ')")).as("text"))
    val diff = gen.select(
        Dedup.minhashSignature("text", 64, 5).as("a"),
        Dedup.minhashSignatureSql("text", 64, 5).as("b"),
        Dedup.simhash("text").as("c"),
        Dedup.simhashSql("text").as("d"))
      .where(col("a") =!= col("b") || col("c") =!= col("d"))
    assert(diff.count() == 0)
  }

  test("text-stats kernel matches the SQL forms: counts, subwords, stopwords, langid") {
    val texts = Seq(
      "", " ", "   ", "a", "The and OF", " the\tand\n", "für die das und",
      "el la y es con para", "abcdefghij klm n", "trail ", "\t lead",
      "the quick brown fox the lazy dog the end",
      "naïve café déjà-vu — ünïcode ✓ the", "1 22 333 4444 55555 666666")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = d.select(
      TextOps.tokenCount(col("text")).as("tc_n"),
      TextOps.tokenCountSql(col("text")).as("tc_s"),
      TextOps.subwordCountEstimate(col("text")).as("sw_n"),
      TextOps.subwordCountEstimateSql(col("text")).as("sw_s"),
      TextOps.stopwordHits(col("text"), Stopwords.en).as("en_n"),
      TextOps.stopwordHitsSql(col("text"), Stopwords.en).as("en_s"),
      TextOps.langId(col("text")).as("li_n"),
      TextOps.langIdSql(col("text")).as("li_s")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"tokenCount diverged: $r")
      assert(r.getInt(2) == r.getInt(3), s"subword diverged: $r")
      assert(r.getInt(4) == r.getInt(5), s"stopword hits diverged: $r")
      assert(r.getString(6) == r.getString(7), s"langId diverged: $r")
    }
    // corpus sweep on real documents
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextOps.tokenCount(col("text")).as("a"), TextOps.tokenCountSql(col("text")).as("b"),
        TextOps.subwordCountEstimate(col("text")).as("c"), TextOps.subwordCountEstimateSql(col("text")).as("d"),
        TextOps.langId(col("text")).as("e"), TextOps.langIdSql(col("text")).as("f"))
      .where(col("a") =!= col("b") || col("c") =!= col("d") || col("e") =!= col("f"))
    assert(diff.count() == 0)
  }

  test("vector kernels (dot product, probe blocks) match SQL forms bit-for-bit") {
    import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
      .limit(40)
    val cos = emb.as("x").crossJoin(emb.as("y"))
      .where(col("x.id") < col("y.id")).limit(250)
      .select(Dedup.cosine(col("x.v"), col("y.v")).as("nat"),
        Dedup.cosineSql(col("x.v"), col("y.v")).as("sql"))
      .collect()
    assert(cos.nonEmpty)
    cos.foreach(r => assert(r.getDouble(0) == r.getDouble(1), "cosine kernel diverged"))
    val blocks = emb
      .select(ofExpr(graft.functions.ProbeBlocks(toExpr(col("v")), 12, 3)).as("nat"),
        Dedup.probeBlocksSql(12, 3).as("sql"))
      .collect()
    blocks.foreach(r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "probe-block kernel diverged"))
  }

  test("kernels are SQL-registered: graft functions callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash64('the quick fox') AS sh,
        |  minhash_signature('the quick fox', 5, 16) AS mh,
        |  shingle_hashes('abcdef', 4) AS sg,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  probe_blocks(array(0.5D, -0.25D), 8, 2) AS pb""".stripMargin).collect()(0)
    // values must equal the Scala-API columns
    val want = Seq("the quick fox").toDF("t").select(
      Dedup.simhash("t").as("sh"),
      Dedup.minhashSignature("t", 16, 5).as("mh")).collect()(0)
    assert(r.getLong(0) == want.getLong(0))
    assert(r.getSeq[Long](1) == want.getSeq[Long](1))
    assert(r.getSeq[Long](2).nonEmpty && r.getDouble(3) == 11.0)
    assert(r.getSeq[Long](4).length == 2)
    // arity errors are caught with usage text
    val e = intercept[Exception](spark.sql("SELECT simhash64('a', 'b')").collect())
    assert(e.getMessage.contains("simhash64"))
  }

  test("ngram jaccard: exact math on a tiny fixture") {
    // "abcd" vs "bcde": 3-shingles {abc,bcd} vs {bcd,cde} -> J = 1/3
    val d = docs((1L, "abcd"), (2L, "bcde"))
    val out = Dedup.ngramJaccardPairs(d, "text", "doc_id", shingleSize = 3, threshold = 0.0)
      .select("jaccard").as[Double].collect()
    assert(out.length == 1 && math.abs(out(0) - 1.0 / 3.0) < 1e-9)
  }

  test("embedding near-dup: planted duplicate vector found; LSH blocking agrees with exhaustive") {
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.999, 0.04, 0.0, 0.0)),  // near-dup of 1
      (3L, Array(0.0, 1.0, 0.0, 0.0)),     // orthogonal
      (4L, Array(1.0, 0.0, 0.0, 0.0)))     // exact dup of 1
      .toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(vecs, "embedding", "vec_id",
      threshold = 0.95, exhaustive = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val blocked = Dedup.embeddingNearDupPairs(vecs, "embedding", "vec_id",
      threshold = 0.95, planes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact))
    assert(blocked.contains((1L, 4L)), "exact dup always lands in the same LSH block")
  }

  test("embedding LSH pair discovery is id-numbering independent (symmetric probes)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      import spark.implicits._
      Dedup.embeddingNearDupPairs(df, "embedding", "vec_id",
        threshold = 0.2, planes = 8, probes = 2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    val direct = pairsOf(emb)
    // renumber ids in reverse order: blocking must find the SAME pairs
    val renum = pairsOf(emb.withColumn("vec_id", lit(10000000L) - col("vec_id")))
      .map { case (a, b) =>
        val (x, y) = (10000000L - a, 10000000L - b)
        (math.min(x, y), math.max(x, y))
      }
    assert(direct == renum,
      s"id-order-dependent recall: only-direct=${(direct -- renum).take(5)} only-renum=${(renum -- direct).take(5)}")
  }

  test("simhash rejects blocks=1 (mask wraps, blocking degenerates)") {
    val d = docs((1L, "a b c"))
    intercept[IllegalArgumentException](Dedup.simhashPairs(d, "text", "doc_id", blocks = 1))
  }

  test("md5-simhash pairs equal quadratic all-pairs Hamming (lossless blocking)") {
    import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // ground truth: collect every doc's md5-simhash, brute-force all pairs
    val hashes = d.select(col("doc_id"),
        ofExpr(graft.functions.SimHashMd5(toExpr(col("text")))).as("sh"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (ia, ha) <- hashes.iterator
      (ib, hb) <- hashes.iterator
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    val got = Dedup.simhashPairsMd5(d, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == expected, s"block-combination candidates lost pairs: " +
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("IntersectCount kernel matches size(array_intersect) on shingle sets") {
    import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val sh = d.select(col("doc_id"),
      ofExpr(graft.functions.ShingleHashes(toExpr(col("text")), 5)).as("sh"))
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .select(
        ofExpr(graft.functions.IntersectCount(toExpr(col("a.sh")), toExpr(col("b.sh")))).as("k"),
        size(array_intersect(col("a.sh"), col("b.sh"))).as("ref"))
    assert(pairs.where(col("k") =!= col("ref")).count() == 0)
    assert(pairs.where(col("k") > 0).count() > 0, "fixture should overlap somewhere")
  }

  test("verified minhash pairs carry the EXACT shingle-set jaccard") {
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill every afternoon"
    val nearDup = base.replace("warm", "cold")
    val unrelated = "completely different content about spark catalyst optimizer rules and parquet row group statistics pruning"
    val d = docs((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
    val out = Dedup.minhashLshPairsVerified(d, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(out.get((1L, 4L)).contains(1.0), s"exact dup must verify at jaccard 1.0: $out")
    assert(out.contains((1L, 2L)) && out((1L, 2L)) < 1.0 && out((1L, 2L)) >= 0.5)
    assert(!out.keys.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
    // the emitted jaccard IS the exact set jaccard (recompute one pair)
    def shingles(t: String) = (0 to math.max(t.length - 5, 0)).map(i =>
      t.substring(i, math.min(i + 5, t.length))).toSet
    val (sa, sb) = (shingles(base), shingles(nearDup))
    val exact = (sa intersect sb).size.toDouble / (sa union sb).size
    assert(math.abs(out((1L, 2L)) - exact) < 1e-9,
      s"emitted ${out((1L, 2L))} != exact set jaccard $exact")
  }

  test("zero-norm vectors and centroids score -2, never capture via NaN") {
    // round-2 ADVICE: 0/0 = NaN sorted FIRST under desc, so a degenerate
    // all-zero centroid silently swallowed every vector
    val vecs = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(0.0, 0.0))).toDF("vec_id", "embedding")
    val cents = Seq((1, Seq(0.0, 0.0)), (2, Seq(0.0, 1.0))).toDF("centroid_id", "centroid")
    val assigned = Ann.buildIvfIndexWith(vecs, cents)
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(assigned(1L) == 2, s"zero centroid captured a normal vector: $assigned")
    assert(assigned(2L) == 1, "all scores tied at -2 must break to smallest id")
  }

  test("IVF at full probe equals brute-force exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") % 100 =!= 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("vec_id"), col("rank")).as[(Long, Long, Int)].collect().toSet
    val exact = key(Ann.bruteForceTopK(corpus, qs, 5))
    val full = key(Ann.ivfTopK(corpus, qs, 5, numCentroids = 8, nProbe = 8))
    assert(full == exact && exact.nonEmpty,
      "full-probe IVF must be mathematically identical to brute force")
  }

  test("IVF recall on a clusterable corpus (the workload IVF is for)") {
    // 16 well-separated clusters in 16 dims: center c = one-hot(c) scaled,
    // plus small deterministic noise — neighbors share a cluster, so
    // probing the home list finds them. Random/unstructured corpora are
    // the IVF worst case (recall ~nProbe/NC by construction); this fixture
    // evidences the operator on the data shape it exists for.
    val n = 2000
    val rows = (0 until n).map { i =>
      val c = i % 16
      val v = (0 until 16).map { d =>
        val noise = (((i.toLong * 31 + d * 7) % 101) - 50) / 250.0
        (if (d == c) 4.0 else 0.0) + noise
      }
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") % 100 =!= 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    val exact = key(Ann.bruteForceTopK(corpus, qs, 10))
    val approx = key(Ann.ivfTopK(corpus, qs, 10, numCentroids = 16, nProbe = 2, lloydIters = 4))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall on clusterable data too low: $recall")
  }

  test("IVF ANN recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") % 100 =!= 0)
    val exact = Ann.bruteForceTopK(corpus, qs, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfTopK(corpus, qs, 10, numCentroids = 8, nProbe = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall") // 4/8 lists probed
  }

  test("redundant assignment lifts partial-probe recall on unstructured embeddings") {
    // random/unstructured embeddings are the IVF worst case (single
    // assignment caps recall near nProbe/NC); storing each vector in its
    // `assign` nearest lists — the published ScaNN/SOAR & FAISS
    // multi-assignment lever — recovers it at assign× index size with the
    // SAME probe join shape. Measured here: 0.80 → 0.92 (assign 2) → 1.0
    // (assign 3) at nProbe 4 of 8 on the sf0.001 embeddings.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") % 100 =!= 0)
    val exact = Ann.bruteForceTopK(corpus, qs, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val r2 = Ann.ivfTopK(corpus, qs, 10, numCentroids = 8, nProbe = 4, assign = 2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall2 = (exact intersect r2).size.toDouble / exact.size
    assert(recall2 >= 0.85, s"assign=2 recall too low: $recall2")
    val r3 = Ann.ivfTopK(corpus, qs, 10, numCentroids = 8, nProbe = 4, assign = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall3 = (exact intersect r3).size.toDouble / exact.size
    assert(recall3 >= 0.95, s"assign=3 recall too low: $recall3")
    // replication must never surface duplicate (query, vector) ranks
    val ranked = Ann.ivfTopK(corpus, qs, 10, numCentroids = 8, nProbe = 4, assign = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(ranked.length == ranked.toSet.size, "duplicate candidates leaked through dedup")
    // and the replicated index really is assign× the corpus
    val idx = Ann.buildIvfIndex(corpus, numCentroids = 8, assign = 2)
    assert(idx.count() == 2 * corpus.count(), "assign=2 index must hold each vector twice")
  }

  test("IVF-PQ: codes cut index bytes >4x; ADC + exact re-rank keeps recall >= 0.9 at assign=2") {
    // the clusterable fixture from the IVF recall test: 16 separated
    // clusters in 16 dims — the workload the index family exists for
    val n = 2000
    val rows = (0 until n).map { i =>
      val c = i % 16
      val v = (0 until 16).map { d =>
        val noise = (((i.toLong * 31 + d * 7) % 101) - 50) / 250.0
        (if (d == c) 4.0 else 0.0) + noise
      }
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val qs = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val corpus = emb.where(col("vec_id") % 100 =!= 0)

    val cents = Ann.centroids(corpus, 16, lloydIters = 4)
    val index = Ann.buildIvfIndexWith(corpus, cents, assign = 2)
    // residual encoding (train + encode on v − coarse centroid) is what
    // preserves WITHIN-list discrimination at 4 bits/subspace
    val resid = Ann.withResiduals(index, cents)
    val model = Ann.trainPq(resid, m = 8, ksub = 16, vecCol = "resid")
    val pqIndex = Ann.encodePq(resid, model)

    // recall vs exact brute force, PQ codes + exact re-rank, redundant assignment
    val exact = Ann.bruteForceTopK(corpus, qs, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Ann.ivfPqTopK(pqIndex, cents, model, corpus, qs, 10,
      nProbe = 2, dedup = true)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF-PQ recall too low: $recall")
    // replication must never surface duplicate ranks
    val ranked = Ann.ivfPqTopK(pqIndex, cents, model, corpus, qs, 10, nProbe = 2, dedup = true)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    assert(ranked.length == ranked.toSet.size, "duplicate candidates leaked through dedup")

    // the storage claim, measured on parquet bytes — on the REAL
    // embeddings table (the synthetic fixture's arithmetic noise is so
    // dictionary-compressible that its full vectors occupy almost nothing;
    // entropy-rich floats are the honest case): the PQ index must be
    // under 1/4 of the full-vector index
    def dirBytes(p: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .filter(_.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size(_)).sum
      } finally s.close()
    }
    val realEmb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val rCents = Ann.centroids(realEmb, 8, lloydIters = 2)
    val rIndex = Ann.buildIvfIndexWith(realEmb, rCents, assign = 2)
    val rResid = Ann.withResiduals(rIndex, rCents)
    val rModel = Ann.trainPq(rResid, m = 8, ksub = 16, vecCol = "resid")
    val rPq = Ann.encodePq(rResid, rModel)
    val fullDir = tmpDir("ivf-full"); val pqDir = tmpDir("ivf-pq")
    rIndex.coalesce(1).write.mode("overwrite").parquet(fullDir)
    rPq.coalesce(1).write.mode("overwrite").parquet(pqDir)
    val (fb, pb) = (dirBytes(fullDir), dirBytes(pqDir))
    assert(pb.toDouble / fb < 0.25,
      f"PQ index not small enough: $pb bytes vs $fb (${pb.toDouble / fb}%.3f)")
  }

  test("stored IVF index: probes read only their centroid partitions; results match in-memory") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val vectors = emb.where(col("vec_id") % 100 =!= 0)
    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val cents = Ann.centroids(vectors, 8)
    val index = Ann.buildIvfIndexWith(vectors, cents) // ONE quantizer for build + probe
    val idxDir = tmpDir("ivf-stored")
    index.write.mode("overwrite").partitionBy("centroid_id").parquet(idxDir)
    val stored = spark.read.parquet(idxDir)

    // the documented 100 TB path: a probe into 2 of 8 lists must scan only
    // those partitions (Spark partition pruning on the directory layout)
    val probe = stored.where(col("centroid_id").isin(1, 2))
    probe.collect()
    val filesRead = probe.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles").map(_.value)).sum
    val totalFiles = spark.read.parquet(idxDir).inputFiles.length
    assert(filesRead < totalFiles, s"probe read $filesRead of $totalFiles files — no partition pruning")

    // end-to-end equality: top-k over the STORED index == in-memory index
    import spark.implicits._
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("q_id"), col("vec_id"), col("rank")).as[(Long, Long, Int)].collect().toSet
    val mem = key(Ann.ivfTopKWithIndex(index, cents, queries, 5, nProbe = 3))
    val disk = key(Ann.ivfTopKWithIndex(stored, cents, queries, 5, nProbe = 3))
    assert(mem == disk && mem.nonEmpty)
  }

  test("sequence packing: two-pass scalable prefix sum equals the window form") {
    // skewed fixture: one hot group holding 80% of rows, forced across
    // MANY range partitions — the case where Window.partitionBy would
    // serialize through one task and the two-pass path must not
    val rows = (0 until 2000).map { i =>
      val g = if (i % 5 != 0) "hot" else s"cold${i % 7}"
      (g, f"id-$i%06d", 64 + (i * 31) % 1985)
    }
    import spark.implicits._
    val df = rows.toDF("source", "doc_id", "n_tok").repartition(13)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select(col("source"), col("doc_id"), col("stream_pos"), col("seq_id"))
        .as[(String, String, Long, Long)].collect().toSet
    val window = key(Packing.packStream(df, "source", "doc_id", "n_tok", 2048))
    val scalable = key(Packing.packStreamScalable(df, "source", "doc_id", "n_tok", 2048,
      partitions = 16))
    assert(scalable == window, s"two-pass prefix sum diverged: " +
      s"missing=${(window -- scalable).take(3)} extra=${(scalable -- window).take(3)}")
    // hot group genuinely spans several range partitions in the fixture
    val hotParts = df.where(col("source") === "hot")
      .repartitionByRange(16, col("source"), col("doc_id"))
      .select(spark_partition_id()).distinct().count()
    assert(hotParts > 1, "fixture failed to spread the hot group")
    // packing semantics: stream positions are dense per group
    val hot = Packing.packStream(df, "source", "doc_id", "n_tok", 2048)
      .where(col("source") === "hot").orderBy("doc_id")
      .select(col("stream_pos"), col("n_tok")).as[(Long, Int)].collect()
    hot.sliding(2).foreach { case Array((p1, n1), (p2, _)) => assert(p1 + n1 == p2); case _ => }
    // schema preservation: a NUMERIC group column keeps its type in the
    // scalable output (round-3 review finding: it was cast to string)
    val intGrouped = rows.map { case (g, id, n) => (g.hashCode % 7, id, n) }
      .toDF("shard", "doc_id", "n_tok")
    val sc = Packing.packStreamScalable(intGrouped, "shard", "doc_id", "n_tok", 2048)
    assert(sc.schema("shard").dataType == org.apache.spark.sql.types.IntegerType)
    assert(sc.schema("n_tok").dataType == org.apache.spark.sql.types.IntegerType)
    val wn = key2(Packing.packStream(intGrouped, "shard", "doc_id", "n_tok", 2048))
    assert(key2(sc) == wn, "int-group scalable packing diverged from window form")
  }

  private def key2(d: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    d.select(col("shard").cast("string"), col("doc_id"), col("stream_pos"), col("seq_id"))
      .as[(String, String, Long, Long)].collect().toSet
  }

  test("deterministic sampling: stable buckets, exact split fractions semantics") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("id")
    val a = Sampling.split(df, "id").groupBy("split").count().as[(String, Long)].collect().toMap
    val b = Sampling.split(df, "id").groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b, "split must be deterministic across evaluations")
    assert(a("train") > 800 && a("train") < 950, s"train fraction off: $a")
    assert(a.values.sum == 1000)
    // buckets in range for both hash families
    val r = df.select(Sampling.hashBucket(col("id"), 100).as("x"),
      Sampling.md5Bucket(col("id"), 100).as("m"))
      .agg(min("x"), max("x"), min("m"), max("m")).head
    assert(r.getInt(0) >= 0 && r.getInt(1) < 100 && r.getInt(2) >= 0 && r.getInt(3) < 100)
  }

  test("connected components: chains, cliques and random graphs match union-find") {
    import spark.implicits._
    def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
    // local union-find reference
    def ref(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    // a 60-node CHAIN: the diameter case where min-label propagation would
    // need 60 rounds; large-star/small-star must converge in O(log²)
    val chain = (0L until 59L).map(i => (i, i + 1))
    assert(cc(chain) == ref(chain))
    assert(cc(chain).values.toSet == Set(0L))
    // disjoint cliques keep separate minima
    val cliques = (for (base <- Seq(100L, 200L); i <- 0 until 4; j <- (i + 1) until 4)
      yield (base + i, base + j))
    assert(cc(cliques) == ref(cliques))
    // seeded random graphs (sparse and denser), reversed orientations,
    // duplicates and self-loops tolerated
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until 300).map(_ => (rnd.nextLong(200).abs, rnd.nextLong(200).abs))
      val clean = edges.filter(e => e._1 != e._2)
      assert(cc(edges) == ref(clean), s"seed $seed diverged from union-find")
    }
    // empty input → empty output
    assert(cc(Nil).isEmpty)
  }

  test("pii scrub: staged redaction with per-stage counts") {
    import spark.implicits._
    val d = docs(
      (1L, "mail me at jane.doe+x@sub.example.org thanks"),
      (2L, "server 192.168.001.42 and backup 10.0.0.7 up"),
      (3L, "call 555-0199 or 555 0200 today"),
      (4L, "combo a@b.io at 1.2.3.4 call 555-1234"),
      (5L, "clean text, no pii at all"),
      (6L, "not-an-ip 1234.5.6.7890 stays")) // >3-digit octets: \b\d{1,3} won't match inside longer runs... verified below
    val out = TextOps.scrubPii(d, "text", "doc_id")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
    assert(out(1L)._1 == ((1L, 0L, 0L)))
    assert(out(1L)._2 == "mail me at [EMAIL] thanks")
    assert(out(2L)._1 == ((0L, 2L, 0L)))
    assert(out(2L)._2 == "server [IP] and backup [IP] up")
    assert(out(3L)._1 == ((0L, 0L, 2L)))
    assert(out(3L)._2 == "call [PHONE] or [PHONE] today")
    assert(out(4L)._1 == ((1L, 1L, 1L)))
    assert(out(4L)._2 == "combo [EMAIL] at [IP] call [PHONE]")
    assert(out(5L)._1 == ((0L, 0L, 0L)))
    assert(out(5L)._2 == "clean text, no pii at all")
    assert(out(6L)._1 == ((0L, 0L, 0L)), "over-long octets must not match")
  }

  test("connected components: binary ids use content equality, min by unsigned lex") {
    import spark.implicits._
    val edges = Seq(
      (Array[Byte](1, 2), Array[Byte](3, 4)),
      (Array[Byte](3, 4), Array[Byte](5, 6)), // same content, fresh arrays
      (Array[Byte](9, 9), Array[Byte](8, 8))).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges, "id_a", "id_b").collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq)).toMap
    val expected = Map(
      Seq[Byte](1, 2) -> Seq[Byte](1, 2), Seq[Byte](3, 4) -> Seq[Byte](1, 2),
      Seq[Byte](5, 6) -> Seq[Byte](1, 2),
      Seq[Byte](8, 8) -> Seq[Byte](8, 8), Seq[Byte](9, 9) -> Seq[Byte](8, 8))
    assert(out == expected, s"binary-id clusters: $out")
  }

  test("incremental dedup: batch vs persisted band index, exact jaccard out") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill every afternoon"
    val nearDup = base.replace("warm", "cold")
    val unrelated = "completely different content about spark catalyst optimizer rules and parquet row group statistics pruning"
    val corpus = docs((1L, base), (3L, unrelated), (5L, base))
    val batch = docs((2L, nearDup), (4L, base),
      (6L, "some totally novel text about nothing in particular with many words"))
    // the index survives a write/read round trip — the incremental
    // workflow's whole point is never recomputing corpus signatures
    val idxPath = tmpDir("mh-index") + "/idx"
    Dedup.minhashIndex(corpus, "text", "doc_id").write.parquet(idxPath)
    val index = spark.read.parquet(idxPath)
    val out = Dedup.dedupAgainstIndex(batch, "text", "doc_id", index,
        corpus, "text", "doc_id", threshold = 0.5)
      .select("id_new", "id_match", "jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(out.get((4L, 1L)).contains(1.0), s"batch->corpus exact dup: $out")
    assert(out.get((4L, 5L)).contains(1.0))
    assert(out.contains((2L, 1L)) && out((2L, 1L)) >= 0.5 && out((2L, 1L)) < 1.0)
    assert(out.contains((2L, 4L)), "within-batch near-dup pair must appear")
    assert(!out.keys.exists(p => Seq(p._1, p._2).exists(i => i == 3L || i == 6L)),
      "unrelated docs must not pair")
  }

  test("connected components: string ids across many partitions (q46 shape)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400)
      .map(_ => (f"doc-${rnd.nextInt(150)}%03d", f"doc-${rnd.nextInt(150)}%03d"))
      .filter(e => e._1 != e._2)
    // repartition(8) forces cross-partition components through the
    // local-contraction pass AND the iterative rounds
    val got = Dedup.connectedComponents(
      edges.toDF("id_a", "id_b").repartition(8), "id_a", "id_b")
      .as[(String, String)].collect().toMap
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(Ordering[String].max(ra, rb)) = Ordering[String].min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got == nodes.map(n => n -> find(n)).toMap)
  }

  test("per-group quota: exactly n survivors per group in order, rank dense") {
    import spark.implicits._
    val df = (0 until 500).map(i => (s"src${i % 7}", i.toLong, (i * 37) % 1000))
      .toDF("source", "doc_id", "sz")
    val q = Sampling.perGroupQuota(df, "source", 5, col("sz").desc, col("doc_id"))
    val got = q.select($"source", $"doc_id", $"rk").as[(String, Long, Long)].collect()
    assert(got.length == 7 * 5)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 5L)) }
    // survivors are the true top-5 per group under the order
    val want = df.as[(String, Long, Int)].collect()
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(5).map(r => (r._1, r._2)) }.toSet
    assert(got.map(r => (r._1, r._2)).toSet == want)
  }

  test("decontamination: distinct-gram overlap counts, exact on a fixture") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the 3-grams "alpha beta gamma", "beta gamma delta" (2 hits)
      (1L, "alpha beta gamma delta zeta"),
      // repeated gram counts ONCE (distinct per doc): 1 hit
      (2L, "alpha beta gamma x alpha beta gamma"),
      (3L, "totally unrelated words here")).toDF("doc_id", "text")
    val hits = TextOps.contaminationHits(corpus, "text", "doc_id", bench, "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 2L, 2L -> 1L))
    // case-insensitive (lowercased tokenization)
    val up = TextOps.contaminationHits(
      Seq((9L, "ALPHA BETA GAMMA")).toDF("doc_id", "text"), "text", "doc_id",
      bench, "text", n = 3).as[(Long, Long)].collect().toMap
    assert(up == Map(9L -> 1L))
  }

  test("repetition stats: duplicate-word fraction and top-word share, exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),        // 5 words, 2 distinct, top 'a' x3
      (2L, "x y z"),            // no repetition
      (3L, "t t")).toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df, "text", "doc_id")
      .as[(Long, Long, Long, Double, String, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 2L, 0.6, "a", 0.6)))
    assert(got(2L) == ((2L, 3L, 3L, 0.0, "x", 0.3333)))
    assert(got(3L) == ((3L, 2L, 1L, 0.5, "t", 1.0)))
  }

  test("token-budget selection equals the window cumulative-sum form") {
    import spark.implicits._
    val rows = (0 until 1200).map(i => (i.toLong, 64L + (i * 31) % 1985))
    val df = rows.toDF("doc_id", "n_tok").repartition(11)
    val total = rows.map(_._2).sum
    for (budget <- Seq(0L, total / 10, total / 2, total, total + 1000)) {
      val got = Sampling.takeUntilBudget(df, "n_tok", budget,
          Seq(col("n_tok").desc, col("doc_id")), partitions = 16)
        .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
      // reference: plain in-memory prefix sum over the same total order
      var cum = 0L
      val want = rows.sortBy(r => (-r._2, r._1)).flatMap { case (id, n) =>
        cum += n; if (cum <= budget) Some(id -> cum) else None
      }.toMap
      assert(got == want, s"budget $budget: ${got.size} vs ${want.size} rows")
    }
    // null weights contribute 0 but rows remain eligible
    val withNull = Seq((1L, java.lang.Long.valueOf(10L)), (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(5L))).toDF("doc_id", "n_tok")
    val sel = Sampling.takeUntilBudget(withNull, "n_tok", 15L, Seq(col("doc_id")))
      .select($"doc_id", $"cum").as[(Long, Long)].collect().toMap
    assert(sel == Map(1L -> 10L, 2L -> 10L, 3L -> 15L))
  }

  test("text ops: token counts, quality, langid, fingerprint invariance") {
    val d = Seq(
      (1L, "The quick brown fox, with the lazy dog!"),
      (2L, "the   quick brown FOX  with the lazy dog"),
      (3L, "der hund und die katze sind mit dem ball im garten"),
      (4L, "")).toDF("doc_id", "text")
    val counts = d.select(col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counts(1L) == 8 && counts(2L) == 8 && counts(4L) == 0)
    // fingerprint: case/punct/whitespace-invariant
    val fps = d.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    // langid: german text detected
    val langs = d.where(length(col("text")) > 0)
      .select(col("doc_id"), TextOps.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(langs(3L) == "de")
    assert(langs(1L) == "en")
  }

  test("portable media: real P6/WAV bytes decode exactly; malformed inputs rejected") {
    import graft.ops.PortableMedia._
    // hand-crafted 2x2 P6 (not produced by our encoder): pixels
    // (10,20,30) (40,50,60) / (70,80,90) (100,110,120)
    val ppm = ("P6\n# c\n2 2\n255\n".getBytes("US-ASCII") ++
      Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120).map(_.toByte))
    val img = decodePpm(ppm)
    assert(img == ImageStats(2, 2, 55.0, 65.0, 75.0))
    // header variants and corruption
    assert(decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII")) == null, "wrong magic accepted")
    assert(decodePpm(ppm.dropRight(1)) == null, "truncated pixels accepted")
    assert(decodePpm("P6\n2 2\n254\n".getBytes("US-ASCII")) == null, "non-255 maxval accepted")

    // hand-crafted WAV: 3 samples [100, -200, 300] @ 8 kHz mono, with an
    // extra chunk before fmt to exercise the chunk walk
    val bb = java.nio.ByteBuffer.allocate(44 + 12 + 6).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 12 + 6).put("WAVE".getBytes)
    bb.put("LIST".getBytes).putInt(4).put("info".getBytes)       // skipped chunk
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(6).putShort(100).putShort(-200).putShort(300)
    val wav = decodeWav(bb.array())
    assert(wav == WavStats(8000, 1, 3, 200.0))
    assert(decodeWav("RIFX".getBytes ++ bb.array().drop(4)) == null, "bad magic accepted")
    // overflow-hostile PPM header (w*h*3 overflows Int) must be rejected
    assert(decodePpm("P6\n50000 50000\n255\n".getBytes("US-ASCII")) == null,
      "overflowing dimensions accepted")
    // stereo is rejected, not mis-decoded as 2x mono samples
    val st = java.nio.ByteBuffer.allocate(44 + 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    st.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
    st.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(8000).putInt(32000).putShort(4).putShort(16)
    st.put("data".getBytes).putInt(4).putShort(1).putShort(2)
    assert(decodeWav(st.array()) == null, "stereo silently decoded as mono")

    // synthesized blobs decode to the closed-form statistics (the same
    // cross-check the q43/q44 oracles perform corpus-wide)
    val id = 7L
    val w = (8 + id % 9).toInt; val h = (8 + (id * 3) % 9).toInt
    val dec = decodePpm(ppmBytes(id, w, h))
    val expMr = (for (y <- 0 until h; x <- 0 until w) yield (id * 31 + x + y) % 256).sum.toDouble / (w * h)
    assert(dec.width == w && dec.height == h && math.abs(dec.mean_r - expMr) < 1e-9)
    val n = (64 + id % 129).toInt
    val wd = decodeWav(wavBytes(id, n, 16000))
    val expMa = (0 until n).map(i => math.abs((id * 7 + i * 13) % 251 - 125)).sum.toDouble / n
    assert(wd.sample_rate == 16000 && wd.n_samples == n && math.abs(wd.mean_abs - expMa) < 1e-9)
  }

  test("imageio codec: PNG round-trips the closed form exactly; JPEG within lossy tolerance") {
    import graft.ops.PortableMedia._
    for (id <- Seq(0L, 7L, 123456L)) {
      val w = (8 + id % 9).toInt; val h = (8 + (id * 3) % 9).toInt
      def mean(f: (Int, Int) => Long): Double =
        (for (y <- 0 until h; x <- 0 until w) yield f(x, y)).sum.toDouble / (w * h)
      val expR = mean((x, y) => (id * 31 + x + y) % 256)
      val expG = mean((x, _) => (id * 37 + x) % 256)
      val expB = mean((_, y) => (id * 41 + y) % 256)

      // PNG is lossless: decoded stats must equal the closed form exactly
      val png = decodeImage(pngBytes(id, w, h))
      assert(png.width == w && png.height == h, s"png dims wrong for id=$id")
      assert(math.abs(png.mean_r - expR) < 1e-9 && math.abs(png.mean_g - expG) < 1e-9 &&
        math.abs(png.mean_b - expB) < 1e-9, s"png stats diverge for id=$id: $png")
      // …and must agree bit-for-bit with the P6 parser on the same pixels
      assert(png == decodePpm(ppmBytes(id, w, h)), "PNG and P6 decoders disagree")

      // JPEG is lossy: dims exact, channel means near the closed form.
      // The synthetic pixels are high-frequency gradients — the hardest
      // case for DCT quantization — so the band is wide but bounded.
      val jpg = decodeImage(jpegBytes(id, w, h))
      assert(jpg.width == w && jpg.height == h, s"jpeg dims wrong for id=$id")
      assert(math.abs(jpg.mean_r - expR) < 32 && math.abs(jpg.mean_g - expG) < 32 &&
        math.abs(jpg.mean_b - expB) < 32, s"jpeg stats too far for id=$id: $jpg vs ($expR,$expG,$expB)")
    }
    // undecodable bytes answer null, never throw
    assert(decodeImage(null) == null)
    assert(decodeImage(Array[Byte](1, 2, 3)) == null)
    assert(decodeImage("P6\n2 2\n255\nxxxxxxxxxxxx".getBytes("US-ASCII")) == null,
      "ImageIO has no PPM reader — must answer null, not throw")
  }

  test("multimodal: blob header round-trips; frames and features deterministic") {
    val d = Seq(7L, 42L, 255L).toDF("doc_id")
    val blobs = Multimodal.synthesizeBlobs(d, "doc_id")
    val meta = Multimodal.decodeMeta(blobs)
      .select("media_id", "meta.width", "meta.height", "meta.payload_bytes", "valid")
      .collect().map(r => r.getString(0) -> (
        r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
        r.getAs[Number](3).longValue, r.getBoolean(4))).toMap
    assert(meta("42") == ((64 + 42 * 31 % 1985, 64 + 42 * 37 % 1985, 128 + 42 * 13 % 1024, true)))
    val feats = Multimodal.extractFeatures(blobs)
      .select("media_id", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    // payload is a constant byte per id -> one histogram bucket is 1.0
    assert(feats("42").count(_ == 1.0f) == 1)
    assert(math.abs(feats("42").sum - 1.0f) < 1e-6)
  }
}
