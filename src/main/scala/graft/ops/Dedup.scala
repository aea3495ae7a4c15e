package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-rule
  * additions; none exist in the reference). All are declarative
  * DataFrame transforms — shuffles are keyed so Catalyst plans partial
  * aggregation / AQE-balanced joins, and every per-row kernel is a
  * built-in (xxhash64 / transform / aggregate / zip_with), i.e. fully
  * codegen'd — no UDFs anywhere in the hot paths.
  */
object Dedup {

  /** Exact dedup: one surviving row (minimal id) per exact key.
    * ONE hash-aggregate shuffle with map-side partial agg; at 100 TB this
    * is the optimal plan (no window, no sort, no self-join). */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as(idCol))

  /** Character shingles of length n as an array column (codegen'd). */
  def shingles(textCol: Column, n: Int): Column =
    expr(s"transform(sequence(1, greatest(length(${textCol}) - ${n - 1}, 1)), i -> substring(${textCol}, i, $n))")

  /** MinHash signature. Each shingle STRING is hashed once (the expensive
    * step); the k-th hash family is an affine remix of that 64-bit base
    * hash (standard one-hash MinHash construction), so cost is
    * O(shingles + shingles × numHashes-arithmetic) instead of
    * O(shingles × numHashes string hashes) — ~10× cheaper per row, still
    * fully inside whole-stage codegen. */
  def minhashSignature(textCol: String, numHashes: Int, shingleSize: Int): Column =
    expr(
      s"""aggregate(
         |  transform(transform(sequence(1, greatest(length($textCol) - ${shingleSize - 1}, 1)),
         |                      i -> substring($textCol, i, $shingleSize)),
         |            s -> xxhash64(s)),
         |  array_repeat(9223372036854775807L, $numHashes),
         |  (acc, h) -> zip_with(acc, sequence(0, ${numHashes - 1}),
         |                       (m, k) -> least(m, xxhash64(h, k))))""".stripMargin)

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: signature → band hashes → self-join on (band, bandHash)
    * buckets (the only shuffle that touches pairs — candidates only, never
    * the O(n²) cross product) → signature-agreement estimate → threshold.
    * Hot buckets (boilerplate text) are the skew risk at scale: bucket
    * join keys are (bandIdx, bandHash) so AQE skew-join splits them.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
                      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sigs = df.select(col(idCol).as("id"), minhashSignature(textCol, numHashes, shingleSize).as("sig"))
    val banded = sigs.select(
        col("id"), col("sig"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(slice(sig, b * $r + 1, $r), b))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
      // both sides of the self-join reuse this; without persist Spark
      // recomputes every signature (O(shingles × numHashes)) twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / lit(numHashes)).as("est_jaccard"))
      .groupBy("id_a", "id_b").agg(max("est_jaccard").as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens (sign of per-bit weight sums). */
  def simhash(textCol: String): Column =
    expr(
      s"""aggregate(
         |  transform(sequence(0, 63),
         |    b -> IF(aggregate(split($textCol, '\\\\s+'), 0L,
         |              (acc, w) -> acc + IF((shiftright(xxhash64(w), b) & 1) = 1, 1L, -1L)) > 0,
         |            shiftleft(1L, b), 0L)),
         |  0L, (acc, v) -> acc | v)""".stripMargin)

  /** SimHash near-dup pairs: 4×16-bit band blocking, verify by Hamming
    * distance ≤ maxHamming (pigeonhole: distance ≤ 3 ⇒ some 16-bit band
    * equal, so blocking is lossless for maxHamming ≤ 3). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), simhash(textCol).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
        posexplode(expr("transform(sequence(0, 3), b -> (shiftright(sh, b * 16) & 65535))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs via inverted-index join: explode distinct
    * shingles, count co-occurrences per pair, |A∪B| = |A|+|B|−|A∩B|.
    * Cost is Σ bucket², so `maxShingleFreq` drops stop-shingles (the
    * classic scale guard: a shingle in >F docs contributes F² pairs and
    * ~zero discrimination). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 5, threshold: Double = 0.5,
                        maxShingleFreq: Long = 1000L): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
    val inverted = sh.select(col("id"), explode(col("sh")).as("g"))
    val filtered = inverted
      .withColumn("cnt", count("*").over(org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .where(col("cnt") <= maxShingleFreq).drop("cnt")
    val co = filtered.as("x").join(filtered.as("y"), Seq("g"))
      .where(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count("*").as("inter"))
    co.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Cosine similarity of two float-array columns (codegen'd built-ins:
    * zip_with dot product + aggregate norms). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Embedding near-duplicates above a cosine threshold, blocked by
    * random-hyperplane LSH signs (8-bit blocks): only same-block pairs are
    * compared, then verified with exact cosine. Random planes are
    * deterministic (xxhash64-seeded pseudo-gaussians by dimension index).
    * For small/oracle use, `exhaustive = true` skips blocking. */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            threshold: Double = 0.95, planes: Int = 8,
                            exhaustive: Boolean = false): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val withBlock =
      if (exhaustive) base.withColumn("block", lit(0))
      else base.withColumn("block",
        expr(
          s"""aggregate(sequence(0, ${planes - 1}), 0,
             |  (acc, p) -> acc * 2 + IF(
             |     aggregate(zip_with(v, transform(sequence(0, size(v) - 1),
             |                                     i -> CAST(pmod(xxhash64(i, p), 2001) - 1000 AS DOUBLE) / 1000.0D),
             |                         (x, w) -> x * w),
             |               0.0D, (a2, t) -> a2 + t) >= 0, 1, 0))""".stripMargin))
    val a = withBlock.select(col("block"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withBlock.select(col("block"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
