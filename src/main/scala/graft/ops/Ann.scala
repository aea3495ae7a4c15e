package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-rule addition). Two tiers:
  *  - brute-force exact top-k: the correctness baseline, a blocked
  *    cross join + windowed rank — exact but O(n·q);
  *  - IVF (inverted-file) top-k: deterministic coarse centroids, vectors
  *    assigned to their nearest centroid, queries probe the nProbe nearest
  *    lists only — the 100 TB path, because the data-side shuffle is one
  *    groupBy(centroid) and each query touches nProbe/NC of the corpus.
  */
object Ann {

  import Dedup.cosine

  /** Exact top-k by cosine: every (query, vector) pair scored, per-query
    * rank window. Queries are broadcast (they are few); ties broken by
    * vec_id for determinism. */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id",
                     qIdCol: String = "q_id"): DataFrame = {
    val scored = vectors.select(col(idCol), col(vecCol).as("v"))
      .crossJoin(broadcast(queries.select(col(qIdCol), col(vecCol).as("q"))))
      .select(col(qIdCol), col(idCol), cosine(col("v"), col("q")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic coarse centroids: seed with the `numCentroids` vectors
    * of smallest id-hash, then refine with `lloydIters` deterministic
    * Lloyd (k-means) iterations — assign every vector to its nearest
    * centroid (broadcast join, no shuffle of the corpus beyond the
    * groupBy), take the element-wise mean per list, keep the old centroid
    * for any list that went empty. Reproducibility: hash seeding and the
    * fixed iteration count are exact; the means are rounded to 12 decimal
    * digits so the (shuffle-fetch-order-dependent) low bits of the
    * floating-point partial-sum reduction collapse to one value — runs
    * agree unless a vector sits within ~1e-12 of a centroid decision
    * boundary. For strict bit-reproducibility use lloydIters = 0, and to
    * reuse ONE trained quantizer across builds pass the centroids
    * explicitly (buildIvfIndexWith / ivfTopKWithIndex).
    *
    * Seed plan: orderBy + limit = TakeOrderedAndProject — each partition
    * emits its local top-k and the driver merges k×partitions rows, so
    * the whole corpus is never sorted. Each Lloyd iteration is one
    * broadcast-assign + one (centroid, dim)-keyed partial aggregation —
    * at corpus scale run the refinement on a deterministic sample (e.g.
    * `vectors.where(pmod(xxhash64(id), N) === 0)`) and assign the full
    * corpus once with the final centroids. */
  def centroids(vectors: DataFrame, numCentroids: Int,
                vecCol: String = "embedding", idCol: String = "vec_id",
                lloydIters: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    val top = vectors.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(numCentroids)
      .select(col(vecCol).as("centroid"))
    val rows = top.collect().zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(i + 1, r.get(0))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("centroid_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      top.schema.fields.head.copy(name = "centroid")))
    var cents = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

    var it = 0
    while (it < lloydIters) {
      val assigned = nearestLists(vectors.select(col(idCol), col(vecCol)), cents, idCol, vecCol, 1)
      // element-wise mean per list: (centroid, dim)-keyed avg with map-side
      // partial aggregation, reassembled in dim order
      val means = assigned
        .select(col("centroid_id"), posexplode(col("__v")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(round(avg(col("col")), 12).as("m"))
        .groupBy(col("centroid_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("mean"))
      // empty lists keep their previous centroid (standard Lloyd handling)
      cents = cents.as("c").join(means.as("u"), Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("u.mean"), col("c.centroid")).as("centroid"))
      // the quantizer is tiny; materialize so each iteration's plan doesn't
      // stack (and the final broadcast is a local relation)
      val collected = cents.collect().toSeq
      cents = spark.createDataFrame(
        java.util.Arrays.asList(collected.sortBy(_.getInt(0)): _*), cents.schema)
      it += 1
    }
    cents
  }

  /** Assign each row of `df` to its `n` nearest centroids. The centroid
    * table is quantizer-sized (tiny by construction), so it is collected
    * once and compiled into a single codegen'd per-row argmax projection
    * ([[graft.functions.NearestCentroids]]) — zero shuffle, zero
    * crossJoin: the round-2 formulation exploded every vector against
    * every centroid and ranked with Window.partitionBy(id), an n×NC
    * exchange that at 10^10 vectors × 256 centroids is a multi-PB shuffle
    * per Lloyd iteration. Ordering and ties (cosine desc, centroid_id
    * asc) are identical; zero-norm vectors/centroids score −2.0 instead
    * of NaN (which sorted FIRST under desc and let a degenerate centroid
    * swallow the corpus). */
  private def nearestLists(df: DataFrame, cents: DataFrame, dfId: String,
                           dfVec: String, n: Int): DataFrame = {
    import org.apache.spark.sql.graft.Bridge.{ofExpr, toExpr}
    val rows = cents.select(col("centroid_id"), col("centroid")).collect()
      .sortBy(_.getInt(0))
    require(rows.nonEmpty, "empty centroid table")
    // exact-sequence check: head/last alone would accept a duplicate id
    // compensating for a gap (e.g. 1,2,2,4) and silently mis-map matrix
    // indices to centroid ids
    require(rows.iterator.map(_.getInt(0)).sameElements(Iterator.range(1, rows.length + 1)),
      s"centroid_id must be dense 1..${rows.length}, got ${rows.map(_.getInt(0)).mkString(",")}")
    val matrix: Seq[Seq[Double]] = rows.toSeq.map(_.getSeq[Double](1))
    val nearest = ofExpr(graft.functions.NearestCentroids(
      toExpr(col("__v")), matrix, n))
    val base = df.select(col(dfId), col(dfVec).as("__v"))
    if (n == 1)
      base.select(col(dfId), col("__v"), element_at(nearest, 1).as("centroid_id"))
    else
      base.select(col(dfId), col("__v"), explode(nearest).as("centroid_id"))
  }

  /** The IVF "index build": vectors labeled with their nearest centroid.
    * At corpus scale this is built ONCE and persisted as a table
    * (partitioned / bucketed by centroid_id), so query batches touch only
    * the nProbe lists they probe — write it with
    * `buildIvfIndex(v, nc).write.partitionBy("centroid_id").parquet(...)`
    * and Spark's partition pruning turns each probe into a directory read.
    *
    * `assign` > 1 is REDUNDANT (spilled) assignment: every vector is
    * stored in its `assign` nearest lists, the standard recall lever for
    * corpora without clean cluster structure (the published ScaNN/SOAR and
    * FAISS multi-assignment idea): a query that fails to probe a
    * neighbor's first list still finds it through the second/third. Cost
    * is `assign`× index storage and probe-read volume — a documented
    * trade, NOT a new shuffle shape: assignment stays a codegen'd per-row
    * projection (explode over the argmax list) and the probe join is
    * unchanged. Duplicate (query, vector) candidates from replication are
    * deduped before ranking. */
  def buildIvfIndex(vectors: DataFrame, numCentroids: Int = 16,
                    vecCol: String = "embedding", idCol: String = "vec_id",
                    lloydIters: Int = 2, assign: Int = 1): DataFrame =
    buildIvfIndexWith(vectors,
      centroids(vectors, numCentroids, vecCol, idCol, lloydIters), vecCol, idCol, assign)

  /** Index build against a PRE-TRAINED quantizer — the shape to use when
    * the same centroids must serve several builds/query runs verbatim. */
  def buildIvfIndexWith(vectors: DataFrame, cents: DataFrame,
                        vecCol: String = "embedding", idCol: String = "vec_id",
                        assign: Int = 1): DataFrame =
    nearestLists(vectors, cents, idCol, vecCol, assign).withColumnRenamed("__v", "v")

  /** IVF top-k over a prebuilt index (columns: idCol, v, centroid_id) and
    * its centroid table: queries probe their `nProbe` nearest lists only —
    * the join key is centroid_id, so with a partitioned index only
    * nProbe/numCentroids of the corpus is read or shuffled.
    *
    * `dedup` must be true for an index built with `assign` > 1: a vector
    * stored in two probed lists would otherwise occupy two ranks. The
    * dedup is a keyed (query, vector) aggregation — its exchange replaces
    * nothing and feeds the per-query rank window directly. */
  def ivfTopKWithIndex(index: DataFrame, cents: DataFrame, queries: DataFrame, k: Int,
                       nProbe: Int = 4, vecCol: String = "embedding",
                       idCol: String = "vec_id", qIdCol: String = "q_id",
                       dedup: Boolean = false): DataFrame = {
    val probes = nearestLists(queries, cents, qIdCol, vecCol, nProbe)
      .withColumnRenamed("__v", "q")
    val scored0 = index.join(probes, Seq("centroid_id"))
      .select(col(qIdCol), col(idCol), cosine(col("v"), col("q")).as("cos"))
    // duplicate candidate rows are bit-identical (same pair, same kernel),
    // so dropDuplicates is deterministic
    val scored = if (dedup) scored0.dropDuplicates(qIdCol, idCol) else scored0
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ------------------------------------------------------------------ //
  // Product quantization (PQ): the IVF storage lever. At 100 TB the
  // float payload dominates the index; PQ stores an m-byte code per
  // vector instead (plus one tiny shared codebook), cutting probe-read
  // volume ~(8·dim/m)× , and re-ranks ADC survivors with exact vectors.
  // ------------------------------------------------------------------ //

  /** Trained PQ codebooks: `m` contiguous subspaces of `dsub = dim/m`
    * dims, each quantized against `codebooks(j)` (ksub × dsub). The model
    * is quantizer-sized (m·ksub·dsub doubles — KBs), shipped to executors
    * as a nested literal inside codegen'd built-in expressions. */
  final case class PqModel(dim: Int, m: Int, codebooks: Seq[Seq[Seq[Double]]]) {
    def dsub: Int = dim / m
    def ksub: Int = codebooks.head.length
  }

  /** Train per-subspace codebooks with deterministic driver-side Lloyd on
    * a hash-ordered sample (the same bounded-collect plane as the coarse
    * quantizer: `sampleN` rows regardless of corpus size — at 10^10
    * vectors the sample is still 4096 rows; train once, reuse the model).
    * Seeds are the first `ksub` DISTINCT subvectors in hash order, empty
    * clusters keep their previous centroid, ties break to the lower
    * index — fully reproducible. `ksub` = 256 is classic 8-bit PQ;
    * smaller values give coarser codes at the same storage. */
  def trainPq(vectors: DataFrame, m: Int, ksub: Int = 256,
              vecCol: String = "embedding", idCol: String = "vec_id",
              sampleN: Int = 4096, iters: Int = 8): PqModel = {
    val sample = vectors
      .select(col(vecCol).cast("array<double>").as("v"))
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      kmeansL2(subs, ksub, iters)
    }
    PqModel(dim, m, books.map(_.map(_.toSeq).toSeq))
  }

  private def kmeansL2(points: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    points.iterator.takeWhile(_ => seen.size < k).foreach(p => seen += p.toSeq)
    var cents = seen.iterator.map(_.toArray).toArray
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var c = 0
      while (c < cents.length) {
        var d2 = 0.0; var i = 0
        while (i < p.length) { val t = p(i) - cents(c)(i); d2 += t * t; i += 1 }
        if (d2 < bd) { bd = d2; best = c }
        c += 1
      }
      best
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](points.head.length))
      val counts = new Array[Long](cents.length)
      points.foreach { p =>
        val c = nearest(p); counts(c) += 1
        var i = 0; while (i < p.length) { sums(c)(i) += p(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    cents
  }

  /** Residual vectors v − coarse-centroid — the standard IVF-PQ move
    * (FAISS/the original Jégou PQ paper): within a list the coarse
    * centroid is common mode, so quantizing the RESIDUAL spends the whole
    * code budget on what distinguishes neighbors inside a list instead of
    * re-describing the list itself. Train the PQ model on these and
    * encode these; ivfPqTopK adds the q·centroid term back per probe. */
  def withResiduals(index: DataFrame, cents: DataFrame, vecCol: String = "v"): DataFrame =
    index.join(broadcast(cents), Seq("centroid_id"))
      .withColumn("resid",
        zip_with(col(vecCol), col("centroid"), (a, b) => a - b))
      .drop("centroid")

  /** Encode an IVF index's residual payload to PQ codes — a single
    * codegen'd projection (all built-ins, the codebook a nested literal):
    * codes(j) = argmin_c ‖resid[j·dsub..] − codebooks(j)(c)‖². The ORIGINAL
    * vector's norm is kept as one double per row (`vnorm`) because the
    * search metric is cosine: ADC reconstructs q·v, and ranking by q·v
    * instead of q·v/‖v‖ lets norm variation inside a list reorder
    * candidates right out of the survivor buffer (measured on the
    * clusterable fixture: +0.05–0.07 recall at m=8/16, rerank 8). Storage
    * per row falls from dim doubles to m small ints (dictionary/bit-packed
    * by parquet) + one double. */
  def encodePq(index: DataFrame, model: PqModel, vecCol: String = "resid",
               origCol: String = "v"): DataFrame = {
    val dsub = model.dsub
    val cb = typedLit(model.codebooks)
    val codes = transform(cb, (book, j) => {
      val dists = transform(book, cvec =>
        aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0),
          (a, d) => a + pow(element_at(cvec, d + 1) -
            element_at(col(vecCol), j * lit(dsub) + d + 1), 2)))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    index.withColumn("codes", codes)
      .withColumn("vnorm", sqrt(aggregate(col(origCol), lit(0.0), (a, x) => a + x * x)))
      .drop(vecCol, origCol)
  }

  /** IVF-PQ top-k over a RESIDUAL-encoded index (withResiduals →
    * trainPq/encodePq): probe as in ivfTopKWithIndex, score candidates by
    * ADC (asymmetric distance computation — per (query, probe) a lookup
    * table lut(j)(c) = Σ_d q(j·dsub+d)·codebooks(j)(c)(d) is computed once
    * on the probe row, then each candidate costs m table lookups instead
    * of dim multiplies; the probe's q·centroid term restores the common
    * mode the residuals removed), keep the `rerank`·k best per query, and
    * re-rank the survivors EXACTLY by joining back their full vectors (a
    * keyed join that reads only survivor rows). ADC approximates the raw
    * dot product, not cosine — norm variation is what the survivor buffer
    * and the exact re-rank absorb. Set `dedup` for an assign>1 index
    * (a duplicate candidate's two residual codes may differ, so the drop
    * keeps the higher ADC score for determinism). */
  def ivfPqTopK(pqIndex: DataFrame, cents: DataFrame, model: PqModel,
                vectors: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 4,
                rerank: Int = 8, vecCol: String = "embedding", idCol: String = "vec_id",
                qIdCol: String = "q_id", dedup: Boolean = false): DataFrame = {
    val dsub = model.dsub
    val cb = typedLit(model.codebooks)
    val probes = nearestLists(queries, cents, qIdCol, vecCol, nProbe)
      .withColumnRenamed("__v", "q")
    val probesLut = probes
      .withColumn("lut",
        transform(cb, (book, j) => transform(book, cvec =>
          aggregate(sequence(lit(0), lit(dsub - 1)), lit(0.0),
            (a, d) => a + element_at(cvec, d + 1) *
              element_at(col("q"), j * lit(dsub) + d + 1)))))
      .join(broadcast(cents), Seq("centroid_id"))
      .withColumn("qdotc",
        aggregate(zip_with(col("q"), col("centroid"), (a, b) => a * b),
          lit(0.0), (a, x) => a + x))
      .drop("centroid", "q")
    // cosine-consistent ADC: (q·centroid + Σ_j lut(j)(code_j)) / ‖v‖ —
    // ‖q‖ is constant per query so dividing by it cannot change ranks;
    // zero-norm rows score −2 exactly like the cosine kernel
    val adcDot = col("qdotc") + aggregate(
      zip_with(col("codes"), col("lut"), (c, row) => element_at(row, c + 1)),
      lit(0.0), (a, x) => a + x)
    val adc = when(col("vnorm") === 0.0, lit(-2.0)).otherwise(adcDot / col("vnorm"))
    val scored0 = pqIndex.join(probesLut, Seq("centroid_id"))
      .select(col(qIdCol), col(idCol), adc.as("adc"))
    // an assign>1 duplicate's two residual codes differ, so its two ADC
    // scores differ — keep the max (a keyed aggregation, deterministic)
    val scored = if (dedup) scored0.groupBy(qIdCol, idCol).agg(max("adc").as("adc")) else scored0
    val wAdc = Window.partitionBy(qIdCol).orderBy(col("adc").desc, col(idCol))
    val survivors = scored.withColumn("r0", row_number().over(wAdc))
      .where(col("r0") <= k * rerank).drop("r0", "adc")
    val exact = survivors
      .join(vectors.select(col(idCol), col(vecCol).cast("array<double>").as("__exact")), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol), col(vecCol).cast("array<double>").as("q"))), Seq(qIdCol))
      .select(col(qIdCol), col(idCol), cosine(col("__exact"), col("q")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF top-k end to end (index built inline). Recall < 1 by design;
    * measured against bruteForceTopK in tests — `assign` > 1 (redundant
    * assignment) lifts recall on unstructured corpora at `assign`× index
    * size. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 16, nProbe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id",
              qIdCol: String = "q_id", lloydIters: Int = 2, assign: Int = 1): DataFrame = {
    val cents = centroids(vectors, numCentroids, vecCol, idCol, lloydIters)
    val index = nearestLists(vectors, cents, idCol, vecCol, assign).withColumnRenamed("__v", "v")
    ivfTopKWithIndex(index, cents, queries, k, nProbe, vecCol, idCol, qIdCol,
      dedup = assign > 1)
  }
}
