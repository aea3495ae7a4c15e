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

  /** Deterministic coarse centroids: the `numCentroids` vectors with the
    * smallest id-hash (a k-means seeding stand-in that keeps the whole
    * pipeline reproducible with no iterative training).
    *
    * Plan: orderBy + limit = TakeOrderedAndProject — each partition emits
    * its local top-k and the driver merges k×partitions rows, so the whole
    * corpus is never sorted (the round-1 partitionless Window forced a
    * single-task global sort of every vector). The k seed rows are then
    * numbered on the driver — k is bounded by definition (a coarse
    * quantizer is broadcast to every query anyway). */
  def centroids(vectors: DataFrame, numCentroids: Int,
                vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
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
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Assign each row of `df` to its `n` nearest centroids (broadcast the
    * tiny centroid table, per-row argmax window). */
  private def nearestLists(df: DataFrame, cents: DataFrame, dfId: String,
                           dfVec: String, n: Int): DataFrame = {
    val scored = df.select(col(dfId), col(dfVec).as("__v"))
      .crossJoin(broadcast(cents))
      .select(col(dfId), col("__v"), col("centroid_id"),
        cosine(col("__v"), col("centroid")).as("__cs"))
    val w = Window.partitionBy(dfId).orderBy(col("__cs").desc, col("centroid_id"))
    scored.withColumn("__rk", row_number().over(w)).where(col("__rk") <= n)
      .select(col(dfId), col("__v"), col("centroid_id"))
  }

  /** The IVF "index build": vectors labeled with their nearest centroid.
    * At corpus scale this is built ONCE and persisted as a table
    * (partitioned / bucketed by centroid_id), so query batches touch only
    * the nProbe lists they probe — write it with
    * `buildIvfIndex(v, nc).write.partitionBy("centroid_id").parquet(...)`
    * and Spark's partition pruning turns each probe into a directory read. */
  def buildIvfIndex(vectors: DataFrame, numCentroids: Int = 16,
                    vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cents = centroids(vectors, numCentroids, vecCol, idCol)
    nearestLists(vectors, cents, idCol, vecCol, 1).withColumnRenamed("__v", "v")
  }

  /** IVF top-k over a prebuilt index (columns: idCol, v, centroid_id) and
    * its centroid table: queries probe their `nProbe` nearest lists only —
    * the join key is centroid_id, so with a partitioned index only
    * nProbe/numCentroids of the corpus is read or shuffled. */
  def ivfTopKWithIndex(index: DataFrame, cents: DataFrame, queries: DataFrame, k: Int,
                       nProbe: Int = 4, vecCol: String = "embedding",
                       idCol: String = "vec_id", qIdCol: String = "q_id"): DataFrame = {
    val probes = nearestLists(queries, cents, qIdCol, vecCol, nProbe)
      .withColumnRenamed("__v", "q")
    val scored = index.join(probes, Seq("centroid_id"))
      .select(col(qIdCol), col(idCol), cosine(col("v"), col("q")).as("cos"))
    val w = Window.partitionBy(qIdCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF top-k end to end (index built inline). Recall < 1 by design;
    * measured against bruteForceTopK in tests. */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, k: Int,
              numCentroids: Int = 16, nProbe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id",
              qIdCol: String = "q_id"): DataFrame = {
    val cents = centroids(vectors, numCentroids, vecCol, idCol)
    val index = nearestLists(vectors, cents, idCol, vecCol, 1).withColumnRenamed("__v", "v")
    ivfTopKWithIndex(index, cents, queries, k, nProbe, vecCol, idCol, qIdCol)
  }
}
