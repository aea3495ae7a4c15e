package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Ann, Dedup, TextOps}

/** A/B the round-6 `par()` input repartition per affected query, warm,
  * rotated rounds, minima — decides where parallelizing the single-split
  * fixture pays vs where the extra exchange is pure overhead at sf0.1. */
object MicroBench4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("MB_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val s = spark
    def docs = s.read.parquet(s"$sfDir/documents.parquet")
    def emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    def par(df: DataFrame) = df.repartition(s.sparkContext.defaultParallelism)

    def q21(d: DataFrame) =
      Dedup.minhashLshPairsVerified(d, "text", "doc_id", shingleSize = 5, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))
    def q22(d: DataFrame) = Dedup.simhashPairsMd5(d, "text", "doc_id", maxHamming = 3)
    def q24(e: DataFrame) = {
      val sub = e.where(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      Dedup.embeddingNearDupPairs(sub, "embedding", "vec_id", threshold = 0.0,
        exhaustive = true).where(col("cos") >= 0.15)
    }
    def q25(e: DataFrame) = {
      val em = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val qs = em.where(col("vec_id") % 100 === 0).select(col("vec_id").as("q_id"), col("embedding"))
      Ann.bruteForceTopK(em.where(col("vec_id") % 100 =!= 0), qs, 5)
    }
    def q38(d: DataFrame) = {
      val survivors = Dedup.exact(
        d.select(TextOps.fingerprint(col("text")).as("fp"), col("doc_id")),
        "fp", "doc_id").select("doc_id")
      val train = graft.ops.Sampling.split(
          d.join(survivors, "doc_id").where(TextOps.tokenCount(col("text")) >= 20), "doc_id")
        .where(col("split") === "train")
      val tok = train.select(col("doc_id"), col("source"),
        TextOps.subwordCountEstimate(col("text")).cast("long").as("n_tok"))
      graft.ops.Packing.packStream(tok, "source", "doc_id", "n_tok", 2048)
    }

    val variants: Seq[(String, () => Long)] = Seq(
      ("q21 noPar", () => q21(docs).count()),
      ("q21 par", () => q21(par(docs)).count()),
      ("q22 noPar", () => q22(docs).count()),
      ("q22 par", () => q22(par(docs)).count()),
      ("q24 noPar", () => q24(emb).count()),
      ("q24 par", () => q24(par(emb)).count()),
      ("q25 noPar", () => q25(emb).count()),
      ("q25 par", () => q25(par(emb)).count()),
      ("q38 noPar", () => q38(docs).count()),
      ("q38 par", () => q38(par(docs)).count()))

    variants.foreach { case (_, f) => f() } // warm
    System.err.println("[mb4] warm")
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (round <- 0 until 3) {
      val rot = variants.drop(round % variants.size) ++ variants.take(round % variants.size)
      rot.foreach { case (label, f) =>
        val t0 = System.nanoTime(); f()
        mins(label) = math.min(mins.getOrElse(label, Double.MaxValue),
          (System.nanoTime() - t0) / 1e9)
      }
      System.err.println(s"[mb4] round $round")
    }
    variants.foreach { case (k, _) => println(f"$k%-12s min ${mins(k)}%6.2f s") }
    spark.stop()
  }
}
