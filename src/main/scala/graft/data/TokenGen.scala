package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator for the target token table (BASELINE.json
  * input_hint): `doc_id: string, tokens: array<int32>, n_tok: int32,
  * source: string`.
  *
  * Everything is a pure function of `doc_id` (FIXTURES.md F1), so
  * byte-equality of token arrays after compaction / Z-order / MERGE is
  * checkable without storing a golden copy:
  *   n_tok     = 64 + pmod(xxhash64(doc_id, "ntok"), lenSpread)
  *   tokens[i] = pmod(xxhash64(doc_id, i), 50257)
  *   source    = Zipf(s≈1.2) over nSources, keyed by pmod(xxhash64(doc_id,"src"), 10^6)
  *
  * Generation is fully codegen'd (spark.range → xxhash64/sequence/transform
  * built-ins; no UDF, no driver loop) — the generator itself scales to any
  * row count across executors.
  */
object TokenGen {

  val NumSources = 20
  val VocabSize  = 50257

  /** Zipf CDF thresholds over [0, 1e6) for source assignment; s=1.2. */
  private def zipfThresholds(n: Int, s: Double): Array[Long] = {
    val weights = (1 to n).map(k => 1.0 / math.pow(k, s))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail
    cum.map(c => math.round(c / total * 1000000L)).toArray
  }

  /** Rows [idStart, idStart+count) of the token table. `lenSpread` bounds
    * n_tok in [64, 64+lenSpread); keep the default 1985 for the canonical
    * [64, 2048] range, or pass a small spread for fast unit tests. */
  def generate(spark: SparkSession, count: Long, idStart: Long = 0L,
               lenSpread: Int = 1985, numFiles: Int = 0): DataFrame = {
    val thresholds = zipfThresholds(NumSources, 1.2)
    // source = first k whose threshold exceeds the uniform hash draw
    val srcExpr = {
      val u = "pmod(xxhash64(doc_id, 'src'), 1000000)"
      val cases = thresholds.zipWithIndex.init.reverse.foldLeft(
        s"'src${"%02d".format(NumSources - 1)}'") { case (acc, (thr, idx)) =>
        s"IF($u < ${thr}L, 'src${"%02d".format(idx)}', $acc)"
      }
      cases
    }
    val base = spark.range(idStart, idStart + count)
      .select(format_string("doc-%012d", col("id")).as("doc_id"))
      .select(
        col("doc_id"),
        expr(s"CAST(64 + pmod(xxhash64(doc_id, 'ntok'), $lenSpread) AS INT)").as("n_tok"),
        expr(srcExpr).as("source"))
      .select(
        col("doc_id"),
        expr(s"transform(sequence(0, n_tok - 1), i -> CAST(pmod(xxhash64(doc_id, i), $VocabSize) AS INT))")
          .as("tokens"),
        col("n_tok"),
        col("source"))
    if (numFiles > 0) base.repartition(numFiles) else base
  }

  /** Expected token array for a doc_id — the oracle for byte-equality
    * checks, computed driver-side with Spark's own xxhash64 via a 1-row
    * plan (keeps a single hash implementation). For test-scale use only. */
  def expectedRow(spark: SparkSession, docId: String, lenSpread: Int = 1985): (Int, Array[Int]) = {
    val row = generateForIds(spark, Seq(docId), lenSpread).collect()(0)
    (row.getInt(2), row.getSeq[Int](1).toArray)
  }

  /** Regenerate rows for specific doc_ids (MERGE fixtures use a variant
    * salt so updated rows differ deterministically). */
  def generateForIds(spark: SparkSession, docIds: Seq[String], lenSpread: Int = 1985,
                     salt: String = ""): DataFrame = {
    import spark.implicits._
    val thresholds = zipfThresholds(NumSources, 1.2)
    val u = "pmod(xxhash64(doc_id, 'src'), 1000000)"
    val srcExpr = thresholds.zipWithIndex.init.reverse.foldLeft(
      s"'src${"%02d".format(NumSources - 1)}'") { case (acc, (thr, idx)) =>
      s"IF($u < ${thr}L, 'src${"%02d".format(idx)}', $acc)"
    }
    docIds.toDF("doc_id")
      .select(
        col("doc_id"),
        expr(s"CAST(64 + pmod(xxhash64(doc_id, 'ntok$salt'), $lenSpread) AS INT)").as("n_tok"),
        expr(srcExpr).as("source"))
      .select(
        col("doc_id"),
        expr(s"transform(sequence(0, n_tok - 1), i -> CAST(pmod(xxhash64(doc_id, i${if (salt.isEmpty) "" else s", '$salt'"}), $VocabSize) AS INT))")
          .as("tokens"),
        col("n_tok"),
        col("source"))
  }
}
