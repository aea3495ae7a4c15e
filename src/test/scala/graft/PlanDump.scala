package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to plans/<dir>/ —
  * the before/after plan evidence for the optimization round. Engine-path
  * queries execute their build side effects (append/compact) while the
  * returned DataFrame is constructed; the dumped plan is the final scan.
  *
  * Usage: sbt "Test/runMain graft.PlanDump <outDir> [query...]"
  * (default queries: the Bench headline set). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q01_agg", "q03_join", "q05_date_trunc", "q10_maintain_scan",
      "q21_minhash_pairs", "q22_simhash_pairs", "q24_embed_neardup", "q25_ann_topk",
      "q30_token_count", "q35_sample_split", "q36_seq_pack", "q37_vocab_topk",
      "q38_pipeline_e2e")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"dumped $name")
      } catch { case e: Throwable => System.err.println(s"$name FAILED: $e") }
    }
    spark.stop()
  }
}
