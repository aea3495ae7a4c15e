package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.TokenGen

/** Round-6 component microbench: isolate parquet nested read / exchange /
  * parquet write costs on the bench's token data (guide §1.4 noop sink).
  * Warm-up pass first — the bench's min-of-3 policy sees warm-JIT numbers,
  * so cold one-shot measurements would mis-rank the stages. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("MB_ROWS", "150000").toLong
    val cpus = sys.env.getOrElse("MB_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def du(dir: String): Long = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      val st = Files.walk(p)
      try st.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      finally st.close()
    }

    val stage = Files.createTempDirectory("graft-mb").toString
    time("stage: TokenGen 200 files")(
      TokenGen.generate(spark, rows, numFiles = 200).write.mode("overwrite").parquet(stage))

    // ---- JIT warmup ----------------------------------------------------
    val warmOut = Files.createTempDirectory("graft-mb-w").toString
    noop(spark.read.parquet(stage))
    spark.read.parquet(stage).select(sum(expr("tok_sum(tokens)"))).head()
    spark.read.parquet(stage).repartition(32).write.mode("overwrite").parquet(warmOut)
    spark.read.parquet(stage).repartition(32).write.mode("overwrite").parquet(warmOut)
    println("-- warm --")

    time("scan noop")(noop(spark.read.parquet(stage)))
    time("tok_sum agg")(
      spark.read.parquet(stage).select(sum(expr("tok_sum(tokens)"))).head())
    time("repartition(32) noop")(noop(spark.read.parquet(stage).repartition(32)))

    val r = spark.read.parquet(stage)
    val o = Files.createTempDirectory("graft-mb-o").toString
    time("write 32f snappy+dict")(
      r.repartition(32).write.mode("overwrite").parquet(o))
    println(f"   bytes: ${du(o) / 1e6}%.1f MB")
    time("write 32f snappy+dict (again)")(
      r.repartition(32).write.mode("overwrite").parquet(o))
    time("write 32f snappy nodict-tokens")(
      r.repartition(32).write.mode("overwrite")
        .option("parquet.enable.dictionary#tokens.list.element", "false")
        .parquet(o))
    println(f"   bytes: ${du(o) / 1e6}%.1f MB")
    time("write 32f zstd+dict")(
      r.repartition(32).write.mode("overwrite").option("compression", "zstd").parquet(o))
    println(f"   bytes: ${du(o) / 1e6}%.1f MB")
    time("write 32f uncompressed nodict-tokens")(
      r.repartition(32).write.mode("overwrite")
        .option("compression", "none")
        .option("parquet.enable.dictionary#tokens.list.element", "false")
        .parquet(o))
    println(f"   bytes: ${du(o) / 1e6}%.1f MB")
    time("write 6f snappy+dict")(
      r.repartition(6).write.mode("overwrite").parquet(o))
    time("write 32part maxRecordsPerFile->6f")(
      r.repartition(32).write.mode("overwrite")
        .option("maxRecordsPerFile", (rows / 6).toString).parquet(o))
    time("write 200f snappy+dict")(
      r.repartition(200).write.mode("overwrite").parquet(o))

    spark.stop()
    Seq(stage, warmOut, o).foreach(d =>
      try SparkEntry.deleteTree(java.nio.file.Paths.get(d)) catch { case _: Exception => () })
  }
}
