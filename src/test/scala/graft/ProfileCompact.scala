package graft

import java.nio.file.Files

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.data.TokenGen
import graft.maintain.Compaction
import graft.meta._
import graft.table.TsTable

/** Scratch profiler: where does the serial (non-Spark-job) time inside one
  * Compaction.run go at low parallelism? Prints each Spark job's wall time
  * and the driver-side gaps between consecutive jobs. */
object ProfileCompact {
  def main(args: Array[String]): Unit = {
    val rows = 600000L
    val cpus = sys.env.getOrElse("PROF_CPUS", "8").toInt
    val root = Files.createTempDirectory("graft-profile").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.default.parallelism", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t0.append(TokenGen.generate(spark, rows, numFiles = 200))

    // warmup on a scratch copy
    val warmRoot = Files.createTempDirectory("graft-profile-warm").toString
    val wt = TsTable.create(warmRoot, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    wt.append(TokenGen.generate(spark, 20000, numFiles = 8))
    Compaction.run(spark, wt, targetFileSize = 16L * 1024 * 1024)

    case class J(id: Int, desc: String, start: Long, var end: Long = 0L,
                 stages: java.util.Set[Int] = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]())
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    case class St(name: String, var ms: Long = 0L, var tasks: Int = 0, var taskMs: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId,
          Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""),
          e.time)
        e.stageIds.foreach(sid => j.stages.add(sid))
        jobs.put(e.jobId, j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val st = stages.computeIfAbsent(si.stageId, _ => St(si.name))
        st.ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(0L)
        st.tasks = si.numTasks
        st.taskMs = si.taskMetrics.executorRunTime
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val tbl = TsTable.open(root)
    val w0 = System.currentTimeMillis()
    val rep = Compaction.run(spark, tbl, targetFileSize = 16L * 1024 * 1024)
    val w1 = System.currentTimeMillis()
    spark.sparkContext.removeSparkListener(listener)

    import scala.jdk.CollectionConverters._
    val js = jobs.values.asScala.toSeq.sortBy(_.start)
    var cursor = w0
    var jobMs = 0L
    println(f"== wall ${(w1 - w0) / 1000.0}%.2f s; bins=${rep.binsExecuted} filesOut=${rep.filesOut} jobs=${js.size}")
    js.foreach { j =>
      val gap = j.start - cursor
      val dur = j.end - j.start
      jobMs += dur
      println(f"  gap ${gap / 1000.0}%6.2f s | job ${j.id}%3d ${dur / 1000.0}%6.2f s  ${j.desc.take(90)}")
      j.stages.asScala.toSeq.sorted.foreach { sid =>
        val st = stages.get(sid)
        if (st != null && st.ms > 200)
          println(f"      stage $sid%3d wall ${st.ms / 1000.0}%6.2f s taskSum ${st.taskMs / 1000.0}%7.2f s tasks ${st.tasks}%4d  ${st.name.take(80)}")
      }
      cursor = math.max(cursor, j.end)
    }
    println(f"  gap ${(w1 - cursor) / 1000.0}%6.2f s | (tail)")
    println(f"== sum(jobs) ${jobMs / 1000.0}%.2f s; driver gaps ${(w1 - w0 - jobMs) / 1000.0}%.2f s")
    spark.stop()
    // each run writes ~2.5 GB of table data; leaked roots accumulated to a
    // disk-full across sessions — reclaim both before exit
    Seq(root, warmRoot).foreach { d =>
      SparkTestBase.registerForCleanup(java.nio.file.Paths.get(d))
    }
  }
}
