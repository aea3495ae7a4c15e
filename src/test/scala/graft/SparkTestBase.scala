package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val cleanupDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import scala.jdk.CollectionConverters._
    cleanupDirs.asScala.foreach { root =>
      try {
        def rm(p: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(p)) {
            val s = java.nio.file.Files.list(p)
            try s.iterator().asScala.foreach(rm) finally s.close()
          }
          java.nio.file.Files.deleteIfExists(p)
        }
        rm(root)
      } catch { case _: Exception => () }
    }
  }, "graft-test-tmp-cleanup"))

  def registerForCleanup(p: java.nio.file.Path): Unit = cleanupDirs.add(p)
}

abstract class SparkFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  /** Temp dirs are registered for one JVM-exit sweep: a full `sbt test`
    * otherwise leaves ~10 GB of table roots under /tmp per run, which
    * accumulated across sessions to a disk-full that killed a live
    * benchmark. Exit-time (not per-test) deletion keeps dirs inspectable
    * while the suite runs and costs one recursive walk at shutdown. */
  def tmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    SparkTestBase.registerForCleanup(p)
    p.toString
  }
}
