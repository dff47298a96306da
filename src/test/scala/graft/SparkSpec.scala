package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the production deployment config: every suite runs with the engine
      // installed the way a cluster would install it (ExtensionsSpec
      // asserts the injections actually work)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the ContextCleaner can drop a broadcast that a concurrently-planned
      // query still references (observed as flaky TorrentBroadcast store
      // errors across suites sharing this session); the test JVM lives ~2
      // minutes, so skipping eager cleanup is safe and deterministic
      .config("spark.cleaner.referenceTracking", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Tables.configure(s)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf: String = "/root/testdata/sf0.001"
}
