package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (JVM-wide; sbt forks a
  * single test JVM). */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's checksum checkpoint manager deadlocks its write
      // pool under local[] test sessions (all executor tasks park in
      // ChecksumCheckpointFileManager.awaitResult) — plain checkpoint
      // files are fine for tests
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
