package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ListenerBridge

/** Forensics main: per-query Spark job/stage counts + wall seconds, one
  * JSON line — the instrument behind the r7-verdict drift question
  * ("which feature added which action?"). Run it on two checkouts at
  * the same SF and diff the job counts: a job is an action, a broadcast
  * build, an AQE shuffle-stage materialization, or an eager checkpoint,
  * so a per-query count delta names the added work precisely.
  *
  * `runMain graft.JobCount [sfDir]` (default sf0.01; SPARK_GRAFT_ONLY
  * restricts like Bench).
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    SparkEntry.queries.get("rel_scan_filter")
      .foreach(f => f(spark, sfDir).write.format("noop").mode("overwrite").save()) // warmup

    val rows = ordered.flatMap { case (name, fn) =>
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      try {
        val c = ListenerBridge.measure(spark.sparkContext, s"jobcount-$name") {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
        val secStr = String.format(java.util.Locale.ROOT, "%.3f", Double.box(sec))
        Some(s""""$name":{"jobs":${c.jobs},"stages":${c.stages},""" +
          s""""shw":${c.shuffleWriteBytes},"shr":${c.shuffleReadBytes},""" +
          s""""task_ms":${c.taskTimeMs},"sec":$secStr}""")
      } catch {
        case e: Throwable =>
          System.err.println(s"$name FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}")
          None
      }
    }
    val line = rows.mkString("{", ",", "}")
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_JOBCOUNT_OUT", "/tmp/jobcount.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
