package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ListenerBridge

/** Attribution harness: A/B one session conf across named queries at the
  * BENCH topology (local[32], shuffle.partitions=32) with the
  * job/shuffle/task-time meter attached — the tooling the r10 verdict
  * asked for ("meter-attribute the cluster; the tooling exists now").
  *
  * Usage:
  *   SPARK_GRAFT_ATTR_KNOB=spark.graft.ingestGuard \
  *   SPARK_GRAFT_ATTR_VALUES=on,off \
  *   sbt "runMain graft.Attribute dedup_semantic ann_ivf"
  *
  * Per (query, knob value): one untimed warm run, then
  * SPARK_GRAFT_ATTR_REPS (default 3) timed runs with Bench's inter-query
  * hygiene (cache clear, blocking unpersist, forced GC). Prints median
  * wall, per-rep walls, and the meter's job/task-time/shuffle counters —
  * core-seconds vs wall exposes serialization instantly; job/shuffle
  * deltas expose plan-shape changes (an extra exchange shows up as a
  * shuffle-byte step, not a guess).
  */
object Attribute {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_ATTR_REPS", "3").toInt)
    val knob = sys.env.getOrElse("SPARK_GRAFT_ATTR_KNOB", "spark.graft.ingestGuard")
    val values = sys.env.getOrElse("SPARK_GRAFT_ATTR_VALUES", "on,off")
      .split(",").map(_.trim).toSeq
    val names = if (args.nonEmpty) args.toSeq
      else sys.error("pass query names as args (see SparkEntry.queries)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    // SPARK_GRAFT_ATTR_JOBS=1: per-rep job timeline — sum of job spans
    // vs wall isolates DRIVER-side stalls (planning, broadcast builds,
    // codegen) from executor time; prints the three largest inter-job
    // gaps and the three longest jobs
    val jobDetail = sys.env.get("SPARK_GRAFT_ATTR_JOBS").contains("1")
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    if (jobDetail) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobSpans.put(e.jobId, (e.time, -1L))
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val prev = jobSpans.get(e.jobId)
          if (prev != null) jobSpans.put(e.jobId, (prev._1, e.time))
        }
      })
    def jobReport(wall: Double): String = {
      import scala.jdk.CollectionConverters._
      val spans = jobSpans.asScala.values.toSeq.filter(_._2 > 0).sortBy(_._1)
      jobSpans.clear()
      if (spans.isEmpty) "no jobs"
      else {
        val spanSum = spans.map(s => (s._2 - s._1) / 1000.0).sum
        val gaps = spans.sliding(2).collect {
          case Seq(a, b) if b._1 > a._2 => (b._1 - a._2) / 1000.0
        }.toSeq.sorted.reverse.take(3)
        val longest = spans.map(s => (s._2 - s._1) / 1000.0).sorted.reverse.take(3)
        f"jobSpanSum=$spanSum%6.2f s of wall=$wall%6.2f; top gaps=[${gaps.map(g => f"$g%.2f").mkString(",")}] " +
          f"top jobs=[${longest.map(g => f"$g%.2f").mkString(",")}]"
      }
    }

    // SPARK_GRAFT_ATTR_STAGES=1: per-stage task-time breakdown of the
    // final rep (which stages carry the core-seconds, at what width)
    val stageDetail = sys.env.get("SPARK_GRAFT_ATTR_STAGES").contains("1")
    val stageLog = new scala.collection.mutable.ArrayBuffer[String]()
    if (stageDetail) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          if (si.taskMetrics != null && si.taskMetrics.executorRunTime > 50)
            stageLog += f"  stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
              f"runTime=${si.taskMetrics.executorRunTime / 1000.0}%7.2f core-s " +
              f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%7.2f '${si.name.takeWhile(_ != '\n').take(70)}'"
        }
      })

    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      for (v <- values) {
        spark.conf.set(knob, v)
        // warm (untimed): absorbs codegen/JIT first-run cost per shape
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        sweep()
        def gcMs: Long = {
          import scala.jdk.CollectionConverters._
          java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
            .asScala.map(_.getCollectionTime).sum
        }
        val runs = (1 to reps).map { i =>
          if (stageDetail && i == reps) stageLog.clear()
          val gc0 = gcMs
          val t0 = System.nanoTime()
          val c = ListenerBridge.measure(spark.sparkContext, s"attr-$name-$v-$i") {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
          val wall = (System.nanoTime() - t0) / 1e9
          val gcD = gcMs - gc0 // in-window GC, before sweep()'s forced gc
          sweep()
          if (sys.env.get("SPARK_GRAFT_ATTR_PER_REP").contains("1"))
            println(f"  rep$i%-2d $name wall=$wall%7.3f s jobs=${c.jobs} " +
              f"taskTime=${c.taskTimeMs / 1000.0}%7.1f core-s gc=${gcD / 1000.0}%6.2f s " +
              f"shw=${c.shuffleWriteBytes / 1048576.0}%8.2f shr=${c.shuffleReadBytes / 1048576.0}%8.2f MiB")
          if (jobDetail) println(s"    ${jobReport(wall)}")
          (wall, c)
        }
        val walls = runs.map(_._1)
        val c = runs.last._2
        println(f"ATTR $name%-18s $knob=$v%-4s median=${median(walls)}%7.3f s " +
          f"walls=[${walls.map(w => f"$w%.3f").mkString(", ")}] " +
          f"jobs=${c.jobs} taskTime=${c.taskTimeMs / 1000.0}%7.1f core-s " +
          f"shw=${c.shuffleWriteBytes / 1048576.0}%8.2f MiB shr=${c.shuffleReadBytes / 1048576.0}%8.2f MiB")
        if (stageDetail) {
          org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
          stageLog.foreach(println); stageLog.clear()
        }
      }
    }
    spark.stop()
  }
}
