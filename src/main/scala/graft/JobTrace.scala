package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ListenerBridge

/** Forensics main: run ONE query and print every Spark job it submits —
  * index, stage count, and the call site / description — to attribute a
  * query's job count to the code that issues the actions (the JobCount
  * totals say "57 jobs", this says which lines own them).
  * `runMain graft.JobTrace <query> [sfDir]`.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("graph_bfs")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // the result stage (last) carries the action's call site
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        println(f"job ${j.jobId}%3d stages ${j.stageInfos.size}%2d  $site")
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.taskMetrics.executorRunTime
        if (ms >= 200) // only stages that matter
          println(f"  stage ${i.stageId}%4d task_ms $ms%7d  ${i.name.take(90)}")
      }
    }
    // warmup pass absorbs first-compile jobs of shared machinery
    Queries.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    Queries.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    ListenerBridge.drain(spark.sparkContext)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
