package org.apache.spark.sql.graftbridge

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Job-count metering for the drift regression gate (JobLedgerSpec) and
  * the `graft.JobCount` forensics main.
  *
  * Counts the Spark jobs (and their planned stages) submitted while a
  * thunk runs, attributed via a unique job group so concurrently
  * running test suites on the shared local SparkContext cannot pollute
  * the numbers. Needs to live under `org.apache.spark` for
  * `listenerBus.waitUntilEmpty()` (the listener bus is async; without
  * the barrier the last job's event may not have been delivered when
  * the thunk returns).
  */
object ListenerBridge {
  final case class Counts(jobs: Int, stages: Int)

  def measure(sc: SparkContext, group: String)(thunk: => Unit): Counts = {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (Option(j.properties).exists(p => group == p.getProperty("spark.jobGroup.id"))) {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          ()
        }
    }
    sc.addSparkListener(listener)
    // save the caller's ambient job group so measurement is transparent
    // (clearJobGroup would drop it instead of restoring)
    val prevId = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(group, group, interruptOnCancel = false)
    try {
      thunk
      sc.listenerBus.waitUntilEmpty()
    } finally {
      sc.setLocalProperty("spark.jobGroup.id", prevId)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
      sc.removeSparkListener(listener)
    }
    Counts(jobs.get, stages.get)
  }
}
