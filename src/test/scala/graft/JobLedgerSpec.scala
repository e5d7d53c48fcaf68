package graft

import org.apache.spark.sql.graftbridge.ListenerBridge
import org.scalatest.funsuite.AnyFunSuite

/** Job-count drift regression gate (r7 verdict item #4): every Spark
  * job a driver query submits is an action, a broadcast build, an AQE
  * shuffle-stage materialization, or an eager checkpoint — so "one
  * extra action per statement" drift (r7's mut_update grew a separate
  * existence-check job) shows up as a count increase. Each query's
  * count is asserted against the committed ceiling in
  * `src/test/resources/job_ledger.json`.
  *
  * The assertion is `measured <= ceiling`, not equality: suites run in
  * parallel on the shared SparkContext, and a concurrently-warmed
  * shared cache (minhash pairs, ANN index epochs) can only REMOVE jobs
  * from a later consumer. Counts are attributed through a per-query job
  * group, so other suites' jobs never inflate a measurement.
  *
  * Regenerate ceilings (after deliberately changing a query's shape)
  * with a SOLO cold run so the recorded numbers are true maxima:
  * `GRAFT_REGEN_JOB_LEDGER=1 sbt "testOnly graft.JobLedgerSpec"`.
  */
class JobLedgerSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")
  private val ledgerPath = java.nio.file.Paths.get("src/test/resources/job_ledger.json")
  private val regen = sys.env.contains("GRAFT_REGEN_JOB_LEDGER")

  private lazy val ledger: Map[String, Int] = {
    val txt = new String(java.nio.file.Files.readAllBytes(ledgerPath), "UTF-8")
    """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }
  private val measured = scala.collection.mutable.LinkedHashMap.empty[String, Int]

  for (name <- Queries.queries.keys.toSeq.sorted) {
    test(s"$name: submits no more Spark jobs than the committed ceiling") {
      val c = ListenerBridge.measure(spark.sparkContext, s"ledger-$name") {
        Queries.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      }
      measured(name) = c.jobs
      if (!regen) {
        val ceiling = ledger.getOrElse(name,
          fail(s"$name is not in job_ledger.json — new query? regenerate with " +
            "GRAFT_REGEN_JOB_LEDGER=1 sbt 'testOnly graft.JobLedgerSpec'"))
        // slack: broadcast-build / incremental-limit jobs jitter ±1
        // under concurrent suites (observed: graph_pattern_long 21 vs
        // 20 in the full parallel sweep only). The drift class this
        // gate exists for — one extra ACTION per statement — is a ≥1
        // job increase on a small-ceiling query (r7's mut_update went
        // 3→5), which max(1, ceiling/10) still fails.
        val slack = math.max(1, ceiling / 10)
        assert(c.jobs <= ceiling + slack,
          s"$name submits ${c.jobs} Spark jobs, committed ceiling is $ceiling " +
            s"(+$slack jitter slack) — an added action/shuffle/broadcast; fuse it " +
            "or regenerate the ledger with the justification in the commit")
      }
    }
  }

  test("ledger hygiene: no stale names; regeneration writes the file") {
    if (regen) {
      val json = measured.toSeq.sortBy(_._1)
        .map { case (n, j) => s"""  "$n": $j""" }.mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.write(ledgerPath, json.getBytes("UTF-8"))
      info(s"job_ledger.json regenerated with ${measured.size} entries")
    } else {
      val known = Queries.queries.keySet
      val stale = ledger.keySet.diff(known)
      assert(stale.isEmpty, s"stale ledger entries (queries no longer exist): ${stale.mkString(", ")}")
    }
  }
}
