package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ListenerBridge
import org.scalatest.funsuite.AnyFunSuite

/** Job-count + shuffle-volume drift regression gate (r7 verdict item
  * #4, extended per the r8 verdict with shuffle-byte ceilings): every
  * Spark job a driver query submits is an action, a broadcast build, an
  * AQE shuffle-stage materialization, or an eager checkpoint — so "one
  * extra action per statement" drift (r7's mut_update grew a separate
  * existence-check job) shows up as a count increase. Shuffle WRITE
  * bytes catch the complementary drift class the job count is blind to:
  * an unpushed filter or a widened projection moves megabytes through
  * the SAME number of shuffles. Both are asserted against the committed
  * ceilings in `src/test/resources/job_ledger.json` (v2: per-query
  * objects `{"jobs": n, "shw": bytes, "shr": bytes}`; `shr` is recorded
  * for forensics, not gated — reused-exchange reads make it less
  * stable).
  *
  * The assertion is `measured <= ceiling (+slack)`, not equality:
  * suites run in parallel on the shared SparkContext, and a
  * concurrently-warmed shared cache (minhash pairs, ANN index epochs)
  * can only REMOVE work from a later consumer. Counts are attributed
  * through a per-query job group (jobs) and its stage-id set (task
  * metrics), so other suites' work never inflates a measurement.
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

  private final case class Ceiling(jobs: Int, shw: Long, shr: Long)

  private lazy val ledger: Map[String, Ceiling] = {
    val txt = new String(java.nio.file.Files.readAllBytes(ledgerPath), "UTF-8")
    val entry = ("\"([^\"]+)\"\\s*:\\s*\\{\\s*\"jobs\"\\s*:\\s*(\\d+)\\s*," +
      "\\s*\"shw\"\\s*:\\s*(\\d+)\\s*,\\s*\"shr\"\\s*:\\s*(\\d+)\\s*\\}").r
    entry.findAllMatchIn(txt)
      .map(m => m.group(1) -> Ceiling(m.group(2).toInt, m.group(3).toLong, m.group(4).toLong))
      .toMap
  }
  private val measured =
    scala.collection.mutable.LinkedHashMap.empty[String, ListenerBridge.Counts]

  /** Shuffle-write slack: lz4 framing/row-order variance under AQE is a
    * few percent; the drift this gate exists for (a table that wasn't
    * shuffled before) is ≥2× on any non-trivial query. The absolute
    * floor keeps KB-scale queries from flaking on block-size jitter. */
  private def shwSlack(ceiling: Long): Long = math.max(64L * 1024, ceiling / 4)

  for (name <- Queries.queries.keys.toSeq.sorted) {
    test(s"$name: stays under the committed job and shuffle-byte ceilings") {
      val c = ListenerBridge.measure(spark.sparkContext, s"ledger-$name") {
        Queries.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      }
      measured(name) = c
      if (!regen) {
        val ceil = ledger.getOrElse(name,
          fail(s"$name is not in job_ledger.json — new query? regenerate with " +
            "GRAFT_REGEN_JOB_LEDGER=1 sbt 'testOnly graft.JobLedgerSpec'"))
        // slack: broadcast-build / incremental-limit jobs jitter ±1
        // under concurrent suites (observed: graph_pattern_long 21 vs
        // 20 in the full parallel sweep only). The drift class this
        // gate exists for — one extra ACTION per statement — is a ≥1
        // job increase on a small-ceiling query (r7's mut_update went
        // 3→5), which max(1, ceiling/10) still fails.
        val slack = math.max(1, ceil.jobs / 10)
        assert(c.jobs <= ceil.jobs + slack,
          s"$name submits ${c.jobs} Spark jobs, committed ceiling is ${ceil.jobs} " +
            s"(+$slack jitter slack) — an added action/shuffle/broadcast; fuse it " +
            "or regenerate the ledger with the justification in the commit")
        assert(c.shuffleWriteBytes <= ceil.shw + shwSlack(ceil.shw),
          s"$name wrote ${c.shuffleWriteBytes} shuffle bytes, committed ceiling is " +
            s"${ceil.shw} (+${shwSlack(ceil.shw)} slack) — an unpushed filter, widened " +
            "projection, or injected repartition; push it down or regenerate the " +
            "ledger with the justification in the commit")
      }
    }
  }

  test("ledger hygiene: no stale names; regeneration writes the file") {
    if (regen) {
      val json = measured.toSeq.sortBy(_._1)
        .map { case (n, c) =>
          s"""  "$n": {"jobs": ${c.jobs}, "shw": ${c.shuffleWriteBytes}, "shr": ${c.shuffleReadBytes}}"""
        }.mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.write(ledgerPath, json.getBytes("UTF-8"))
      info(s"job_ledger.json regenerated with ${measured.size} entries")
    } else {
      val known = Queries.queries.keySet
      val stale = ledger.keySet.diff(known)
      assert(stale.isEmpty, s"stale ledger entries (queries no longer exist): ${stale.mkString(", ")}")
    }
  }

  test("sensitivity: an unpushed filter trips the shuffle-byte gate the job count is blind to") {
    // same aggregation, same shuffle COUNT — version B carries every row
    // through the shuffle because the filter moved inside the aggregate.
    // The gate formula applied to A's measurement as the ceiling must
    // flag B. Synthetic input so sensitivity doesn't depend on SF.
    import spark.implicits._
    val rows = spark.range(0, 2000000L).select(
      (col("id") % 400000).as("k"),
      (col("id") % 17).as("f"),
      col("id").as("v"))
    val a = ListenerBridge.measure(spark.sparkContext, "ledger-sens-a") {
      rows.filter(col("f") === 0).groupBy("k").agg(sum("v").as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    val b = ListenerBridge.measure(spark.sparkContext, "ledger-sens-b") {
      rows.groupBy("k").agg(sum(when(col("f") === 0, col("v"))).as("s"))
        .write.format("noop").mode("overwrite").save()
    }
    assert(a.shuffleWriteBytes > 0, "version A must actually shuffle")
    assert(b.shuffleWriteBytes > a.shuffleWriteBytes + shwSlack(a.shuffleWriteBytes),
      s"gate must flag the unpushed filter: A=${a.shuffleWriteBytes}B " +
        s"B=${b.shuffleWriteBytes}B slack=${shwSlack(a.shuffleWriteBytes)}B")
  }
}
