package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap-split sessionization: hand-computed splits, stats, tieBreak
  * determinism at equal timestamps, and the documented approximation of
  * the epoch salt (boundary splits).
  */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // user 1: 0,50,70 | gap | 500,520 ; user 2: 5 alone
  private def ev = Seq(
    (1L, 0L, 10L), (1L, 50L, 11L), (1L, 70L, 12L), (1L, 500L, 13L), (1L, 520L, 14L),
    (2L, 5L, 15L)
  ).toDF("user", "t", "eid")

  test("sessions split exactly where the gap exceeds the threshold") {
    val s = Sessionize.sessionize(ev, Seq("user"), "t", gapMicros = 100L,
        tieBreak = Seq("eid"))
      .collect().map(r => (r.getLong(2)) -> r.getString(3)).toMap
    assert(s(10L) == "1" && s(11L) == "1" && s(12L) == "1")
    assert(s(13L) == "2" && s(14L) == "2")
    assert(s(15L) == "1")
    // a gap of exactly the threshold does NOT split (strictly greater)
    val s2 = Sessionize.sessionize(Seq((1L, 0L, 1L), (1L, 100L, 2L)).toDF("user", "t", "eid"),
        Seq("user"), "t", gapMicros = 100L, tieBreak = Seq("eid"))
      .select("session").as[String].collect().toSet
    assert(s2 == Set("1"))
  }

  test("sessionStats: counts, bounds and durations") {
    val st = Sessionize.sessionStats(ev, Seq("user"), "t", gapMicros = 100L,
        tieBreak = Seq("eid"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(st((1L, "1")) == ((3L, 0L, 70L, 70L)))
    assert(st((1L, "2")) == ((2L, 500L, 520L, 20L)))
    assert(st((2L, "1")) == ((1L, 5L, 5L, 0L)))
  }

  test("equal timestamps stay in one session; tieBreak fixes the order") {
    val dup = Seq((1L, 10L, 1L), (1L, 10L, 2L), (1L, 10L, 3L)).toDF("user", "t", "eid")
    val s = Sessionize.sessionize(dup, Seq("user"), "t", 5L, tieBreak = Seq("eid"))
      .select("session").as[String].collect().toSet
    assert(s == Set("1"))
  }

  test("epoch salt: same sessions when aligned, documented split when straddling") {
    // epoch 1000 splits nothing here (all sessions inside one epoch)
    val aligned = Sessionize.sessionize(ev, Seq("user"), "t", 100L,
        tieBreak = Seq("eid"), epochMicros = Some(1000L))
      .collect().map(r => r.getLong(2) -> r.getString(3)).toMap
    assert(aligned.values.toSet == Set("0_1", "0_2")) // epoch 0 ordinals 1 and 2
    assert(aligned(10L) == aligned(11L) && aligned(11L) == aligned(12L))
    assert(aligned(13L) == aligned(14L) && aligned(13L) != aligned(12L))
    // a session straddling the epoch boundary splits — the documented
    // approximation (t=90 and t=110 are within gap but cross epoch 100)
    val straddle = Seq((1L, 90L, 1L), (1L, 110L, 2L)).toDF("user", "t", "eid")
    val got = Sessionize.sessionize(straddle, Seq("user"), "t", 100L,
        tieBreak = Seq("eid"), epochMicros = Some(101L))
      .select("session").as[String].collect().toSet
    assert(got.size == 2)
    val exact = Sessionize.sessionize(straddle, Seq("user"), "t", 100L, tieBreak = Seq("eid"))
      .select("session").as[String].collect().toSet
    assert(exact.size == 1)
  }

  test("plan shape: one shuffle and one sort serve both window passes") {
    val plan = Sessionize.sessionize(ev, Seq("user"), "t", 100L, Seq("eid"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
    assert("Sort \\[".r.findAllIn(plan).length == 1,
      s"expected exactly one sort (dependent windows share the order):\n$plan")
  }

  test("invalid gaps are rejected loudly") {
    intercept[IllegalArgumentException](Sessionize.sessionize(ev, Seq("user"), "t", 0L))
    intercept[IllegalArgumentException](
      Sessionize.sessionize(ev, Seq("user"), "t", 100L, epochMicros = Some(50L)))
  }
}
