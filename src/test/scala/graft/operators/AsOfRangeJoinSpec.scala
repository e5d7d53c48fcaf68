package graft.operators

import graft.SparkFixture
import graft.text.LanguageModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join, interval (range) join, and bigram-LM perplexity: each
  * checked against an algorithmically different second implementation
  * (naive θ-join + rank / hand-computed closed forms), plus the salted
  * as-of plan against the single-window plan.
  */
class AsOfRangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  // — as-of join —

  def lhs: DataFrame = Seq(
    (1L, 100L, "v1"), (1L, 200L, "v2"), (1L, 50L, "v0"),
    (2L, 10L, "w1"), (2L, 300L, "w2"),
    (3L, 999L, "x1") // key with no right rows at all
  ).toDF("k", "t", "tag")

  def rhs: DataFrame = Seq(
    (1L, 100L, 7L, 1.5), // exactly at v1's ts — inclusive match
    (1L, 100L, 9L, 2.5), // same ts, larger tieBreak id wins
    (1L, 150L, 11L, 3.5),
    (2L, 11L, 13L, 4.5) // after w1, before w2
  ).toDF("k", "rt", "rid", "rv")

  test("asOfJoin: inclusive ties, tieBreak picks greatest, inner drops unmatched") {
    val out = AsOfJoin.asOfJoin(lhs, rhs, Seq("k"), "t", "rt", tieBreak = Seq("rid"))
      .select("k", "t", "tag", "rid", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(out == Set(
      (1L, 100L, "v1", 9L, 2.5), // at-ts rows match; rid 9 beats rid 7
      (1L, 200L, "v2", 11L, 3.5), // latest ≤ 200 is 150
      (2L, 300L, "w2", 13L, 4.5)
    )) // v0 (t=50), w1 (t=10), x1 (no rights) dropped by inner
  }

  test("asOfJoin: left join keeps unmatched rows with null payload") {
    val out = AsOfJoin.asOfJoin(lhs, rhs, Seq("k"), "t", "rt",
        tieBreak = Seq("rid"), joinType = "left")
    assert(out.count() == 6)
    assert(out.filter(col("rid").isNull).select("tag").as[String].collect().toSet ==
      Set("v0", "w1", "x1"))
  }

  /** Independent oracle: raw θ-join on key + rt<=t, windowed rank-1 by
    * (rt desc, tieBreak desc) — the quadratic plan asOfJoin avoids. */
  private def naiveAsOf(l: DataFrame, r: DataFrame): Set[(Long, Long, String, Long, Double)] = {
    val j = l.join(r, l("k") === r("k") && r("rt") <= l("t"))
      .select(l("k"), col("t"), col("tag"), col("rt"), col("rid"), col("rv"))
    val w = Window.partitionBy(col("k"), col("t"), col("tag"))
      .orderBy(col("rt").desc, col("rid").desc)
    j.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(4), x.getDouble(5)))
      .toSet
  }

  test("asOfJoin: plain and salted plans both equal the naive θ-join oracle") {
    // deterministic synthetic load: 2 keys × 400 interleaved rows so
    // buckets of width 50 see in-bucket hits, carries, and empty buckets
    val l = (0 until 400).map(i => (i % 2 + 1L, i * 7L % 1000, s"L$i")).toDF("k", "t", "tag")
      .distinct()
    val r = (0 until 120).map(i => (i % 2 + 1L, i * 31L % 1000, 1000L + i, i / 10.0))
      .toDF("k", "rt", "rid", "rv")
    val expect = naiveAsOf(l, r)
    val plain = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", tieBreak = Seq("rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3), x.getDouble(4))).toSet
    val salted = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", tieBreak = Seq("rid"),
        bucketWidthMicros = Some(50L))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3), x.getDouble(4))).toSet
    assert(plain == expect)
    assert(salted == expect)
  }

  test("asOfJoin forward: earliest right at-or-after, both plans vs oracle") {
    val l = (0 until 400).map(i => (i % 2 + 1L, i * 7L % 1000, s"L$i")).toDF("k", "t", "tag")
      .distinct()
    val r = (0 until 120).map(i => (i % 2 + 1L, i * 31L % 1000, 1000L + i, i / 10.0))
      .toDF("k", "rt", "rid", "rv")
    // independent oracle: θ-join rt >= t, rank-1 by (rt asc, rid desc)
    val j = l.join(r, l("k") === r("k") && r("rt") >= l("t"))
      .select(l("k"), col("t"), col("tag"), col("rt"), col("rid"), col("rv"))
    val w = Window.partitionBy(col("k"), col("t"), col("tag"))
      .orderBy(col("rt"), col("rid").desc)
    val expect = j.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(4), x.getDouble(5)))
      .toSet
    val plain = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", tieBreak = Seq("rid"),
        direction = "forward")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3), x.getDouble(4))).toSet
    val salted = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt", tieBreak = Seq("rid"),
        direction = "forward", bucketWidthMicros = Some(50L))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3), x.getDouble(4))).toSet
    assert(plain == expect)
    assert(salted == expect)
  }

  test("asOfJoin: timestamp columns compare at µs precision") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "a"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 23:59:59"), 5L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "rt").select("rid").as[Long].collect()
    assert(out.toSeq == Seq(5L))
  }

  test("asOfJoin plan shape: one shuffle, one window — never the pair blow-up") {
    val plan = AsOfJoin.asOfJoin(lhs, rhs, Seq("k"), "t", "rt", tieBreak = Seq("rid"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("asOfJoin: payload collision is rejected loudly") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(lhs, rhs.withColumnRenamed("rv", "tag"), Seq("k"), "t", "rt")
    }
  }

  // — range join —

  /** Independent oracle: unconstrained cross join + range filter. */
  private def naiveRange(p: DataFrame, iv: DataFrame): Set[(Long, Long)] =
    p.crossJoin(iv).filter(col("v") >= col("s") && col("v") < col("e"))
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  test("intervalJoin equals the cross-join oracle across bucket shapes") {
    val p = (0 until 300).map(i => (i.toLong, i * 13L % 2000)).toDF("pid", "v")
    // short, bucket-straddling, point-width, empty, and giant intervals
    val iv = (Seq((0L, 10L, 60L), (1L, 95L, 105L), (2L, 100L, 101L), (3L, 500L, 500L),
      (4L, 700L, 690L), (5L, 0L, 2000L)) ++
      (6 until 40).map(i => (i.toLong, i * 50L, i * 50L + 75L))).toDF("iid", "s", "e")
    val got = RangeJoin.intervalJoin(p, "v", iv, "s", "e",
        bucketWidthMicros = 100L, maxBucketsPerInterval = 8)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naiveRange(p, iv))
    // and with a width where nothing is a giant
    val got2 = RangeJoin.intervalJoin(p, "v", iv, "s", "e", bucketWidthMicros = 64L)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got2 == naiveRange(p, iv))
  }

  test("intervalJoin: extra equi-keys restrict matches") {
    val p = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("pid", "pk", "v")
    val iv = Seq((10L, "a", 0L, 10L), (20L, "b", 0L, 10L)).toDF("iid", "ik", "s", "e")
    val got = RangeJoin.intervalJoin(p, "v", iv, "s", "e",
        keys = Seq(("pk", "ik")), bucketWidthMicros = 10L)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
  }

  // — perplexity —

  test("bigramPerplexity: closed-form hand check") {
    // corpus: "a b a b" + "a a" → uni a:4 b:2, N=6 V=2
    // doc1: S = ln(4/6) + 2·ln((2+1)/(4+2)) + ln((1+1)/(2+2)) = ln(2/3) + 3·ln(1/2)
    //   ppl = exp(−S/4) = (3/2 · 8)^(1/4) = 12^0.25
    // doc2: S = ln(2/3) + ln((1+1)/(4+2)) → ppl = (3/2 · 3)^(1/2) = √4.5
    val docs = Seq((1L, "a b a b"), (2L, "a a"), (3L, "...")).toDF("doc_id", "text")
    val out = LanguageModel.bigramPerplexity(docs, "doc_id", "text", round = -1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L)) // the token-free doc is excluded
    assert(out(1L)._1 == 4L && math.abs(out(1L)._2 - math.pow(12, 0.25)) < 1e-12)
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - math.sqrt(4.5)) < 1e-12)
  }

  test("bigramPerplexity: single-token docs score on the unigram alone") {
    val docs = Seq((1L, "z"), (2L, "z z")).toDF("doc_id", "text")
    // uni z:3, N=3, V=1 → doc1: ppl = exp(−ln(3/3)) = 1
    val out = LanguageModel.bigramPerplexity(docs, "doc_id", "text", round = -1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    // doc2: S = ln(1) + ln((1+1)/(3+1)) → ppl = √2
    assert(math.abs(out(2L) - math.sqrt(2.0)) < 1e-12)
  }
}
