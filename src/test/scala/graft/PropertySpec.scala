package graft

import graft.lang.AnyValue
import graft.pipeline.Sampling
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over the cross-cutting machinery:
  * hash portability, Any-value encoding injectivity and order, and
  * list-function semantics vs their plain-Scala definitions. All
  * Spark-side checks batch the generated cases into ONE DataFrame per
  * property so the suite stays fast.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("knuthBucket equals the naive formula wherever the naive form cannot overflow") {
    val ids = Gen.listOfN(200, Gen.chooseNum(0L, Int.MaxValue.toLong)).sample.get
    val out = ids.toDF("id")
      .select(col("id"), Sampling.knuthBucket(col("id"), 1000000).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val naive = ((id * 2654435761L) % 4294967296L) % 1000000L
      assert(out(id) == naive, s"id=$id")
    }
  }

  test("knuthBucket stays in range over the FULL Long domain (incl. the naive-overflow regime)") {
    val ids = Gen.listOfN(200, Gen.chooseNum(Long.MinValue, Long.MaxValue)).sample.get
    val bad = ids.toDF("id")
      .select(Sampling.knuthBucket(col("id"), 1000).as("b"))
      .filter(col("b") < 0 || col("b") >= 1000).count()
    assert(bad == 0)
  }

  test("AnyValue.encode is injective across types and values") {
    // all DISTINCT values (across types): int 1 vs float 1.0 vs string
    // "1" vs string "1.0" vs list [1] must all encode apart
    val values: List[Any] = List(true, false, 0L, 1L, -1L, 42L,
      0.0, 1.0, -1.5, Double.NaN, Double.PositiveInfinity,
      "", "1", "1.0", "true", "a", "\"a\"", "NaN",
      Seq(1L, 2L), Seq("1"), Seq(1.0))
    val encoded = values.map(AnyValue.encode)
    assert(encoded.distinct.length == values.length,
      s"collisions: ${values.zip(encoded).groupBy(_._2).filter(_._2.length > 1)}")
  }

  test("sortKey reproduces the reference total order: Null < Bool < Num < Str, int-before-float ties") {
    // the reference's variant order with numeric value order inside the
    // Num band (value.rs:143-174, 575-598)
    val ordered: Seq[Any] = Seq(
      false, true, // Bool band
      Double.NegativeInfinity, -1.5, -1L, 0L, 0.5, 1L, 1.0, // int 1 < float 1.0
      2L, Double.PositiveInfinity, Double.NaN, // NaN at the top of Num (Spark double order)
      "", "a", "b") // Str band
    val enc = ordered.map(AnyValue.encode)
    val df = enc.zipWithIndex.map { case (e, i) => (i.toLong, e.asInstanceOf[String]) }
      .toDF("expect_pos", "enc")
    val sorted = df.orderBy(AnyValue.sortKey(col("enc")))
      .select("expect_pos").as[Long].collect().toSeq
    assert(sorted == sorted.sorted, s"order diverged: $sorted")
  }

  test("list ops match plain-Scala semantics on random inputs (script path)") {
    val db = new graft.lang.CozoDb(spark)
    val lists = Gen.listOfN(30, Gen.listOf(Gen.chooseNum(-5L, 5L))).sample.get
    // one script per shape class, all lists checked in one pass via a
    // const relation
    val rel = lists.zipWithIndex
      .map { case (l, i) => s"[$i, [${l.mkString(", ")}]]" }
      .mkString("[", ", ", "]")
    val out = db.run(
      s"""r[i, l] <- $rel
         |?[i, srt, rev, uniq, ln] := r[i, l], srt = sorted(l), rev = reverse(l),
         |  uniq = unique(l), ln = length(l)""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3), r.getInt(4))).toMap
    lists.zipWithIndex.foreach { case (l, i) =>
      val (srt, rev, uniq, ln) = out(i.toLong)
      assert(srt == l.sorted, s"sorted($l)")
      assert(rev == l.reverse, s"reverse($l)")
      assert(uniq == l.distinct, s"unique($l) keeps first-occurrence order")
      assert(ln == l.length)
    }
  }

  test("int_range matches Scala ranges for random (from, to, step)") {
    val db = new graft.lang.CozoDb(spark)
    val cases = Gen.listOfN(25, for {
      a <- Gen.chooseNum(-20L, 20L)
      b <- Gen.chooseNum(-20L, 20L)
      s <- Gen.oneOf(-3L, -2L, -1L, 1L, 2L, 3L)
    } yield (a, b, s)).sample.get
    val rel = cases.zipWithIndex
      .map { case ((a, b, s), i) => s"[$i, $a, $b, $s]" }.mkString("[", ", ", "]")
    val out = db.run(
      s"""r[i, a, b, s] <- $rel
         |?[i, rng] := r[i, a, b, s], rng = int_range(a, b, s)""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    cases.zipWithIndex.foreach { case ((a, b, s), i) =>
      val expect = (a until b by s).toSeq
      assert(out(i.toLong) == expect, s"int_range($a, $b, $s)")
    }
  }

  test("canonicalizeUrl never throws and is idempotent on arbitrary input") {
    import graft.pipeline.Urls
    // adversarial URL-ish strings: random printable garbage, plus
    // structured cases hitting every parser branch boundary
    val structured = Seq(
      "http://", "https://:443", "http://:80/", "://host", "https://h.com?",
      "https://h.com?&&", "https://h.com/#", "https://h.com:/x",
      "https://h.com:99999/x", "HTTP://H/?utm_=1", "a://b:80/c?d#e#f",
      "https://h.com/a//b///", "https://h.com/?utm_source", "x")
    val garbage = Gen.listOfN(150,
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(('!' to '~') :+ ' ')).map(_.mkString)))
      .sample.get
    val inputs = (structured ++ garbage).distinct
    val once = inputs.toDF("u")
      .select(col("u"), Urls.canonicalizeUrl(col("u")).as("c1"))
      .withColumn("c2", Urls.canonicalizeUrl(col("c1")))
      .collect() // never throws: any exception fails the test here
    once.foreach { r =>
      val (u, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(c1 != null, s"null canonical for '$u'")
      assert(c2 == c1, s"not idempotent for '$u': '$c1' -> '$c2'")
    }
  }

  test("md5Key matches the JVM md5 and stays in [0, 2^32)") {
    import graft.pipeline.Sampling
    val strs = Gen.listOfN(100, Gen.alphaNumStr).sample.get.distinct
    val out = strs.toDF("s")
      .select(col("s"), Sampling.md5Key(col("s")).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val expect = java.lang.Long.parseLong(hex, 16)
      assert(out(s) == expect && expect >= 0 && expect < (1L << 32), s"'$s'")
    }
  }
}
