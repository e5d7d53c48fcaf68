package graft.pipeline

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential fuzz of n-gram decontamination vs a naive string-set
  * scan (both broadcast and shuffle-join paths must agree with it and
  * with each other), novelty vs naive document-frequency counting,
  * and HTML extraction robustness on malformed markup.
  */
class DecontamFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")

  private def doc(rnd: scala.util.Random, len: Int): String =
    Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def grams(t: String, n: Int): Set[String] = {
    val toks = t.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Set.empty else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("ngramOverlap ≡ naive string-set scan on both join paths (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 52711 + 9)
      val n = 3 + rnd.nextInt(3)
      val evalDocs = (1L to 4L).map(id => (id, doc(rnd, 6 + rnd.nextInt(10))))
      // some training docs embed an eval fragment, some don't
      val train = (1L to 15L).map { id =>
        val t = doc(rnd, 8 + rnd.nextInt(14))
        if (rnd.nextInt(3) == 0) {
          val ev = evalDocs(rnd.nextInt(evalDocs.size))._2.split(" ")
          (id, (t.split(" ").take(4) ++ ev.take(n + rnd.nextInt(3)) ++ t.split(" ").drop(4)).mkString(" "))
        } else (id, t)
      }
      val minOv = 1 + rnd.nextInt(2)
      val want = train.flatMap { case (id, t) =>
        val tg = grams(t, n)
        val hits = evalDocs.map { case (eid, et) => eid -> tg.intersect(grams(et, n)) }
        val ov = hits.flatMap(_._2).toSet.size
        val ed = hits.count(_._2.nonEmpty)
        if (ov >= minOv) Some(id -> ((ov.toLong, ed.toLong))) else None
      }.toMap
      for (bcast <- Seq(true, false)) {
        val got = Decontaminate.ngramOverlap(
            train.toDF("id", "text"), "id", "text",
            evalDocs.toDF("id", "text"), "id", "text",
            n = n, minOverlap = minOv, broadcastEval = bcast)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        assert(got == want, s"seed $seed n $n bcast $bcast")
      }
    }
  }

  test("novelty ≡ naive distinct-shingle document-frequency counting (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 36241 + 3)
      val n = 2 + rnd.nextInt(3)
      val base = (1L to 10L).map(id => (id, doc(rnd, n + rnd.nextInt(12))))
      // some later docs copy an earlier one so non-novel shingles exist
      val docs = base.map { case (id, t) =>
        if (id > 5 && rnd.nextInt(3) == 0) (id, base((id - 6).toInt)._2) else (id, t)
      }
      val got = graft.text.TextAnalysis.novelty(docs.toDF("id", "text"), "id", "text", n = n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val all = docs.map { case (id, t) => id -> grams(t, n) }.toMap
      val dfreq = all.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val want = all.collect { case (id, g) if g.nonEmpty =>
        id -> ((g.size.toLong, g.count(dfreq(_) == 1).toLong))
      }
      assert(got == want, s"seed $seed n $n")
    }
  }

  test("HTML extraction never throws on malformed markup and is stable on its own output") {
    val rnd = new scala.util.Random(11L)
    val cases = Seq(
      "<p>hello world this is fine</p>",
      "<div><p>unclosed <b>tags everywhere",
      "<<<>>> <p <p <p", "", "&amp;&lt;&gt;&nbsp;&bogus;",
      "<script>var x = '<p>';</script>visible text here okay",
      "plain text with no tags at all, long enough to keep") ++
      (0 until 30).map { _ =>
        (0 until 8).map(_ => Seq("<p>", "</p>", "<div", ">", "text word here", "&amp;",
          "<b>bold</b>", "\n")(rnd.nextInt(8))).mkString(" ")
      }
    val out = cases.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    val r1 = graft.text.HtmlExtract.extract(out, "id", "html", minLineChars = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // extracting already-extracted text only ever loses tag-like noise,
    // never gains content
    val again = r1.toSeq.toDF("id", "html")
    val r2 = graft.text.HtmlExtract.extract(again, "id", "html", minLineChars = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, t2) <- r2) assert(t2.length <= r1(id).length + 1, s"case $id grew")
  }
}
