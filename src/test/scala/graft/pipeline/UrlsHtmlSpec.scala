package graft.pipeline

import graft.SparkFixture
import graft.text.HtmlExtract
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization / per-domain caps (Urls.scala), HTML text
  * extraction (HtmlExtract.scala), and Bloom-prefiltered
  * decontamination (Decontaminate.bloomOverlap) — hand-computed
  * vectors plus equivalence against the exact (un-prefiltered) plan.
  */
class UrlsHtmlSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(Urls.canonicalizeUrl(col("u")).as("c"))
      .collect().head.getString(0)
  }

  test("canonicalizeUrl: case, ports, fragments, tracking params, param sort, slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1&fbclid=z#frag")
      === "https://www.example.com/A/b?a=1&b=2")
    assert(canon("http://host.org:80/") === "http://host.org/")
    assert(canon("http://host.org:8080/x") === "http://host.org:8080/x")
    assert(canon("https://h.net") === "https://h.net/")
    assert(canon("https://h.net/p/?ref=tw") === "https://h.net/p")
    assert(canon("https://h.net/p?gclid=1&utm_medium=m") === "https://h.net/p")
    // path case is preserved; query order is not
    assert(canon("https://A.B/Path?z=1&y=2") === "https://a.b/Path?y=2&z=1")
  }

  test("registrableDomain: multi-part TLDs take three labels, others two") {
    import spark.implicits._
    val hosts = Seq("www.bbc.co.uk", "news.example.com", "a.b.c.com.au",
      "example.com", "localhost")
    val out = hosts.toDF("h").select(col("h"), Urls.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("www.bbc.co.uk") === "bbc.co.uk")
    assert(out("news.example.com") === "example.com")
    assert(out("a.b.c.com.au") === "c.com.au")
    assert(out("example.com") === "example.com")
    assert(out("localhost") === "localhost")
  }

  test("dedupAndCap: keeper is min id per canonical url, rank caps per domain") {
    import spark.implicits._
    val crawl = Seq(
      (10L, "https://A.com/x?utm_source=1"), // dups of the same page
      (3L, "https://a.com/x/"),
      (7L, "https://a.com/x#top"),
      (5L, "https://a.com/y"),
      (6L, "https://b.com/z")).toDF("doc_id", "url")
    val out = Urls.dedupAndCap(crawl, "doc_id", "url", cap = 1)
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("id"), r.getAs[String]("domain"), r.getAs[Long]("rank"), r.getAs[Boolean]("keep")))).toMap
    assert(out.size === 3, "three distinct canonical urls")
    assert(out("https://a.com/x") === ((3L, "a.com", 1L, true)))
    assert(out("https://a.com/y") === ((5L, "a.com", 2L, false)), "beyond cap in its domain")
    assert(out("https://b.com/z") === ((6L, "b.com", 1L, true)))
  }

  test("HtmlExtract: scripts/styles/comments drop, blocks break lines, entities decode") {
    import spark.implicits._
    val html = "<html><head><style>p { x }</style><script>if (1 < 2) alert('&amp;')</script>" +
      "</head><body><h1>A Real Headline</h1><!-- hidden --><p>First paragraph with enough text.</p>" +
      "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;3&nbsp;ok</p><a href='/n'>nav</a><div>ok</div></body></html>"
    val out = Seq((1L, html)).toDF("doc_id", "html")
    val r = HtmlExtract.extract(out, "doc_id", "html", minLineChars = 10).collect().head
    val content = r.getAs[String]("content")
    assert(content === Seq(
      "A Real Headline",
      "First paragraph with enough text.",
      "Tom & Jerry say \"hi\" <3 ok").mkString("\n"))
    assert(r.getAs[Long]("n_lines") === 3L) // 'nav'/'ok' lines are sub-floor chrome
    assert(r.getAs[Long]("n_chars") === content.length.toLong)
    // single-pass entity decode: &amp;lt; becomes &lt;, not <
    val once = Seq((1L, "<p>one pass here: &amp;lt; stays encoded</p>")).toDF("doc_id", "html")
    val c2 = HtmlExtract.extract(once, "doc_id", "html", 5).collect().head.getAs[String]("content")
    assert(c2 === "one pass here: &lt; stays encoded")
  }

  test("canonicalizeUrl: non-hierarchical and garbage inputs pass through verbatim") {
    assert(canon("mailto:someone@example.com") === "mailto:someone@example.com")
    assert(canon("data:text/plain;base64,SGk=") === "data:text/plain;base64,SGk=")
    assert(canon("not a url at all") === "not a url at all")
    assert(canon("/relative/path?x=1") === "/relative/path?x=1")
    assert(canon("") === "")
    // unknown scheme: canonicalized but its port is not a default, kept
    assert(canon("FTP://Host.COM:21/file") === "ftp://host.com:21/file")
  }

  test("splitByGroup: whole groups share one split, portable hash matches spec") {
    import graft.pipeline.Sampling
    val out = Sampling.splitByGroup(docs, "source", trainPct = 60, valPct = 20, portable = true)
      .select("source", "split").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1))
    // one split per group — no group straddles
    assert(out.map(_._1).distinct.length === out.length, s"a group got two splits: ${out.toSeq}")
    // spot-check the md5 bucket arithmetic against a JVM recompute
    out.foreach { case (src, split) =>
      val hex = java.security.MessageDigest.getInstance("MD5").digest(src.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val b = java.lang.Long.parseLong(hex, 16) % 100
      val expect = if (b < 60) "train" else if (b < 80) "val" else "test"
      assert(split === expect, s"$src bucket $b")
    }
  }

  test("shuffledPositions: a permutation of 0..n-1, ordered by the portable hash") {
    import graft.pipeline.Sampling
    val out = Sampling.shuffledPositions(docs.select("doc_id"), "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("position"))
    val n = out.length
    assert(out.map(_._2).sorted.toSeq === (0L until n).toSeq, "positions are exactly 0..n-1")
    // order agrees with a driver-side sort by (md5-prefix, id)
    def key(id: Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = out.map(_._1).sortBy(id => (key(id), id)).zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    out.foreach { case (id, pos) => assert(pos === expected(id), s"doc $id") }
  }

  test("bloomOverlap equals the exact ngramOverlap (no false negatives by construction)") {
    val train = docs.filter(col("doc_id") % 11 =!= 0)
    val eval = docs.filter(col("doc_id") % 11 === 0)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("train_id"),
        r.getAs[Long]("overlap_ngrams"), r.getAs[Long]("eval_docs"))).toSet
    val exact = key(Decontaminate.ngramOverlap(train, "doc_id", "text", eval, "doc_id", "text", n = 4))
    val bloom = key(Decontaminate.bloomOverlap(train, "doc_id", "text", eval, "doc_id", "text", n = 4))
    assert(bloom === exact)
  }
}
