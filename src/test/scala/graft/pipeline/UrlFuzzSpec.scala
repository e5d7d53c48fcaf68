package graft.pipeline

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property fuzz of URL canonicalization: IDEMPOTENCE (the documented
  * spec requirement — canon∘canon ≡ canon, the property the
  * trailing-slash and param-sort rules were designed around), spec
  * conformance on structured random URLs (a naive Scala
  * implementation of the five documented rules), and total robustness
  * on garbage inputs (opaque strings pass through verbatim).
  */
class UrlFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def randUrl(rnd: scala.util.Random): String = {
    val scheme = Seq("http", "HTTP", "https", "HtTpS", "ftp")(rnd.nextInt(5))
    val host = Seq("Example.COM", "a.b.co.uk", "x.example.org", "WWW.Site.Net")(rnd.nextInt(4))
    val port = Seq("", ":80", ":443", ":8080")(rnd.nextInt(4))
    val path = Seq("", "/", "/a/b", "/a/b/", "/a//", "//", "/p%20q")(rnd.nextInt(7))
    val params = (0 until rnd.nextInt(4)).map(_ =>
      Seq("utm_source=x", "b=2", "a=1", "gclid=99", "ref=top", "z=", "fbclid=7", "c=3")(rnd.nextInt(8)))
    val q = if (params.isEmpty) "" else "?" + params.mkString("&")
    val frag = Seq("", "#top", "#sec-2")(rnd.nextInt(3))
    s"$scheme://$host$port$path$q$frag"
  }

  /** Naive mirror of the five documented rules. */
  private def naiveCanon(u: String): String = {
    val m = "^([A-Za-z][A-Za-z0-9+.-]*)://(.*)$".r
    u match {
      case m(sch0, rest0) =>
        val scheme = sch0.toLowerCase
        val hostport = rest0.takeWhile(c => c != '/' && c != '?' && c != '#').toLowerCase
        val (host, port) = hostport.split(":", 2) match {
          case Array(h, p) if p.nonEmpty && p.forall(_.isDigit) => (h, p)
          case _ => (hostport, "")
        }
        val keepPort = port.nonEmpty &&
          !(scheme == "http" && port == "80") && !(scheme == "https" && port == "443")
        val rest = rest0.drop(hostport.length)
        val noFrag = rest.takeWhile(_ != '#')
        val rawPath = noFrag.takeWhile(_ != '?')
        val stripped = rawPath.reverse.dropWhile(_ == '/').reverse
        val path = if (stripped.isEmpty) "/" else stripped
        val rawQuery = if (noFrag.contains('?')) noFrag.dropWhile(_ != '?').drop(1) else ""
        val params = rawQuery.split("&").filter(p => p.nonEmpty &&
          !p.matches("^(utm_[^=&]*|gclid|fbclid|ref)(=.*)?$")).sorted
        val q = if (params.isEmpty) "" else "?" + params.mkString("&")
        scheme + "://" + host + (if (keepPort) ":" + port else "") + path + q
      case _ => u
    }
  }

  test("canonicalizeUrl is idempotent and matches the naive five-rule spec (200 random URLs)") {
    val rnd = new scala.util.Random(20260814L)
    val urls = (0 until 200).map(_ => randUrl(rnd)).distinct
    val out = urls.toDF("u")
      .select(col("u"), Urls.canonicalizeUrl(col("u")).as("c"))
      .withColumn("cc", Urls.canonicalizeUrl(col("c")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    for ((u, c, cc) <- out) {
      assert(c == cc, s"not idempotent: $u → $c → $cc")
      assert(c == naiveCanon(u), s"spec mismatch for $u: got $c, want ${naiveCanon(u)}")
    }
  }

  test("garbage inputs pass through verbatim, never throw (structured fuzz)") {
    val rnd = new scala.util.Random(7L)
    val garbage = Seq("", "not a url", "mailto:a@b.c", "data:text/plain,x",
      "/relative/path", "://nohost", "ht!tp://x", "💩🚀", "a:b:c") ++
      (0 until 50).map(_ => rnd.nextString(1 + rnd.nextInt(12)))
    val out = garbage.toDF("u")
      .select(col("u"), Urls.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    for ((u, c) <- out if !u.matches("^[A-Za-z][A-Za-z0-9+.-]*://.*"))
      assert(c == u, s"opaque input changed: '$u' → '$c'")
  }
}
