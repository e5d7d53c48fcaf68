package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl corpora: canonicalization (so the same
  * page fetched under cosmetic URL variants dedups exactly),
  * registrable-domain extraction, and per-domain document caps (the
  * standard anti-over-representation curation step — no single site
  * should dominate a training mix).
  *
  * Everything is a codegen'd column expression (regexp_extract / split /
  * filter / array_sort / concat) — the 100 TB shape is a pure projection
  * over the scan; only the per-domain cap shuffles, and it shuffles by
  * domain (billions of groups — well-distributed; a pathological
  * single-domain crawl is exactly the case the cap exists to cut, and
  * rank-beyond-cap rows can be dropped by a pre-aggregated count join if
  * one domain ever dominated a shuffle).
  *
  * Canonicalization spec (fixed order, engine-portable — the DuckDB
  * oracle runs the same chain):
  *   1. scheme and host lowercase; userinfo is out of scope (crawl URLs);
  *   2. default ports drop (`:80` for http, `:443` for https);
  *   3. the fragment drops;
  *   4. tracking params drop — name matches `utm_*`, `gclid`, `fbclid`,
  *      or `ref` — and surviving params sort bytewise (param ORDER is
  *      transport noise, not content identity);
  *   5. trailing slashes drop; an empty or all-slash path becomes `/`
  *      (stripping exactly one slash would not be idempotent).
  */
object Urls {

  private val trackingParam = "^(utm_[^=&]*|gclid|fbclid|ref)(=.*)?$"

  /** The canonical form of a URL column per the object-level spec.
    * Inputs without a `scheme://` prefix (mailto:, data:, relative
    * paths, plain garbage — all present in real crawl frontiers) pass
    * through VERBATIM: canonicalization must never conflate two
    * distinct opaque strings, and filtering non-fetchable schemes is
    * the caller's policy, not a hash-time surprise. */
  def canonicalizeUrl(url: Column): Column = {
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), canonicalizeHierarchical(url))
      .otherwise(url)
  }

  private def canonicalizeHierarchical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(afterScheme, "^([^/?#]*)", 1))
    val host = regexp_extract(hostport, "^([^:]*)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rest = regexp_replace(afterScheme, "^[^/?#]*", "") // path?query#frag
    val noFrag = regexp_replace(rest, "#.*$", "")
    val rawPath = regexp_extract(noFrag, "^([^?]*)", 1)
    // strip ALL trailing slashes (stripping just one is not idempotent
    // on '/a//'); an all-slash or empty path normalizes to '/'
    val strippedPath = regexp_replace(rawPath, "/+$", "")
    val pathFinal = when(strippedPath === "", lit("/")).otherwise(strippedPath)
    val rawQuery = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingParam))
    val query = array_join(array_sort(params), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      pathFinal,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** Multi-part TLDs recognized by the registrable-domain heuristic.
    * A full public-suffix list is swap-in data; these cover the common
    * ccTLD second-level registries. */
  val multiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "co.in", "co.nz", "com.br", "com.mx", "com.cn")

  /** Registrable domain of a host: last 3 labels when the last 2 form a
    * recognized multi-part TLD, else last 2 (a host that IS a TLD or a
    * single label returns itself). */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val tlds = array(multiPartTlds.map(lit): _*)
    when(n >= 3 && array_contains(tlds, lastTwo), array_join(slice(labels, -3, 3), "."))
      .when(n >= 2, lastTwo)
      .otherwise(host)
  }

  /** Host component of an (already canonical) URL. */
  def hostOf(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/:?#]*)", 1)

  /** Canonical-URL dedup + per-domain cap over a crawl relation.
    * One row per distinct canonical URL: the keeper id is the MIN id
    * over that URL's fetches (deterministic); `rank` orders the
    * domain's URLs by (id, url) and `keep` marks rank ≤ `cap`.
    * Two shuffles total: the URL-level aggregate, then the domain
    * window — both keyed on high-cardinality columns. */
  def dedupAndCap(df: DataFrame, idCol: String, urlCol: String,
                  cap: Int): DataFrame = {
    val canon = df.select(col(idCol).as("id"), canonicalizeUrl(col(urlCol)).as("url"))
    val perUrl = canon.groupBy("url").agg(min(col("id")).as("id"))
      .withColumn("domain", registrableDomain(hostOf(col("url"))))
    perUrl.withColumn("rank",
        row_number().over(Window.partitionBy(col("domain")).orderBy(col("id"), col("url")))
          .cast("long"))
      .withColumn("keep", col("rank") <= cap)
  }
}
