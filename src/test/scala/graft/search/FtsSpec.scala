package graft.search

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class FtsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def docs = Seq(
    (1L, "spark joins hash tables quickly"),
    (2L, "merge sort beats hash join on sorted input"),
    (3L, "spark streaming with watermarks"),
    (4L, "the hash join and the merge join"),
    (5L, "quick brown fox")
  ).toDF("doc_id", "text")

  lazy val ix = Fts.Index.build(docs, "doc_id", "text")

  def ids(q: Fts.Q): Set[Long] =
    Fts.search(ix, q).collect().map(_.getLong(0)).toSet

  test("parseQuery builds the expected AST") {
    // reference precedence (parse/fts.rs PRATT): OR binds TIGHTER
    // than AND, NOT loosest
    assert(Fts.parseQuery("a AND b OR c") ==
      Fts.And(Seq(Fts.Term("a"), Fts.Or(Seq(Fts.Term("b"), Fts.Term("c"))))))
    assert(Fts.parseQuery("a NOT b") == Fts.Not(Fts.Term("a"), Fts.Term("b")))
    assert(Fts.parseQuery("NEAR(x y, 3)") == Fts.Near(Seq(Fts.Term("x"), Fts.Term("y")), 3))
  }

  test("malformed probes raise clean parse errors, not raw JVM exceptions") {
    for (bad <- Seq("NEAR(a b", "NEAR(a, x)", "NEAR(a,)", "NEAR(a, 3", "\"unterminated", ")"))
      intercept[IllegalArgumentException](Fts.parseQuery(bad))
  }

  test("term / and / or / not match sets") {
    assert(ids(Fts.Term("spark")) == Set(1L, 3L))
    assert(ids(Fts.And(Seq(Fts.Term("hash"), Fts.Term("join")))) == Set(2L, 4L))
    assert(ids(Fts.Or(Seq(Fts.Term("spark"), Fts.Term("fox")))) == Set(1L, 3L, 5L))
    assert(ids(Fts.Not(Fts.Term("hash"), Fts.Term("merge"))) == Set(1L))
  }

  test("near requires proximity") {
    assert(ids(Fts.Near(Seq(Fts.Term("hash"), Fts.Term("join")), 1)) == Set(2L, 4L))
    // doc 2: 'hash'(3) 'join'(4); widen to catch doc 1? no 'join' there
    assert(ids(Fts.Near(Seq(Fts.Term("spark"), Fts.Term("hash")), 2)) == Set(1L))
  }

  test("bm25 prefers rarer terms and shorter docs") {
    val scores = Fts.search(ix, Fts.Or(Seq(Fts.Term("fox"), Fts.Term("join"))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 'fox' appears in 1 doc, 'join' in 3 → fox doc should outscore single-join docs
    assert(scores(5L) > scores(2L))
  }

  test("stemmer conflates variants; stopword filter drops them") {
    val ix2 = Fts.Index.build(docs, "doc_id", "text", stopwords = true, stem = true)
    // 'joins' (doc 1) stems to 'join' like the query
    val withStem = Fts.search(ix2, Fts.Term("join")).collect().map(_.getLong(0)).toSet
    assert(withStem.contains(1L))
    // 'the' is stopped out of doc 4's index
    assert(Fts.search(ix2, Fts.Term("the")).collect().isEmpty)
  }

  test("NGram tokenizer enables substring search (fts/mod.rs:107)") {
    val ix2 = Fts.Index.build(docs, "doc_id", "text",
      Fts.Pipeline(tokenizer = "NGram", minGram = 3, maxGram = 3))
    // 'treaming' is a substring of 'streaming' (doc 3): its 3-grams all hit
    assert(Fts.search(ix2, Fts.Term("treaming")).collect().map(_.getLong(0)).toSet == Set(3L))
    // no doc contains 'zzz'
    assert(Fts.search(ix2, Fts.Term("zzz")).collect().isEmpty)
  }

  test("Whitespace and Raw tokenizers split as configured") {
    val ws = Fts.Index.build(docs, "doc_id", "text", Fts.Pipeline(tokenizer = "Whitespace"))
    // whitespace keeps punctuation attached: 'input' ends doc 2 without trailing punct
    assert(Fts.search(ws, Fts.Term("input")).collect().map(_.getLong(0)).toSet == Set(2L))
    val raw = Fts.Index.build(docs, "doc_id", "text", Fts.Pipeline(tokenizer = "Raw"))
    // raw: whole text is one token — only an exact full-string query matches
    assert(Fts.search(raw, Fts.Term("quick brown fox")).collect().map(_.getLong(0)).toSet == Set(5L))
    assert(Fts.search(raw, Fts.Term("quick")).collect().isEmpty)
  }

  test("RemoveLong and AsciiFolding filters") {
    val ix2 = Fts.Index.build(docs, "doc_id", "text", Fts.Pipeline(removeLong = Some(6)))
    // 'watermarks' (10 chars) is dropped from the index AND from queries
    assert(Fts.search(ix2, Fts.Term("watermarks")).collect().isEmpty)
    assert(Fts.search(ix2, Fts.Term("spark")).collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    import spark.implicits._
    val accented = Seq((1L, "crème brûlée récipe")).toDF("doc_id", "text")
    val folded = Fts.Index.build(accented, "doc_id", "text", Fts.Pipeline(asciiFolding = true))
    assert(Fts.search(folded, Fts.Term("creme")).collect().map(_.getLong(0)).toSet == Set(1L))
    assert(Fts.search(folded, Fts.Term("RÉCIPE")).collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("query terms pass through the index pipeline (stem + stopword both sides)") {
    val ix2 = Fts.Index.build(docs, "doc_id", "text", stopwords = true, stem = true)
    // un-stemmed query 'joins' must hit the stemmed posting 'join'
    val hits = Fts.search(ix2, Fts.Term("joins")).collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L, 4L))
    // a stopworded conjunct drops from an AND instead of emptying it
    val and = Fts.search(ix2, Fts.And(Seq(Fts.Term("the"), Fts.Term("fox"))))
      .collect().map(_.getLong(0)).toSet
    assert(and == Set(5L))
    // NEAR with an upper-cased, inflected term still matches by position
    assert(Fts.search(ix2, Fts.Near(Seq(Fts.Term("HASH"), Fts.Term("joins")), 2))
      .collect().map(_.getLong(0)).toSet.contains(2L))
  }

  test("persisted index round-trips: searchIndexed == in-memory search, pipe included") {
    val dir = "/tmp/graft_fts_persist_test"
    val pipe = Fts.Pipeline(stopwords = true, snowball = true, stemLang = "english")
    val pix = Fts.Index.build(docs, "doc_id", "text", pipe)
    Fts.writeIndex(dir, pix, buckets = 8)
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> (math.rint(r.getDouble(1) * 1e9) / 1e9)).toMap
    for (q <- Seq("hash AND join", "spark OR fox", "joins NOT merge", "the")) {
      val mem = scores(Fts.search(pix, Fts.parseQuery(q)))
      val disk = scores(Fts.searchIndexed(spark, dir, q))
      assert(disk == mem, s"query '$q': $disk != $mem")
    }
    // readIndex reproduces the index wholesale (stats + pipe intact)
    val rix = Fts.readIndex(spark, dir)
    assert(rix.n == pix.n && rix.avgdl == pix.avgdl && rix.pipe == pix.pipe)
    assert(scores(Fts.search(rix, Fts.parseQuery("hash AND join"))) ==
      scores(Fts.search(pix, Fts.parseQuery("hash AND join"))))
  }

  test("persisted-index probe reads only the query terms' bucket partitions") {
    val dir = "/tmp/graft_fts_persist_prune"
    Fts.writeIndex(dir, ix, buckets = 8)
    val res = Fts.searchIndexed(spark, dir, "fox")
    res.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val postScans = scans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("/postings")))
    assert(postScans.nonEmpty, "expected a file scan over the postings")
    postScans.foreach { f =>
      assert(f.selectedPartitions.partitionCount <= 1,
        s"one-term probe read ${f.selectedPartitions.partitionCount} of 8 bucket partitions")
    }
  }
}
