package graft.search

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Reference-exact FTS semantics: the grammar shapes of
  * parse/fts.rs:145-162 (its own test_parse) and the ACTUAL scorer of
  * fts/indexing.rs:110-247 — tf·idf·boost literals, And = intersect +
  * sum, Or = union + MAX, Not = remove, NEAR chained windows —
  * hand-computed on a micro corpus. */
class FtsRefSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import Fts._

  test("reference grammar shapes (parse/fts.rs test_parse)") {
    assert(parseQuery(" hello world OR bye bye world") ==
      Or(Seq(Term("hello world"), Term("bye bye world"))))
    assert(parseQuery(" hello world AND bye bye world") ==
      And(Seq(Term("hello world"), Term("bye bye world"))))
    assert(parseQuery(" hello world NOT bye bye NOT 'ok, mates'") ==
      Not(Not(Term("hello world"), Term("bye bye")), Term("ok, mates")))
    parseQuery(""" NEAR(abc def "ghi"^22.8) """) match {
      case Near(ts, 10) =>
        assert(ts.map(_.t) == Seq("abc", "def", "ghi") && ts(2).boost == 22.8)
      case other => fail(s"expected Near, got $other")
    }
    // NEAR/k distance form; legacy NEAR(a b, k) stays accepted
    assert(parseQuery("NEAR/3(abc def)") == Near(Seq(Term("abc"), Term("def")), 3))
    assert(parseQuery("NEAR(abc def, 3)") == Near(Seq(Term("abc"), Term("def")), 3))
    // `,` and `;` are OR (cozoscript.pest fts_or)
    assert(parseQuery("aa, bb; cc") == Or(Seq(Or(Seq(Term("aa"), Term("bb"))), Term("cc"))))
    // precedence: NOT loosest, then AND, OR tightest (parse/fts.rs PRATT)
    assert(parseQuery("aa AND bb OR cc") ==
      And(Seq(Term("aa"), Or(Seq(Term("bb"), Term("cc"))))))
    assert(parseQuery("aa NOT bb AND cc") ==
      Not(Term("aa"), And(Seq(Term("bb"), Term("cc")))))
    // prefix marker and boosts
    assert(parseQuery("wor*") == Term("wor", prefix = true))
    assert(parseQuery("word^2.5") == Term("word", boost = 2.5))
    // juxtaposed exprs And at the top (fts_doc)
    assert(parseQuery("aa (bb OR cc)") ==
      And(Seq(Term("aa"), Or(Seq(Term("bb"), Term("cc"))))))
  }

  private def microIx = {
    import spark.implicits._
    val docs = Seq((1L, "aa aa bb"), (2L, "aa cc"), (3L, "bb cc cc")).toDF("id", "text")
    Fts.Index.build(docs, "id", "text")
  }

  private def res(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) ->
      BigDecimal(r.getDouble(1)).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap

  private def r8(d: Double): Double =
    BigDecimal(d).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tf_idf literal / And / Or / Not scoring matches hand computation (indexing.rs:231-247)") {
    val ix = microIx
    def idf(df: Double): Double = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    // aa: docs 1 (tf 2), 2 (tf 1); df = 2
    assert(res(searchRef(ix, Term("aa"))) ==
      Map(1L -> r8(2 * idf(2)), 2L -> r8(1 * idf(2))))
    // boost multiplies
    assert(res(searchRef(ix, Term("aa", boost = 2.0))) ==
      Map(1L -> r8(4 * idf(2)), 2L -> r8(2 * idf(2))))
    // score_kind tf drops the idf
    assert(res(searchRef(ix, Term("aa"), "tf")) == Map(1L -> 2.0, 2L -> 1.0))
    // And: intersection, scores SUM
    assert(res(searchRef(ix, And(Seq(Term("aa"), Term("bb"))))) ==
      Map(1L -> r8(2 * idf(2) + 1 * idf(2))))
    // Or: union, scores MAX (not sum)
    val orRes = res(searchRef(ix, Or(Seq(Term("aa"), Term("cc")))))
    assert(orRes == Map(
      1L -> r8(2 * idf(2)),
      2L -> r8(math.max(1 * idf(2), 1 * idf(2))),
      3L -> r8(2 * idf(2))))
    // Not removes
    assert(res(searchRef(ix, Not(Term("aa"), Term("bb")))).keySet == Set(2L))
    // duplicate literal under And sums twice (FxHashMap fold)
    assert(res(searchRef(ix, And(Seq(Term("aa"), Term("aa"))))) ==
      Map(1L -> r8(4 * idf(2)), 2L -> r8(2 * idf(2))))
    // prefix literal: matches every term starting 'a' — doc-entry df
    // counts ENTRIES and per-doc tf is the LARGEST matching term's
    val pre = res(searchRef(ix, Term("aa", prefix = true)))
    assert(pre.keySet == Set(1L, 2L))
  }

  test("NEAR chained-window scoring: tf = surviving positions, summed boosters, node-level df (indexing.rs:163-219)") {
    import spark.implicits._
    // doc 1: xx .. yy adjacent; doc 2: xx far from yy
    val docs = Seq((1L, "xx yy zz"), (2L, "xx aa aa aa aa yy")).toDF("id", "text")
    val ix = Fts.Index.build(docs, "id", "text")
    val near2 = res(searchRef(ix, Near(Seq(Term("xx"), Term("yy")), 2)))
    // only doc 1 survives dist 2; tf = 1 surviving position, df = 1,
    // booster = 1+1 = 2
    assert(near2.keySet == Set(1L))
    val idf1 = math.log(1.0 + (2.0 - 1 + 0.5) / 1.5)
    assert(near2(1L) == r8(1 * idf1 * 2.0))
    // wider window admits doc 2 as well
    assert(res(searchRef(ix, Near(Seq(Term("xx"), Term("yy")), 5))).keySet == Set(1L, 2L))
    // three literals chain pairwise: xx->yy->zz within 2 only in doc 1
    assert(res(searchRef(ix, Near(Seq(Term("xx"), Term("yy"), Term("zz")), 2))).keySet == Set(1L))
  }

  test("the script path defaults to the reference scorer; score_kind: selects tf and bm25") {
    val db = new graft.lang.CozoDb(spark)
    db.run("?[k, v] <- [[1, 'aa aa bb'], [2, 'aa cc'], [3, 'bb cc cc']] :create sd {k}")
    db.run("::fts create sd:fts {extractor: v, tokenizer: Simple, filters: [Lowercase]}")
    def idf(df: Double): Double = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
    val tfidf = db.run("?[k, s] := ~sd:fts{k | query: 'aa', k: 10, bind_score: s}")
      .collect().map(r => r.getLong(0) -> r8(r.getDouble(1))).toMap
    assert(tfidf == Map(1L -> r8(2 * idf(2)), 2L -> r8(1 * idf(2))))
    val tf = db.run("?[k, s] := ~sd:fts{k | query: 'aa', k: 10, bind_score: s, score_kind: 'tf'}")
      .collect().map(r => r.getLong(0) -> r8(r.getDouble(1))).toMap
    assert(tf == Map(1L -> 2.0, 2L -> 1.0))
    // bm25 is reachable as the documented extension
    val bm = db.run("?[k, s] := ~sd:fts{k | query: 'aa', k: 10, bind_score: s, score_kind: 'bm25'}")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bm.keySet == Set(1L, 2L) && bm(1L) > bm(2L))
    val e = intercept[Exception](
      db.run("?[k] := ~sd:fts{k | query: 'aa', k: 1, score_kind: 'nope'}"))
    assert(e.getMessage.contains("score_kind"))
    // boosts reach the score through the script string
    val boosted = db.run("?[k, s] := ~sd:fts{k | query: 'aa^3', k: 10, bind_score: s}")
      .collect().map(r => r.getLong(0) -> r8(r.getDouble(1))).toMap
    assert(boosted == Map(1L -> r8(6 * idf(2)), 2L -> r8(3 * idf(2))))
  }
}
