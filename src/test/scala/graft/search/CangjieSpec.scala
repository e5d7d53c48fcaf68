package graft.search

import graft.SparkFixture
import graft.lang.CozoDb
import org.scalatest.funsuite.AnyFunSuite

/** Cangjie CJK tokenizer (fts/mod.rs:109-139): jieba-style dictionary
  * DP segmentation with the reference's four kinds, plus a CJK
  * index+query round-trip through `::fts create`.
  */
class CangjieSpec extends AnyFunSuite {

  test("default kind: max-probability dictionary cut") {
    assert(Cangjie.cut("我们喜欢机器学习") == Seq("我们", "喜欢", "机器学习"))
    assert(Cangjie.cut("人工智能时代") == Seq("人工智能", "时代"))
    // uncovered characters fall back to single codepoints
    assert(Cangjie.cut("我们齉龘") == Seq("我们", "齉", "龘"))
  }

  test("unicode kind: one token per CJK codepoint") {
    assert(Cangjie.cut("中国人", "unicode") == Seq("中", "国", "人"))
  }

  test("all kind: every dictionary word occurrence") {
    val toks = Cangjie.cut("人工智能", "all").toSet
    assert(toks.contains("人工"))
    assert(toks.contains("智能"))
    assert(toks.contains("人工智能"))
  }

  test("search kind: long words also emit their dictionary sub-words") {
    val toks = Cangjie.cut("机器学习", "search").toSet
    assert(toks.contains("机器学习"))
    assert(toks.contains("机器"))
    assert(toks.contains("学习"))
  }

  test("mixed CJK and ASCII text splits both ways") {
    assert(Cangjie.cut("我们用spark处理数据") == Seq("我们", "用", "spark", "处理", "数据"))
  }

  test("expanded dictionary: classic compounds and nested sub-word DP") {
    // the canonical jieba demo sentence segments into real words
    assert(Cangjie.cut("研究生命的起源") == Seq("研究生", "命", "的", "起源") ||
      Cangjie.cut("研究生命的起源") == Seq("研究", "生命", "的", "起源"))
    // DP picks the higher-probability parse for unambiguous compounds
    assert(Cangjie.cut("自然语言处理平台") == Seq("自然语言处理", "平台"))
    assert(Cangjie.cut("分布式服务器集群") == Seq("分布式", "服务器", "集群"))
    // search mode surfaces nested sub-words of the long compound
    val toks = Cangjie.cut("自然语言处理", "search").toSet
    assert(toks.contains("自然语言处理"))
    assert(toks.contains("自然"))
    assert(toks.contains("语言"))
    assert(toks.contains("处理"))
  }

  test("CJK ::fts create + probe round-trip (fts/mod.rs Cangjie)") {
    val spark = SparkFixture.spark
    val db = new CozoDb(spark)
    db.run(
      """?[k, v] <- [
        |  ['a', '我们喜欢机器学习和人工智能'],
        |  ['b', '今天北京天气很好'],
        |  ['c', '数据库查询引擎的索引搜索']
        |] :create zh {k}""".stripMargin)
    db.run(
      """::fts create zh:fts {
        |  extractor: v,
        |  tokenizer: Cangjie('search'),
        |  filters: []
        |}""".stripMargin)
    def probe(q: String): Set[String] =
      db.run(s"?[k] := ~zh:fts{k | query: '$q', k: 3}")
        .collect().map(_.getString(0)).toSet
    assert(probe("机器学习") == Set("a"))
    assert(probe("北京") == Set("b"))
    assert(probe("索引") == Set("c"))
    // multi-word CJK query segments and must hit via AND of its words
    assert(probe("人工智能") == Set("a"))
  }

  test("hmm: BMES Viterbi joins unknown single-char runs (jieba finalseg shape)") {
    // without hmm, unknown chars stay single codepoints
    val noHmm = Cangjie.cut("我们齉龘", hmm = false)
    assert(noHmm == Seq("我们", "齉", "龘"))
    // with hmm, structural invariants hold regardless of the emission
    // table: concatenation is lossless and known words are untouched
    val withHmm = Cangjie.cut("我们齉龘", hmm = true)
    assert(withHmm.head == "我们")
    assert(withHmm.mkString == "我们齉龘")
    // pinned emissions make a specific cut certain: 王 strongly B,
    // 晓 strongly M, 明 strongly E — the unknown run becomes one word
    val mk = (b: Double, m: Double, e: Double, s: Double) => Array(b, m, e, s)
    try {
      Cangjie.setHmmEmissions(Map(
        '王' -> mk(-1.0, -20.0, -20.0, -10.0),
        '晓' -> mk(-20.0, -1.0, -20.0, -10.0),
        '明' -> mk(-20.0, -20.0, -1.0, -10.0)))
      assert(Cangjie.viterbiCut("王晓明") == Seq("王晓明"))
      // and one where S-S-S wins: every char strongly single
      Cangjie.setHmmEmissions(Map(
        '王' -> mk(-20.0, -20.0, -20.0, -1.0),
        '晓' -> mk(-20.0, -20.0, -20.0, -1.0),
        '明' -> mk(-20.0, -20.0, -20.0, -1.0)))
      assert(Cangjie.viterbiCut("王晓明") == Seq("王", "晓", "明"))
      // full pipeline: the unknown run inside a sentence takes the cut
      Cangjie.setHmmEmissions(Map(
        '王' -> mk(-1.0, -20.0, -20.0, -10.0),
        '晓' -> mk(-20.0, -1.0, -20.0, -10.0),
        '明' -> mk(-20.0, -20.0, -1.0, -10.0)))
      assert(Cangjie.cut("我们王晓明朋友", hmm = true) == Seq("我们", "王晓明", "朋友"))
      assert(Cangjie.cut("我们王晓明朋友", hmm = false) == Seq("我们", "王", "晓", "明", "朋友"))
    } finally Cangjie.resetHmmEmissions()
    // default dictionary-derived emissions: deterministic, lossless,
    // and only over the leftover runs (words from the DP cut unchanged)
    val sent = Cangjie.cut("机器学习改变了出版业", hmm = true)
    assert(sent.mkString == "机器学习改变了出版业")
    assert(sent.contains("机器学习"))
  }

  test("::fts create Cangjie('default', true) wires use_hmm; non-boolean errors") {
    val spark = SparkFixture.spark
    val db = new CozoDb(spark)
    db.run("?[k, v] <- [['a', '我们喜欢机器学习']] :create zh2 {k}")
    db.run(
      """::fts create zh2:fts {
        |  extractor: v, tokenizer: Cangjie('default', true), filters: []
        |}""".stripMargin)
    assert(db.run("?[k] := ~zh2:fts{k | query: '机器学习', k: 3}")
      .collect().map(_.getString(0)).toSet == Set("a"))
    val e = intercept[Exception](db.run(
      """::fts create zh2:bad {
        |  extractor: v, tokenizer: Cangjie('default', 'yes'), filters: []
        |}""".stripMargin))
    assert(e.getMessage.contains("use_hmm"), e.getMessage)
  }

  test("dictionary swap-in extends segmentation (loadDictLines shape)") {
    val before = Cangjie.cut("量子计算")
    assert(before != Seq("量子计算")) // not in the seed dict as one word
    val saved = Cangjie.dictionarySize
    try {
      Cangjie.loadDictLines(Iterator("量子计算 50000", "量子 80000 n", "计算 90000"))
      assert(Cangjie.cut("量子计算") == Seq("量子计算"))
      assert(Cangjie.dictionarySize == 3)
    } finally {
      Cangjie.resetDictionary()
      assert(Cangjie.dictionarySize == saved)
    }
  }
}
