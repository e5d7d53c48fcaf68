package graft.search

import graft.functions.CozoFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Turnkey swap-in harnesses for the three DATA-blocked parity holes
  * (jieba dictionary, OpenCC t2s tables, Snowball golden vocabularies —
  * tools/swapin/README.md). Each hole gets
  *
  *   1. an always-on test feeding the loader a miniature file of the
  *      real format, proving the parse→activate path works, and
  *   2. an `assume`-gated test that picks up the REAL file when it is
  *      present at the documented hook path (env-overridable) and
  *      validates + activates it — deployment is dropping the file and
  *      running this suite.
  */
class SwapInSpecs extends AnyFunSuite {
  lazy val spark = graft.SparkFixture.spark

  private def hook(env: String, default: String): java.nio.file.Path =
    java.nio.file.Paths.get(sys.env.getOrElse(env, default))

  // ————————————————————————— jieba dictionary —————————————————————————

  test("jieba loader: miniature dict.txt activates and changes the cut") {
    val p = java.nio.file.Files.createTempFile("graft_jieba_mini", ".txt")
    // real dict.txt format: word freq [pos-tag]
    java.nio.file.Files.write(p,
      "深度学习 1000 n\n深度 300 n\n学习 500 v\n".getBytes("UTF-8"))
    try {
      Cangjie.loadDictLines(
        scala.io.Source.fromFile(p.toFile, "UTF-8").getLines())
      assert(Cangjie.dictionarySize == 3)
      assert(Cangjie.cut("深度学习") == Seq("深度学习"),
        "whole dictionary word must win over its parts")
    } finally {
      Cangjie.resetDictionary()
      java.nio.file.Files.deleteIfExists(p)
    }
    assert(Cangjie.cut("我们喜欢机器学习") == Seq("我们", "喜欢", "机器学习"),
      "reset must restore the seed dictionary")
  }

  test("jieba swap-in: full dict.txt at the hook path activates") {
    val p = hook("GRAFT_JIEBA_DICT", "tools/swapin/jieba_dict.txt")
    assume(java.nio.file.Files.exists(p),
      s"no jieba dictionary at $p — drop dict.txt there to activate")
    val before = Cangjie.dictionarySize
    Cangjie.loadDictLines(scala.io.Source.fromFile(p.toFile, "UTF-8").getLines())
    assert(Cangjie.dictionarySize > before,
      s"dictionary did not grow: ${Cangjie.dictionarySize} entries")
    // the canonical jieba README example segments correctly with the
    // full dictionary
    assert(Cangjie.cut("我来到北京清华大学").contains("清华大学"))
  }

  // ————————————————————————— OpenCC t2s tables —————————————————————————

  test("OpenCC loader: miniature TSCharacters/TSPhrases activate both t2s paths") {
    import spark.implicits._
    def t2sOf(s: String): String =
      Seq(Tuple1(s)).toDF("t").select(CozoFunctions.t2s(col("t"))).head().getString(0)
    try {
      // ANY swapped-in entries take the greedy longest-match UDF (the
      // strategy must not depend on entry COUNT — r9 fix for the ≤64
      // expression/UDF divergence on overlapping phrases);
      // 𫠆 is astral (non-BMP) — the loader must route it through the
      // string-level phrase pass, never translate()
      CozoFunctions.loadOpenCC(
        Iterator("龡\t吹", "龑\t𫠆", "# comment"), Iterator("龡龡測試\t测测试试"))
      assert(CozoFunctions.openCCLoaded == ((1, 2)))
      assert(t2sOf("龡龡測試") == "测测试试", "swapped-in phrase must win")
      assert(t2sOf("龡一") == "吹一", "swapped-in BMP char must apply")
      assert(t2sOf("龑一") == "𫠆一", "astral mapping must apply via the phrase pass")
      assert(t2sOf("瞭解") == "了解", "built-in phrases must survive the merge")
      // many more entries: same greedy UDF; results must stay consistent
      val filler = (0 until 70).map(i => f"填充詞$i%02d\t填充词$i%02d")
      CozoFunctions.loadOpenCC(
        Iterator("龡\t吹", "龑\t𫠆"),
        (Seq("龡龡測試\t测测试试") ++ filler).iterator)
      assert(t2sOf("龡龡測試") == "测测试试")
      assert(t2sOf("龡一") == "吹一")
      assert(t2sOf("龑一") == "𫠆一")
      assert(t2sOf("瞭解") == "了解")
      assert(t2sOf("乾燥的乾隆") == "干燥的乾隆",
        "built-in ambiguous-char phrases must hold on the UDF path")
    } finally CozoFunctions.resetOpenCC()
  }

  test("OpenCC swap-in: full tables at the hook path activate") {
    val dir = hook("GRAFT_OPENCC_DIR", "tools/swapin/opencc")
    val chars = dir.resolve("TSCharacters.txt")
    val phrases = dir.resolve("TSPhrases.txt")
    assume(java.nio.file.Files.exists(chars) && java.nio.file.Files.exists(phrases),
      s"no OpenCC tables under $dir — drop TSCharacters.txt/TSPhrases.txt there")
    import spark.implicits._
    try {
      val (nc, np) = CozoFunctions.loadOpenCC(
        scala.io.Source.fromFile(chars.toFile, "UTF-8").getLines(),
        scala.io.Source.fromFile(phrases.toFile, "UTF-8").getLines())
      assert(nc > 1000 && np > 1000, s"full tables expected, got $nc chars / $np phrases")
      val got = Seq(Tuple1("漢語和憑藉的乾燥")).toDF("t")
        .select(CozoFunctions.t2s(col("t"))).head().getString(0)
      assert(got == "汉语和凭借的干燥")
    } finally CozoFunctions.resetOpenCC()
  }

  // ———————————————————— Snowball golden vocabularies ————————————————————

  private def snowballDir = hook("GRAFT_SNOWBALL_VOC_DIR", "tools/swapin/snowball")

  test("snowball validator: a miniature voc/output pair diffs cleanly") {
    // english spec vectors in the official file format (one word/stem
    // per line, aligned)
    val dir = java.nio.file.Files.createTempDirectory("graft_snowball_mini")
    val lang = dir.resolve("english")
    java.nio.file.Files.createDirectories(lang)
    java.nio.file.Files.write(lang.resolve("voc.txt"),
      "consign\nconsigned\nconsigning\nconsignment\nknitting\nknot\n".getBytes("UTF-8"))
    java.nio.file.Files.write(lang.resolve("output.txt"),
      "consign\nconsign\nconsign\nconsign\nknit\nknot\n".getBytes("UTF-8"))
    val report = SwapInSpecs.diffSnowball(dir)
    assert(report == Map("english" -> ((6, 6))), s"unexpected report: $report")
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("snowball swap-in: golden vocabularies at the hook path validate the ports") {
    assume(java.nio.file.Files.isDirectory(snowballDir) &&
      java.nio.file.Files.list(snowballDir).findAny().isPresent,
      s"no golden vocabularies under $snowballDir — drop <lang>/voc.txt+output.txt there")
    val report = SwapInSpecs.diffSnowball(snowballDir)
    assert(report.nonEmpty, "no <lang>/voc.txt+output.txt pairs found")
    val failures = report.collect {
      case (lang, (ok, total)) if ok < total =>
        s"$lang: $ok/$total (${"%.2f".format(100.0 * ok / total)}%)"
    }
    // the ports are from-spec; the golden diff is the fidelity gate the
    // r6/r7 verdicts asked for — it must be EXACT to claim parity
    assert(failures.isEmpty,
      s"stemmer/vocabulary mismatches:\n  ${failures.mkString("\n  ")}")
  }
}

object SwapInSpecs {
  /** For each `<lang>/voc.txt` + `output.txt` under `dir`, stem every
    * word with this build's stemmer: (matches, total) per language.
    * Languages this build does not ship (arabic/greek/tamil) are
    * skipped — `::fts create` already fails loudly for them. */
  def diffSnowball(dir: java.nio.file.Path): Map[String, (Int, Int)] = {
    val sub = java.nio.file.Files.list(dir).iterator()
    val out = scala.collection.mutable.Map.empty[String, (Int, Int)]
    while (sub.hasNext) {
      val langDir = sub.next()
      val lang = langDir.getFileName.toString.toLowerCase
      val voc = langDir.resolve("voc.txt")
      val exp = langDir.resolve("output.txt")
      if (java.nio.file.Files.exists(voc) && java.nio.file.Files.exists(exp)) {
        Stemmers.forLanguage(lang).foreach { stem =>
          val words = scala.io.Source.fromFile(voc.toFile, "UTF-8").getLines().toSeq
          val expect = scala.io.Source.fromFile(exp.toFile, "UTF-8").getLines().toSeq
          require(words.length == expect.length,
            s"$lang: voc ${words.length} lines vs output ${expect.length}")
          val ok = words.zip(expect).count { case (w, e) => stem(w) == e }
          out(lang) = (ok, words.length)
        }
      }
    }
    out.toMap
  }
}
