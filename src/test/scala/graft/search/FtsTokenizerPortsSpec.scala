package graft.search

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer-behavior ports from the reference's tantivy-derived FTS
  * stack (cozo-core/src/fts/tokenizer modules): n-gram emission incl.
  * non-ASCII and prefix mode, ASCII folding incl. the Latin-1
  * expansions, RemoveLong, and stopword filtering. Token ORDER differs
  * (we emit grams grouped by n, the reference interleaves by position)
  * so multisets are compared — search semantics only consume the set.
  */
class FtsTokenizerPortsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  def toks(text: String, p: Fts.Pipeline): Seq[String] =
    Seq(text).toDF("t").select(Fts.tokenizeWith(col("t"), p).as("x"))
      .collect().head.getSeq[String](0)

  def ngramP(min: Int, max: Int, prefix: Boolean = false) =
    Fts.Pipeline(tokenizer = "NGram", minGram = min, maxGram = max,
      prefixOnly = prefix, lowercase = false, stopwords = false, stem = false)

  test("ngram all_ngrams(1,2) on 'hello' (ngram_tokenizer.rs:349)") {
    assert(toks("hello", ngramP(1, 2)).sorted ==
      Seq("h", "he", "e", "el", "l", "ll", "l", "lo", "o").sorted)
  }

  test("ngram min==max(3,3) on 'hello' (ngram_tokenizer.rs:363)") {
    assert(toks("hello", ngramP(3, 3)) == Seq("hel", "ell", "llo"))
  }

  test("ngram prefix_only(2,5) on 'frankenstein' (ngram_tokenizer.rs:372)") {
    assert(toks("frankenstein", ngramP(2, 5, prefix = true)) ==
      Seq("fr", "fra", "fran", "frank"))
  }

  test("ngram non-ascii all_ngrams(1,2) on 'hεllo' (ngram_tokenizer.rs:382)") {
    assert(toks("hεllo", ngramP(1, 2)).sorted ==
      Seq("h", "hε", "ε", "εl", "l", "ll", "l", "lo", "o").sorted)
  }

  test("ngram non-ascii prefix(2,5) on 'hεllo' (ngram_tokenizer.rs:397)") {
    assert(toks("hεllo", ngramP(2, 5, prefix = true)) ==
      Seq("hε", "hεl", "hεll", "hεllo"))
  }

  test("ngram of empty string is empty (ngram_tokenizer.rs:407)") {
    assert(toks("", ngramP(1, 5)).isEmpty)
    assert(toks("", ngramP(2, 5)).isEmpty)
  }

  test("ascii folding (ascii_folding_filter.rs:1549)") {
    assert(Fts.asciiFoldStr("Ràmon") == "Ramon")
    assert(Fts.asciiFoldStr("accentué") == "accentue")
    assert(Fts.asciiFoldStr("âäàéè") == "aaaee")
    assert(Fts.asciiFoldStr("Usagi") == "Usagi") // no change
  }

  test("ascii folding: Latin-1 expansions (ascii_folding_filter.rs:1580)") {
    assert(Fts.asciiFoldStr("À LA CHAÎNE") == "A LA CHAINE")
    assert(Fts.asciiFoldStr("Æ") == "AE")
    assert(Fts.asciiFoldStr("œuf") == "oeuf")
    assert(Fts.asciiFoldStr("straße") == "strasse")
    assert(Fts.asciiFoldStr("Þ ø Ĳ ﬁ") == "TH o IJ fi")
    // non-letter symbols pass through unmodified (:1618)
    assert(Fts.asciiFoldStr("§ ¦ ¤ END") == "§ ¦ ¤ END")
  }

  test("remove_long limit 6 keeps only short tokens (remove_long.rs:78)") {
    val p = Fts.Pipeline(tokenizer = "Simple", lowercase = false,
      stopwords = false, stem = false, removeLong = Some(6))
    assert(toks("hello tantivy, happy searching!", p) == Seq("hello", "happy"))
  }

  test("AlphaNumOnly drops tokens with non-alphanumeric chars (fts/mod.rs:141)") {
    val p = Fts.Pipeline(tokenizer = "Whitespace", alphaNumOnly = true)
    assert(Fts.tokenizeTermStr("hello", p) == Seq("hello"))
    assert(Fts.tokenizeTermStr("can't", p).isEmpty)
    assert(Fts.tokenizeTermStr("café42", p) == Seq("café42")) // unicode letters count
  }

  test("SplitCompoundWords splits full decompositions only (fts/mod.rs:153)") {
    val dict = Seq("dampf", "schiff", "fahrt")
    val p = Fts.Pipeline(tokenizer = "Whitespace", compoundWords = dict)
    assert(Fts.tokenizeTermStr("dampfschifffahrt", p) == Seq("dampf", "schiff", "fahrt"))
    // partial coverage → token unchanged
    assert(Fts.tokenizeTermStr("dampfboot", p) == Seq("dampfboot"))
    // a bare dictionary word is NOT split (needs >= 2 parts)
    assert(Fts.tokenizeTermStr("schiff", p) == Seq("schiff"))
    // index side agrees
    val spark = graft.SparkFixture.spark
    import spark.implicits._
    val toks = Seq(Tuple1("die dampfschifffahrt beginnt")).toDF("text")
      .select(Fts.tokenizeWith(org.apache.spark.sql.functions.col("text"), p))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("die", "dampf", "schiff", "fahrt", "beginnt"))
  }

  test("fts query parser shapes (parse/fts.rs:147)") {
    assert(Fts.parseQuery(" hello world OR bye bye world").isInstanceOf[Fts.Or])
    assert(Fts.parseQuery(" hello world AND bye bye world").isInstanceOf[Fts.And])
    assert(Fts.parseQuery(" hello world NOT bye bye NOT 'ok, mates'").isInstanceOf[Fts.Not])
    Fts.parseQuery(""" NEAR(abc def "ghi"^22.8) """) match {
      case Fts.Near(ts, dist) => assert(dist == 10 && ts.map(_.t).contains("abc"))
      case other => fail(s"expected Near, got $other")
    }
  }

  test("stop words are dropped (stop_word_filter/mod.rs:151)") {
    val p = Fts.Pipeline(tokenizer = "Simple", lowercase = true,
      stopwords = true, stem = false)
    val out = toks("i am a cat. as yet i have no name.", p)
    assert(out.contains("cat") && out.contains("name"))
    assert(!out.contains("i") && !out.contains("a") && !out.contains("am"))
  }
}
