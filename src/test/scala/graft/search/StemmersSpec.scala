package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Multi-language Snowball stemmer vectors (from-the-spec ports,
  * Stemmers/StemmersWest). Vectors follow the published algorithm
  * descriptions at snowballstem.org — region computations and
  * longest-suffix semantics are exercised per step family. The
  * reference reaches the same algorithms through rust-stemmers
  * (fts/mod.rs:176-208).
  */
class StemmersSpec extends AnyFunSuite {

  private def check(lang: String, vectors: (String, String)*): Unit = {
    val f = Stemmers.forLanguage(lang).getOrElse(fail(s"$lang not shipped"))
    for ((in, want) <- vectors)
      assert(f(in) == want, s"$lang: $in -> ${f(in)} (want $want)")
  }

  test("german: plural/derivational suffixes, umlaut removal, ß->ss") {
    check("german",
      "häuser" -> "haus", "haus" -> "haus", "katzen" -> "katz",
      "bücher" -> "buch", "größe" -> "gross", "aufeinander" -> "aufeinand",
      "verständnisses" -> "verstandnis", "kategorie" -> "kategori",
      "möglichkeit" -> "moglich", "keiten" -> "keit",
      // lich outside R2 is kept
      "lieblich" -> "lieblich")
  }

  test("swedish: definite/plural endings, s-ending, step-3 lig/ig") {
    check("swedish",
      "jackorna" -> "jack", "flickorna" -> "flick", "möjligheten" -> "möj",
      "friskt" -> "frisk", "hundarnas" -> "hund", "tröttast" -> "trött")
  }

  test("norwegian: ene/et endings, heten* family") {
    check("norwegian",
      "huset" -> "hus", "båtene" -> "båt", "hetenes" -> "het",
      "vakreste" -> "vakrest", "billigste" -> "billigst")
  }

  test("danish: erne/et endings, double-consonant undouble, lig family") {
    check("danish",
      "huset" -> "hus", "bilerne" -> "bil", "bestemmelse" -> "bestem",
      "venligheden" -> "ven", "dejligst" -> "dej")
  }

  test("russian: noun/adjective/verb/gerund endings, derivational ость") {
    check("russian",
      "книги" -> "книг", "красивый" -> "красив", "важная" -> "важн",
      "столами" -> "стол", "возможностью" -> "возможн",
      "бегавшая" -> "бега", "программист" -> "программист",
      "программистов" -> "программист",
      // ё folds to е before stemming
      "весёлый" -> "весел")
  }

  test("dutch: en/e with undoubling, heid, lijk, heden->heid") {
    check("dutch",
      "lichamelijk" -> "licham", "bogen" -> "bog", "huizen" -> "huiz",
      "werkelijkheid" -> "werkelijk", "mogelijkheden" -> "mogelijk")
  }

  test("spanish: gerund/verb suffixes, attached pronouns, residual step") {
    check("spanish",
      "caminando" -> "camin", "niños" -> "niñ", "comieron" -> "com",
      "generosidad" -> "gener", "haciéndola" -> "hac",
      "construyeron" -> "constru",
      // longest-match prefers the verb reading erías over noun ías
      "librerías" -> "libr")
  }

  test("french: ement/ité/aux families, verb suffixes, undoubling") {
    check("french",
      "continuité" -> "continu", "majestueux" -> "majestu",
      "grandement" -> "grand", "nationale" -> "national",
      "nationaux" -> "national", "maisons" -> "maison",
      "voudriez" -> "voudr", "habituellement" -> "habituel")
  }

  test("italian: azione/ità, verb suffixes, final-vowel removal") {
    check("italian",
      "cantando" -> "cant", "felicità" -> "felic", "abitazione" -> "abit",
      "nazionali" -> "nazional", "mangiare" -> "mang")
  }

  test("portuguese: idade/amente, verb suffixes, nasal-vowel marking") {
    check("portuguese",
      "bonecas" -> "bonec", "felicidade" -> "felic",
      "trabalhando" -> "trabalh", "nacionais" -> "nacion",
      "rapidamente" -> "rapid", "corações" -> "coraçõ")
  }

  test("finnish: particle/possessive/case steps, LV and cv conditions, tidy") {
    check("finnish",
      // case step: ssa/stä endings, then step-5 plural i, step-6 cv tidy
      "taloissa" -> "talo", "koirien" -> "koir", "kaupungissa" -> "kaupung",
      // possessive än after stä, then case stä
      "edeltäjistään" -> "edeltäj", "edeltäjiinsä" -> "edeltäj",
      // particle kin after vowel; illative hXn with its echo-vowel check
      "kirjakin" -> "kirj", "talohon" -> "talo",
      // no ending: untouched stems keep their final o (not in a/ä/e/i)
      "talo" -> "talo")
  }

  test("romanian: plural/article step 0, combining suffixes, verbs, residual vowel") {
    check("romanian",
      "copilul" -> "copil", "frumoasă" -> "frumoas",
      // step 1 reduction aţiune -> at, then step 2 R2 delete
      "lucrează" -> "lucr", "cântând" -> "cânt",
      // ist-normalization keeps the ist stem
      "jurnalişti" -> "jurnalist", "jurnalism" -> "jurnalist",
      // step 0 ile -> i (not after ab), then residual i
      "cărţile" -> "cărţ", "zilele" -> "zil")
  }

  test("turkish: harmony-checked inflection stripping, final-consonant repair") {
    check("turkish",
      "kitaplar" -> "kitap",
      // sU possessive strips, then b -> p restoration
      "kitabı" -> "kitap",
      // chain: ablative + lArI plural-possessive; one-syllable stop
      "evlerinden" -> "ev",
      // UmUz possessive + ğ -> k restoration
      "çocuğumuz" -> "çocuk",
      // over-stripped vowel-final stem repaired by the d/g vowel append
      "kedim" -> "kedi",
      // nominal-verb past-tense chain
      "güzelliğini" -> "güzellik",
      // one-syllable words are never stemmed
      "ev" -> "ev", "at" -> "at")
  }

  test("hungarian: instrumental undoubling, cases, owners, plural") {
    check("hungarian",
      "fallal" -> "fal", "zsebbel" -> "zseb", // assimilated -val/-vel
      "házakat" -> "ház", "házban" -> "ház", "házaim" -> "ház",
      "gépekkel" -> "gép",
      // -hoz with á -> a restoration, then the owned-a step takes the rest
      "almához" -> "alm", "házában" -> "ház",
      "könyvek" -> "könyv")
  }

  test("dispatch: all shipped languages resolve; unshipped do not") {
    for (l <- Stemmers.shippedLanguages)
      assert(Stemmers.forLanguage(l).isDefined, l)
    for (l <- Seq("arabic", "greek", "tamil"))
      assert(Stemmers.forLanguage(l).isEmpty, l)
    assert(Stemmers.referenceLanguages.size == 18)
    // every shipped language is one the reference accepts
    Stemmers.shippedLanguages.foreach(l =>
      assert(Stemmers.referenceLanguages.contains(l), l))
  }

  test("stemmers are idempotent on their own output (index/query parity)") {
    val words = Map(
      "german" -> Seq("häuser", "katzen", "möglichkeit"),
      "swedish" -> Seq("jackorna", "möjligheten"),
      "norwegian" -> Seq("huset", "båtene"),
      "danish" -> Seq("bilerne", "bestemmelse"),
      "dutch" -> Seq("lichamelijk", "mogelijkheden"),
      "french" -> Seq("grandement", "habituellement"),
      "italian" -> Seq("cantando", "abitazione"),
      "portuguese" -> Seq("trabalhando", "felicidade"),
      "finnish" -> Seq("taloissa", "edeltäjistään", "koirien"),
      "romanian" -> Seq("copilul", "lucrează", "jurnalişti"),
      "turkish" -> Seq("kitaplar", "çocuğumuz", "evlerinden"),
      "hungarian" -> Seq("házakat", "fallal", "könyvek"))
    // a second application must not keep stripping (otherwise an
    // indexed stem and a stemmed query term could diverge)
    for ((lang, ws) <- words; w <- ws) {
      val f = Stemmers.forLanguage(lang).get
      val once = f(w)
      assert(f(once) == once, s"$lang: $w -> $once -> ${f(once)}")
    }
  }

  test("no stemmer throws on adversarial input (they run inside UDFs over raw corpus text)") {
    val rng = new scala.util.Random(42)
    val adversarial = Seq("", "a", "ß", "é", "ъь", "ñ", "x" * 300, "щщщ",
      "0123", "...", "ÄÖÜäöü", "łódź", "ꙮ", "🙂🙂", "mixedСмесь漢字") ++
      (1 to 200).map { _ =>
        val len = rng.nextInt(12) + 1
        (1 to len).map(_ => (rng.nextInt(0x2000) + 1).toChar).mkString
      }
    for (lang <- Stemmers.shippedLanguages; w <- adversarial) {
      val out = Stemmers.forLanguage(lang).get(w)
      assert(out != null, s"$lang returned null for ${w.take(20)}")
    }
  }

  test("stopwords: shipped codes resolve, reference codes validated") {
    for (c <- Stopwords.shippedCodes) {
      val l = Stopwords.forLang(c).get
      assert(l.nonEmpty)
      assert(l.distinct.size == l.size, s"$c has duplicates")
      assert(Stopwords.referenceCodes.contains(c), c)
    }
    assert(Stopwords.forLang("xx").isEmpty)
    assert(Stopwords.forLang("el").isEmpty) // reference-known, not shipped
    assert(Stopwords.referenceCodes.contains("el"))
    // every shipped stemmer language has a shipped stopword list
    for (l <- Stemmers.shippedLanguages) {
      val code = Map("danish" -> "da", "dutch" -> "nl", "english" -> "en",
        "finnish" -> "fi", "french" -> "fr", "german" -> "de",
        "hungarian" -> "hu", "italian" -> "it", "norwegian" -> "no",
        "portuguese" -> "pt", "romanian" -> "ro", "russian" -> "ru",
        "spanish" -> "es", "swedish" -> "sv", "turkish" -> "tr")(l)
      assert(Stopwords.forLang(code).isDefined, s"$l -> $code")
    }
  }
}
