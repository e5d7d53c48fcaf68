package graft.search

/** Non-English Snowball stemmers — from-the-spec ports of the published
  * public algorithms (snowballstem.org). The reference exposes the same
  * family through its FTS `Stemmer(language)` token filter
  * (fts/mod.rs:176-208, via the rust-stemmers crate); [[Fts]] applies
  * the selected stemmer identically on the index side (array transform
  * over tokenized text) and the query side (driver mirror).
  *
  * Each stemmer is a pure `String => String` over a lower-cased token.
  * The ports follow the published algorithm text (regions, longest-
  * suffix-match, per-suffix conditions); the per-language specs carry
  * curated test vectors in FtsStemmerSpec. Languages the reference
  * accepts but this build does not ship (arabic, greek, tamil — their
  * published algorithms hinge on word/affix data not reproducible
  * offline with fidelity) raise a clear error at `::fts create`
  * instead of silently stemming with the wrong algorithm.
  */
object Stemmers {

  /** Languages the reference's Stemmer filter accepts (fts/mod.rs:188-205). */
  val referenceLanguages: Set[String] = Set(
    "arabic", "danish", "dutch", "english", "finnish", "french", "german",
    "greek", "hungarian", "italian", "norwegian", "portuguese", "romanian",
    "russian", "spanish", "swedish", "tamil", "turkish")

  /** The stemmer for `lang`, if shipped in this build. */
  def forLanguage(lang: String): Option[String => String] =
    lang.toLowerCase match {
      case "english" => Some(Snowball.stem)
      case "german" => Some(german)
      case "swedish" => Some(swedish)
      case "norwegian" => Some(norwegian)
      case "danish" => Some(danish)
      case "russian" => Some(russian)
      case "dutch" => Some(StemmersWest.dutch)
      case "spanish" => Some(StemmersWest.spanish)
      case "french" => Some(StemmersWest.french)
      case "italian" => Some(StemmersWest.italian)
      case "portuguese" => Some(StemmersWest.portuguese)
      case "finnish" => Some(StemmersEast.finnish)
      case "romanian" => Some(StemmersEast.romanian)
      case "turkish" => Some(StemmersEast.turkish)
      case "hungarian" => Some(StemmersEast.hungarian)
      case _ => None
    }

  def shippedLanguages: Seq[String] = Seq("danish", "dutch", "english",
    "finnish", "french", "german", "hungarian", "italian", "norwegian",
    "portuguese", "romanian", "russian", "spanish", "swedish", "turkish")

  // ——————————————————— shared region machinery ———————————————————

  /** Start of the standard region: after the first non-vowel following
    * a vowel, scanning from `from` (spec: R1; R2 = same applied again
    * from R1). */
  private def region(w: String, from: Int, isV: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !isV(w(i))) i += 1
    while (i < w.length && isV(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** suffix starts at or after the region boundary. */
  private def inR(w: String, suf: String, r: Int): Boolean =
    w.endsWith(suf) && w.length - suf.length >= r

  private def dropSuf(w: String, n: Int): String = w.substring(0, w.length - n)

  // —————————————————————————— German ——————————————————————————

  private val deVowels = "aeiouyäöü"
  private def deV(c: Char) = deVowels.indexOf(c) >= 0
  private val deSEnd = "bdfghklmnrt"
  private val deStEnd = "bdfghklmnt"

  /** Snowball German stemmer (snowballstem.org german). */
  def german(word0: String): String = {
    if (word0 == null || word0.length < 2) return word0
    var w = word0.toLowerCase.replace("ß", "ss")
    // protect u/y between vowels from being treated as vowels
    if (w.length > 2) {
      val sb = new StringBuilder(w)
      var i = 1
      while (i < sb.length - 1) {
        if ((sb(i) == 'u' || sb(i) == 'y') && deV(sb(i - 1)) && deV(sb(i + 1)))
          sb(i) = sb(i).toUpper
        i += 1
      }
      w = sb.toString
    }
    var r1 = region(w, 0, deV)
    val r2 = region(w, r1, deV)
    // R1 boundary moved right so at least 3 letters precede it
    if (r1 < 3) r1 = math.min(3, w.length)

    // step 1, longest of: em ern er | e en es (+niss fixup) | s (valid s-ending)
    val s1 = Seq("ern", "em", "er", "en", "es", "e", "s")
    s1.find(w.endsWith) match {
      case Some(suf @ ("ern" | "em" | "er")) =>
        if (inR(w, suf, r1)) w = dropSuf(w, suf.length)
      case Some(suf @ ("en" | "es" | "e")) =>
        if (inR(w, suf, r1)) {
          w = dropSuf(w, suf.length)
          if (w.endsWith("niss")) w = dropSuf(w, 1)
        }
      case Some("s") =>
        if (inR(w, "s", r1) && w.length >= 2 && deSEnd.indexOf(w(w.length - 2)) >= 0)
          w = dropSuf(w, 1)
      case _ => ()
    }

    // step 2, longest of: est en er | st (valid st-ending preceded by >=3 letters)
    val s2 = Seq("est", "en", "er", "st")
    s2.find(w.endsWith) match {
      case Some(suf @ ("est" | "en" | "er")) =>
        if (inR(w, suf, r1)) w = dropSuf(w, suf.length)
      case Some("st") =>
        if (inR(w, "st", r1) && w.length >= 6 &&
          deStEnd.indexOf(w(w.length - 3)) >= 0)
          w = dropSuf(w, 2)
      case _ => ()
    }

    // step 3, derivational
    val s3 = Seq("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik")
    s3.find(w.endsWith) match {
      case Some(suf @ ("end" | "ung")) =>
        if (inR(w, suf, r2)) {
          w = dropSuf(w, suf.length)
          if (inR(w, "ig", r2) && !w.endsWith("eig")) w = dropSuf(w, 2)
        }
      case Some(suf @ ("ig" | "ik" | "isch")) =>
        if (inR(w, suf, r2) && !(w.length > suf.length && w(w.length - suf.length - 1) == 'e'))
          w = dropSuf(w, suf.length)
      case Some(suf @ ("lich" | "heit")) =>
        if (inR(w, suf, r2)) {
          w = dropSuf(w, suf.length)
          if (inR(w, "er", r1)) w = dropSuf(w, 2)
          else if (inR(w, "en", r1)) w = dropSuf(w, 2)
        }
      case Some("keit") =>
        if (inR(w, "keit", r2)) {
          w = dropSuf(w, 4)
          if (inR(w, "lich", r2)) w = dropSuf(w, 4)
          else if (inR(w, "ig", r2)) w = dropSuf(w, 2)
        }
      case _ => ()
    }

    w.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c => c
    }
  }

  // ————————————————————————— Swedish ——————————————————————————

  private val svVowels = "aeiouyäåö"
  private def svV(c: Char) = svVowels.indexOf(c) >= 0
  private val svSEnd = "bcdfghjklmnoprtvy"
  private val svStep1 = Seq(
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas", "ornas",
    "arens", "andet", "arna", "erna", "orna", "ande", "arne", "aste", "aren",
    "ades", "erns", "ade", "are", "ern", "ens", "het", "ast", "ad", "en",
    "ar", "er", "or", "as", "es", "at", "a", "e"
  ).sortBy(-_.length)

  /** Snowball Swedish stemmer. */
  def swedish(word0: String): String = {
    if (word0 == null || word0.length < 3) return word0
    var w = word0.toLowerCase
    var r1 = region(w, 0, svV)
    if (r1 < 3) r1 = math.min(3, w.length)

    // step 1: longest suffix lying in R1 (setlimit semantics: a match
    // that starts before R1 simply doesn't participate), from the list
    // or `s` after a valid s-ending
    val cands = (svStep1 ++ Seq("andes", "ens")).distinct.sortBy(-_.length)
    cands.find(s => inR(w, s, r1)) match {
      case Some(suf) => w = dropSuf(w, suf.length)
      case None =>
        if (inR(w, "s", r1) && w.length >= 2 && svSEnd.indexOf(w(w.length - 2)) >= 0)
          w = dropSuf(w, 1)
    }

    // step 2: dd gd nn dt gt kt tt (in R1) -> drop last letter
    if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(p => inR(w, p, r1)))
      w = dropSuf(w, 1)

    // step 3: longest in R1 of lig/ig/els (delete), löst->lös, fullt->full
    Seq("fullt", "löst", "lig", "els", "ig").find(s => inR(w, s, r1)).foreach {
      case suf @ ("fullt" | "löst") => w = dropSuf(w, 1)
      case suf => w = dropSuf(w, suf.length)
    }
    w
  }

  // ————————————————————————— Norwegian ————————————————————————

  private val noVowels = "aeiouyæåø"
  private def noV(c: Char) = noVowels.indexOf(c) >= 0
  private val noSEnd = "bcdfghjlmnoprtvyz"
  private val noStep1 = Seq(
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "enes", "edes",
    "ende", "ande", "ene", "ane", "ede", "ens", "ers", "ets", "het", "ast",
    "en", "ar", "er", "as", "es", "et", "a", "e"
  ).sortBy(-_.length)

  /** Snowball Norwegian (Bokmål) stemmer. */
  def norwegian(word0: String): String = {
    if (word0 == null || word0.length < 3) return word0
    var w = word0.toLowerCase
    var r1 = region(w, 0, noV)
    if (r1 < 3) r1 = math.min(3, w.length)

    // step 1: longest suffix lying in R1: list | erte/ert -> er |
    // s after a valid s-ending
    val all = (noStep1 ++ Seq("erte", "ert")).distinct.sortBy(-_.length)
    all.find(s => inR(w, s, r1)) match {
      case Some(suf @ ("erte" | "ert")) => w = dropSuf(w, suf.length) + "er"
      case Some(suf) => w = dropSuf(w, suf.length)
      case None =>
        if (inR(w, "s", r1) && w.length >= 2) {
          val prev = w(w.length - 2)
          val ok = noSEnd.indexOf(prev) >= 0 ||
            (prev == 'k' && (w.length < 3 || !noV(w(w.length - 3))))
          if (ok) w = dropSuf(w, 1)
        }
    }

    // step 2: dt/vt (in R1) -> drop t
    if (Seq("dt", "vt").exists(p => inR(w, p, r1)))
      w = dropSuf(w, 1)

    // step 3
    Seq("hetslov", "slov", "elov", "lov", "elig", "eleg", "els", "lig",
      "eig", "ig", "leg").find(s => inR(w, s, r1)).foreach { s =>
      w = dropSuf(w, s.length)
    }
    w
  }

  // —————————————————————————— Danish ——————————————————————————

  private val daVowels = "aeiouyæåø"
  private def daV(c: Char) = daVowels.indexOf(c) >= 0
  private val daSEnd = "abcdfghjklmnoprtvyzå"
  private val daStep1 = Seq(
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder", "endes",
    "ernes", "erens", "erets", "ered", "ende", "erne", "eres", "enes", "eren",
    "erer", "heds", "eret", "ene", "ere", "ens", "ers", "ets", "hed", "es",
    "et", "er", "en", "e"
  ).sortBy(-_.length)

  /** Snowball Danish stemmer. */
  def danish(word0: String): String = {
    if (word0 == null || word0.length < 3) return word0
    var w = word0.toLowerCase
    var r1 = region(w, 0, daV)
    if (r1 < 3) r1 = math.min(3, w.length)

    // step 1: longest suffix lying in R1, or s after a valid s-ending
    daStep1.find(s => inR(w, s, r1)) match {
      case Some(suf) => w = dropSuf(w, suf.length)
      case None =>
        if (inR(w, "s", r1) && w.length >= 2 && daSEnd.indexOf(w(w.length - 2)) >= 0)
          w = dropSuf(w, 1)
    }

    def step2(): Unit =
      if (Seq("gd", "dt", "gt", "kt").exists(p => inR(w, p, r1)))
        w = dropSuf(w, 1)
    step2()

    // step 3: igst -> ig first; then longest in R1 of elig/lig/els/ig
    // (delete + re-run step 2) or løst -> løs
    if (w.endsWith("igst")) w = dropSuf(w, 2)
    Seq("elig", "løst", "lig", "els", "ig").find(s => inR(w, s, r1)) match {
      case Some("løst") => w = dropSuf(w, 1)
      case Some(suf) => w = dropSuf(w, suf.length); step2()
      case None => ()
    }

    // step 4: undouble a final double consonant in R1
    if (w.length >= 2 && w.length - 1 >= r1 &&
      w(w.length - 1) == w(w.length - 2) && !daV(w(w.length - 1)))
      w = dropSuf(w, 1)
    w
  }

  // —————————————————————————— Russian —————————————————————————

  private val ruVowels = "аеиоуыэюя"
  private def ruV(c: Char) = ruVowels.indexOf(c) >= 0

  private val ruPerfGerund1 = Seq("вшись", "вши", "в") // require preceding а/я
  private val ruPerfGerund2 = Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val ruAdjective = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое", "ей",
    "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую", "юю", "ая",
    "яя", "ою", "ею").sortBy(-_.length)
  private val ruParticiple1 = Seq("ем", "нн", "вш", "ющ", "щ") // preceding а/я
  private val ruParticiple2 = Seq("ивш", "ывш", "ующ")
  private val ruVerb1 = Seq( // require preceding а/я
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но", "ет",
    "ют", "ны", "ть", "й", "л", "н").sortBy(-_.length)
  private val ruVerb2 = Seq(
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло",
    "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ят", "ей", "уй", "ил",
    "ыл", "им", "ым", "ен", "ит", "ыт", "ую", "ю").sortBy(-_.length)
  private val ruNoun = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ию", "ья", "ия", "ье",
    "ие", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах", "ях",
    "ью", "ю", "а", "е", "и", "й", "о", "у", "ы", "ь", "я", "ев", "ов"
  ).sortBy(-_.length)

  /** Snowball Russian stemmer (on Cyrillic; ё folded to е per spec). */
  def russian(word0: String): String = {
    if (word0 == null || word0.isEmpty) return word0
    var w = word0.toLowerCase.replace('ё', 'е')
    // RV: after the first vowel
    var rv = 0
    while (rv < w.length && !ruV(w(rv))) rv += 1
    rv = if (rv < w.length) rv + 1 else w.length
    val r1 = region(w, 0, ruV)
    val r2 = region(w, r1, ruV)

    // group-1 endings require а/я immediately before the suffix, and
    // the whole of step 1 runs under the RV limit (russian.sbl
    // `backwards setlimit tomark pV`), so that а/я must itself lie in
    // RV — a conditioning vowel at the boundary does NOT license the
    // removal
    def ayaBefore(sufLen: Int): Boolean = {
      val i = w.length - sufLen - 1
      i >= rv && (w(i) == 'а' || w(i) == 'я')
    }

    // step 1
    val gerundAll = (ruPerfGerund2 ++ ruPerfGerund1).sortBy(-_.length)
    val didGerund = gerundAll.find(s => inR(w, s, rv)) match {
      case Some(s) =>
        if (ruPerfGerund1.contains(s)) {
          if (ayaBefore(s.length)) { w = dropSuf(w, s.length); true }
          else false
        } else { w = dropSuf(w, s.length); true }
      case None => false
    }
    if (!didGerund) {
      // reflexive (optional)
      Seq("ся", "сь").find(s => inR(w, s, rv)).foreach(s => w = dropSuf(w, s.length))
      // adjectival = adjective with optional preceding participle
      val didAdj = ruAdjective.find(s => inR(w, s, rv)) match {
        case Some(s) =>
          w = dropSuf(w, s.length)
          val partAll = (ruParticiple2 ++ ruParticiple1).sortBy(-_.length)
          partAll.find(p => inR(w, p, rv)).foreach { p =>
            if (ruParticiple1.contains(p)) {
              if (ayaBefore(p.length)) w = dropSuf(w, p.length)
            } else w = dropSuf(w, p.length)
          }
          true
        case None => false
      }
      if (!didAdj) {
        // verb, then noun
        val verbAll = (ruVerb2 ++ ruVerb1).sortBy(-_.length)
        val didVerb = verbAll.find(s => inR(w, s, rv)) match {
          case Some(s) =>
            if (ruVerb1.contains(s)) {
              if (ayaBefore(s.length)) { w = dropSuf(w, s.length); true }
              else false
            } else { w = dropSuf(w, s.length); true }
          case None => false
        }
        if (!didVerb)
          ruNoun.find(s => inR(w, s, rv)).foreach(s => w = dropSuf(w, s.length))
      }
    }

    // step 2: final и
    if (inR(w, "и", rv)) w = dropSuf(w, 1)
    // step 3: derivational ость/ост in R2
    Seq("ость", "ост").find(s => inR(w, s, r2)).foreach(s => w = dropSuf(w, s.length))
    // step 4: undouble нн | superlative ейш(е) then undouble нн | final ь
    if (w.endsWith("нн") && w.length - 1 >= rv) w = dropSuf(w, 1)
    else {
      Seq("ейше", "ейш").find(s => inR(w, s, rv)) match {
        case Some(s) =>
          w = dropSuf(w, s.length)
          if (w.endsWith("нн") && w.length - 1 >= rv) w = dropSuf(w, 1)
        case None =>
          if (inR(w, "ь", rv)) w = dropSuf(w, 1)
      }
    }
    w
  }
}
