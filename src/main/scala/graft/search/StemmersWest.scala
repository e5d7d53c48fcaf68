package graft.search

/** Dutch + Romance-language Snowball stemmers, continuing [[Stemmers]]
  * (from-the-spec ports of the published snowballstem.org algorithms;
  * the reference reaches the same family through rust-stemmers,
  * fts/mod.rs:176-208). Region machinery mirrors [[Stemmers]]; the
  * Spanish-style RV rule is shared by es/it/pt. Suffix tables follow
  * the published algorithm text; FtsStemmerSpec carries the curated
  * vectors.
  */
object StemmersWest {

  private def region(w: String, from: Int, isV: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !isV(w(i))) i += 1
    while (i < w.length && isV(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }
  private def inR(w: String, suf: String, r: Int): Boolean =
    w.endsWith(suf) && w.length - suf.length >= r
  private def dropSuf(w: String, n: Int): String = w.substring(0, w.length - n)

  /** Spanish/Italian/Portuguese RV: second letter consonant -> after
    * the next vowel; first two letters vowels -> after the next
    * consonant; else (consonant-vowel) after the third letter. */
  private def rvRomance(w: String, isV: Char => Boolean): Int = {
    if (w.length < 3) return w.length
    if (!isV(w(1))) {
      var i = 2; while (i < w.length && !isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else if (isV(w(0)) && isV(w(1))) {
      var i = 2; while (i < w.length && isV(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    } else 3
  }

  // —————————————————————————— Dutch ———————————————————————————

  private val nlVowels = "aeiouyè"
  private def nlV(c: Char) = nlVowels.indexOf(c) >= 0

  /** Snowball Dutch stemmer. */
  def dutch(word0: String): String = {
    if (word0 == null || word0.length < 3) return word0
    var w = word0.toLowerCase.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    // prelude: protect initial/post-vocalic y and intervocalic i
    val sb = new StringBuilder(w)
    if (sb(0) == 'y') sb(0) = 'Y'
    var i = 1
    while (i < sb.length) {
      if (sb(i) == 'y' && nlV(sb(i - 1))) sb(i) = 'Y'
      else if (sb(i) == 'i' && i < sb.length - 1 && nlV(sb(i - 1)) && nlV(sb(i + 1)))
        sb(i) = 'I'
      i += 1
    }
    w = sb.toString
    var r1 = region(w, 0, nlV)
    val r2 = region(w, r1, nlV)
    if (r1 < 3) r1 = math.min(3, w.length)

    def undouble(): Unit =
      if (Seq("kk", "dd", "tt").exists(w.endsWith)) w = dropSuf(w, 1)
    def validEnEnding: Boolean =
      w.length >= 1 && !nlV(w.last) && !w.endsWith("gem")

    // step 1: heden -> heid | en/ene after valid en-ending | s/se after
    // valid s-ending (longest first)
    if (inR(w, "heden", r1)) w = dropSuf(w, 5) + "heid"
    else if (inR(w, "ene", r1) && {
      val stem = dropSuf(w, 3); stem.nonEmpty && !nlV(stem.last) && !stem.endsWith("gem")
    }) { w = dropSuf(w, 3); undouble() }
    else if (inR(w, "en", r1) && {
      val stem = dropSuf(w, 2); stem.nonEmpty && !nlV(stem.last) && !stem.endsWith("gem")
    }) { w = dropSuf(w, 2); undouble() }
    else if (inR(w, "se", r1) && {
      val stem = dropSuf(w, 2); stem.nonEmpty && !nlV(stem.last) && stem.last != 'j'
    }) w = dropSuf(w, 2)
    else if (inR(w, "s", r1) && {
      val stem = dropSuf(w, 1); stem.nonEmpty && !nlV(stem.last) && stem.last != 'j'
    }) w = dropSuf(w, 1)

    // step 2: final e after a non-vowel
    var eRemoved = false
    if (inR(w, "e", r1) && w.length >= 2 && !nlV(w(w.length - 2))) {
      w = dropSuf(w, 1); eRemoved = true; undouble()
    }

    // step 3a: heid (not after c), then a preceding en as in step 1
    if (inR(w, "heid", r2) && (w.length == 4 || w(w.length - 5) != 'c')) {
      w = dropSuf(w, 4)
      if (inR(w, "en", r1) && {
        val stem = dropSuf(w, 2); stem.nonEmpty && !nlV(stem.last) && !stem.endsWith("gem")
      }) { w = dropSuf(w, 2); undouble() }
    }

    // step 3b: derivational (longest of end/ing, ig, lijk, baar, bar)
    Seq("lijk", "baar", "end", "ing", "bar", "ig").find(w.endsWith) match {
      case Some(suf @ ("end" | "ing")) =>
        if (inR(w, suf, r2)) {
          w = dropSuf(w, suf.length)
          if (inR(w, "ig", r2) && !(w.length > 2 && w(w.length - 3) == 'e'))
            w = dropSuf(w, 2)
          else undouble()
        }
      case Some("ig") =>
        if (inR(w, "ig", r2) && !(w.length > 2 && w(w.length - 3) == 'e'))
          w = dropSuf(w, 2)
      case Some("lijk") =>
        if (inR(w, "lijk", r2)) {
          w = dropSuf(w, 4)
          if (inR(w, "e", r1) && w.length >= 2 && !nlV(w(w.length - 2))) {
            w = dropSuf(w, 1); undouble()
          }
        }
      case Some("baar") => if (inR(w, "baar", r2)) w = dropSuf(w, 4)
      case Some("bar") => if (inR(w, "bar", r2) && eRemoved) w = dropSuf(w, 3)
      case _ => ()
    }

    // step 4 undouble vowel: C + aa/ee/oo/uu + D (D non-vowel, not I)
    if (w.length >= 4) {
      val n = w.length
      val d = w(n - 1); val v1 = w(n - 2); val v2 = w(n - 3); val c = w(n - 4)
      if (!nlV(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 && !nlV(c))
        w = w.substring(0, n - 2) + d
    }
    w.map { case 'Y' => 'y'; case 'I' => 'i'; case c => c }
  }

  // —————————————————————————— Spanish —————————————————————————

  private val esVowels = "aeiouáéíóúü"
  private def esV(c: Char) = esVowels.indexOf(c) >= 0
  private def esUnaccent(c: Char): Char = c match {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'; case 'ó' => 'o'
    case 'ú' => 'u'; case x => x
  }

  private val esPronouns = Seq("selas", "selos", "sela", "selo", "las",
    "les", "los", "nos", "me", "se", "la", "le", "lo").sortBy(-_.length)
  private val esStep2b = Seq(
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "ábamos",
    "aríais", "aseis", "eríais", "iríais", "ieseis", "asteis", "isteis",
    "ásemos", "áramos", "íamos", "arían", "arías", "aréis", "erían",
    "erías", "eréis", "irían", "irías", "iréis", "ieran", "iesen", "ieron",
    "iendo", "ieras", "ieses", "abais", "arais", "asen", "ases", "íais",
    "aban", "aran", "ando", "aron", "ados", "idos", "amos", "imos", "arán",
    "arás", "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aba", "ada", "ida", "ara", "ase", "ían",
    "ado", "ido", "ías", "áis", "ará", "aré", "erá", "eré", "irá", "iré",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís")
    .sortBy(-_.length)

  /** Snowball Spanish stemmer. */
  def spanish(word0: String): String = {
    if (word0 == null || word0.length < 2) return word0
    var w = word0.toLowerCase
    val rv = rvRomance(w, esV)
    val r1 = region(w, 0, esV)
    val r2 = region(w, r1, esV)

    // step 0: attached pronoun after a gerund/infinitive marker in RV
    esPronouns.find(w.endsWith).foreach { p =>
      val stem = dropSuf(w, p.length)
      val accented = Seq("iéndo", "ándo", "ár", "ér", "ír")
      val plain = Seq("iendo", "ando", "ar", "er", "ir")
      accented.find(m => stem.endsWith(m) && stem.length - m.length >= rv) match {
        case Some(_) => w = stem.map(esUnaccent)
        case None =>
          if (plain.exists(m => stem.endsWith(m) && stem.length - m.length >= rv))
            w = stem
          else if (stem.endsWith("yendo") && stem.length >= 6 &&
            stem(stem.length - 6) == 'u') w = stem
      }
    }

    // step 1: standard suffixes (longest match over all groups)
    val before1 = w
    val g1 = Seq("amientos", "imientos", "amiento", "imiento", "anzas",
      "ismos", "ables", "ibles", "istas", "anza", "icos", "icas", "ismo",
      "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
    val g2 = Seq("aciones", "adoras", "adores", "ancias", "adora", "ación",
      "antes", "ancia", "ador", "ante")
    val all1: Seq[(String, Int)] =
      (g1.map(_ -> 1) ++ g2.map(_ -> 2) ++
        Seq("logías" -> 3, "logía" -> 3, "uciones" -> 4, "ución" -> 4,
          "encias" -> 5, "encia" -> 5, "amente" -> 6, "mente" -> 7,
          "idades" -> 8, "idad" -> 8, "ivas" -> 9, "ivos" -> 9,
          "iva" -> 9, "ivo" -> 9)).sortBy(-_._1.length)
    all1.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, 1)) => if (inR(w, s, r2)) w = dropSuf(w, s.length)
      case Some((s, 2)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        if (inR(w, "ic", r2)) w = dropSuf(w, 2)
      }
      case Some((s, 3)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "log"
      case Some((s, 4)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "u"
      case Some((s, 5)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "ente"
      case Some((s, 6)) => if (inR(w, s, r1)) {
        w = dropSuf(w, s.length)
        if (inR(w, "iv", r2)) {
          w = dropSuf(w, 2)
          if (inR(w, "at", r2)) w = dropSuf(w, 2)
        } else Seq("os", "ic", "ad").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 7)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        Seq("ante", "able", "ible").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 8)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        Seq("abil", "ic", "iv").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 9)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        if (inR(w, "at", r2)) w = dropSuf(w, 2)
      }
      case _ => ()
    }

    // step 2a (only if step 1 removed nothing): y-verb suffixes after u
    if (w == before1) {
      val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
        "yes", "ya", "ye", "yo", "yó").sortBy(-_.length)
      val did2a = ys.find(s => inR(w, s, rv) && w.length > s.length &&
        w(w.length - s.length - 1) == 'u')
      did2a match {
        case Some(s) => w = dropSuf(w, s.length)
        case None =>
          // step 2b: other verb suffixes in RV
          Seq("en", "es", "éis", "emos").sortBy(-_.length)
            .find(s => inR(w, s, rv)) match {
            case Some(s) =>
              w = dropSuf(w, s.length)
              if (w.endsWith("gu")) w = dropSuf(w, 1)
            case None =>
              esStep2b.find(s => inR(w, s, rv)).foreach(s => w = dropSuf(w, s.length))
          }
      }
    }

    // step 3: residual suffix (always)
    Seq("os", "a", "o", "á", "í", "ó").sortBy(-_.length)
      .find(s => inR(w, s, rv)) match {
      case Some(s) => w = dropSuf(w, s.length)
      case None =>
        Seq("e", "é").find(s => inR(w, s, rv)).foreach { s =>
          w = dropSuf(w, s.length)
          if (w.endsWith("gu") && w.length - 1 >= rv) w = dropSuf(w, 1)
        }
    }
    w.map(esUnaccent)
  }

  // —————————————————————————— French ——————————————————————————

  private val frVowels = "aeiouyâàëéêèïîôûù"
  private def frV(c: Char) = frVowels.indexOf(c) >= 0

  private val frStep2a = Seq(
    "issaIent", "issantes", "issants", "issante", "issions", "issants",
    "issait", "issant", "issent", "issiez", "issons", "irions", "issais",
    "iraIent", "issez", "isses", "irais", "irait", "irent", "iriez",
    "irons", "iront", "îtes", "îmes", "irai", "iras", "isse", "ira",
    "ies", "it", "ît", "ie", "ir", "is", "i").distinct.sortBy(-_.length)
  private val frStep2b1 = Seq( // delete in RV
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "ées", "era", "iez", "ée", "és", "er",
    "ez", "é").sortBy(-_.length)
  private val frStep2b2 = Seq( // delete in RV, then a preceding e in RV
    "assions", "assiez", "assent", "aIent", "antes", "asses", "âtes",
    "âmes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a").sortBy(-_.length)

  /** Snowball French stemmer. */
  def french(word0: String): String = {
    if (word0 == null || word0.length < 2) return word0
    var w = word0.toLowerCase
    // prelude: protect u/i between vowels, y next to a vowel, u after q
    val sb = new StringBuilder(w)
    var i = 0
    while (i < sb.length) {
      val c = sb(i)
      if ((c == 'u' || c == 'i') && i > 0 && i < sb.length - 1 &&
        frV(sb(i - 1)) && frV(sb(i + 1))) sb(i) = c.toUpper
      else if (c == 'y' && ((i > 0 && frV(sb(i - 1))) ||
        (i < sb.length - 1 && frV(sb(i + 1))))) sb(i) = 'Y'
      else if (c == 'u' && i > 0 && sb(i - 1) == 'q') sb(i) = 'U'
      i += 1
    }
    w = sb.toString
    // RV: two initial vowels -> after third letter; else after the
    // first vowel not at the start (par/col/tap exception)
    val rv =
      if (w.length >= 3 && frV(w(0)) && frV(w(1))) 3
      else if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap")) 3
      else {
        var j = 1
        while (j < w.length && !frV(w(j))) j += 1
        if (j < w.length) j + 1 else w.length
      }
    val r1 = region(w, 0, frV)
    val r2 = region(w, r1, frV)

    val original = w
    var step1Done = false
    var mentMatched = false

    // step 1: standard suffix removal — longest match over the groups
    val groups: Seq[(String, Int)] = (
      Seq("ances", "ance", "iqUes", "iqUe", "ismes", "isme", "ables",
        "able", "istes", "iste", "eux").map(_ -> 1) ++
        Seq("atrices", "atrice", "ateurs", "ateur", "ations", "ation").map(_ -> 2) ++
        Seq("logies", "logie" ).map(_ -> 3) ++
        Seq("usions", "usion", "utions", "ution").map(_ -> 4) ++
        Seq("ences", "ence").map(_ -> 5) ++
        Seq("ements", "ement").map(_ -> 6) ++
        Seq("ités", "ité").map(_ -> 7) ++
        Seq("ives", "ive", "ifs", "if").map(_ -> 8) ++
        Seq("eaux" -> 9, "aux" -> 10, "euses" -> 11, "euse" -> 11) ++
        Seq("issements" -> 12, "issement" -> 12) ++
        Seq("amment" -> 13, "emment" -> 14) ++
        Seq("ments" -> 15, "ment" -> 15)
      ).sortBy(-_._1.length)

    groups.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, 1)) => if (inR(w, s, r2)) { w = dropSuf(w, s.length); step1Done = true }
      case Some((s, 2)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length); step1Done = true
        if (inR(w, "ic", r2)) w = dropSuf(w, 2)
        else if (w.endsWith("ic")) w = dropSuf(w, 2) + "iqU"
      }
      case Some((s, 3)) => if (inR(w, s, r2)) { w = dropSuf(w, s.length) + "log"; step1Done = true }
      case Some((s, 4)) => if (inR(w, s, r2)) { w = dropSuf(w, s.length) + "u"; step1Done = true }
      case Some((s, 5)) => if (inR(w, s, r2)) { w = dropSuf(w, s.length) + "ent"; step1Done = true }
      case Some((s, 6)) => if (inR(w, s, rv)) {
        w = dropSuf(w, s.length); step1Done = true
        if (inR(w, "iv", r2)) {
          w = dropSuf(w, 2); if (inR(w, "at", r2)) w = dropSuf(w, 2)
        } else if (inR(w, "eus", r2)) w = dropSuf(w, 3)
        else if (inR(w, "eus", r1)) w = dropSuf(w, 3) + "eux"
        else if (inR(w, "abl", r2) || inR(w, "iqU", r2)) w = dropSuf(w, 3)
        else if (inR(w, "ièr", rv) || inR(w, "Ièr", rv)) w = dropSuf(w, 3) + "i"
      }
      case Some((s, 7)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length); step1Done = true
        if (w.endsWith("abil")) {
          if (inR(w, "abil", r2)) w = dropSuf(w, 4) else w = dropSuf(w, 4) + "abl"
        } else if (w.endsWith("ic")) {
          if (inR(w, "ic", r2)) w = dropSuf(w, 2) else w = dropSuf(w, 2) + "iqU"
        } else if (inR(w, "iv", r2)) w = dropSuf(w, 2)
      }
      case Some((s, 8)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length); step1Done = true
        if (inR(w, "at", r2)) {
          w = dropSuf(w, 2)
          if (w.endsWith("ic")) {
            if (inR(w, "ic", r2)) w = dropSuf(w, 2) else w = dropSuf(w, 2) + "iqU"
          }
        }
      }
      case Some((s, 9)) => w = dropSuf(w, 1); step1Done = true // eaux -> eau
      case Some((s, 10)) => if (inR(w, s, r1)) { w = dropSuf(w, 3) + "al"; step1Done = true }
      case Some((s, 11)) =>
        if (inR(w, s, r2)) { w = dropSuf(w, s.length); step1Done = true }
        else if (inR(w, s, r1)) { w = dropSuf(w, s.length) + "eux"; step1Done = true }
      case Some((s, 12)) =>
        if (inR(w, s, r1) && w.length > s.length && !frV(w(w.length - s.length - 1))) {
          w = dropSuf(w, s.length); step1Done = true
        }
      case Some((s, 13)) => if (inR(w, s, rv)) {
        w = dropSuf(w, s.length) + "ant"; mentMatched = true
      }
      case Some((s, 14)) => if (inR(w, s, rv)) {
        w = dropSuf(w, s.length) + "ent"; mentMatched = true
      }
      case Some((s, 15)) =>
        if (w.length > s.length && frV(w(w.length - s.length - 1)) &&
          w.length - s.length - 1 >= rv) {
          w = dropSuf(w, s.length); mentMatched = true
        }
      case _ => ()
    }

    // step 2a: verb suffixes beginning i (if step 1 left the word
    // unchanged, or matched one of the -ment family)
    if (!step1Done || mentMatched) {
      val found2a = frStep2a.find(s => inR(w, s, rv) && w.length > s.length &&
        !frV(w(w.length - s.length - 1)) && w.length - s.length - 1 >= rv)
      found2a match {
        case Some(s) => w = dropSuf(w, s.length)
        case None =>
          // step 2b
          if (inR(w, "ions", r2)) w = dropSuf(w, 4)
          else frStep2b1.find(s => inR(w, s, rv)) match {
            case Some(s) => w = dropSuf(w, s.length)
            case None =>
              frStep2b2.find(s => inR(w, s, rv)).foreach { s =>
                w = dropSuf(w, s.length)
                if (inR(w, "e", rv)) w = dropSuf(w, 1)
              }
          }
      }
    }

    if (w != original) {
      // step 3
      if (w.endsWith("Y")) w = dropSuf(w, 1) + "i"
      else if (w.endsWith("ç")) w = dropSuf(w, 1) + "c"
    } else {
      // step 4
      if (w.endsWith("s") && w.length >= 2 &&
        "aiouès".indexOf(w(w.length - 2)) < 0) w = dropSuf(w, 1)
      if (inR(w, "ion", r2) && w.length > 3 &&
        (w(w.length - 4) == 's' || w(w.length - 4) == 't')) w = dropSuf(w, 3)
      else Seq("ière", "Ière", "ier", "Ier").find(w.endsWith) match {
        case Some(s) => w = dropSuf(w, s.length) + "i"
        case None =>
          if (inR(w, "e", rv)) w = dropSuf(w, 1)
          else if (inR(w, "ë", rv) && w.endsWith("guë")) w = dropSuf(w, 1)
      }
    }

    // step 5 undouble
    Seq("enn", "onn", "ett", "ell", "eill").find(w.endsWith)
      .foreach(_ => w = dropSuf(w, 1))
    // step 6 un-accent: é/è + non-vowels to the end -> e
    val m = "[éè]([^aeiouyâàëéêèïîôûù]+)$".r
    w = m.replaceAllIn(w, mm => "e" + mm.group(1))

    w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
  }

  // —————————————————————————— Italian —————————————————————————

  private val itVowels = "aeiouàèìòù"
  private def itV(c: Char) = itVowels.indexOf(c) >= 0

  private val itPronouns = Seq("gliela", "gliele", "glieli", "glielo",
    "gliene", "sene", "mela", "mele", "meli", "melo", "mene", "tela",
    "tele", "teli", "telo", "tene", "cela", "cele", "celi", "celo",
    "cene", "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la",
    "le", "li", "lo", "mi", "ne", "si", "ti", "vi").sortBy(-_.length)
  private val itStep2 = Seq(
    "erebbero", "irebbero", "assimo", "eranno", "erebbe", "eremmo",
    "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo", "ireste",
    "iresti", "iscano", "iscono", "issero", "arono", "avamo", "avano",
    "avate", "eremo", "erete", "erono", "evamo", "evano", "evate",
    "iremo", "irete", "irono", "ivamo", "ivano", "ivate", "ammo", "ando",
    "asse", "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
    "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce",
    "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato", "ava",
    "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi", "evo", "irà",
    "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono",
    "uta", "ute", "uti", "uto", "ar", "ir").sortBy(-_.length)

  /** Snowball Italian stemmer. */
  def italian(word0: String): String = {
    if (word0 == null || word0.length < 2) return word0
    var w = word0.toLowerCase.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'; case 'ó' => 'ò'
      case 'ú' => 'ù'; case c => c
    }
    val sb = new StringBuilder(w)
    var i = 0
    while (i < sb.length) {
      val c = sb(i)
      if ((c == 'u' || c == 'i') && i > 0 && i < sb.length - 1 &&
        itV(sb(i - 1)) && itV(sb(i + 1))) sb(i) = c.toUpper
      else if (c == 'u' && i > 0 && sb(i - 1) == 'q') sb(i) = 'U'
      i += 1
    }
    w = sb.toString
    val rv = rvRomance(w, itV)
    val r1 = region(w, 0, itV)
    val r2 = region(w, r1, itV)

    // step 0: attached pronoun after ando/endo (delete) or ar/er/ir
    // (replace with e), marker in RV
    itPronouns.find(w.endsWith).foreach { p =>
      val stem = dropSuf(w, p.length)
      if (Seq("ando", "endo").exists(m => stem.endsWith(m) && stem.length - m.length >= rv))
        w = stem
      else if (Seq("ar", "er", "ir").exists(m => stem.endsWith(m) && stem.length - m.length >= rv))
        w = stem + "e"
    }

    val before1 = w
    // step 1: standard suffixes
    val g1 = Seq("atrice", "atrici", "abile", "abili", "ibile", "ibili",
      "mente", "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista",
      "iste", "isti", "istà", "istè", "istì", "ante", "anti", "ico",
      "ici", "ica", "ice", "oso", "osi", "osa", "ose")
    val all1: Seq[(String, Int)] = (g1.map(_ -> 1) ++
      Seq("azione" -> 2, "azioni" -> 2, "atore" -> 2, "atori" -> 2,
        "logia" -> 3, "logie" -> 3, "uzione" -> 4, "uzioni" -> 4,
        "usione" -> 4, "usioni" -> 4, "enza" -> 5, "enze" -> 5,
        "amento" -> 6, "amenti" -> 6, "imento" -> 6, "imenti" -> 6,
        "amente" -> 7, "ità" -> 8, "ivo" -> 9, "ivi" -> 9, "iva" -> 9,
        "ive" -> 9)).sortBy(-_._1.length)
    all1.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, 1)) => if (inR(w, s, r2)) w = dropSuf(w, s.length)
      case Some((s, 2)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        if (inR(w, "ic", r2)) w = dropSuf(w, 2)
      }
      case Some((s, 3)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "log"
      case Some((s, 4)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "u"
      case Some((s, 5)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "ente"
      case Some((s, 6)) => if (inR(w, s, rv)) w = dropSuf(w, s.length)
      case Some((s, 7)) => if (inR(w, s, r1)) {
        w = dropSuf(w, s.length)
        if (inR(w, "iv", r2)) {
          w = dropSuf(w, 2); if (inR(w, "at", r2)) w = dropSuf(w, 2)
        } else Seq("os", "ic", "abil").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 8)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        Seq("abil", "ic", "iv").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 9)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        if (inR(w, "at", r2)) {
          w = dropSuf(w, 2)
          if (inR(w, "ic", r2)) w = dropSuf(w, 2)
        }
      }
      case _ => ()
    }

    // step 2: verb suffixes (if step 1 removed nothing)
    if (w == before1)
      itStep2.find(s => inR(w, s, rv)).foreach(s => w = dropSuf(w, s.length))

    // step 3a: final vowel (then a preceding i), in RV
    Seq("a", "e", "i", "o", "à", "è", "ì", "ò").find(s => inR(w, s, rv))
      .foreach { s =>
        w = dropSuf(w, 1)
        if (inR(w, "i", rv)) w = dropSuf(w, 1)
      }
    // step 3b: ch/gh -> c/g in RV
    if (inR(w, "ch", rv)) w = dropSuf(w, 1)
    else if (inR(w, "gh", rv)) w = dropSuf(w, 1)

    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  // ————————————————————————— Portuguese ————————————————————————

  // ã/õ are treated as a vowel + marker pair during stemming
  private val ptVowels = "aeiouáéíóúâêô"
  private def ptV(c: Char) = ptVowels.indexOf(c) >= 0

  private val ptStep2 = Seq(
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis", "áramos",
    "éramos", "íramos", "ávamos", "aremos", "eremos", "iremos", "ariam",
    "eriam", "iriam", "assem", "essem", "issem", "arias", "erias",
    "irias", "ardes", "erdes", "irdes", "asses", "esses", "isses",
    "astes", "estes", "istes", "áreis", "areis", "éreis", "ereis",
    "íreis", "ireis", "áveis", "íamos", "armos", "ermos", "irmos",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "adas", "idas",
    "arás", "aras", "erás", "eras", "irás", "avas", "ares", "eres",
    "ires", "íeis", "ados", "idos", "ámos", "amos", "emos", "imos",
    "iras", "ada", "ida", "ará", "ara", "erá", "era", "irá", "ava",
    "iam", "ado", "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am",
    "em", "ar", "er", "ir", "as", "es", "is", "eu", "iu", "ou")
    .sortBy(-_.length)

  /** Snowball Portuguese stemmer. */
  def portuguese(word0: String): String = {
    if (word0 == null || word0.length < 2) return word0
    // prelude: ã/õ -> a~/o~ so the nasal vowel behaves as vowel+non-vowel
    var w = word0.toLowerCase.replace("ã", "a~").replace("õ", "o~")
    val rv = rvRomance(w, ptV)
    val r1 = region(w, 0, ptV)
    val r2 = region(w, r1, ptV)

    val before1 = w
    // step 1: standard suffixes
    val g1 = Seq("amentos", "imentos", "amento", "imento", "adoras",
      "adores", "aço~es", "ismos", "istas", "adora", "aça~o", "antes",
      "ância", "ezas", "icos", "icas", "ismo", "ável", "ível", "ista",
      "osos", "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa")
    val all1: Seq[(String, Int)] = (g1.map(_ -> 1) ++
      Seq("logías" -> 2, "logía" -> 2, "logias" -> 2, "logia" -> 2,
        "uciones" -> 3, "ución" -> 3, "uço~es" -> 3, "uça~o" -> 3,
        "ências" -> 4, "ência" -> 4, "amente" -> 5, "mente" -> 6,
        "idades" -> 7, "idade" -> 7, "ivas" -> 8, "ivos" -> 8,
        "iva" -> 8, "ivo" -> 8, "iras" -> 9, "ira" -> 9))
      .sortBy(-_._1.length)
    all1.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, 1)) => if (inR(w, s, r2)) w = dropSuf(w, s.length)
      case Some((s, 2)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "log"
      case Some((s, 3)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "u"
      case Some((s, 4)) => if (inR(w, s, r2)) w = dropSuf(w, s.length) + "ente"
      case Some((s, 5)) => if (inR(w, s, r1)) {
        w = dropSuf(w, s.length)
        if (inR(w, "iv", r2)) {
          w = dropSuf(w, 2); if (inR(w, "at", r2)) w = dropSuf(w, 2)
        } else Seq("os", "ic", "ad").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 6)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        Seq("ante", "avel", "ível").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 7)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        Seq("abil", "ic", "iv").find(p => inR(w, p, r2))
          .foreach(p => w = dropSuf(w, p.length))
      }
      case Some((s, 8)) => if (inR(w, s, r2)) {
        w = dropSuf(w, s.length)
        if (inR(w, "at", r2)) w = dropSuf(w, 2)
      }
      case Some((s, 9)) =>
        if (inR(w, s, rv) && w.length > s.length &&
          w(w.length - s.length - 1) == 'e') w = dropSuf(w, s.length) + "ir"
      case _ => ()
    }

    // step 2: verb suffixes in RV (if step 1 removed nothing)
    if (w == before1)
      ptStep2.find(s => inR(w, s, rv)).foreach(s => w = dropSuf(w, s.length))

    // step 3: i after c, in RV (only if steps 1-2 altered the word)
    if (w != before1 && inR(w, "i", rv) && w.length >= 2 && w(w.length - 2) == 'c')
      w = dropSuf(w, 1)

    // step 4 (if steps 1-2 did not alter): residual suffix
    if (w == before1)
      Seq("os", "a", "i", "o", "á", "í", "ó").sortBy(-_.length)
        .find(s => inR(w, s, rv)).foreach(s => w = dropSuf(w, s.length))

    // step 5 (always): final e/é/ê in RV, then gu/ci fixup; ç -> c
    Seq("e", "é", "ê").find(s => inR(w, s, rv)) match {
      case Some(s) =>
        w = dropSuf(w, 1)
        if ((w.endsWith("gu") && w.length - 1 >= rv) ||
          (w.endsWith("ci") && w.length - 1 >= rv)) w = dropSuf(w, 1)
      case None => if (w.endsWith("ç")) w = dropSuf(w, 1) + "c"
    }

    w.replace("a~", "ã").replace("o~", "õ")
  }
}
