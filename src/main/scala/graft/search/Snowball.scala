package graft.search

/** Snowball English stemmer ("Porter2") — a from-the-spec port of the
  * published public algorithm (snowballstem.org English stemmer). The
  * reference wires the same algorithm as its FTS `Stemmer('english')`
  * token filter (fts/mod.rs:176-208, via the rust-stemmers crate);
  * [[Fts]] applies [[stem]] identically on the index side (array
  * transform over tokenized text) and the query side (driver mirror),
  * which is the correctness requirement for an FTS pipeline.
  */
object Snowball {

  private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val doubles =
    Seq("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  /** Exceptional forms checked before the steps run (spec "exception1"). */
  private val exceptions1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Words whose processing halts after step 1a (spec "exception2"). */
  private val exceptions2 = Set("inning", "outing", "canning", "herring",
    "earring", "proceed", "exceed", "succeed")

  private val step2Rules: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
    "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")

  private val step3Rules: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
    "ness" -> "", "ful" -> "")

  private val step4Suffixes: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ion", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic")

  /** Stem one (already lowercased) token. Null-safe; tokens of fewer
    * than 3 letters come back unchanged, as the spec requires. */
  def stem(word: String): String = {
    if (word == null) return null
    var w = if (word.startsWith("'")) word.substring(1) else word
    if (w.length < 3) return w
    exceptions1.get(w) match {
      case Some(r) => return r
      case None =>
    }

    // consonant-y marking: y at the start or after a vowel is a
    // consonant, written Y so the vowel tests below see it as one
    {
      val sb = new StringBuilder(w)
      if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
      var i = 1
      while (i < sb.length) {
        if (sb.charAt(i) == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
        i += 1
      }
      w = sb.toString
    }

    // R1 = after the first non-vowel following a vowel (special-cased
    // prefixes per the spec); R2 = the same rule applied within R1
    def regionFrom(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isV(s.charAt(i))) i += 1
      while (i < s.length && isV(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1 =
      if (w.startsWith("gener")) 5
      else if (w.startsWith("commun")) 6
      else if (w.startsWith("arsen")) 5
      else regionFrom(w, 0)
    val r2 = regionFrom(w, r1)

    def inR1(sufLen: Int) = w.length - sufLen >= r1
    def inR2(sufLen: Int) = w.length - sufLen >= r2
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n >= 3 && !isV(s.charAt(n - 3)) && isV(s.charAt(n - 2))) {
        val c = s.charAt(n - 1)
        if (!isV(c) && c != 'w' && c != 'x' && c != 'Y') return true
      }
      n == 2 && isV(s.charAt(0)) && !isV(s.charAt(1))
    }
    def isShortWord(s: String) = endsShortSyllable(s) && r1 >= s.length

    // step 0: longest of ' 's 's'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && w.dropRight(2).exists(isV)) w = w.dropRight(1)

    if (exceptions2.contains(w)) return w

    // step 1b
    if (w.endsWith("eedly")) { if (inR1(5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(3)) w = w.dropRight(1) }
    else Seq("ingly", "edly", "ing", "ed").find(w.endsWith).foreach { sf =>
      val base = w.dropRight(sf.length)
      if (base.exists(isV)) {
        w = base
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (doubles.exists(w.endsWith)) w = w.dropRight(1)
        else if (isShortWord(w)) w += "e"
      }
    }

    // step 1c: y → i after a non-vowel that is not the first letter
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') && !isV(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 (Snowball `among` semantics: the LONGEST listed suffix is
    // chosen first; only then is its R1 condition tested — a failed
    // condition does NOT fall through to a shorter suffix)
    step2Rules.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      if (inR1(suf.length)) suf match {
        case "ogi" =>
          if (w.length > 3 && w.charAt(w.length - 4) == 'l') w = w.dropRight(1)
        case "li" =>
          if (w.length > 2 && liEnding.contains(w.charAt(w.length - 3))) w = w.dropRight(2)
        case _ => w = w.dropRight(suf.length) + rep
      }
    }

    // step 3
    step3Rules.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, rep) =>
      if (inR1(suf.length)) {
        if (suf == "ative") { if (inR2(5)) w = w.dropRight(5) }
        else w = w.dropRight(suf.length) + rep
      }
    }

    // step 4
    step4Suffixes.find(w.endsWith).foreach { suf =>
      if (inR2(suf.length)) {
        if (suf == "ion") {
          if (w.length > 3 && (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
            w = w.dropRight(3)
        } else w = w.dropRight(suf.length)
      }
    }

    // step 5
    if (w.endsWith("e")) {
      if (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length > 1 && w.charAt(w.length - 2) == 'l') w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
