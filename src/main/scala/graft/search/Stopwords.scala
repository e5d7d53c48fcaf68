package graft.search

/** Per-language stopword lists for the FTS `Stopwords(lang)` filter.
  *
  * The reference resolves ISO-639-1 codes to lists generated from the
  * public stopwords-iso collection (stop_word_filter/mod.rs:33-100).
  * This build ships ITS OWN compact function-word lists for the major
  * languages (written for this project, not copied) — smaller than
  * stopwords-iso, so BM25 results can differ from the reference on
  * marginal function words for non-English text. For exact parity with
  * a specific list, scripts can pass the explicit-list form
  * `Stopwords(['word', ...])`, which this build supports with the
  * reference's semantics (fts/mod.rs:210-233).
  */
object Stopwords {

  /** Codes the reference's for_lang accepts (stop_word_filter/mod.rs). */
  val referenceCodes: Set[String] = Set(
    "af", "ar", "hy", "eu", "bn", "br", "bg", "ca", "zh", "hr", "cs", "da",
    "nl", "en", "eo", "et", "fi", "fr", "gl", "de", "el", "gu", "ha", "he",
    "hi", "hu", "id", "ga", "it", "ja", "ko", "ku", "la", "lt", "lv", "ms",
    "mr", "no", "fa", "pl", "pt", "ro", "ru", "sk", "sl", "so", "st", "es",
    "sw", "sv", "th", "tl", "tr", "uk", "ur", "vi", "yo", "zu")

  private val de = Seq(
    "aber", "als", "also", "am", "an", "auch", "auf", "aus", "bei", "bin",
    "bis", "bist", "da", "damit", "dann", "das", "dass", "dein", "dem",
    "den", "der", "des", "dich", "die", "dir", "doch", "dort", "du",
    "durch", "ein", "eine", "einem", "einen", "einer", "eines", "er", "es",
    "euer", "für", "hab", "habe", "haben", "hat", "hatte", "hier", "hin",
    "ich", "ihr", "im", "in", "ist", "ja", "jede", "jedem", "jeden",
    "jeder", "jedes", "kann", "kein", "können", "machen", "mein", "mich",
    "mir", "mit", "muss", "nach", "nicht", "noch", "nun", "nur", "ob",
    "oder", "ohne", "sehr", "sein", "seine", "sich", "sie", "sind", "so",
    "um", "und", "uns", "unser", "unter", "viel", "vom", "von", "vor",
    "war", "waren", "was", "weil", "weiter", "wenn", "wer", "werde",
    "werden", "wie", "wieder", "will", "wir", "wird", "wirst", "wo",
    "zu", "zum", "zur", "über")

  private val fr = Seq(
    "au", "aux", "avec", "ce", "ces", "cette", "dans", "de", "des", "du",
    "elle", "elles", "en", "est", "et", "eu", "il", "ils", "je", "la",
    "le", "les", "leur", "leurs", "lui", "ma", "mais", "me", "mes", "moi",
    "mon", "ne", "nos", "notre", "nous", "on", "ont", "ou", "où", "par",
    "pas", "plus", "pour", "qu", "que", "qui", "sa", "se", "ses", "son",
    "sont", "sur", "ta", "te", "tes", "toi", "ton", "tu", "un", "une",
    "vos", "votre", "vous", "y", "à", "été", "être", "avoir", "fait",
    "comme", "tout", "bien", "sans", "peut", "deux", "même", "si", "entre")

  private val es = Seq(
    "a", "al", "algo", "algunos", "ante", "antes", "como", "con", "contra",
    "cual", "cuando", "de", "del", "desde", "donde", "durante", "e", "el",
    "ella", "ellas", "ellos", "en", "entre", "era", "es", "esa", "ese",
    "eso", "esta", "este", "esto", "fue", "ha", "hay", "la", "las", "le",
    "les", "lo", "los", "me", "mi", "muy", "más", "ni", "no", "nos",
    "nosotros", "o", "os", "otra", "otros", "para", "pero", "por", "porque",
    "que", "quien", "se", "ser", "si", "sin", "sobre", "son", "su", "sus",
    "sí", "también", "te", "tiene", "todo", "todos", "tu", "tus", "un",
    "una", "uno", "unos", "usted", "y", "ya", "yo", "él", "ésta")

  private val ru = Seq(
    "а", "без", "более", "бы", "был", "была", "были", "было", "быть", "в",
    "вам", "вас", "весь", "во", "вот", "все", "всего", "всех", "вы", "где",
    "да", "даже", "для", "до", "его", "ее", "ей", "ею", "если", "есть",
    "еще", "же", "за", "здесь", "и", "из", "или", "им", "их", "к", "как",
    "ко", "когда", "кто", "ли", "либо", "мне", "может", "мы", "на", "надо",
    "наш", "не", "него", "нее", "нет", "ни", "них", "но", "ну", "о", "об",
    "однако", "он", "она", "они", "оно", "от", "очень", "по", "под", "при",
    "с", "со", "так", "также", "такой", "там", "те", "тем", "то", "того",
    "тоже", "той", "только", "том", "ты", "у", "уже", "хотя", "чего", "чей",
    "чем", "что", "чтобы", "чье", "чья", "эта", "эти", "это", "я")

  private val it = Seq(
    "a", "ad", "al", "alla", "alle", "anche", "che", "chi", "ci", "come",
    "con", "cui", "da", "dal", "dalla", "degli", "dei", "del", "della",
    "delle", "di", "dove", "e", "ed", "era", "essere", "fa", "fra", "gli",
    "ha", "hanno", "ho", "i", "il", "in", "io", "la", "le", "lei", "lo",
    "loro", "lui", "ma", "mi", "mia", "mio", "ne", "nei", "nel", "nella",
    "noi", "non", "nostro", "o", "per", "perché", "più", "quale", "quando",
    "questa", "questo", "qui", "se", "sei", "si", "sia", "solo", "sono",
    "su", "sua", "sul", "sulla", "suo", "ti", "tra", "tu", "tua", "tuo",
    "tutti", "tutto", "un", "una", "uno", "vi", "voi", "è")

  private val pt = Seq(
    "a", "ao", "aos", "aquela", "aquele", "as", "até", "com", "como", "da",
    "das", "de", "dela", "dele", "depois", "do", "dos", "e", "ela", "elas",
    "ele", "eles", "em", "entre", "era", "essa", "esse", "esta", "este",
    "eu", "foi", "for", "há", "isso", "isto", "já", "lhe", "mais", "mas",
    "me", "mesmo", "meu", "minha", "muito", "na", "nas", "nem", "no",
    "nos", "nossa", "nosso", "não", "nós", "o", "os", "ou", "para", "pela",
    "pelo", "por", "qual", "quando", "que", "quem", "se", "sem", "ser",
    "seu", "sua", "são", "só", "também", "te", "tem", "teu", "tu", "tua",
    "um", "uma", "você", "vocês", "à", "às", "é")

  private val nl = Seq(
    "aan", "al", "alles", "als", "altijd", "andere", "ben", "bij", "daar",
    "dan", "dat", "de", "der", "deze", "die", "dit", "doch", "doen", "door",
    "dus", "een", "eens", "en", "er", "ge", "geen", "geweest", "haar",
    "had", "heb", "hebben", "heeft", "hem", "het", "hier", "hij", "hoe",
    "hun", "iemand", "iets", "ik", "in", "is", "ja", "je", "kan", "kon",
    "kunnen", "maar", "me", "meer", "men", "met", "mij", "mijn", "moet",
    "na", "naar", "niet", "niets", "nog", "nu", "of", "om", "omdat", "ons",
    "ook", "op", "over", "reeds", "te", "tegen", "toch", "toen", "tot",
    "u", "uit", "uw", "van", "veel", "voor", "want", "waren", "was", "wat",
    "we", "wel", "werd", "wezen", "wie", "wij", "wil", "worden", "zal",
    "ze", "zei", "zelf", "zich", "zij", "zijn", "zo", "zonder", "zou")

  private val sv = Seq(
    "alla", "allt", "att", "av", "blev", "bli", "blir", "de", "dem", "den",
    "denna", "deras", "dess", "det", "detta", "dig", "din", "dina", "ditt",
    "du", "där", "då", "efter", "ej", "eller", "en", "er", "era", "ett",
    "från", "för", "ha", "hade", "han", "hans", "har", "henne", "hennes",
    "hon", "honom", "hur", "här", "i", "icke", "ingen", "inom", "inte",
    "jag", "ju", "kan", "kunde", "man", "med", "mellan", "men", "mig",
    "min", "mina", "mitt", "mot", "mycket", "ni", "nu", "när", "någon",
    "något", "några", "och", "om", "oss", "på", "samma", "sedan", "sig",
    "sin", "sina", "sitta", "själv", "skulle", "som", "så", "sådan",
    "till", "under", "upp", "ut", "utan", "vad", "var", "vara", "varför",
    "varje", "vars", "vart", "vem", "vi", "vid", "vilken", "än", "är",
    "åt", "över")

  private val no = Seq(
    "alle", "at", "av", "begge", "bli", "ble", "da", "de", "deg", "den",
    "denne", "der", "dere", "det", "dette", "din", "du", "eller", "en",
    "er", "et", "etter", "for", "fra", "ha", "hadde", "han", "hans",
    "har", "hennes", "hun", "hva", "hvem", "hvis", "hvor", "i", "ikke",
    "inn", "jeg", "kan", "kun", "man", "med", "meg", "mellom", "men",
    "mer", "min", "mot", "mye", "må", "ned", "noe", "noen", "nå", "og",
    "også", "om", "opp", "oss", "over", "på", "samme", "seg", "selv",
    "si", "sin", "sitt", "skal", "skulle", "slik", "som", "så", "til",
    "ut", "var", "ved", "vi", "vil", "ville", "vår", "være", "vært", "å")

  private val da = Seq(
    "af", "alle", "alt", "anden", "at", "blev", "blive", "bliver", "da",
    "de", "dem", "den", "denne", "der", "deres", "det", "dette", "dig",
    "din", "disse", "dog", "du", "efter", "eller", "en", "end", "er",
    "et", "for", "fra", "ham", "han", "hans", "har", "havde", "have",
    "hende", "hendes", "her", "hos", "hun", "hvad", "hvis", "hvor", "i",
    "ikke", "ind", "jeg", "jer", "jo", "kunne", "man", "mange", "med",
    "meget", "men", "mig", "min", "mine", "mit", "mod", "ned", "noget",
    "nogle", "nu", "når", "og", "også", "om", "op", "os", "over", "på",
    "selv", "sig", "sin", "sine", "sit", "skal", "skulle", "som", "sådan",
    "thi", "til", "ud", "under", "var", "vi", "vil", "ville", "vor",
    "være", "været")

  private val fi = Seq(
    "ei", "en", "että", "he", "hän", "ja", "jo", "jos", "joka", "jotka",
    "kanssa", "keitä", "ken", "kuin", "kun", "me", "mikä", "minä", "mitä",
    "mutta", "myös", "ne", "niin", "nyt", "olen", "olet", "oli", "olla",
    "olleet", "on", "ovat", "sekä", "se", "sen", "siellä", "siitä", "sinä",
    "sitä", "tai", "te", "tämä", "tässä", "vaan", "vai", "vain", "voi",
    "yli", "kaikki", "hyvin", "paljon", "jossa", "jonka", "kuitenkin")

  private val ro = Seq(
    "acea", "această", "acel", "acest", "am", "ar", "are", "aş", "au",
    "avea", "că", "către", "ce", "cel", "ceva", "cu", "cum", "da", "dacă",
    "dar", "de", "deci", "din", "după", "e", "ea", "ei", "el", "ele",
    "era", "este", "eu", "fără", "fi", "fie", "fost", "iar", "îi", "îl",
    "în", "între", "la", "le", "lor", "lui", "mai", "mea", "mei", "mult",
    "ne", "nu", "o", "ori", "până", "pe", "pentru", "prin", "sa", "să",
    "sau", "se", "şi", "spre", "sunt", "tot", "un", "una", "unei", "unui",
    "va", "voi", "vor")

  private val hu = Seq(
    "a", "az", "ahogy", "ahol", "aki", "akik", "akkor", "amely", "ami",
    "amikor", "át", "azért", "azok", "azonban", "be", "csak", "de",
    "e", "ebben", "egy", "egyes", "egyik", "el", "ez", "ezek", "ezt",
    "fel", "felé", "ha", "hanem", "hogy", "így", "ill", "illetve", "is",
    "ki", "kell", "le", "lehet", "lesz", "lett", "maga", "majd", "már",
    "más", "meg", "mert", "mi", "mikor", "milyen", "minden", "mint",
    "mintha", "mit", "nagy", "ne", "nem", "nincs", "oda", "ő", "ők",
    "őket", "pedig", "rá", "s", "saját", "sem", "semmi", "sok", "szerint",
    "szinte", "talán", "tehát", "több", "úgy", "új", "utána", "vagy",
    "van", "vannak", "volt", "voltak", "például")

  private val tr = Seq(
    "acaba", "ama", "ancak", "artık", "bana", "bazı", "belki", "ben",
    "beni", "benim", "bir", "biraz", "birçok", "biri", "biz", "bize",
    "bizim", "böyle", "bu", "buna", "bunu", "bunun", "çok", "çünkü",
    "da", "daha", "de", "değil", "diye", "eğer", "en", "gibi", "hem",
    "hep", "hepsi", "her", "hiç", "için", "ile", "ise", "işte", "kadar",
    "kendi", "ki", "kim", "mı", "mi", "mu", "mü", "nasıl", "ne", "neden",
    "nerede", "niye", "o", "ona", "onlar", "onların", "onu", "onun",
    "öyle", "sana", "sen", "senin", "siz", "sizin", "şey", "şimdi", "şu",
    "tüm", "ve", "veya", "ya", "yani", "yok", "zaten")

  private val shipped: Map[String, Seq[String]] = Map(
    "en" -> Fts.stopwordsEn, "de" -> de, "fr" -> fr, "es" -> es,
    "ru" -> ru, "it" -> it, "pt" -> pt, "nl" -> nl, "sv" -> sv,
    "no" -> no, "da" -> da, "fi" -> fi, "ro" -> ro, "hu" -> hu, "tr" -> tr)

  /** The shipped list for `code`, if any. */
  def forLang(code: String): Option[Seq[String]] = shipped.get(code.toLowerCase)

  def shippedCodes: Seq[String] = shipped.keys.toSeq.sorted
}
