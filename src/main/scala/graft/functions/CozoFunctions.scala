package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface of the reference
  * (138 `define_op!`s, cozo-core/src/data/functions.rs; dispatch
  * data/expr.rs:794+). Nearly all are direct Spark built-ins — this
  * object pins down the exact mapping (and the handful of compositions)
  * so query builders and tests have one canonical place to look.
  * Citations are functions.rs line numbers.
  */
object CozoFunctions {

  // — comparison / logic (297-372, 1091-1117) — cozo's cross-type total
  // order only matters for Any-typed columns; on typed columns Spark
  // comparison semantics coincide. NULL==NULL joins use `<=>`.
  def nullSafeEq(a: Column, b: Column): Column = a <=> b
  def isIn(v: Column, list: Column): Column = array_contains(list, v) // 324
  def coalesceF(cs: Column*): Column = coalesce(cs: _*) // 287
  def condF(branches: Seq[(Column, Column)], otherwise: Column): Column = // Expr::Cond
    branches.foldRight(otherwise) { case ((c, v), acc) => when(c, v).otherwise(acc) }

  // — arithmetic / math (382-1069): add/sub/mul/div/abs/signum/floor/
  // ceil/round/mod/pow/sqrt/exp/ln/log2/log10/trig/hyperbolic — all
  // 1:1 Spark built-ins (`pow`, `sqrt`, `exp`, `log`, `log2`, `log10`,
  // `sin`..`atanh`, `least`/`greatest` for scalar min/max 453/468).
  /** 1611 haversine (radians in, great-circle distance on unit sphere). */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = (lat2 - lat1) / 2
    val dLon = (lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) + cos(lat1) * cos(lat2) * pow(sin(dLon), 2)
    lit(2.0) * asin(least(lit(1.0), sqrt(a)))
  }
  /** 1626 haversine_deg_input. */
  def haversineDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversine(radians(lat1), radians(lon1), radians(lat2), radians(lon2))
  def degToRad(c: Column): Column = radians(c) // 1641
  def radToDeg(c: Column): Column = degrees(c) // 1649

  // — strings (1253-1868)
  def strIncludes(s: Column, sub: Column): Column = s.contains(sub) // 1312
  def sliceString(s: Column, from: Column, to: Column): Column = // 1847 [from,to)
    substring(s, from + 1, to - from)
  def chars(s: Column): Column = split(s, "") // 1831
  def fromSubstrings(parts: Column): Column = array_join(parts, "") // 1868
  def unicodeNormalize(s: Column, form: String): Column = { // 1577, UDF (no builtin)
    val f = java.text.Normalizer.Form.valueOf(form.toUpperCase)
    val u = udf((x: String) => if (x == null) null else java.text.Normalizer.normalize(x, f))
    u(s)
  }

  // — regex (1380-1435): regexp_like / regexp_extract_all /
  // regexp_substr are 1:1; `regex_replace` (1401) replaces only the
  // FIRST occurrence (Rust `Regex::replace`), which Spark's
  // regexp_replace (= replace_all, 1411) cannot express — UDF with a
  // per-executor compiled-pattern cache.
  def regexReplaceFirst(s: Column, pattern: Column, rep: Column): Column =
    RegexCache.replaceFirstUdf(s, pattern, rep)

  // — lists (71-2409)
  def listGet(l: Column, i: Column): Column = element_at(l, i + 1) // 1741 (0-based)
  // first/last of an empty list are null, not an error (1657/1667) —
  // try_element_at, since ANSI element_at throws on out-of-bounds
  def first_(l: Column): Column = try_element_at(l, lit(1))
  def last_(l: Column): Column = when(size(l) > 0, element_at(l, -1)) // try_element_at rejects -1
  def sorted(l: Column): Column = sort_array(l) // 1591
  /** Empty array<array<elem>> with the element type of `l` — the
    * filter-to-nothing trick keeps the expression generic (a literal
    * `array()` cast needs a concrete type name). */
  private def emptyNested(l: Column): Column = filter(array(l), _ => lit(false))
  def chunksExact(l: Column, n: Int): Column = chunksExactC(l, lit(n))
  def chunksExactC(l: Column, n: Column): Column = // 1693
    when(size(l) >= n, transform(sequence(lit(0), (size(l) / n).cast("int") - 1),
      i => slice(l, i * n + 1, n))).otherwise(emptyNested(l))
  def chunks(l: Column, n: Column): Column = // 1677 (last chunk may be short)
    when(size(l) > 0, transform(sequence(lit(0), ceil(size(l).cast("double") / n).cast("int") - 1),
      i => slice(l, i * n + 1, n))).otherwise(emptyNested(l))
  def windows(l: Column, n: Int): Column = windowsC(l, lit(n))
  def windowsC(l: Column, n: Column): Column = // 1709
    when(size(l) >= n, transform(sequence(lit(0), size(l) - n),
      i => slice(l, i + 1, n))).otherwise(emptyNested(l))
  def intRange(from: Column, to: Column): Column = // 2257 [from, to)
    when(from < to, sequence(from, to - 1)).otherwise(array().cast("array<long>"))
  /** 3-arg int_range with signed step (2257): stop-exclusive in either
    * direction; empty when the step points away from the stop. */
  def intRangeStep(from: Column, to: Column, step: Column): Column =
    when(step > 0, when(from < to, sequence(from, to - 1, step)).otherwise(array().cast("array<long>")))
      .otherwise(when(from > to, sequence(from, to + 1, step)).otherwise(array().cast("array<long>")))
  /** op_slice (1712): 0-based [start, end) with negative-from-end
    * indices; out-of-bound bounds are an ERROR (unlike maybe_get). */
  def sliceList(x: Column, s: Column, e: Column): Column = {
    val n = size(x)
    val s2 = when(s < 0, s + n).otherwise(s).cast("int")
    val e2 = when(e < 0, e + n).otherwise(e).cast("int")
    when(s2 < 0 || e2 > n || s2 > e2,
      raise_error(concat(lit("slice bounds out of range: ["), s.cast("string"),
        lit(", "), e.cast("string"), lit(") on length "), n.cast("string"))))
      .otherwise(slice(x, s2 + 1, e2 - s2))
  }

  // — type predicates / casts (306-2429): is_null → isNull, is_nan →
  // isnan, to_int/to_float/to_bool/to_string → cast; is_* on typed
  // columns are schema facts.

  // — JSON (76-316): parse_json/dump_json/json_object →
  // from_json/to_json/get_json_object; path ops compose get_json_object.
  def jsonToScalarLong(s: Column, path: String): Column = { // 316 for ints
    val raw = get_json_object(s, path)
    when(raw.rlike("^-?\\d+$"), raw.cast("long"))
  }

  // — encoding (1895/1906)
  def encodeBase64(c: Column): Column = base64(c)
  def decodeBase64(c: Column): Column = unbase64(c)

  // — vectors (2030-2230): see VectorFunctions (native codegen kernels).
  def l2Normalize(v: Column): Column = { // 2168
    val n = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    when(n > 0, transform(v, x => (x / n).cast("float"))).otherwise(v)
  }

  // — t2s (functions.rs:1446): traditional→simplified Chinese. The
  // reference embeds a full OpenCC table; this covers the common
  // single-character mappings via codegen'd translate() — multi-char
  // phrase conversion would need the full shipped table.
  private val t2sTraditional =
    "萬與醜專業叢東絲丟兩嚴喪個爿豐臨為麗舉麼義烏樂喬習鄉書買亂爭於虧雲亙" +
    "產畝親褻嚲億僅從侖倉儀們價眾優夥會傴傘偉傳傷倀倆傖偽佇體餘傭僉俠侶僥" +
    "偵側僑儈儕儂侄儔儼倫偉悵閆門問聞閩罔惘煩釩釓訂計訃認譏訐訌討讓訕訖訓" +
    "議訊記講諱謳詎訝訥許訛論訩訟諷設訪訣證詁訶評詛識詗詐訴診詆謅詞詘詔譯" +
    "國圖圓團壙場壞塊堅壇壢壩塢墳墜長門開閉閑間悶閒們" +
    "漢滅澩灩滬淚風颱鳳凰鬥鬧鬨馬駁駛駝驅騰驢驥魚魯鯨鳥鳴鴉鳳雞" +
    "車軋軌軒連運進違這還邊遼達遷過邁" +
    "紅紂紃約級紀紉緯紜紘純紕紗綱納紝縱綸紛紙紋紡" +
    "語學話說誰請讀寫聽見視覺觀點線練組經給統繼"
  private val t2sSimplified =
    "万与丑专业丛东丝丢两严丧个丬丰临为丽举么义乌乐乔习乡书买乱争于亏云亘" +
    "产亩亲亵亸亿仅从仑仓仪们价众优伙会伛伞伟传伤伥俩伧伪伫体余佣佥侠侣侥" +
    "侦侧侨侩侪侬侄俦俨伦伟怅闫门问闻闽罔惘烦钒钆订计讣认讥讦讧讨让讪讫训" +
    "议讯记讲讳讴讵讶讷许讹论讻讼讽设访诀证诂诃评诅识诇诈诉诊诋诌词诎诏译" +
    "国图圆团圹场坏块坚坛坜坝坞坟坠长门开闭闲间闷闲们" +
    "汉灭学滟沪泪风台凤凰斗闹哄马驳驶驼驱腾驴骥鱼鲁鲸鸟鸣鸦凤鸡" +
    "车轧轨轩连运进违这还边辽达迁过迈" +
    "红纣紃约级纪纫纬纭纮纯纰纱纲纳纴纵纶纷纸纹纺" +
    "语学话说谁请读写听见视觉观点线练组经给统继"
  /** Phrase-level rules applied before the character table, the part
    * of OpenCC/fast2s semantics a char map cannot express: ambiguous
    * traditional characters (乾/著/藉/瞭) convert differently inside
    * certain phrases. Protected phrases round-trip through a
    * private-use placeholder so the char pass cannot rewrite them.
    * A curated subset — the full Apache-2.0 OpenCC phrase data is the
    * swap-in at deployment; the char table carries everything else. */
  private val t2sPhrases: Seq[(String, String)] = Seq(
    // 乾 → 干 in general (乾燥→干燥), but stays 乾 in these
    "乾隆" -> "乾隆", "乾坤" -> "乾坤", "乾卦" -> "乾卦",
    // 著 → 着 as the aspect particle, stays 著 in writing-related senses
    "著作" -> "著作", "著名" -> "著名", "顯著" -> "显著", "土著" -> "土著",
    "編著" -> "编著", "名著" -> "名著",
    // 藉 → 借 in excuse/by-means-of senses, stays 藉 otherwise
    "藉口" -> "借口", "憑藉" -> "凭借", "慰藉" -> "慰藉", "狼藉" -> "狼藉",
    // 瞭 → 了 in understanding senses, stays 瞭 in looking senses
    "瞭望" -> "瞭望", "瞭解" -> "了解", "明瞭" -> "明了")
  private val t2sAmbiguousChars = ("乾著藉瞭", "干着藉了") // defaults outside phrases

  /** functions.rs:1446 `t2s` — phrase rules + common-character table
    * (the reference embeds the full fast2s data). */
  def t2s(c: Column): Column = {
    // phrase → placeholder, char pass, placeholder → simplified phrase
    val masked = t2sPhrases.zipWithIndex.foldLeft(c) { case (acc, ((trad, _), i)) =>
      replace(acc, lit(trad), lit((0xE000 + i).toChar.toString))
    }
    val translated = translate(masked,
      t2sTraditional + t2sAmbiguousChars._1, t2sSimplified + t2sAmbiguousChars._2)
    t2sPhrases.zipWithIndex.foldLeft(translated) { case (acc, ((_, simp), i)) =>
      replace(acc, lit((0xE000 + i).toChar.toString), lit(simp))
    }
  }

  // — bitwise over packed bool lists (functions.rs:1194-1216). The
  // reference packs into Bytes; a cold-path UDF is acceptable here
  // (never in a scan hot loop — use array<boolean> columns directly
  // for analytical predicates).
  private lazy val packBitsUdf = udf((bits: Seq[Boolean]) => {
    if (bits == null) null
    else {
      val out = new Array[Byte]((bits.length + 7) / 8)
      bits.zipWithIndex.foreach { case (b, i) => if (b) out(i / 8) = (out(i / 8) | (0x80 >> (i % 8))).toByte }
      out
    }
  })
  private lazy val unpackBitsUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) null
    else bytes.flatMap(b => (0 until 8).map(i => ((b >> (7 - i)) & 1) == 1)))
  def packBits(bools: Column): Column = packBitsUdf(bools)
  def unpackBits(bytes: Column): Column = unpackBitsUdf(bytes)

  // — JSON path set/remove (functions.rs:81-156) for top-level keys,
  // via map manipulation; keys re-emitted sorted for canonical output.
  private def jsonAsMap(j: Column): Column =
    from_json(j, org.apache.spark.sql.types.DataType.fromDDL("map<string,string>"))
  private def mapToJson(m: Column): Column =
    to_json(map_from_entries(array_sort(map_entries(m))))
  def jsonSet(j: Column, key: String, value: Column): Column =
    mapToJson(map_concat(map_filter(jsonAsMap(j), (k, _) => k =!= key), map(lit(key), value.cast("string"))))
  def jsonRemove(j: Column, key: String): Column =
    mapToJson(map_filter(jsonAsMap(j), (k, _) => k =!= key))

  // — time (functions.rs:2441-2520): cozo represents instants as epoch
  // seconds (float); formatting is RFC3339-ish.
  def nowSeconds(): Column = unix_timestamp(current_timestamp()).cast("double")
  def formatTimestamp(epochSecs: Column, fmt: String = "yyyy-MM-dd'T'HH:mm:ssXXX"): Column =
    date_format(timestamp_seconds(epochSecs), fmt)
  def parseTimestamp(s: Column): Column = unix_timestamp(to_timestamp(s)).cast("double")

  // — uuid (functions.rs:2305-2571): v4 random; v1 is time-ordered —
  // a deterministic time-ordered surrogate built from a timestamp and
  // a hash suffix (sortable like v1, stable across engines).
  def uuidV4(): Column = uuid()
  def timeUuid(ts: Column, salt: Column): Column =
    concat_ws("-",
      lpad(hex(unix_timestamp(ts)), 12, "0"),
      lpad(hex(pmod(xxhash64(salt), lit(65536L))), 4, "0"),
      lit("4000-8000-000000000000"))
  /** functions.rs:2556 `uuid_timestamp` — epoch seconds for time-ordered
    * uuids, null otherwise. Our v1 surrogate (timeUuid above) carries the
    * timestamp as a 12-hex-char first group; real v4s have an 8-char
    * first group and yield null, matching the reference's None for
    * non-v1 uuids. */
  def uuidTimestamp(u: Column): Column = {
    val first = substring_index(u, "-", 1)
    when(length(first) === 12, conv(first, 16, 10).cast("double"))
  }

  // — bytes bitwise (functions.rs:1126-1176): byte-wise and/or/xor over
  // equal-length Bytes (reference bails on length mismatch → null here),
  // not over packed-bool longs.
  private lazy val bytesAndUdf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null || a.length != b.length) null
    else a.indices.map(i => (a(i) & b(i)).toByte).toArray)
  private lazy val bytesOrUdf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null || a.length != b.length) null
    else a.indices.map(i => (a(i) | b(i)).toByte).toArray)
  private lazy val bytesXorUdf = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null || a.length != b.length) null
    else a.indices.map(i => (a(i) ^ b(i)).toByte).toArray)
  private lazy val bytesNotUdf = udf((a: Array[Byte]) =>
    if (a == null) null else a.map(x => (~x).toByte))
  def bytesAnd(a: Column, b: Column): Column = bytesAndUdf(a, b)
  def bytesOr(a: Column, b: Column): Column = bytesOrUdf(a, b)
  def bytesXor(a: Column, b: Column): Column = bytesXorUdf(a, b)
  def bytesNot(a: Column): Column = bytesNotUdf(a)

  // — random (functions.rs:2310/2134): bernoulli draw; dim-n random unit
  // vector (reference: standard normal components).
  def randBernoulli(p: Column): Column = // 2310: p outside [0, 1] is an error
    when(p < 0 || p > 1, raise_error(concat(lit("rand_bernoulli probability out of range: "),
      p.cast("string")))).otherwise(rand() < p)
  private lazy val randVecUdf = udf((n: Int) =>
    Array.fill(n)(scala.util.Random.nextGaussian().toFloat)).asNondeterministic()
  def randVec(n: Column): Column = randVecUdf(n.cast("int"))
}

/** Serializable compiled-regex cache shared by regex UDF closures —
  * avoids per-row Pattern.compile on executors. */
private[functions] object RegexCache extends Serializable {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def compiled(p: String): java.util.regex.Pattern = {
    val hit = cache.get(p)
    if (hit != null) hit
    else { val c = java.util.regex.Pattern.compile(p); cache.putIfAbsent(p, c); c }
  }
  val replaceFirstUdf = udf((s: String, p: String, r: String) =>
    if (s == null || p == null || r == null) null
    else compiled(p).matcher(s).replaceFirst(r))
}
