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
  // chunks/windows Let-bind their list argument: the slicing lambdas
  // would otherwise re-evaluate it per chunk/window — quadratic when a
  // caller passes an expression (a tokenizer) instead of a column ref
  def chunksExact(l: Column, n: Int): Column = chunksExactC(l, lit(n))
  def chunksExactC(l0: Column, n: Column): Column = Let.once(l0) { l => // 1693
    when(size(l) >= n, transform(sequence(lit(0), (size(l) / n).cast("int") - 1),
      i => slice(l, i * n + 1, n))).otherwise(emptyNested(l))
  }
  def chunks(l0: Column, n: Column): Column = Let.once(l0) { l => // 1677 (last chunk may be short)
    when(size(l) > 0, transform(sequence(lit(0), ceil(size(l).cast("double") / n).cast("int") - 1),
      i => slice(l, i * n + 1, n))).otherwise(emptyNested(l))
  }
  def windows(l: Column, n: Int): Column = windowsC(l, lit(n))
  def windowsC(l0: Column, n: Column): Column = Let.once(l0) { l => // 1709
    when(size(l) >= n, transform(sequence(lit(0), size(l) - n),
      i => slice(l, i + 1, n))).otherwise(emptyNested(l))
  }
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
    "瞭望" -> "瞭望", "瞭解" -> "了解", "明瞭" -> "明了",
    // 徵 → 征 in general (特徵→特征), but the musical note zhǐ keeps
    // its form in simplified orthography
    "宮商角徵羽" -> "宫商角徵羽", "變徵" -> "变徵", "角徵" -> "角徵",
    // word-level rewrites a char map cannot express
    "甚麼" -> "什么",   // 甚 stays 甚 elsewhere (甚至→甚至)
    "傢俱" -> "家具")   // 俱 stays 俱 elsewhere (俱樂部→俱乐部)
  private val t2sAmbiguousChars = ("乾著藉瞭", "干着藉了") // defaults outside phrases

  /** Additional single-character mappings beyond the legacy rows, one
    * 2-char "trad simp" entry each so every mapping is auditable in
    * place. Merged with the legacy table at init; conflicting duplicates
    * fail loudly there. Still a curated subset of the full OpenCC data
    * (the deployment swap-in), but this covers the high-frequency
    * simplifications the legacy rows missed. */
  private val t2sMorePairs: Seq[String] = Seq(
    // extremely common single chars
    "發发", "後后", "時时", "實实", "當当", "對对", "裡里", "裏里", "麵面",
    "隻只", "幹干", "並并", "沒没", "電电", "點点", "無无", "該该", "爾尔",
    "將将", "從从", "數数", "準准", "備备", "條条", "師师", "農农", "雜杂",
    // finance / trade (貝 radical)
    "財财", "責责", "賢贤", "敗败", "貨货", "貪贪", "貧贫", "購购", "貯贮",
    "貴贵", "費费", "贈赠", "資资", "賊贼", "賞赏", "賦赋", "賬账", "賓宾",
    "負负", "貢贡", "貶贬", "貿贸", "賄贿", "賠赔", "賤贱", "賭赌", "贊赞",
    "賴赖", "賀贺", "贏赢", "質质", "貝贝", "賣卖", "賽赛", "贗赝",
    // metals (釒 radical)
    "鐵铁", "銀银", "錢钱", "銅铜", "鋁铝", "鋼钢", "針针", "釘钉", "鈣钙",
    "鈉钠", "鉀钾", "鎂镁", "鋅锌", "錫锡", "鉛铅", "鏈链", "鎖锁", "鍵键",
    "錯错", "鍋锅", "鑄铸", "鑒鉴", "鑑鉴", "錄录", "鑼锣", "鈴铃", "鐘钟",
    "鍾钟", "錶表", "鏡镜", "鏟铲", "鑽钻", "銷销", "鋒锋", "銳锐", "鍛锻",
    "鎮镇", "鋪铺",
    // 頁 radical
    "頁页", "頂顶", "項项", "順顺", "須须", "頑顽", "顧顾", "頓顿", "頒颁",
    "頌颂", "預预", "領领", "頭头", "頸颈", "頻频", "題题", "額额", "顏颜",
    "願愿", "類类", "顯显", "頗颇", "顆颗", "顫颤", "頃顷",
    // food (飠 radical)
    "飯饭", "飲饮", "餓饿", "館馆", "飽饱", "飾饰", "餃饺", "餅饼", "養养",
    "餘余", "餡馅", "飢饥", "饑饥", "饒饶", "饞馋",
    // horses (馬 radical)
    "馮冯", "馳驰", "駕驾", "騎骑", "騙骗", "驚惊", "驗验", "驕骄", "駐驻",
    "騷骚", "驟骤", "駛驶", "騰腾", "驢驴", "驥骥", "驅驱", "駱骆",
    // silk (糹 radical)
    "絞绞", "綁绑", "繩绳", "維维", "綿绵", "緊紧", "縣县", "織织", "繞绕",
    "繡绣", "續续", "纏缠", "縮缩", "總总", "績绩", "縫缝", "編编", "緣缘",
    "緒绪", "緩缓", "締缔", "縛缚", "絡络", "絕绝", "結结", "綜综", "綠绿",
    "綢绸", "網网", "紹绍", "繪绘", "繳缴", "糾纠", "纖纤", "纔才", "籤签",
    "緻致", "縷缕", "纜缆", "纏缠",
    // 門 radical
    "閃闪", "閥阀", "閣阁", "閱阅", "闆板", "闊阔", "闖闯", "關关", "閘闸",
    "閏闰", "闢辟", "閨闺",
    // speech (訁 radical) beyond legacy
    "詳详", "誅诛", "誕诞", "誘诱", "誤误", "誦诵", "說说", "誠诚", "誡诫",
    "誌志", "諒谅", "談谈", "諸诸", "諾诺", "謀谋", "謂谓", "謊谎", "謝谢",
    "謠谣", "謹谨", "譜谱", "譽誉", "護护", "變变", "讚赞", "誇夸", "詩诗",
    "誼谊", "調调", "課课", "諺谚", "謎谜", "謙谦", "詢询",
    // vehicles (車 radical)
    "軟软", "較较", "載载", "輔辅", "輕轻", "輛辆", "輝辉", "輪轮", "輸输",
    "轉转", "轎轿", "輩辈", "轟轰", "輯辑", "輻辐", "轄辖", "軍军", "軌轨",
    "軀躯", "輿舆",
    // fish / birds / bugs
    "鮮鲜", "鯉鲤", "鯊鲨", "鴨鸭", "鴿鸽", "鵝鹅", "鷹鹰", "鶴鹤", "鵬鹏",
    "鴻鸿", "蟲虫", "蠶蚕", "蠟蜡", "蟬蝉", "蝦虾", "螞蚂", "螢萤", "蝕蚀",
    "蟻蚁", "蠅蝇", "鷗鸥",
    // misc high-frequency
    "龍龙", "龜龟", "鹽盐", "鹼碱", "麥麦", "黃黄", "黨党", "齊齐", "齒齿",
    "勁劲", "辦办", "蘇苏", "蘭兰", "藝艺", "藥药", "蘋苹", "蓮莲", "薩萨",
    "蔣蒋", "蕭萧", "蘿萝", "葉叶", "萊莱", "莊庄", "蒼苍", "蓋盖", "蔥葱",
    "蕩荡", "薦荐", "藍蓝", "蘆芦", "蘊蕴", "艱艰", "虛虚", "虜虏",
    "愛爱", "憲宪", "憶忆", "應应", "懷怀", "懼惧", "憑凭", "態态", "慶庆",
    "慮虑", "慣惯", "憤愤", "悅悦", "惱恼", "憂忧", "鬱郁", "懲惩", "戀恋",
    "懶懒", "戲戏", "戰战", "戶户",
    "擊击", "擔担", "據据", "擁拥", "擇择", "擴扩", "攔拦", "攜携", "攝摄",
    "擺摆", "擾扰", "撲扑", "撐撑", "搶抢", "撈捞", "損损", "換换", "揚扬",
    "搖摇", "擬拟", "掛挂", "採采", "捨舍", "捲卷", "擋挡", "擠挤",
    "樹树", "橋桥", "機机", "權权", "樓楼", "標标", "樣样", "檢检", "榮荣",
    "構构", "槍枪", "極极", "楊杨", "夢梦", "棄弃", "檔档", "櫃柜", "欄栏",
    "樸朴", "棟栋", "桿杆", "橫横",
    "歡欢", "歲岁", "歷历", "曆历", "歸归", "殘残", "殺杀", "毀毁", "殼壳",
    "毆殴", "歎叹", "歐欧",
    "氫氢", "淺浅", "濟济", "濤涛", "灣湾", "溫温", "湯汤", "測测", "湧涌",
    "滿满", "漸渐", "潔洁", "澤泽", "濃浓", "濕湿", "瀉泻", "瀏浏", "滲渗",
    "漲涨", "潛潜", "潤润", "澆浇", "淪沦", "洶汹", "湊凑", "減减", "渦涡",
    "決决", "況况", "淨净", "涼凉", "沖冲", "潑泼", "灘滩", "灑洒", "濱滨",
    "燈灯", "燒烧", "爐炉", "煙烟", "熱热", "燦灿", "燭烛", "爛烂", "營营",
    "煉炼", "熒荧", "燉炖", "爺爷", "牆墙", "牽牵", "犧牺", "獻献",
    "獨独", "獲获", "穫获", "獎奖", "獄狱", "猶犹", "狀状", "獅狮", "貓猫",
    "豬猪", "狹狭",
    "環环", "現现", "瑪玛", "瓊琼",
    "畢毕", "畫画", "異异", "疇畴", "瘋疯", "療疗", "瘡疮", "癢痒", "瘧疟",
    "癱瘫", "盡尽", "儘尽", "監监", "盤盘", "盜盗", "睜睁", "瞞瞒", "矚瞩",
    "睏困",
    "礦矿", "碼码", "磚砖", "礎础", "確确", "碩硕", "礙碍",
    "禮礼", "禍祸", "禱祷", "禪禅", "種种", "稱称", "穀谷", "積积", "穩稳",
    "稅税", "窮穷", "竊窃", "窩窝", "窺窥", "競竞",
    "筆笔", "筍笋", "節节", "範范", "築筑", "簡简", "簽签", "籃篮", "籌筹",
    "籠笼", "篩筛", "簾帘", "篤笃", "簫箫",
    "糧粮", "粵粤", "糞粪",
    "罰罚", "罷罢", "羅罗", "罵骂",
    "聖圣", "聯联", "聰聪", "聲声", "職职", "聳耸", "肅肃",
    "脈脉", "腦脑", "腸肠", "膚肤", "膠胶", "臟脏", "髒脏", "脹胀", "腫肿",
    "膽胆", "脅胁", "脫脱", "腎肾", "膩腻", "臉脸", "腳脚",
    "艦舰", "艙舱", "興兴", "舖铺",
    "術术", "衛卫", "補补", "裝装", "褲裤", "襯衬", "複复", "復复", "製制",
    "襪袜", "襲袭", "衝冲", "衆众",
    "規规", "覽览", "豎竖", "豈岂", "艷艳",
    "趕赶", "趙赵", "趨趋", "躍跃", "踐践", "蹤踪",
    "辭辞", "辯辩", "辮辫",
    "遠远", "適适", "選选", "遺遗", "邏逻", "遲迟", "遞递", "鄰邻", "鄭郑",
    "鄧邓", "郵邮", "遊游", "遙遥", "遜逊", "週周",
    "釀酿", "釋释",
    "陸陆", "陽阳", "陰阴", "階阶", "際际", "隨随", "險险", "隱隐", "隊队",
    "陣阵", "陳陈", "隸隶", "陝陕",
    "雖虽", "雙双", "難难", "離离", "靈灵", "靜静", "霧雾", "靂雳",
    "韋韦", "韓韩", "響响", "飄飘",
    "鬆松", "鬚须", "魯鲁",
    "齡龄", "屬属", "層层", "屆届", "屍尸", "屜屉", "屢屡",
    "帶带", "幫帮", "幣币", "帥帅", "幟帜", "帳帐", "廣广", "廟庙", "廠厂",
    "廢废", "廳厅", "廬庐", "庫库", "廈厦", "廚厨", "廁厕", "龐庞",
    "彈弹", "強强", "彎弯", "彙汇", "彌弥", "徑径", "徹彻", "徵征",
    "敵敌", "敘叙", "斬斩", "斃毙", "曉晓",
    "壓压", "壘垒", "墮堕", "壞坏", "壟垄",
    "婦妇", "媽妈", "嬰婴", "嬌娇", "孫孙", "寧宁", "寬宽", "審审", "宮宫",
    "尋寻", "導导", "對对", "壽寿", "夾夹", "奪夺", "奮奋", "奧奥", "妝妆",
    "姦奸", "嚇吓", "噸吨", "嘆叹", "嗎吗", "嘔呕", "嘩哗", "嘯啸", "嚴严",
    "囑嘱", "囪囱", "圍围", "園园", "圖图", "團团", "聞闻",
    "傑杰", "儲储", "償偿", "優优", "僱雇", "債债", "傾倾",
    "劇剧", "劉刘", "劍剑", "創创", "劃划", "則则", "剛刚", "剝剥", "剎刹",
    "勝胜", "勞劳", "勢势", "動动", "務务", "勵励", "勸劝", "匯汇", "區区",
    "醫医", "協协", "單单", "華华", "惡恶", "矯矫",
    "黴霉", "髮发", "雞鸡", "鳳凤", "鳴鸣", "鴉鸦", "鬧闹", "鬨哄", "鬥斗",
    "麗丽", "齋斋",
    // r7 sweep: remaining high-frequency one-to-one simplifications
    "臺台", "檯台", "嚮向", "註注", "佈布", "鹹咸", "摺折", "籲吁",
    "嘗尝", "嚐尝", "慾欲", "罈坛", "輓挽", "陞升", "昇升", "燻熏",
    "衊蔑", "蹟迹", "跡迹", "嶽岳", "慄栗", "峯峰", "羣群", "噁恶",
    "鞦秋", "韆千", "麯曲", "嚥咽", "樑梁", "鏽锈", "滷卤", "鹵卤",
    "捱挨", "齣出", "甦苏", "孃娘", "鈞钧", "瀋沈", "硃朱", "唸念",
    "噹当", "鉅巨", "係系", "繫系", "脩修", "傢家", "冊册", "試试")

  /** Merged character table: legacy rows + [[t2sMorePairs]]. Duplicate
    * entries with the SAME target are collapsed; a conflicting duplicate
    * or an entry colliding with the ambiguous-char set fails loudly at
    * class init (tests would go red before any query runs). */
  private val (t2sTradMerged, t2sSimpMerged): (String, String) = {
    val legacy = t2sTraditional.zip(t2sSimplified)
    val more = t2sMorePairs.map { p =>
      require(p.length == 2, s"t2s pair must be 2 chars: '$p'"); (p(0), p(1))
    }
    val m = scala.collection.mutable.LinkedHashMap.empty[Char, Char]
    for ((t, s) <- legacy ++ more) {
      require(!m.contains(t) || m(t) == s, s"conflicting t2s mapping for '$t'")
      require(!t2sAmbiguousChars._1.contains(t), s"ambiguous char '$t' belongs to the phrase pass")
      if (!m.contains(t)) m(t) = s
    }
    (m.keys.mkString, m.values.mkString)
  }

  // — deployment swap-in for the FULL OpenCC data (TSCharacters.txt /
  // TSPhrases.txt, `trad<TAB>simp[ simp2…]` lines; first candidate
  // wins, like opencc's default). Swapped-in entries take precedence
  // over the curated built-ins. OpenCCSwapInSpec validates the loader
  // against a miniature file and activates a real table when one is
  // present at the documented path (tools/swapin/README).
  @volatile private var t2sCharsExt: Map[Char, Char] = Map.empty
  @volatile private var t2sPhrasesExt: Seq[(String, String)] = Seq.empty

  def loadOpenCC(charLines: Iterator[String],
                 phraseLines: Iterator[String]): (Int, Int) = {
    def parse(lines: Iterator[String]): Seq[(String, String)] = lines.flatMap { l =>
      val parts = l.trim.split("\\s+")
      if (parts.length >= 2 && !parts(0).startsWith("#")) Some(parts(0) -> parts(1))
      else None
    }.toSeq
    // BMP 1:1 mappings ride the translate() char table; everything else
    // — astral code points (translate is UTF-16-unit-wise) and
    // multi-char entries — goes through the string-level phrase pass
    val (bmp, rest) = parse(charLines).partition {
      case (t, s) => t.length == 1 && s.length == 1
    }
    val chars = bmp.map { case (t, s) => t(0) -> s(0) }
    val phrases = rest ++ parse(phraseLines)
    require(chars.nonEmpty || phrases.nonEmpty, "loadOpenCC: no parseable entries")
    t2sCharsExt = chars.toMap
    t2sPhrasesExt = phrases
    (chars.size, phrases.size)
  }
  def resetOpenCC(): Unit = { t2sCharsExt = Map.empty; t2sPhrasesExt = Seq.empty }
  def openCCLoaded: (Int, Int) = (t2sCharsExt.size, t2sPhrasesExt.size)

  /** functions.rs:1446 `t2s` — phrase rules + common-character table
    * (the reference embeds the full fast2s data). With ONLY the curated
    * built-in table the pass is pure column expressions; ANY swapped-in
    * OpenCC entries switch to the greedy longest-match UDF — the two
    * strategies can diverge on overlapping phrase occurrences (global
    * length-ordered replace vs left-to-right greedy), so the strategy
    * choice must not depend on HOW MANY entries were swapped in (r8
    * advice), and a 10k-deep replace() expression tree is not a plan
    * anyway; t2s is a cold-path scalar, never a scan predicate. */
  def t2s(c: Column): Column = {
    val phrases: Seq[(String, String)] = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
      for ((t, s) <- t2sPhrases ++ t2sPhrasesExt) m(t) = s // ext overrides
      m.toSeq
    }
    if (t2sPhrasesExt.isEmpty && t2sCharsExt.isEmpty) {
      // phrase → placeholder, char pass, placeholder → simplified phrase.
      // Longest phrase masks first (宮商角徵羽 must win over its 角徵
      // substring), matching OpenCC's greedy longest-match segmentation.
      val ordered = phrases.zipWithIndex.sortBy { case ((trad, _), _) => -trad.length }
      val masked = ordered.foldLeft(c) { case (acc, ((trad, _), i)) =>
        replace(acc, lit(trad), lit((0xE000 + i).toChar.toString))
      }
      val translated = translate(masked,
        t2sTradMerged + t2sAmbiguousChars._1,
        t2sSimpMerged + t2sAmbiguousChars._2)
      phrases.zipWithIndex.foldLeft(translated) { case (acc, ((_, simp), i)) =>
        replace(acc, lit((0xE000 + i).toChar.toString), lit(simp))
      }
    } else {
      val charMap: Map[Char, Char] = {
        val base = t2sTradMerged.zip(t2sSimpMerged).toMap ++
          t2sAmbiguousChars._1.zip(t2sAmbiguousChars._2).toMap
        base ++ t2sCharsExt
      }
      val phraseMap = phrases.toMap
      val maxLen = if (phraseMap.isEmpty) 0 else phraseMap.keys.map(_.length).max
      val fn = udf((text: String) => t2sGreedy(text, phraseMap, maxLen, charMap))
      fn(c)
    }
  }

  /** Greedy longest-match segmentation (opencc's conversion strategy):
    * at each position try the longest phrase first, fall back to the
    * char map. O(maxPhraseLen) hash probes per character. */
  private def t2sGreedy(text: String, phrases: Map[String, String],
                        maxLen: Int, charMap: Map[Char, Char]): String = {
    if (text == null) return null
    val sb = new StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      var matched: String = null
      var mlen = 0
      var l = math.min(maxLen, text.length - i)
      while (l >= 1 && matched == null) { // ≥1: astral singles live here
        val s = phrases.getOrElse(text.substring(i, i + l), null)
        if (s != null) { matched = s; mlen = l }
        l -= 1
      }
      if (matched != null) { sb.append(matched); i += mlen }
      else { sb.append(charMap.getOrElse(text.charAt(i), text.charAt(i))); i += 1 }
    }
    sb.toString
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
