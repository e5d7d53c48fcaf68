package graft.search

/** Cangjie CJK tokenizer (reference fts/mod.rs:109-139): jieba-style
  * dictionary segmentation with the reference's four kinds —
  * `default` (max-probability DP cut), `all` (every dictionary word
  * found), `search` (default cut plus sub-words of long words, the
  * index-friendly mode), `unicode` (one token per CJK codepoint).
  *
  * The algorithm is the public jieba design: build the DAG of
  * dictionary words starting at each position (trie prefix walk), then
  * dynamic-programming the max-sum-of-log-frequency path; characters
  * not covered by the dictionary fall back to single-codepoint tokens.
  * The HMM unknown-word model is NOT ported (`use_hmm` is accepted and
  * ignored) — it needs jieba's trained emission tables, which are data
  * this environment cannot ship.
  *
  * The built-in dictionary is a small seed (~200 high-frequency words)
  * so segmentation and the FTS round-trip are real and testable;
  * [[setDictionary]] swaps in a full dictionary (e.g. the MIT-licensed
  * jieba dict.txt, `word freq [tag]` lines via [[loadDictLines]]) in a
  * deployment with the data available. Both the index-side UDF and the
  * query-side mirror read the same volatile reference, so the pipeline
  * stays consistent after a swap.
  *
  * Non-CJK runs (ASCII words, digits) are tokenized like the Simple
  * tokenizer: maximal letter/number runs.
  */
object Cangjie {

  /** (word, frequency). Frequencies only matter relatively. */
  @volatile private var dict: Map[String, Long] = seedDict
  @volatile private var trie: Trie = Trie.build(seedDict.keys)
  @volatile private var logTotal: Double = math.log(seedDict.values.sum.toDouble)

  def setDictionary(words: Iterable[(String, Long)]): Unit = synchronized {
    val m = words.toMap
    require(m.nonEmpty, "empty dictionary")
    dict = m
    trie = Trie.build(m.keys)
    logTotal = math.log(m.values.map(_ max 1L).sum.toDouble)
  }

  /** Parse jieba dict.txt lines: `word freq [pos-tag]`. */
  def loadDictLines(lines: Iterator[String]): Unit =
    setDictionary(lines.flatMap { l =>
      val parts = l.trim.split("\\s+")
      if (parts.length >= 2 && parts(1).forall(_.isDigit))
        Some(parts(0) -> parts(1).toLong)
      else if (parts.length == 1 && parts(0).nonEmpty) Some(parts(0) -> 1L)
      else None
    }.toSeq)

  def dictionarySize: Int = dict.size

  /** Restore the built-in seed dictionary (undo a [[setDictionary]]). */
  def resetDictionary(): Unit = setDictionary(seedDict)

  private def isCjk(c: Char): Boolean =
    (c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF) ||
      (c >= 0xF900 && c <= 0xFAFF) || (c >= 0x3040 && c <= 0x30FF)

  /** Tokenize mixed text: CJK runs go through the dictionary cut of the
    * requested kind; other letter/number runs are single tokens. */
  def cut(text: String, kind: String = "default"): Seq[String] = {
    if (text == null) return null
    val out = Vector.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (isCjk(c)) {
        var j = i
        while (j < n && isCjk(text.charAt(j))) j += 1
        out ++= cutCjk(text.substring(i, j), kind)
        i = j
      } else if (c.isLetterOrDigit) {
        var j = i
        while (j < n && !isCjk(text.charAt(j)) && text.charAt(j).isLetterOrDigit) j += 1
        out += text.substring(i, j)
        i = j
      } else i += 1
    }
    out.result()
  }

  private def cutCjk(s: String, kind: String): Seq[String] = kind match {
    case "unicode" => s.map(_.toString)
    case "all" =>
      // every dictionary word occurrence, plus uncovered single chars
      val found = Vector.newBuilder[String]
      val covered = new Array[Boolean](s.length)
      for (i <- s.indices; len <- trie.prefixLengthsFrom(s, i) if len > 1) {
        found += s.substring(i, i + len)
        for (k <- i until i + len) covered(k) = true
      }
      val singles = s.indices.collect { case i if !covered(i) => s.substring(i, i + 1) }
      found.result() ++ singles
    case "search" =>
      // default cut, plus dictionary sub-words of each long token
      cutDp(s).flatMap { w =>
        if (w.length <= 2) Seq(w)
        else {
          val subs = for {
            i <- 0 until w.length
            len <- trie.prefixLengthsFrom(w, i)
            if len > 1 && len < w.length
          } yield w.substring(i, i + len)
          subs.distinct :+ w
        }
      }
    case _ => cutDp(s)
  }

  /** jieba's max-probability route: DAG of dict words per position,
    * right-to-left DP on log(freq/total); unknown chars score below
    * any dictionary word so they only fill gaps. */
  private def cutDp(s: String): Seq[String] = {
    val n = s.length
    if (n == 0) return Nil
    val d = dict; val t = trie; val lt = logTotal
    val minLog = -lt - 10.0 // unknown single char
    val best = new Array[Double](n + 1)
    val nxt = new Array[Int](n + 1)
    best(n) = 0.0
    var i = n - 1
    while (i >= 0) {
      var b = minLog + best(i + 1)
      var bj = i + 1
      for (len <- t.prefixLengthsFrom(s, i)) {
        val w = s.substring(i, i + len)
        val lf = math.log(d.getOrElse(w, 1L).max(1L).toDouble) - lt
        if (lf + best(i + len) > b) { b = lf + best(i + len); bj = i + len }
      }
      best(i) = b
      nxt(i) = bj
      i -= 1
    }
    val out = Vector.newBuilder[String]
    var k = 0
    while (k < n) { out += s.substring(k, nxt(k)); k = nxt(k) }
    out.result()
  }

  // ——————————————————————— trie ———————————————————————

  private final class Trie(children: Array[scala.collection.mutable.HashMap[Char, Int]],
                           terminal: Array[Boolean]) {
    /** Lengths (ascending) of all dictionary words starting at s(i). */
    def prefixLengthsFrom(s: String, i: Int): List[Int] = {
      var node = 0
      var j = i
      val acc = List.newBuilder[Int]
      var go = true
      while (go && j < s.length) {
        children(node).get(s.charAt(j)) match {
          case None => go = false
          case Some(nx) =>
            node = nx; j += 1
            if (terminal(node)) acc += (j - i)
        }
      }
      acc.result()
    }
  }

  private object Trie {
    def build(words: Iterable[String]): Trie = {
      val children =
        scala.collection.mutable.ArrayBuffer(scala.collection.mutable.HashMap.empty[Char, Int])
      val terminal = scala.collection.mutable.ArrayBuffer(false)
      for (w <- words if w.nonEmpty) {
        var node = 0
        for (c <- w) {
          node = children(node).get(c) match {
            case Some(nx) => nx
            case None =>
              children += scala.collection.mutable.HashMap.empty[Char, Int]
              terminal += false
              children(node).put(c, children.length - 1)
              children.length - 1
          }
        }
        terminal(node) = true
      }
      new Trie(children.toArray, terminal.toArray)
    }
  }

  /** Seed dictionary: ~200 high-frequency Mandarin words with rough
    * relative frequencies — enough for real segmentation behavior and
    * the FTS round-trip tests; swap in the full jieba dict via
    * [[setDictionary]]/[[loadDictLines]] where the data is available. */
  private def seedDict: Map[String, Long] = Map(
    "我们" -> 900000L, "你们" -> 300000L, "他们" -> 500000L, "自己" -> 400000L,
    "什么" -> 800000L, "怎么" -> 300000L, "这个" -> 600000L, "那个" -> 300000L,
    "一个" -> 900000L, "没有" -> 800000L, "可以" -> 800000L, "知道" -> 500000L,
    "现在" -> 500000L, "时候" -> 400000L, "时间" -> 400000L, "今天" -> 300000L,
    "明天" -> 150000L, "昨天" -> 120000L, "因为" -> 300000L, "所以" -> 300000L,
    "但是" -> 400000L, "如果" -> 300000L, "已经" -> 350000L, "还是" -> 300000L,
    "就是" -> 500000L, "不是" -> 500000L, "还有" -> 250000L, "觉得" -> 200000L,
    "喜欢" -> 200000L, "希望" -> 150000L, "需要" -> 250000L, "开始" -> 250000L,
    "问题" -> 300000L, "工作" -> 350000L, "学习" -> 250000L, "生活" -> 250000L,
    "世界" -> 250000L, "中国" -> 500000L, "北京" -> 200000L, "上海" -> 180000L,
    "国家" -> 250000L, "政府" -> 150000L, "公司" -> 250000L, "大学" -> 180000L,
    "学生" -> 200000L, "老师" -> 180000L, "朋友" -> 200000L, "孩子" -> 200000L,
    "东西" -> 200000L, "地方" -> 220000L, "事情" -> 200000L, "方法" -> 150000L,
    "方面" -> 150000L, "情况" -> 200000L, "发展" -> 250000L, "经济" -> 200000L,
    "社会" -> 220000L, "文化" -> 160000L, "历史" -> 150000L, "语言" -> 120000L,
    "中文" -> 100000L, "英文" -> 80000L, "文本" -> 60000L, "文章" -> 90000L,
    "内容" -> 120000L, "信息" -> 180000L, "数据" -> 150000L, "数据库" -> 60000L,
    "查询" -> 50000L, "索引" -> 40000L, "搜索" -> 80000L, "搜索引擎" -> 30000L,
    "引擎" -> 50000L, "计算" -> 90000L, "计算机" -> 80000L, "程序" -> 90000L,
    "程序员" -> 30000L, "软件" -> 90000L, "硬件" -> 40000L, "网络" -> 120000L,
    "互联网" -> 80000L, "人工" -> 40000L, "智能" -> 70000L, "人工智能" -> 60000L,
    "机器" -> 70000L, "机器学习" -> 40000L, "深度" -> 50000L, "模型" -> 70000L,
    "算法" -> 50000L, "系统" -> 150000L, "分析" -> 100000L, "处理" -> 100000L,
    "使用" -> 150000L, "用户" -> 100000L, "服务" -> 130000L, "技术" -> 160000L,
    "科学" -> 120000L, "研究" -> 160000L, "教育" -> 120000L, "医生" -> 80000L,
    "医院" -> 90000L, "城市" -> 130000L, "农村" -> 70000L, "电话" -> 80000L,
    "手机" -> 110000L, "电脑" -> 90000L, "电视" -> 80000L, "电影" -> 100000L,
    "音乐" -> 90000L, "新闻" -> 90000L, "报道" -> 60000L, "记者" -> 50000L,
    "作者" -> 50000L, "读者" -> 40000L, "写作" -> 30000L, "阅读" -> 40000L,
    "旅游" -> 60000L, "飞机" -> 60000L, "火车" -> 60000L, "汽车" -> 90000L,
    "自行车" -> 30000L, "地铁" -> 40000L, "公共" -> 50000L, "交通" -> 60000L,
    "环境" -> 90000L, "自然" -> 80000L, "动物" -> 60000L, "植物" -> 40000L,
    "天气" -> 60000L, "下雨" -> 30000L, "太阳" -> 40000L, "月亮" -> 25000L,
    "星星" -> 20000L, "地球" -> 50000L, "宇宙" -> 25000L, "空间" -> 45000L,
    "时代" -> 60000L, "未来" -> 80000L, "过去" -> 70000L, "改变" -> 60000L,
    "增加" -> 60000L, "减少" -> 40000L, "提高" -> 70000L, "降低" -> 35000L,
    "重要" -> 120000L, "主要" -> 110000L, "基本" -> 70000L, "特别" -> 70000L,
    "非常" -> 130000L, "真正" -> 60000L, "完全" -> 70000L, "直接" -> 60000L,
    "共同" -> 45000L, "不同" -> 90000L, "相同" -> 30000L, "一样" -> 80000L,
    "一起" -> 90000L, "一切" -> 50000L, "所有" -> 90000L, "每个" -> 50000L,
    "大家" -> 90000L, "人们" -> 90000L, "男人" -> 50000L, "女人" -> 55000L,
    "先生" -> 60000L, "小姐" -> 30000L, "经理" -> 40000L, "员工" -> 40000L,
    "市场" -> 90000L, "价格" -> 70000L, "产品" -> 90000L, "质量" -> 55000L,
    "安全" -> 80000L, "健康" -> 75000L, "身体" -> 70000L, "心理" -> 40000L,
    "感觉" -> 70000L, "感情" -> 40000L, "爱情" -> 40000L, "家庭" -> 70000L,
    "父母" -> 50000L, "母亲" -> 45000L, "父亲" -> 45000L, "儿子" -> 40000L,
    "女儿" -> 40000L, "哥哥" -> 25000L, "姐姐" -> 25000L, "弟弟" -> 20000L,
    "妹妹" -> 20000L, "房子" -> 50000L, "房间" -> 45000L, "厨房" -> 20000L,
    "学校" -> 90000L, "班级" -> 15000L, "课程" -> 30000L, "考试" -> 40000L,
    "成绩" -> 30000L, "毕业" -> 35000L, "找到" -> 50000L, "发现" -> 80000L,
    "认为" -> 90000L, "表示" -> 70000L, "成为" -> 80000L, "进行" -> 90000L,
    "通过" -> 90000L, "根据" -> 60000L, "关于" -> 55000L, "对于" -> 55000L,
    "皇后" -> 12000L, "王后" -> 8000L, "皇帝" -> 30000L, "国王" -> 25000L)
}
