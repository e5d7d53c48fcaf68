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
  * With `use_hmm`, runs of leftover single characters go through
  * jieba's BMES character-tagging Viterbi (finalseg): the published
  * start/transition log-probabilities are constants of the public
  * design and ship here; the trained per-character EMISSION table is
  * data this environment cannot ship, so emissions are estimated from
  * the loaded dictionary's own positional statistics (first char of a
  * multi-char word → B, last → E, middles → M, single-char words → S,
  * frequency-weighted) — [[setHmmEmissions]] swaps in jieba's exact
  * prob_emit data where available, the same deployment hook as the
  * dictionary itself.
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
    if (!emissionsPinned) hmmEmit = emissionsFromDict(m)
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
    * requested kind; other letter/number runs are single tokens.
    * `hmm` enables the unknown-word Viterbi for the default/search
    * kinds (fts/mod.rs:109-139: All and Unicode take no hmm flag). */
  def cut(text: String, kind: String = "default", hmm: Boolean = false): Seq[String] = {
    if (text == null) return null
    val out = Vector.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (isCjk(c)) {
        var j = i
        while (j < n && isCjk(text.charAt(j))) j += 1
        out ++= cutCjk(text.substring(i, j), kind, hmm)
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

  private def cutCjk(s: String, kind: String, hmm: Boolean): Seq[String] = kind match {
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
      cutDefault(s, hmm).flatMap { w =>
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
    case _ => cutDefault(s, hmm)
  }

  /** The default cut: DP route; with hmm, leftover single-char runs go
    * through the Viterbi (jieba __cut_DAG vs __cut_DAG_NO_HMM). */
  private def cutDefault(s: String, hmm: Boolean): Seq[String] =
    if (!hmm) cutDp(s)
    else {
      val d = dict
      val out = Vector.newBuilder[String]
      val buf = new StringBuilder
      def flush(): Unit = if (buf.nonEmpty) {
        val b = buf.toString
        if (b.length == 1) out += b
        else if (!d.contains(b)) out ++= viterbiCut(b)
        else out ++= b.map(_.toString) // known word the route split: chars
        buf.clear()
      }
      for (w <- cutDp(s)) {
        if (w.length == 1) buf += w(0)
        else { flush(); out += w }
      }
      flush()
      out.result()
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

  // ————————————— HMM unknown-word model (jieba finalseg) —————————————
  // BMES character-tagging Viterbi. States: B=0 M=1 E=2 S=3. The start
  // and transition log-probabilities are the published constants of the
  // public jieba design (finalseg prob_start/prob_trans); the emission
  // table is trained DATA — estimated from the loaded dictionary by
  // default, exact jieba prob_emit swappable via [[setHmmEmissions]].

  private val MinLog = -3.14e100 // jieba's MIN_FLOAT for absent emissions
  private val hmmStart = Array(-0.26268660809250016, MinLog, MinLog, -1.4652633398537678)
  private val hmmTrans: Array[Array[Double]] = {
    val t = Array.fill(4)(Array.fill(4)(MinLog))
    t(0)(1) = -0.916290731874155     // B -> M
    t(0)(2) = -0.510825623765990     // B -> E
    t(1)(1) = -1.2603623820268226    // M -> M
    t(1)(2) = -0.33344856811948514   // M -> E
    t(2)(0) = -0.5897149736854513    // E -> B
    t(2)(3) = -0.8085250474669937    // E -> S
    t(3)(0) = -0.7211965654669841    // S -> B
    t(3)(3) = -0.6658631448798212    // S -> S
    t
  }
  // legal predecessors per state (jieba PrevStatus)
  private val hmmPrev: Array[Array[Int]] = Array(
    Array(2, 3), // B <- E, S
    Array(1, 0), // M <- M, B
    Array(0, 1), // E <- B, M
    Array(3, 2)) // S <- S, E

  @volatile private var hmmEmit: Map[Char, Array[Double]] = emissionsFromDict(seedDict)
  @volatile private var emissionsPinned: Boolean = false

  /** Swap in an exact emission table (char → log-prob per B/M/E/S, e.g.
    * parsed from jieba's prob_emit). Pinned: later dictionary swaps no
    * longer re-derive emissions. */
  def setHmmEmissions(e: Map[Char, Array[Double]]): Unit = synchronized {
    require(e.nonEmpty && e.values.forall(_.length == 4), "emissions: char -> 4 log-probs")
    hmmEmit = e
    emissionsPinned = true
  }

  /** Back to dictionary-derived emissions (and re-derive on dict swaps). */
  def resetHmmEmissions(): Unit = synchronized {
    emissionsPinned = false
    hmmEmit = emissionsFromDict(dict)
  }

  /** Frequency-weighted positional statistics of the dictionary: first
    * char of a multi-char word emits from B, last from E, middles from
    * M, single-char words from S. */
  private def emissionsFromDict(d: Map[String, Long]): Map[Char, Array[Double]] = {
    val counts = scala.collection.mutable.HashMap.empty[Char, Array[Long]]
    def add(c: Char, st: Int, f: Long): Unit =
      counts.getOrElseUpdate(c, new Array[Long](4))(st) += f
    for ((w, f0) <- d if w.nonEmpty) {
      val f = f0 max 1L
      if (w.length == 1) add(w(0), 3, f)
      else {
        add(w(0), 0, f)
        add(w(w.length - 1), 2, f)
        var i = 1
        while (i < w.length - 1) { add(w(i), 1, f); i += 1 }
      }
    }
    val totals = new Array[Double](4)
    counts.values.foreach(a => { var s = 0; while (s < 4) { totals(s) += a(s); s += 1 } })
    counts.iterator.map { case (c, a) =>
      c -> Array.tabulate(4)(s =>
        if (a(s) > 0 && totals(s) > 0) math.log(a(s) / totals(s)) else MinLog)
    }.toMap
  }

  private def emitLog(c: Char, st: Int): Double =
    hmmEmit.get(c) match { case Some(a) => a(st); case None => MinLog }

  /** Viterbi over BMES, then emit B..E words and S singles (jieba
    * finalseg.__cut). The path always starts in B/S and is forced to
    * end in E/S, so the tag sequence segments cleanly. */
  private[search] def viterbiCut(s: String): Seq[String] = {
    val n = s.length
    if (n == 0) return Nil
    if (n == 1) return Seq(s)
    val v = Array.ofDim[Double](n, 4)
    val bp = Array.ofDim[Int](n, 4)
    var st = 0
    while (st < 4) { v(0)(st) = hmmStart(st) + emitLog(s(0), st); st += 1 }
    var i = 1
    while (i < n) {
      st = 0
      while (st < 4) {
        var best = Double.NegativeInfinity
        var bprev = hmmPrev(st)(0)
        for (p <- hmmPrev(st)) {
          val sc = v(i - 1)(p) + hmmTrans(p)(st)
          if (sc > best) { best = sc; bprev = p }
        }
        v(i)(st) = best + emitLog(s(i), st)
        bp(i)(st) = bprev
        st += 1
      }
      i += 1
    }
    val tags = new Array[Int](n)
    tags(n - 1) = if (v(n - 1)(2) >= v(n - 1)(3)) 2 else 3 // end in E or S
    i = n - 1
    while (i > 0) { tags(i - 1) = bp(i)(tags(i)); i -= 1 }
    val out = Vector.newBuilder[String]
    var beg = 0
    var j = 0
    while (j < n) {
      tags(j) match {
        case 0 => beg = j
        case 2 => out += s.substring(beg, j + 1)
        case 3 => out += s.substring(j, j + 1)
        case _ => ()
      }
      j += 1
    }
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

  /** Seed dictionary: ~450 high-frequency Mandarin words with rough
    * relative frequencies — enough for real segmentation behavior and
    * the FTS round-trip tests; swap in the full jieba dict via
    * [[setDictionary]]/[[loadDictLines]] where the data is available. */
  private def seedDict: Map[String, Long] = seedDictCore ++ seedDictMore

  private def seedDictCore: Map[String, Long] = Map(
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

  /** Round-6 expansion: connectives, frequent verbs, software/tech
    * vocabulary (the corpus domain), positional/temporal nouns, and the
    * classic segmentation-test compounds (研究生/北京大学/自然语言处理)
    * whose nested sub-words exercise the DP cut and `search` mode. */
  private def seedDictMore: Map[String, Long] = Map(
    // connectives / adverbs
    "以及" -> 200000L, "而且" -> 180000L, "或者" -> 150000L, "虽然" -> 160000L,
    "然后" -> 200000L, "然而" -> 90000L, "于是" -> 80000L, "并且" -> 90000L,
    "不过" -> 140000L, "只是" -> 120000L, "只有" -> 130000L, "只要" -> 90000L,
    "无论" -> 60000L, "不管" -> 55000L, "即使" -> 60000L, "尽管" -> 50000L,
    "既然" -> 40000L, "否则" -> 40000L, "例如" -> 50000L, "比如" -> 70000L,
    "首先" -> 60000L, "其次" -> 35000L, "另外" -> 60000L, "此外" -> 45000L,
    "总之" -> 25000L, "终于" -> 50000L, "突然" -> 60000L, "立刻" -> 30000L,
    "马上" -> 50000L, "刚才" -> 40000L, "正在" -> 90000L, "曾经" -> 50000L,
    "从来" -> 40000L, "永远" -> 45000L, "一直" -> 90000L, "总是" -> 60000L,
    "经常" -> 55000L, "有时" -> 40000L, "偶尔" -> 15000L, "几乎" -> 60000L,
    "大约" -> 30000L, "左右" -> 45000L, "差不多" -> 30000L, "越来越" -> 40000L,
    // frequent verbs / abstract nouns
    "关系" -> 90000L, "影响" -> 90000L, "作用" -> 70000L, "结果" -> 90000L,
    "原因" -> 70000L, "目的" -> 55000L, "条件" -> 60000L, "标准" -> 60000L,
    "规定" -> 50000L, "要求" -> 90000L, "决定" -> 80000L, "选择" -> 80000L,
    "继续" -> 70000L, "停止" -> 30000L, "完成" -> 70000L, "实现" -> 70000L,
    "建设" -> 70000L, "建立" -> 60000L, "创建" -> 25000L, "创新" -> 45000L,
    "设计" -> 70000L, "开发" -> 70000L, "测试" -> 45000L, "部署" -> 15000L,
    "运行" -> 45000L, "执行" -> 40000L, "存储" -> 25000L, "读取" -> 15000L,
    "写入" -> 12000L, "删除" -> 20000L, "更新" -> 35000L, "插入" -> 15000L,
    "修改" -> 30000L, "配置" -> 25000L, "支持" -> 80000L, "提供" -> 90000L,
    "帮助" -> 70000L, "解决" -> 65000L, "讨论" -> 45000L, "介绍" -> 45000L,
    "说明" -> 45000L, "描述" -> 25000L, "定义" -> 30000L, "理解" -> 50000L,
    // software / data vocabulary (the corpus domain)
    "版本" -> 35000L, "文件" -> 60000L, "文档" -> 30000L, "目录" -> 25000L,
    "路径" -> 18000L, "代码" -> 50000L, "函数" -> 30000L, "变量" -> 22000L,
    "参数" -> 30000L, "类型" -> 40000L, "对象" -> 35000L, "接口" -> 30000L,
    "模块" -> 25000L, "组件" -> 22000L, "框架" -> 25000L, "平台" -> 45000L,
    "工具" -> 45000L, "功能" -> 55000L, "性能" -> 35000L, "效率" -> 35000L,
    "优化" -> 30000L, "错误" -> 35000L, "异常" -> 22000L, "日志" -> 18000L,
    "监控" -> 18000L, "调试" -> 12000L, "编译" -> 15000L, "语法" -> 18000L,
    "逻辑" -> 28000L, "结构" -> 45000L, "数组" -> 15000L, "列表" -> 20000L,
    "字典" -> 15000L, "字符" -> 18000L, "字符串" -> 15000L, "数字" -> 40000L,
    "整数" -> 10000L, "内存" -> 25000L, "磁盘" -> 12000L, "缓存" -> 15000L,
    "队列" -> 12000L, "线程" -> 15000L, "进程" -> 15000L, "并发" -> 12000L,
    "分布" -> 20000L, "分布式" -> 12000L, "集群" -> 12000L, "节点" -> 18000L,
    "服务器" -> 30000L, "客户" -> 40000L, "客户端" -> 18000L, "请求" -> 30000L,
    "响应" -> 20000L, "协议" -> 20000L, "端口" -> 10000L, "地址" -> 30000L,
    "网站" -> 40000L, "网页" -> 25000L, "页面" -> 28000L, "链接" -> 20000L,
    "按钮" -> 15000L, "输入" -> 30000L, "输出" -> 25000L, "界面" -> 22000L,
    "图片" -> 35000L, "视频" -> 45000L, "音频" -> 15000L, "声音" -> 35000L,
    // physical / positional / temporal
    "颜色" -> 30000L, "大小" -> 25000L, "位置" -> 35000L, "方向" -> 30000L,
    "速度" -> 35000L, "距离" -> 28000L, "重量" -> 15000L, "温度" -> 25000L,
    "压力" -> 35000L, "能量" -> 25000L, "电力" -> 15000L, "力量" -> 35000L,
    "水平" -> 35000L, "垂直" -> 10000L, "中心" -> 50000L, "中间" -> 35000L,
    "左边" -> 15000L, "右边" -> 15000L, "上面" -> 30000L, "下面" -> 30000L,
    "前面" -> 30000L, "后面" -> 30000L, "里面" -> 35000L, "外面" -> 25000L,
    "旁边" -> 20000L, "附近" -> 25000L, "周围" -> 25000L, "之间" -> 60000L,
    "之前" -> 55000L, "之后" -> 60000L, "以前" -> 55000L, "以后" -> 60000L,
    "当时" -> 50000L, "同时" -> 60000L, "最近" -> 50000L, "最后" -> 70000L,
    "最初" -> 20000L, "时期" -> 35000L, "阶段" -> 30000L, "过程" -> 50000L,
    // classic segmentation-test compounds and their sub-words
    "研究生" -> 25000L, "生命" -> 45000L, "起源" -> 12000L,
    "北京大学" -> 15000L, "清华大学" -> 12000L, "中文分词" -> 3000L,
    "分词" -> 5000L, "自然语言" -> 8000L, "自然语言处理" -> 6000L,
    "语言处理" -> 4000L, "词典" -> 8000L, "词语" -> 10000L,
    "句子" -> 18000L, "段落" -> 8000L, "翻译" -> 25000L, "词汇" -> 12000L)
}
