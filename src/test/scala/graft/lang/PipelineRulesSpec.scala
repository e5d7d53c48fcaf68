package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The beyond-reference training-pipeline operators exposed as fixed
  * rules, so the CozoScript front end reaches the full pipeline surface
  * (dedup, text analysis, decontamination, sampling) the same way it
  * reaches the graph suite.
  */
class PipelineRulesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def docsDb(): CozoDb = {
    val db = new CozoDb(spark)
    db.run(
      """?[id, text] <- [
        |  [1, 'the quick brown fox jumps over the lazy dog'],
        |  [2, 'the quick brown fox jumps over the lazy dog'],
        |  [3, 'completely different words appear in this unrelated document']
        |] :create docs {id => text}""".stripMargin)
    db
  }

  test("MinHashDedup finds the exact-duplicate pair from script") {
    val rows = docsDb().run("?[a, b, j] <~ MinHashDedup(*docs[id, text], threshold: 0.5)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(rows.head._3 == 1.0)
  }

  test("DedupClusters resolves pairs (rule input) into canonical keepers") {
    val rows = docsDb().run(
      """pairs[a, b, j] <~ MinHashDedup(*docs[id, text], threshold: 0.5)
        |pp[a, b] := pairs[a, b, _]
        |ids[id] := *docs[id, _]
        |?[id, cluster, keep] <~ DedupClusters(ids[], pp[])""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(rows == Set((1L, 1L, true), (2L, 1L, false), (3L, 3L, true)))
  }

  test("SubstringDedup reports full coverage for exact twins, zero for the unique doc") {
    val rows = docsDb().run(
      "?[id, total, dup, ratio] <~ SubstringDedup(*docs[id, text], min_len: 5)")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == (9L, 9L))
    assert(rows(2L) == (9L, 9L))
    assert(rows(3L)._2 == 0L)
  }

  test("SubstringRemove / TextChunk / TextKeywords from script") {
    val db = docsDb()
    // docs 1 and 2 are exact twins: doc 1 (first) survives intact,
    // doc 2 is fully erased; doc 3 untouched
    val rem = db.run(
      "?[id, total, kept, text] <~ SubstringRemove(*docs[id, text], min_len: 5)")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(rem(1L) == ((9L, 9L, "the quick brown fox jumps over the lazy dog")))
    assert(rem(2L) == ((9L, 0L, "")))
    assert(rem(3L)._1 == rem(3L)._2)
    val chunks = db.run(
      "?[id, i, n, t] <~ TextChunk(*docs[id, text], size: 5, stride: 4)")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(chunks((1L, 0L)) == "the quick brown fox jumps")
    assert(chunks((1L, 1L)) == "jumps over the lazy dog")
    val kw = db.run("?[id, rank, term, score] <~ TextKeywords(*docs[id, text], k: 2)")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 3's rarest terms rank first; ties resolve alphabetically
    assert(kw.contains((3L, 1L)) && kw.contains((3L, 2L)))
    assert(kw((3L, 1L)) < kw((3L, 2L)))
  }

  test("PackByBudget / PackSequences / BalanceSources / BalanceTemperature from script") {
    val db = new CozoDb(spark)
    db.run("?[id, w] <- [[1, 5], [2, 5], [3, 5], [4, 11]] :create dw {id => w}")
    val shards = db.run("?[id, w, s] <~ PackByBudget(*dw[id, w], budget: 10)")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // prefix sums 0,5,10,15 div 10 → shards 0,0,1,1
    assert(shards == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
    val chunks = db.run("?[id, ci, cw, s] <~ PackSequences(*dw[id, w], max_len: 4, budget: 8)")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(chunks((4L, 0L)) == 4L && chunks((4L, 2L)) == 3L) // 11 = 4+4+3
    db.run("?[s, id] <- [['a', 1], ['a', 2], ['a', 3], ['a', 4], ['b', 10]] :create sb {s, id}")
    val bal = db.run("?[s, id] <~ BalanceSources(*sb[s, id])")
      .collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.size).toMap
    assert(bal == Map("a" -> 1, "b" -> 1)) // anchored at b (1 row each)
    val bt = db.run("?[s, id] <~ BalanceTemperature(*sb[s, id], tau: 0.5)")
      .collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.size).toMap
    // τ=0.5: w_a=2e6, w_b=1e6, anchor b → target_a = 2, target_b = 1
    assert(bt == Map("a" -> 2, "b" -> 1))
  }

  test("PoolEmbeddings from script: per-group mean pool, L2-normalized") {
    val db = new CozoDb(spark)
    db.registerTable("ch",
      { import spark.implicits._
        Seq((1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), (2L, Seq(3.0f, 4.0f)))
          .toDF("g", "v") }, Seq("g", "v"))
    val rows = db.run("?[g, d, x] <~ PoolEmbeddings(*ch[g, v])")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(rows((1L, 0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(rows((2L, 1)) - 0.8) < 1e-9)
  }

  test("TextQuality / TextRepetition / LanguageId from script") {
    val db = docsDb()
    val q = db.run("?[id, quality] <~ TextQuality(*docs[id, text])")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.keySet == Set(1L, 2L, 3L))
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    val rep = db.run("?[id, n, tbf, dtf] <~ TextRepetition(*docs[id, text])")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep(1L) == 9L)
    db.run(
      """?[id, text] <- [[10, '今天天气很好'], [11, 'plain english text']]
        |:create zh {id => text}""".stripMargin)
    val lang = db.run("?[id, lang] <~ LanguageId(*zh[id, text])")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang == Map(10L -> "zh", 11L -> "en"))
  }

  test("Decontaminate flags the training doc sharing an n-gram run with eval") {
    val db = docsDb()
    db.run(
      """?[id, text] <- [[100, 'quick brown fox jumps over']]
        |:create eval {id => text}""".stripMargin)
    val hits = db.run(
      "?[id, overlap, docs] <~ Decontaminate(*docs[id, text], *eval[id, text], n: 5)")
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L)) // both twins carry the 5-gram; doc 3 clean
  }

  test("Sample is deterministic and Split partitions every row") {
    val db = docsDb()
    val s1 = db.run("?[id, text] <~ Sample(*docs[id, text], fraction: 0.5)")
      .collect().map(_.getLong(0)).toSet
    val s2 = db.run("?[id, text] <~ Sample(*docs[id, text], fraction: 0.5)")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    val sp = db.run("?[id, text, split] <~ Split(*docs[id, text])")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(sp.keySet == Set(1L, 2L, 3L))
    assert(sp.values.forall(Set("train", "val", "test")))
  }

  test("AnnKnn over registered embeddings from script") {
    val db = new CozoDb(spark)
    db.registerTable("emb",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "embedding"))
    db.registerTable("probes",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "embedding").limit(2))
    val rows = db.run("?[q, id, cos, rank] <~ AnnKnn(*emb[], *probes[], k: 3)")
      .collect()
    assert(rows.length == 6) // 2 probes x top-3
    assert(rows.forall(_.getInt(3) <= 3))
  }

  test("SemanticDedup / DecontaminateEmbed from script: planted twins flagged") {
    import spark.implicits._
    val db = new CozoDb(spark)
    val r = new scala.util.Random(3)
    val base = (0L until 40L).map(i => (i, Array.fill(8)(r.nextGaussian().toFloat)))
    val twins = base.take(5).map { case (i, v) =>
      (i + 100L, v.map(x => x + 0.01f * r.nextGaussian().toFloat))
    }
    db.registerTable("emb", (base ++ twins).toDF("id", "vec"))
    db.registerTable("evalset", twins.toDF("id", "vec"))
    val pairs = db.run(
      "?[a, b, c, cell] <~ SemanticDedup(*emb[], threshold: 0.95, n_clusters: 2)")
      .collect().map(re => (re.getLong(0), re.getLong(1))).toSet
    assert(pairs.nonEmpty && pairs.subsetOf(
      (0L until 5L).map(i => (i, i + 100L)).toSet))
    val flagged = db.run(
      "?[t, c, n] <~ DecontaminateEmbed(*emb[], *evalset[], threshold: 0.99)")
      .collect().map(_.getLong(0)).toSet
    // every planted eval vector flags itself (cosine 1) and usually its
    // base twin
    assert((100L until 105L).toSet.subsetOf(flagged))
  }

  test("MediaDecode / ImageDedup: real PNG decode and phash twins from script") {
    import spark.implicits._
    val db = new CozoDb(spark)
    val media = graft.multimodal.Multimodal.synthesizeImages(
      (0L until 10L).toDF("id"), "id", groupMod = 5)
      .select("id", "media")
    db.registerTable("media", media)
    val meta = db.run(
      """mr[id, fmt, w, h, nf, ok] <~ MediaDecode(*media[])
        |?[id, fmt, w, h, ok] := mr[id, fmt, w, h, nf, ok]""".stripMargin)
      .collect()
    assert(meta.length == 10)
    assert(meta.forall(r => r.getString(1) == "png" && r.getInt(2) == 32 &&
      r.getInt(3) == 24 && r.getBoolean(4)))
    val pairs = db.run("?[a, b, hm] <~ ImageDedup(*media[], max_hamming: 0)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 5L).map(i => (i, i + 5L)).toSet)
  }

  test("AnnHnsw over registered embeddings from script") {
    val db = new CozoDb(spark)
    db.registerTable("emb",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "embedding"))
    db.registerTable("probes",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "embedding").limit(2))
    val rows = db.run(
      "?[q, id, cos, rank] <~ AnnHnsw(*emb[], *probes[], k: 3, m: 8, ef: 48)")
      .collect()
    assert(rows.length == 6) // 2 probes x top-3
    assert(rows.forall(_.getInt(3) <= 3))
    // self-match excluded, ranks ordered by descending cosine
    assert(rows.forall(r => r.get(0) != r.get(1)))
  }

  test("AnnPq over registered embeddings from script") {
    val db = new CozoDb(spark)
    db.registerTable("emb",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "embedding"))
    db.registerTable("probes",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .selectExpr("vec_id", "embedding").limit(2))
    val rows = db.run(
      "?[q, id, cos, rank] <~ AnnPq(*emb[], *probes[], k: 3, refine: 16)")
      .collect()
    assert(rows.length == 6) // 2 probes x top-3 (refine covers any recall slip)
    assert(rows.forall(_.getInt(3) <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("AnnPqProbe probes a persisted index from script") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .selectExpr("vec_id as id", "embedding as vec")
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_script").toString
    graft.similarity.Ann.writeIndex(dir, emb, nCells = 8, subspaces = 16, codes = 64)
    val db = new CozoDb(spark)
    db.registerTable("probes",
      emb.selectExpr("id as vec_id", "vec as embedding").limit(2))
    val rows = db.run(
      s"?[q, id, cos, rank] <~ AnnPqProbe(*probes[], path: 'file://$dir', k: 3, n_probe: 8)")
      .collect()
    assert(rows.length == 6) // full probe: 2 queries x top-3
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("FtsIndexProbe probes a persisted FTS index from script") {
    import spark.implicits._
    val docs = Seq((1L, "red apples and pears"), (2L, "green apples"),
      (3L, "yellow bananas")).toDF("id", "text")
    val ix = graft.search.Fts.Index.build(docs, "id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ftsidx_script").toString
    graft.search.Fts.writeIndex(dir, ix, buckets = 8)
    val db = new CozoDb(spark)
    val rows = db.run(
      s"?[id, score] <~ FtsIndexProbe(path: 'file://$dir', query: 'apples', k: 5)")
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(rows.forall(_.getDouble(1) > 0))
    // missing options fail loudly
    intercept[Exception](db.run(s"?[id, s] <~ FtsIndexProbe(path: 'file://$dir')"))
    intercept[Exception](db.run("?[id, s] <~ FtsIndexProbe(query: 'apples')"))
  }

  test("AsOfJoin from script: latest prior right row per left row") {
    val db = new CozoDb(spark)
    db.run("?[k, t, tag] <- [[1, 100, 'v1'], [1, 200, 'v2'], [2, 10, 'w']] :create l {k, t => tag}")
    db.run("?[k, t, p] <- [[1, 90, 'early'], [1, 150, 'mid']] :create r {k, t => p}")
    val rows = db.run("?[k, t, tag, p] <~ AsOfJoin(*l[k, t, tag], *r[k, t, p])")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getString(3))).toSet
    assert(rows == Set((1L, 100L, "v1", "early"), (1L, 200L, "v2", "mid")))
    // join: 'left' keeps the unmatched key-2 row with a null payload
    val kept = db.run("?[k, t, tag, p] <~ AsOfJoin(*l[k, t, tag], *r[k, t, p], join: 'left')")
      .collect()
    assert(kept.length == 3 && kept.count(_.isNullAt(3)) == 1)
    // direction: 'forward' matches the earliest right at-or-after;
    // bucket_width engages the salted plan with identical output
    val fwd = db.run(
      "?[k, t, tag, p] <~ AsOfJoin(*l[k, t, tag], *r[k, t, p], direction: 'forward', bucket_width: 60)")
      .collect().map(x => (x.getLong(1), x.getString(3))).toMap
    assert(fwd == Map(100L -> "mid")) // t=100 → rt=150; t=200, key-2 unmatched
    // malformed options raise clean compile errors
    intercept[Compiler.CompileException](
      db.run("?[k, t, tag, p] <~ AsOfJoin(*l[k, t, tag], *r[k, t, p], join: 'outer')"))
    intercept[Compiler.CompileException](
      db.run("?[k, t, tag, p] <~ AsOfJoin(*l[k, t, tag], *r[k, t, p], direction: 'sideways')"))
    intercept[Compiler.CompileException](
      db.run("?[k, t, tag, p] <~ AsOfJoin(*l[k, t, tag], *r[k, t, p], bucket_width: -5)"))
  }

  test("RangeJoin from script: points into containing windows") {
    val db = new CozoDb(spark)
    db.run("?[p, name] <- [[5, 'a'], [15, 'b'], [25, 'c']] :create pts {p => name}")
    db.run("?[s, e, w] <- [[0, 10, 'w1'], [10, 30, 'w2']] :create iv {s, e => w}")
    val rows = db.run(
      "?[p, name, s, e, w] <~ RangeJoin(*pts[p, name], *iv[s, e, w], bucket_width: 10)")
      .collect().map(x => (x.getString(1), x.getString(4))).toSet
    assert(rows == Set(("a", "w1"), ("b", "w2"), ("c", "w2")))
  }

  test("Sessionize from script: gap option splits sessions per key") {
    val db = new CozoDb(spark)
    db.run("?[u, t, e] <- [[1, 0, 10], [1, 40, 11], [1, 500, 12], [2, 5, 13]] :create ev {u, t => e}")
    val rows = db.run("?[u, t, e, session] <~ Sessionize(*ev[u, t, e], gap: 100)")
      .collect().map(r => r.getLong(2) -> r.getString(3)).toMap
    assert(rows(10L) == rows(11L)) // within gap
    assert(rows(12L) != rows(10L)) // split at the 460µs gap
    assert(rows(13L) == "1")
  }

  test("KMeans from script: two well-separated groups land in two clusters") {
    import spark.implicits._
    val db = new CozoDb(spark)
    // 4 vectors on +x, 4 on +y — cosine separates them perfectly
    val vecs = (0 until 8).map { i =>
      val base = if (i < 4) Array(1f, 0.05f * i, 0f) else Array(0.05f * i, 1f, 0f)
      (i.toLong, base)
    }.toDF("id", "vec")
    db.registerTable("emb", vecs)
    val rows = db.run("?[id, cluster] <~ KMeans(*emb[id, vec], k: 2, iters: 4)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0L until 8L).toSet) // every id assigned exactly once
    val g1 = (0 until 4).map(i => rows(i.toLong)).toSet
    val g2 = (4 until 8).map(i => rows(i.toLong)).toSet
    assert(g1.size == 1 && g2.size == 1 && g1 != g2,
      s"x-group and y-group each one cluster, different ones: $rows")
  }

  test("Perplexity from script: twins score identically, the outlier differs") {
    val rows = docsDb().run("?[id, n, ppl] <~ Perplexity(*docs[id, text], round: 6)")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == rows(2L)) // identical docs, identical perplexity
    assert(rows(1L)._2 != rows(3L)._2)
    assert(rows.values.forall(_._2 > 0))
  }

  test("StripHtml from script: markup drops, prose lines survive") {
    val db = new CozoDb(spark)
    db.run(
      """?[id, html] <- [[1, '<p>Prose long enough to keep.</p><script>var x;</script><div>ok</div>']]
        |:create pages {id => html}""".stripMargin)
    val rows = db.run(
      "?[id, content, n_lines, n_chars] <~ StripHtml(*pages[id, html], min_line_chars: 10)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "Prose long enough to keep.", 1L)))
  }

  test("UrlDedup from script: canonical variants collapse, per-domain cap ranks") {
    val db = new CozoDb(spark)
    db.run(
      """?[id, url] <- [
        |  [1, 'https://A.com/x?utm_source=t'],
        |  [2, 'https://a.com/x/'],
        |  [3, 'https://a.com/y']
        |] :create crawl {id => url}""".stripMargin)
    val rows = db.run("?[url, id, domain, rank, keep] <~ UrlDedup(*crawl[id, url], cap: 1)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(rows == Set(
      ("https://a.com/x", 1L, "a.com", 1L, true),
      ("https://a.com/y", 3L, "a.com", 2L, false)))
  }

  test("SplitByGroup and GlobalShuffle from script: group atomicity, full permutation") {
    val db = new CozoDb(spark)
    db.run(
      """?[id, grp] <- [[1, 'a'], [2, 'a'], [3, 'b'], [4, 'b'], [5, 'c']]
        |:create items {id => grp}""".stripMargin)
    val splits = db.run("?[id, grp, split] <~ SplitByGroup(*items[id, grp], portable: true)")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(splits.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1),
      "every group lands in exactly one split")
    val pos = db.run("?[id, pos] <~ GlobalShuffle(*items[id])")
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(pos == (0L until 5L).toSeq, "positions are a permutation of 0..n-1")
  }

  test("DecontaminateBloom from script equals Decontaminate on the same inputs") {
    val db = docsDb()
    db.run(
      """?[id, text] <- [[10, 'the quick brown fox jumps over the lazy dog']]
        |:create eval {id => text}""".stripMargin)
    def norm(q: String) = db.run(q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = norm("?[id, overlap, docs] <~ Decontaminate(*docs[id, text], *eval[id, text], n: 4)")
    val bloom = norm("?[id, overlap, docs] <~ DecontaminateBloom(*docs[id, text], *eval[id, text], n: 4)")
    assert(exact == bloom)
    assert(exact.map(_._1) == Set(1L, 2L)) // the twin docs overlap the eval doc
  }

  test("DedupKeepBest keeps the highest-quality member of each cluster") {
    val db = new CozoDb(spark)
    db.run(
      """?[id, q] <- [[1, 1.0], [2, 9.0], [3, 5.0], [4, 7.0]]
        |:create items {id => q}""".stripMargin)
    db.run(
      """?[a, b] <- [[1, 2], [2, 3]]
        |:create prs {a => b}""".stripMargin)
    val rows = db.run(
      "?[id, cluster, q, keep] <~ DedupKeepBest(*items[id, q], *prs[a, b])")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    // cluster {1,2,3}: best quality is id 2; singleton 4 keeps itself
    assert(rows == Set((1L, 1L, false), (2L, 1L, true), (3L, 1L, false),
      (4L, 4L, true)))
  }

  test("Dsir from script ranks the target-like doc above the unrelated one") {
    val db = new CozoDb(spark)
    // raw docs must be distinct: DSIR's log p̂ − log q̂ penalizes
    // raw-frequent grams, so an exact twin would (correctly) sink
    db.run(
      """?[id, text] <- [
        |  [1, 'the quick brown fox jumps over the lazy dog'],
        |  [3, 'completely different words appear in this unrelated document']
        |] :create raw {id => text}""".stripMargin)
    db.run(
      """?[id, text] <- [[50, 'quick brown fox jumps high']]
        |:create tgt {id => text}""".stripMargin)
    val w = db.run("?[id, n, logw] <~ Dsir(*raw[id, text], *tgt[id, text])")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(1L, 3L))
    assert(w(1L) > w(3L), "the fox doc must outrank the unrelated doc")
  }

  test("PercentileCut keeps each group's top rows against its own threshold") {
    val db = new CozoDb(spark)
    db.run(
      """?[id, grp, score] <- [
        |  [1, 'a', 1.0], [2, 'a', 2.0], [3, 'a', 3.0], [4, 'a', 4.0],
        |  [5, 'b', 10.0], [6, 'b', 20.0]
        |] :create sc {id => grp, score}""".stripMargin)
    val rows = db.run(
      "?[id, grp, score, thr, keep] <~ PercentileCut(*sc[id, grp, score], quantile: 0.5, exact: true)")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    // group a: median of 1..4 = 2.5 → keep {3,4}; group b: median 15 → keep {6}
    assert(rows(1L) == ((2.5, false)) && rows(2L) == ((2.5, false)))
    assert(rows(3L) == ((2.5, true)) && rows(4L) == ((2.5, true)))
    assert(rows(5L) == ((15.0, false)) && rows(6L) == ((15.0, true)))
    // the scale default (approx sketch) picks an ACTUAL group member as
    // the threshold and still keeps ~the top half
    val approx = db.run(
      "?[id, grp, score, thr, keep] <~ PercentileCut(*sc[id, grp, score], quantile: 0.5)")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(Set(2.0, 3.0).contains(approx(1L)._1), "approx median is a member value")
    assert(approx(4L)._2 && !approx(1L)._2)
  }

  test("BpeTrain + BpeEncode from script: rules feed encoding, decode identity holds") {
    val db = docsDb()
    val enc = db.run(
      """merges[rank, l, r] <~ BpeTrain(*docs[id, text], merges: 10)
        |?[id, tokens, n] <~ BpeEncode(*docs[id, text], merges[])""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(enc.keySet == Set(1L, 2L, 3L))
    assert(enc(1L) == enc(2L), "identical docs encode identically")
    assert(enc(1L).mkString("") == "thequickbrownfoxjumpsoverthelazydog")
  }
}
