package graft.lang

import graft.SparkFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runs EVERY registered fixed rule once on miniature inputs and
  * asserts its output width against FixedRules.arity — the declared
  * numbers the `::fixed_rules` listing serves (the reference registry
  * exposes FixedRule::arity the same way, fixed_rule/mod.rs:63). Rules
  * with input-dependent width (declared None) are asserted against the
  * width these specific inputs must produce. Doubles as an end-to-end
  * smoke test of the whole script-rule registry.
  */
class FixedRulesAritySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val edges = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 1L, 1.5),
    (3L, 4L, 1.0), (4L, 4L, 1.0)).toDF("src", "dst", "w")
  private lazy val dag = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 1.5))
    .toDF("src", "dst", "w")
  private lazy val starts = Seq(Tuple1(1L)).toDF("start")
  private lazy val goals = Seq(Tuple1(3L)).toDF("goal")
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "completely different words appear in this document today"))
    .toDF("id", "text")
  private lazy val labeled = Seq((1L, "good wholesome text here", 1L),
    (2L, "bad spam words now", 0L)).toDF("id", "text", "label")
  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .selectExpr("vec_id as id", "embedding as vec").limit(64).cache()
  private lazy val probes = vecs.limit(2)
  private lazy val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
  private lazy val ids = docs.select(col("id"))
  private lazy val weighted = Seq((1L, 10L), (2L, 20L), (3L, 5L))
    .toDF("id", "weight")
  private lazy val srcDocs = Seq(("a", 1L), ("a", 2L), ("b", 3L))
    .toDF("src", "id")
  private lazy val qual = Seq((1L, 0.5), (2L, 0.9), (3L, 0.1))
    .toDF("id", "quality")
  private lazy val grouped = Seq((1L, "g1", 0.5), (2L, "g1", 0.9), (3L, "g2", 0.1))
    .toDF("id", "grp", "score")
  private lazy val tsRows = Seq((1L, 100L, "v1"), (1L, 200L, "v2"), (2L, 10L, "w"))
    .toDF("key", "ts", "tag")
  private lazy val tsRight = Seq((1L, 90L, "early"), (1L, 150L, "mid"))
    .toDF("key", "ts", "p")
  private lazy val points = Seq((150L, "a"), (250L, "b")).toDF("p", "name")
  private lazy val intervals = Seq((100L, 200L, "w1")).toDF("start", "end", "iname")
  private lazy val htmlDocs = Seq(
    (1L, "<html><body><p>some long enough paragraph of text</p></body></html>"))
    .toDF("id", "html")
  private lazy val urls = Seq((1L, "https://example.com/a?utm_source=x"),
    (2L, "https://example.com/a")).toDF("id", "url")
  private lazy val media: DataFrame = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "png", baos)
    val bytes = baos.toByteArray
    Seq((1L, bytes), (2L, bytes)).toDF("id", "media")
  }
  private lazy val merges = FixedRules.get("BpeTrain").get(
    Seq(docs), Map("merges" -> 10L), spark)
  private lazy val annIdxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_arity_ann").toString
    graft.similarity.Ann.writeIndex(dir, vecs, nCells = 4, subspaces = 8, codes = 16)
    dir
  }
  private lazy val ftsIdxDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_arity_fts").toString
    graft.search.Fts.writeIndex(dir, graft.search.Fts.Index.build(docs, "id", "text"),
      buckets = 4)
    dir
  }
  private lazy val csvPath = {
    val p = java.nio.file.Files.createTempFile("graft_arity", ".csv")
    java.nio.file.Files.write(p, "a,b\n1,x\n2,y\n".getBytes("UTF-8"))
    p.toString
  }
  private lazy val jsonPath = {
    val p = java.nio.file.Files.createTempFile("graft_arity", ".json")
    java.nio.file.Files.write(p, "{\"a\":1,\"b\":\"x\"}\n".getBytes("UTF-8"))
    p.toString
  }

  /** rels + options + (for variable-arity rules) the width these inputs
    * must produce. */
  private case class Case(rels: () => Seq[DataFrame],
                          opts: Map[String, Any] = Map.empty,
                          varWidth: Option[Int] = None)

  private lazy val cases: Map[String, Case] = Map(
    "PageRank" -> Case(() => Seq(edges)),
    "DegreeCentrality" -> Case(() => Seq(edges)),
    "ConnectedComponents" -> Case(() => Seq(edges)),
    "StronglyConnectedComponent" -> Case(() => Seq(edges)),
    "StronglyConnectedComponents" -> Case(() => Seq(edges)),
    "SCC" -> Case(() => Seq(edges)),
    "CommunityDetectionLouvain" -> Case(() => Seq(edges)),
    "LabelPropagation" -> Case(() => Seq(edges), Map("max_iter" -> 2L)),
    "ClusteringCoefficients" -> Case(() => Seq(edges)),
    "TopSort" -> Case(() => Seq(dag)),
    "BFS" -> Case(() => Seq(edges, starts), Map("limit" -> 3L)),
    "DFS" -> Case(() => Seq(edges, starts), Map("limit" -> 3L)),
    "BreadthFirstSearch" -> Case(() => Seq(edges, starts), Map("limit" -> 3L)),
    "DepthFirstSearch" -> Case(() => Seq(edges, starts), Map("limit" -> 3L)),
    "ShortestPathBFS" -> Case(() => Seq(edges, starts)),
    "ShortestPathDijkstra" -> Case(() => Seq(edges, starts), varWidth = Some(3)),
    "RandomWalk" -> Case(() => Seq(edges, starts), Map("steps" -> 3L)),
    "MinimumSpanningTreePrim" -> Case(() => Seq(edges)),
    "MinimumSpanningForestKruskal" -> Case(() => Seq(edges)),
    "ClosenessCentrality" -> Case(() => Seq(edges)),
    "BetweennessCentrality" -> Case(() => Seq(edges)),
    "ShortestPathAStar" -> Case(() => Seq(edges, starts, goals)),
    "KShortestPathYen" -> Case(() => Seq(edges, starts, goals), Map("k" -> 2L)),
    "Constant" -> Case(() => Seq.empty,
      Map("data" -> Seq(Seq(1L, "a"), Seq(2L, "b"))), varWidth = Some(2)),
    "ReorderSort" -> Case(() => Seq(docs), varWidth = Some(3)),
    "DedupExact" -> Case(() => Seq(docs)),
    "MinHashDedup" -> Case(() => Seq(docs)),
    "NgramJaccardDedup" -> Case(() => Seq(docs)),
    "SimHashDedup" -> Case(() => Seq(docs)),
    "SubstringDedup" -> Case(() => Seq(docs), Map("min_len" -> 5L)),
    "SubstringSpans" -> Case(() => Seq(docs), Map("min_len" -> 5L)),
    "SubstringRemove" -> Case(() => Seq(docs), Map("min_len" -> 5L)),
    "TextChunk" -> Case(() => Seq(docs), Map("size" -> 4L, "stride" -> 3L)),
    "TextKeywords" -> Case(() => Seq(docs), Map("k" -> 2L)),
    "PackByBudget" -> Case(() => Seq(weighted), Map("budget" -> 25L)),
    "PackSequences" -> Case(() => Seq(weighted),
      Map("max_len" -> 16L, "budget" -> 32L)),
    "BalanceSources" -> Case(() => Seq(srcDocs)),
    "BalanceTemperature" -> Case(() => Seq(srcDocs), Map("tau" -> 0.5)),
    "PoolEmbeddings" -> Case(() => Seq(vecs.selectExpr("id % 2 as grp", "vec"))),
    "QualityClassifier" -> Case(() => Seq(labeled), Map("iters" -> 2L)),
    "EmbeddingDedup" -> Case(() => Seq(vecs), Map("threshold" -> 0.5)),
    "DecontaminateEmbed" -> Case(() => Seq(vecs, probes), Map("threshold" -> 0.5)),
    "SemanticDedup" -> Case(() => Seq(vecs),
      Map("threshold" -> 0.5, "n_clusters" -> 2L)),
    "MediaDecode" -> Case(() => Seq(media)),
    "ImageDedup" -> Case(() => Seq(media)),
    "DedupClusters" -> Case(() => Seq(ids, pairs)),
    "DedupKeepBest" -> Case(() => Seq(qual, pairs)),
    "TextStats" -> Case(() => Seq(docs)),
    "TextQuality" -> Case(() => Seq(docs)),
    "TextRepetition" -> Case(() => Seq(docs)),
    "TextNovelty" -> Case(() => Seq(docs), Map("n" -> 3L)),
    "GopherRules" -> Case(() => Seq(docs), Map("min_words" -> 2L)),
    "DedupLines" -> Case(() => Seq(docs)),
    "PiiSignals" -> Case(() => Seq(docs)),
    "LanguageId" -> Case(() => Seq(docs)),
    "Decontaminate" -> Case(() => Seq(docs, docs.limit(1)), Map("n" -> 3L)),
    "DecontaminateBloom" -> Case(() => Seq(docs, docs.limit(1)), Map("n" -> 3L)),
    "BpeTrain" -> Case(() => Seq(docs), Map("merges" -> 10L)),
    "BpeEncode" -> Case(() => Seq(docs, merges)),
    "Dsir" -> Case(() => Seq(docs, docs.limit(1)), Map("buckets" -> 100L)),
    "StripHtml" -> Case(() => Seq(htmlDocs), Map("min_line_chars" -> 5L)),
    "UrlDedup" -> Case(() => Seq(urls.select(col("id"), col("url")))),
    "PercentileCut" -> Case(() => Seq(grouped), Map("quantile" -> 0.5)),
    "Sample" -> Case(() => Seq(docs), Map("fraction" -> 0.5), varWidth = Some(2)),
    "Split" -> Case(() => Seq(docs), varWidth = Some(3)),
    "SplitByGroup" -> Case(() => Seq(grouped), varWidth = Some(4)),
    "GlobalShuffle" -> Case(() => Seq(docs), varWidth = Some(3)),
    "AnnKnn" -> Case(() => Seq(vecs, probes), Map("k" -> 2L)),
    "AnnPq" -> Case(() => Seq(vecs, probes),
      Map("k" -> 2L, "subspaces" -> 8L, "codes" -> 16L)),
    "AnnHnsw" -> Case(() => Seq(vecs, probes), Map("k" -> 2L)),
    "AnnPqProbe" -> Case(() => Seq(probes),
      Map("path" -> s"file://$annIdxDir", "k" -> 2L)),
    "FtsIndexProbe" -> Case(() => Seq.empty,
      Map("path" -> s"file://$ftsIdxDir", "query" -> "quick", "k" -> 5L)),
    "AsOfJoin" -> Case(() => Seq(tsRows, tsRight), varWidth = Some(4)),
    "RangeJoin" -> Case(() => Seq(points, intervals),
      Map("bucket_width" -> 1000L), varWidth = Some(5)),
    "Sessionize" -> Case(() => Seq(tsRows), Map("gap" -> 50L), varWidth = Some(4)),
    "KMeans" -> Case(() => Seq(vecs), Map("k" -> 2L, "iters" -> 2L)),
    "Perplexity" -> Case(() => Seq(docs)),
    "CsvReader" -> Case(() => Seq.empty,
      Map("url" -> s"file://$csvPath"), varWidth = Some(2)),
    "JsonReader" -> Case(() => Seq.empty,
      Map("url" -> s"file://$jsonPath"), varWidth = Some(2)))

  test("every registered rule has an audit case and every case a rule") {
    val names = FixedRules.names.toSet
    assert(names.diff(cases.keySet).isEmpty,
      s"rules without an arity audit case: ${names.diff(cases.keySet).mkString(", ")}")
    assert(cases.keySet.diff(names).isEmpty,
      s"stale audit cases: ${cases.keySet.diff(names).mkString(", ")}")
  }

  for (name <- FixedRules.names) {
    test(s"$name: declared arity matches the actual output width") {
      val c = cases(name)
      val out = FixedRules.get(name).get(c.rels(), c.opts, spark)
      val width = out.columns.length
      out.write.format("noop").mode("overwrite").save() // it must also RUN
      FixedRules.arity(name) match {
        case Some(declared) =>
          assert(width == declared,
            s"$name: declared arity $declared but produced $width columns " +
              s"(${out.columns.mkString(", ")})")
          assert(c.varWidth.isEmpty, s"$name has fixed declared arity; drop varWidth")
        case None =>
          val expected = c.varWidth.getOrElse(
            fail(s"$name declares variable arity; the case needs varWidth"))
          assert(width == expected,
            s"$name: variable-arity rule produced $width columns for this input, " +
              s"expected $expected (${out.columns.mkString(", ")})")
      }
    }
  }

  test("ShortestPathDijkstra with goals takes the (src,dst,cost,path) shape") {
    val out = FixedRules.get("ShortestPathDijkstra").get(
      Seq(edges, starts, goals), Map.empty, spark)
    assert(out.columns.length == 4)
  }
}
