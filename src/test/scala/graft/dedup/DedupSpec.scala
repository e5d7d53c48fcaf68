package graft.dedup

import graft.SparkFixture
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Candidate-generation soundness checks on real testdata: the
  * prefix-filtered exact Jaccard and the narrow (ids-only) LSH joins
  * must reproduce the brute-force answers exactly.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Naive unfiltered exact Jaccard via the full shared-shingle join —
    * the reference answer the prefix filter must match. */
  private def naiveJaccard(threshold: Double): Set[(Long, Long, Double)] = {
    val sh = docs.select(col("doc_id").as("id"),
        explode(TF.wordShingles(col("text"), 3)).as("s"))
      .distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("id").as("id_a"), col("s"))
      .join(sh.select(col("id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet

  test("ngramJaccard equals the naive shared-shingle join on BOTH adaptive paths") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      // collisionFactor=MaxValue forces the direct-join path,
      // collisionFactor=0 forces the prefix-filtered path; both exact
      val direct = pairs(Dedup.ngramJaccard(docs, "doc_id", "text", shingleN = 3,
        threshold = t, maxDocFreq = Some(Long.MaxValue), collisionFactor = Long.MaxValue))
      val prefix = pairs(Dedup.ngramJaccard(docs, "doc_id", "text", shingleN = 3,
        threshold = t, maxDocFreq = Some(Long.MaxValue), collisionFactor = 0L))
      val truth = naiveJaccard(t)
      assert(direct == truth, s"direct path, threshold $t")
      assert(prefix == truth, s"prefix path, threshold $t")
    }
  }

  test("exact-twin collapse is invisible: twinned corpus ≡ naive on both Jaccard paths and minhash") {
    import spark.implicits._
    // 3 copies of every doc (distinct ids) — the collapse must emit the
    // within-twin J=1 pairs AND fan every rep-level pair out to all
    // member combinations, on both adaptive paths and the LSH shape
    val twinned = docs.select(col("doc_id"), col("text"))
      .withColumn("__c", explode(array(lit(0L), lit(1L), lit(2L))))
      .select((col("doc_id") * 10 + col("__c")).as("doc_id"), col("text"))
    def naive(t: Double): Set[(Long, Long, Double)] = {
      val sh = twinned.select(col("doc_id").as("id"),
          explode(TF.wordShingles(col("text"), 3)).as("s")).distinct()
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
      sh.select(col("id").as("id_a"), col("s"))
        .join(sh.select(col("id").as("id_b"), col("s")), Seq("s"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
        .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
        .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
        .withColumn("jaccard", col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
        .filter(col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
        .collect().map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
    }
    val truth = naive(0.5)
    assert(truth.exists(_._3 == 1.0), "twin fixture must contain J=1 pairs")
    val direct = pairs(Dedup.ngramJaccard(twinned, "doc_id", "text", shingleN = 3,
      threshold = 0.5, maxDocFreq = Some(Long.MaxValue), collisionFactor = Long.MaxValue))
    val prefix = pairs(Dedup.ngramJaccard(twinned, "doc_id", "text", shingleN = 3,
      threshold = 0.5, maxDocFreq = Some(Long.MaxValue), collisionFactor = 0L))
    val lsh = pairs(Dedup.minhashDedup(twinned, "doc_id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.5))
    assert(direct == truth, "direct path on twinned corpus")
    assert(prefix == truth, "prefix path on twinned corpus")
    assert(lsh == truth, "minhashDedup on twinned corpus")
    // simhash collapses on the fingerprint itself — compare against the
    // brute-force fp pair scan on the same twinned corpus
    val fps = graft.functions.TextFunctions
      .simhashFingerprints(twinned, "doc_id", TF.tokens(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val simTruth = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= 3
    } yield (ia, ib, h)).toSet
    val sim = Dedup.simhashPairs(twinned, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sim == simTruth, "simhashPairs on twinned corpus")
  }

  test("minhashDedup (LSH + exact verify) recovers every naive pair at j>=0.5 on this corpus") {
    val got = pairs(Dedup.minhashDedup(docs, "doc_id", "text",
      shingleN = 3, bands = 32, rowsPerBand = 2, threshold = 0.5))
    assert(got == naiveJaccard(0.5))
  }

  test("minhashLsh narrow band join emits (id_a, id_b, est) with ids ordered and deduped") {
    val out = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    assert(rows.nonEmpty) // the corpus has planted near-dups
  }

  test("embeddingNearDup regime selection: degenerate LSH params route to the blocked exact scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.4, planes = 0))
    // planes=3/tables=32: 98.6% of RANDOM pairs collide somewhere, so
    // the LSH shape would touch all pairs anyway — the exact regime
    // must fire (identical output, no hyperplane machinery in the plan)
    val low = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.4, planes = 3, tables = 32)
    assert(pairs(low) == brute)
    assert(!low.queryExecution.optimizedPlan.toString.contains("xxhash64"),
      "low-threshold call still built hyperplane buckets")
  }

  test("blocked kernel ≡ crossJoin shape (int ids force the relational fallback)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val kernel = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.4, planes = 0))
    // non-long ids are not kernelable → the crossJoin shape runs; the
    // same pair set (ids re-widened) proves the kernel's mirror equality
    val embInt = emb.withColumn("vec_id", col("vec_id").cast("int"))
    val cross = Dedup.embeddingNearDup(embInt, "vec_id", "embedding",
      threshold = 0.4, planes = 0)
      .collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong,
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
    assert(kernel == cross)
    assert(kernel.nonEmpty)
  }

  test("blocked kernel: zero-norm vectors score 0.0 and pass a threshold <= 0, like the expression") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.0, planes = 0))
    // every ordered pair has cosine 0.0 here → all pass at threshold 0
    assert(got == Set((1L, 2L, 0.0), (1L, 3L, 0.0), (2L, 3L, 0.0)))
  }

  test("blocked kernel: ragged / null vectors fall back to the expression shape (r11 advice)") {
    import spark.implicits._
    // lengths 3, 2, 3 and a null: the kernel would crash (short) or
    // silently truncate (long) — CosineSimilarity's pairwise-min-length
    // semantics must win instead
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(1f, 0f)),
      (3L, Array(1f, 0f, 1f)),
      (4L, null: Array[Float])).toDF("vec_id", "embedding")
    val got = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.5, planes = 0))
    // expression semantics (dot AND norms truncate to min length):
    // cos(1,2)=1 at n=2, cos(1,3)=1/√2 at n=3, cos(2,3)=1 at n=2
    // (vec3's third element falls outside the window); null rows drop
    val r2 = math.rint(1.0 / math.sqrt(2.0) * 1e6) / 1e6
    assert(got == Set((1L, 2L, 1.0), (1L, 3L, r2), (2L, 3L, 1.0)))
  }

  test("embeddingNearDup discriminative-LSH regime equals brute force on planted twins") {
    import spark.implicits._
    val r = new scala.util.Random(5)
    def vec(): Array[Float] = Array.fill(32)(r.nextGaussian().toFloat)
    def tweak(v: Array[Float]): Array[Float] =
      v.map(x => x + 0.05f * r.nextGaussian().toFloat)
    val base = (0L until 80L).map(i => (i, vec()))
    val twins = base.take(8).map { case (i, v) => (i + 1000L, tweak(v)) }
    val emb = (base ++ twins).toDF("vec_id", "embedding")
    // planes=8/tables=8: random-pair collision 3.1% -> LSH path stays
    val lsh = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.9, planes = 8, tables = 8)
    // the bucket table is checkpointed, so look for its columns (the
    // hyperplane projections themselves hide behind the LogicalRDD)
    assert(lsh.queryExecution.optimizedPlan.toString.contains("bucket"),
      "discriminative params should keep the hyperplane-bucket path")
    val brute = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding",
      threshold = 0.9, planes = 0))
    assert(brute.nonEmpty, "twin construction produced no cosine>=0.9 pairs")
    assert(pairs(lsh) == brute)
  }

  test("semanticDedup: cluster-scoped pairs find planted twins, all pairs verified exact") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val base = (0L until 60L).map(i => (i, Array.fill(16)(r.nextGaussian().toFloat)))
    val twins = base.take(10).map { case (i, v) =>
      (i + 100L, v.map(x => x + 0.01f * r.nextGaussian().toFloat))
    }
    val emb = (base ++ twins).toDF("id", "vec")
    val pairs = Dedup.semanticDedup(emb, "id", "vec",
      threshold = 0.95, nClusters = 4).collect()
    val found = pairs.map(p => (p.getLong(0), p.getLong(1))).toSet
    val planted = (0L until 10L).map(i => (i, i + 100L)).toSet
    // twins are near-identical: nearly all land in the same cell
    assert((found intersect planted).size >= 8, s"found $found")
    // no false positives beyond the threshold (random 16-dim pairs at
    // 0.95 are essentially impossible)
    assert(found.subsetOf(planted))
    // cosines in the output are true cosines
    val byId = (base ++ twins).toMap
    for (p <- pairs) {
      val (a, b) = (byId(p.getLong(0)), byId(p.getLong(1)))
      val cosTrue = a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x.toDouble * x).sum))
      assert(math.abs(p.getDouble(2) - cosTrue) < 1e-6)
    }
  }

  test("duplicatedCoverage finds exactly the planted shared span (Lee-et-al substring dedup)") {
    import spark.implicits._
    // docs 1 and 2 share a 12-token run; doc 3 is unrelated filler long
    // enough to window but with every 5-gram unique
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared omega psi chi phi upsilon"),
      (3L, (1 to 20).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val cov = Dedup.duplicatedCoverage(corpus, "doc_id", "text", minLen = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the shared 12-token span is covered in both carriers, nothing else:
    // windows are length-5, only those fully inside the shared run repeat
    assert(cov(1L) == (16L, 12L))
    assert(cov(2L) == (17L, 12L))
    assert(cov(3L) == (20L, 0L))
  }

  test("duplicatedSpans merges windows into one maximal range per carrier") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"$shared omega psi chi phi upsilon")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(corpus, "doc_id", "text", minLen = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1: tokens 2..13 are the shared run (0-based); doc 2: 0..11
    assert(spans == Set((1L, 2, 13), (2L, 0, 11)))
  }

  test("removeDuplicateSpans: first occurrence survives intact, later occurrences are cut (Lee-et-al ExactSubstr removal)") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"alpha beta $shared gamma delta"), // first (min id) — keeps the run
      (2L, s"$shared omega psi chi phi upsilon"), // loses tokens 0..7
      (3L, (1 to 20).map(i => s"u$i").mkString(" ")), // untouched filler
      (4L, "x y") // below minLen — untouched
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicateSpans(corpus, "doc_id", "text", minLen = 8)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((12L, 12L, s"alpha beta $shared gamma delta")))
    assert(r(2L) == ((13L, 5L, "omega psi chi phi upsilon")))
    assert(r(3L) == ((20L, 20L, (1 to 20).map(i => s"u$i").mkString(" "))))
    assert(r(4L) == ((2L, 2L, "x y")))
    // intra-document repetition: the SECOND copy inside the same doc is
    // removed; overlapping windows across the repeat merge their coverage
    val selfRep = Seq((7L, s"$shared $shared tail")).toDF("doc_id", "text")
    val rs = Dedup.removeDuplicateSpans(selfRep, "doc_id", "text", minLen = 8)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getString(3))).head
    assert(rs == ((17L, 9L, s"$shared tail")))
  }

  test("duplicatedCoverage agrees with a string-keyed recomputation on real testdata") {
    val byHash = Dedup.duplicatedCoverage(docs, "doc_id", "text", minLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent recomputation with STRING window keys (no hashing)
    val base = docs.select(col("doc_id").as("id"), TF.tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
    val wins = base.filter(size(col("tk")) >= 10)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("tk")) - lit(10)),
        i => concat_ws(" ", slice(col("tk"), i + 1, lit(10))))))
      .toDF("id", "start", "w")
    val dup = wins.groupBy("w").agg(count(lit(1)).as("c")).filter(col("c") > 1).select("w")
    val cover = wins.join(dup, Seq("w"))
      .select(col("id"), explode(sequence(col("start"), col("start") + lit(9))).as("p"))
      .distinct().groupBy("id").agg(count(lit(1)).as("dup_tokens"))
    val expected = base.select(col("id"), size(col("tk")).cast("long").as("total_tokens"))
      .join(cover, Seq("id"), "left")
      .select(col("id"), col("total_tokens"), coalesce(col("dup_tokens"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(byHash == expected)
  }

  test("minhash signatures are set-order invariant (runtime/minhash_lsh.rs:371 test_minhash)") {
    val k = 64
    def sig(elems: Seq[String]): Seq[Long] =
      spark.range(1)
        .select(TF.minhashSignature(array(elems.map(lit): _*), k).as("s"))
        .collect().head.getSeq[Long](0)
    def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    val m1 = sig(Seq("1", "2", "3", "4", "5", "6"))
    val m2 = sig(Seq("4", "3", "2", "1", "5", "6"))
    assert(m1 == m2) // same set, different order -> identical signature
    assert(estJaccard(m1, m2) == 1.0)
    val m1x = sig(Seq("1", "2", "3", "4", "5", "6", "7", "8", "9"))
    assert(estJaccard(m1x, m2) < 1.0) // superset drifts the estimate down
    val m2x = sig(Seq("4", "3", "2", "1", "5", "6", "17", "18", "19"))
    assert(estJaccard(m1x, m2x) < 1.0)
  }

  test("dedupLines: first occurrence wins, trim-keyed, blanks always kept") {
    import spark.implicits._
    val docsIn = Seq(
      (1L, "alpha beta\ncommon line\n\ngamma"),
      (2L, "  common line\ndelta"), // leading spaces: still the same key
      (3L, "common line")).toDF("doc_id", "text")
    val r = Dedup.dedupLines(docsIn, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    // doc 1 owns the first occurrence of "common line" and keeps everything
    assert(r(1L) == ((4L, 4L, "alpha beta\ncommon line\n\ngamma")))
    // doc 2's trimmed duplicate is removed; its unique line survives
    assert(r(2L) == ((2L, 1L, "delta")))
    // doc 3 loses its only line entirely
    assert(r(3L) == ((1L, 0L, "")))
  }

  test("resolveClustersBest keeps all-NULL-quality clusters: min-id keeper, no dropped docs (ADVICE r6)") {
    import spark.implicits._
    val d = Seq((1L, Some(0.9)), (2L, Some(0.5)), (3L, None: Option[Double]),
      (4L, None: Option[Double]), (5L, Some(0.2)))
      .toDF("id", "quality")
    // cluster {1,2}: real scores; cluster {3,4}: all NULL; 5: singleton
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Dedup.resolveClustersBest(d, "id", "quality", pairs)
      .collect().map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L, 5L), s"every document returned, got ${r.keySet}")
    assert(r(1L) && !r(2L))  // quality argmax
    assert(r(3L) && !r(4L))  // all-NULL cluster: min-id fallback
    assert(r(5L))            // singleton keeps itself
  }

  test("one-pass Simhash64 expression equals the explode+vote-sum aggregate formula") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "Zeta9", "η7", "x")
    val docs = ((1L to 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(40) + 1)(words(rnd.nextInt(words.length))).mkString(" "))
    } :+ ((100L, "")) :+ ((101L, "   ..!!   "))) // empty-token docs drop on BOTH paths
      .toDF("doc_id", "text")
    val toks = TF.tokens(col("text"))
    // the pre-r13 formula, verbatim
    val th = docs.select(col("doc_id").as("id"), explode(toks).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"__b$b")
    }
    val old = th.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(b => when(col(s"__b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val neu = graft.functions.TextFunctions
      .simhashFingerprints(docs, "doc_id", toks)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(neu == old, "one-pass simhash diverged from the aggregate formula")
    assert(!neu.contains(100L) && !neu.contains(101L))
  }
}
