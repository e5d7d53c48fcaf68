package graft.similarity

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HNSW graph (HnswIndex + Ann.hnswTopK / hnswWriteIndex /
  * hnswProbeIndex): in-memory algorithm correctness against exact
  * linear scan (the reference asserts hnsw.rs the same way), the
  * partition-merge operator's recall on real testdata, graph
  * invariants, determinism, and the persisted-index round-trip. */
class HnswSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randVec(r: scala.util.Random, dim: Int): Array[Float] =
    Array.fill(dim)(r.nextGaussian().toFloat)

  private def exactTopK(vecs: Map[Long, Array[Float]], q: Array[Float],
                        k: Int): Seq[Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    vecs.toSeq.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
  }

  test("in-memory graph: high recall vs exact scan, degree caps, determinism") {
    val r = rng(7)
    val vecs = (0L until 500L).map(i => i -> randVec(r, 16)).toMap
    def build(): HnswIndex = {
      val idx = new HnswIndex(m = 8, efConstruction = 64)
      vecs.toSeq.sortBy(_._1).foreach { case (id, v) => idx.insert(id, v) }
      idx
    }
    val idx = build()
    assert(idx.size == 500)
    assert(idx.maxDegree <= 16, s"degree cap blown: ${idx.maxDegree}")
    // recall@10 with a generous beam on gaussian vectors
    val queries = (0 until 20).map(_ => randVec(r, 16))
    val recalls = queries.map { q =>
      val got = idx.search(q, 10, efSearch = 80).map(_._1).toSet
      val want = exactTopK(vecs, q, 10).toSet
      (got intersect want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 too low: $mean")
    // identical rebuild -> identical answers (hash levels, no RNG)
    val idx2 = build()
    for (q <- queries.take(5))
      assert(idx.search(q, 10, 80) == idx2.search(q, 10, 80))
    // reported cosines are true cosines (spot check against the oracle)
    val (topId, topSim) = idx.search(queries.head, 1, 80).head
    val v = vecs(topId)
    val dot = v.zip(queries.head).map { case (x, y) => x.toDouble * y }.sum
    val cosTrue = dot / (math.sqrt(v.map(x => x.toDouble * x).sum) *
      math.sqrt(queries.head.map(x => x.toDouble * x).sum))
    assert(math.abs(topSim - cosTrue) < 1e-5)
  }

  test("hash-derived levels follow the paper's geometric law (hnsw.rs:1020 test_random_level)") {
    // the reference's test prints the -ln(U)*mL histogram; assert it:
    // with m=16, P(level >= 1) = 1/m, P(level >= 2) = 1/m^2
    val idx = new HnswIndex(m = 16, efConstruction = 16)
    val r = rng(99)
    for (id <- 0L until 8000L) idx.insert(id * 2654435761L, randVec(r, 2))
    val levels = idx.nodes.map(_._3).toSeq
    val p1 = levels.count(_ >= 1).toDouble / levels.size
    val p2 = levels.count(_ >= 2).toDouble / levels.size
    assert(math.abs(p1 - 1.0 / 16) < 0.02, s"P(level>=1)=$p1, want ~${1.0 / 16}")
    assert(p2 < 0.02, s"P(level>=2)=$p2, want ~${1.0 / 256}")
    // and the same id always gets the same level (pure hash, no RNG)
    val idx2 = new HnswIndex(m = 16, efConstruction = 16)
    for (id <- 0L until 100L) idx2.insert(id * 2654435761L, randVec(rng(1), 2))
    val l1 = idx.nodes.map(t => (t._1, t._3)).toMap
    idx2.nodes.foreach { case (id, _, lvl) => assert(l1(id) == lvl) }
  }

  test("load() restores a graph that answers identically to its builder") {
    val r = rng(13)
    val idx = new HnswIndex(m = 6, efConstruction = 48)
    val vecs = (0L until 200L).map(i => i -> randVec(r, 8))
    vecs.foreach { case (id, v) => idx.insert(id, v) }
    val restored = HnswIndex.load(idx.nodes.toSeq, idx.edges.toSeq, 6, 48)
    for (_ <- 0 until 10) {
      val q = randVec(r, 8)
      assert(restored.search(q, 5, 40) == idx.search(q, 5, 40))
    }
  }

  test("in-memory graph: L2 and IP metrics reach the exact top-k (hnsw.rs:66-108 metric set)") {
    val r = rng(11)
    val vecs = (0L until 400L).map(i => i -> randVec(r, 12)).toMap
    def exact(q: Array[Float], score: (Array[Float], Array[Float]) => Double): Seq[Long] =
      vecs.toSeq.map { case (id, v) => (id, score(v, q)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val l2 = (a: Array[Float], b: Array[Float]) =>
      -a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val ip = (a: Array[Float], b: Array[Float]) =>
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    for ((metric, score) <- Seq("l2" -> l2, "ip" -> ip)) {
      val idx = new HnswIndex(m = 8, efConstruction = 64, metric = metric)
      vecs.toSeq.sortBy(_._1).foreach { case (id, v) => idx.insert(id, v) }
      val queries = (0 until 15).map(_ => randVec(r, 12))
      val recalls = queries.map { q =>
        val got = idx.search(q, 10, efSearch = 80).map(_._1).toSet
        val want = exact(q, score).toSet
        (got intersect want).size.toDouble / want.size
      }
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.9, s"$metric mean recall@10 too low: $mean")
      // reported score is the true metric score for the top hit
      val q0 = queries.head
      val (topId, topScore) = idx.search(q0, 1, 80).head
      assert(math.abs(topScore - score(vecs(topId), q0)) < 1e-6)
    }
  }

  test("hnswTopK: partition-merged recall vs brute force on sf0.001 embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("vec"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.bruteForceTopK(corpus, queries, k = 5))
    val hnsw = Ann.hnswTopK(corpus, queries, k = 5,
      m = 12, efConstruction = 80, efSearch = 64)
    val approx = pairs(hnsw)
    val recall = (exact intersect approx).size.toDouble / exact.size
    // per-partition graphs are small at this SF, so the merge is
    // near-exact; anything below ~0.9 means a broken walk
    assert(recall >= 0.9, s"HNSW recall@5 too low: $recall")
    // reported cosines agree with the exact kernel for shared pairs
    val bf = Ann.bruteForceTopK(corpus, queries, k = 5)
      .select(col("query_id"), col("id"), col("cosine").as("bfc"))
    val joined = hnsw.join(bf, Seq("query_id", "id"))
      .select(abs(col("cosine") - col("bfc")).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(joined < 1e-6, s"cosine mismatch up to $joined")
  }

  test("persisted index round-trip: probe equals in-line build") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("vec"))
    val dir = java.nio.file.Files.createTempDirectory("hnsw_idx").toString
    Ann.hnswWriteIndex(dir, corpus, m = 12, efConstruction = 80, numParts = 8)
    val probed = Ann.hnswProbeIndex(dir, queries, k = 5, efSearch = 64)
    // the probe of the persisted graphs must be a valid ANN answer in
    // its own right: high recall and exact cosines
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Ann.bruteForceTopK(corpus, queries, k = 5))
    val recall = (exact intersect pairs(probed)).size.toDouble / exact.size
    assert(recall >= 0.9, s"persisted HNSW recall@5 too low: $recall")
    // probing twice is deterministic
    val again = Ann.hnswProbeIndex(dir, queries, k = 5, efSearch = 64)
    assert(probed.collect().toSet == again.collect().toSet)
  }
}
