package graft.dedup

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential fuzz of the exact-Jaccard candidate plan: random small
  * corpora with planted overlap structure, the stats-adaptive
  * prefix-filter/PPJoin plan vs a naive all-pairs shingle-set scan.
  * Both the direct-join and AllPairs regimes are exercised (the plan
  * picks by Σdf², which the corpus shape steers). Also fuzzes
  * minhashDedup's verified output: banding may MISS pairs (bounded
  * probability) but a verified pair must never be wrong or
  * sub-threshold.
  */
class DedupFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj")

  private def randCorpus(rnd: scala.util.Random, n: Int): Seq[(Long, String)] =
    (1L to n.toLong).map { id =>
      val base = Seq.fill(5 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      // with prob 1/3, make this doc a mutation of an earlier one so
      // mid-range Jaccard pairs actually exist
      val words = if (id > 1 && rnd.nextInt(3) == 0) {
        val other = base.take(2 + rnd.nextInt(3))
        other ++ base.drop(rnd.nextInt(3))
      } else base
      (id, words.mkString(" "))
    }

  private def shingles(text: String, n: Int): Set[String] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def naivePairs(corpus: Seq[(Long, String)], n: Int,
                         t: Double): Map[(Long, Long), Double] =
    (for {
      Seq((ia, ta), (ib, tb)) <- corpus.combinations(2)
      sa = shingles(ta, n); sb = shingles(tb, n)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (math.min(ia, ib), math.max(ia, ib)) -> j).toMap

  test("ngramJaccard ≡ naive all-pairs exact Jaccard (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 34513 + 19)
      val corpus = randCorpus(rnd, 12 + rnd.nextInt(10))
      val t = Seq(0.3, 0.5, 0.7)(rnd.nextInt(3))
      val got = Dedup.ngramJaccard(corpus.toDF("id", "text"), "id", "text",
          shingleN = 2, threshold = t, maxDocFreq = Some(Long.MaxValue))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = naivePairs(corpus, 2, t)
      assert(got.keySet == want.keySet, s"seed $seed t $t")
      for ((p, j) <- want)
        assert(math.abs(got(p) - j) < 1e-12, s"seed $seed pair $p")
    }
  }

  test("resolveClusters / resolveClustersBest ≡ naive union-find + argmax keeper (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 60251 + 3)
      val n = 10 + rnd.nextInt(10)
      val ids = (1L to n.toLong)
      // random pairs incl. chains/cycles; some ids isolated
      val pairs = (0 until rnd.nextInt(12)).map { _ =>
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n)))
      }.filter(p => p._1 != p._2)
      val quality: Map[Long, Option[Double]] = ids.map(id =>
        id -> (if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(50).toDouble))).toMap
      // naive union-find with min-id labels
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- pairs) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
      val label = ids.map { id =>
        val members = ids.filter(j => parent.contains(j) && parent.contains(id) && find(j) == find(id))
        id -> (if (parent.contains(id) && members.nonEmpty) members.min else id)
      }.toMap
      val docsDf = ids.map(id => (id, quality(id).map(Double.box).orNull)).toSeq
        .toDF("id", "q")
      val pairsDf = (if (pairs.isEmpty) Seq((-1L, -2L)) else pairs).toDF("id_a", "id_b")
      val rc = Dedup.resolveClusters(docsDf.select("id"), "id", pairsDf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      for (id <- ids)
        assert(rc(id) == ((label(id), id == label(id))), s"seed $seed id $id")
      val rb = Dedup.resolveClustersBest(docsDf, "id", "q", pairsDf)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      val keepers = ids.groupBy(label).map { case (_, members) =>
        val mq = members.map(m => quality(m).getOrElse(Double.NegativeInfinity)).max
        members.filter(m => quality(m).getOrElse(Double.NegativeInfinity) == mq).min
      }.toSet
      for (id <- ids)
        assert(rb(id) == keepers(id), s"seed $seed keeper for $id (clusters $label)")
    }
  }

  test("minhashDedup verified pairs are a SOUND subset of exact pairs (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 77003 + 7)
      val corpus = randCorpus(rnd, 12 + rnd.nextInt(8))
      val got = Dedup.minhashDedup(corpus.toDF("id", "text"), "id", "text",
          shingleN = 2, bands = 32, rowsPerBand = 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val exact = naivePairs(corpus, 2, 0.5)
      // soundness: every emitted pair is exact-verified and above t
      for ((p, j) <- got) {
        assert(exact.contains(p), s"seed $seed false pair $p")
        assert(math.abs(exact(p) - j) < 1e-12 && j >= 0.5, s"seed $seed pair $p")
      }
      // banding at 32×2 on j≥0.5: miss probability ≤ (1-0.5²)³² ≈ 1e-4
      // per pair — on these seeds the candidate set is complete
      assert(got.keySet == exact.keySet, s"seed $seed missed ${exact.keySet -- got.keySet}")
    }
  }
}
