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
