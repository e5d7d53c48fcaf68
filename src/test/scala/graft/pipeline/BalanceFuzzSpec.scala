package graft.pipeline

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of source balancing vs a naive mirror of its
  * documented spec (anchor = min N/w; target_s = floor(w_s·N_a/w_a);
  * keep the target_s rows with the smallest (knuthBucket(id), id)).
  * The exact path must match the naive set EXACTLY; the rate-only
  * path must stay within sampling noise and be a subset property
  * check (every kept row passes the hash-rate threshold).
  */
class BalanceFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val D = 1L << 30

  private def knuth(id: Long): Long = {
    val lo32 = id & 0xFFFFFFFFL
    val prod = Math.floorMod(
      lo32 * 31153L + Math.floorMod(lo32 * 40503L, 65536L) * 65536L, 4294967296L)
    Math.floorMod(prod, D)
  }

  test("balanceSources exact path ≡ naive anchored-target selection (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 86413 + 11)
      val sources = Seq("web", "code", "books").take(2 + rnd.nextInt(2))
      val rows = sources.zipWithIndex.flatMap { case (s, si) =>
        (0 until 20 + rnd.nextInt(60)).map(i => (s, (si * 1000 + i).toLong))
      }
      val weights = sources.map(s => s -> (1L + rnd.nextInt(3))).toMap
      val got = Balance.balanceSources(rows.toDF("src", "id"), "src", "id", weights)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // naive mirror of the documented spec
      val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val anchor = sources.sortBy(s => (counts(s).toDouble / weights(s), s)).head
      val want = sources.flatMap { s =>
        val target = weights(s) * counts(anchor) / weights(anchor)
        rows.filter(_._1 == s)
          .sortBy { case (_, id) => (knuth(id), id) }
          .take(target.toInt)
      }.toSet
      assert(got == want, s"seed $seed weights $weights anchor $anchor")
    }
  }

  test("temperature weights flatten ratios toward uniform as τ→0; τ=1 keeps raw proportions (6 seeds)") {
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed * 71993 + 13)
      val rows = Seq(("big", 300 + rnd.nextInt(200)), ("mid", 80 + rnd.nextInt(40)),
          ("small", 20 + rnd.nextInt(10)))
        .flatMap { case (s, c) => (0 until c).map(i => (s, (s.hashCode.abs % 97) * 10000L + i)) }
      val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      def keptRatio(tau: Double): Double = {
        val kept = Balance.balanceSourcesTemperature(
            rows.toDF("src", "id"), "src", "id", tau)
          .collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.size).toMap
        kept("big").toDouble / kept("small")
      }
      val r1 = keptRatio(1.0)
      val rHalf = keptRatio(0.5)
      val r0 = keptRatio(0.0)
      val rawRatio = counts("big").toDouble / counts("small")
      assert(math.abs(r1 - rawRatio) / rawRatio < 0.05, s"seed $seed τ=1: $r1 vs raw $rawRatio")
      assert(rHalf < r1 && rHalf > 1.0, s"seed $seed τ=0.5 ratio $rHalf should sit between")
      assert(math.abs(r0 - 1.0) < 0.25, s"seed $seed τ=0 should be ~uniform, got $r0")
      // naive spec mirror at τ=0.5: exact kept sets
      val tau = 0.5
      val w = counts.map { case (s, n) => s -> math.max(1L, math.round(math.pow(n.toDouble, tau) * 1e6)) }
      val anchor = counts.keys.toSeq.sortBy(s => (counts(s).toDouble / w(s), s)).head
      val want = counts.keys.toSeq.sorted.flatMap { s =>
        val target = w(s) * counts(anchor) / w(anchor)
        rows.filter(_._1 == s).sortBy { case (_, id) => (knuth(id), id) }.take(target.toInt)
      }.toSet
      val got = Balance.balanceSourcesTemperature(rows.toDF("src", "id"), "src", "id", tau)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"seed $seed τ=0.5 exact set")
    }
  }

  test("rate-only path: kept counts near target, every survivor passes the hash rate (6 seeds)") {
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(seed * 52813 + 3)
      val rows = Seq("a", "b").flatMap { s =>
        (0 until 400).map(i => (s, (s.hashCode.abs % 7 * 10000 + i).toLong))
      }
      val weights = Map("a" -> (1L + rnd.nextInt(2)), "b" -> (1L + rnd.nextInt(2)))
      val got = Balance.balanceSources(rows.toDF("src", "id"), "src", "id",
          weights, exact = false)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val anchor = Seq("a", "b").sortBy(s => (counts(s).toDouble / weights(s), s)).head
      for (s <- Seq("a", "b")) {
        val target = weights(s) * counts(anchor) / weights(anchor)
        val kept = got.count(_._1 == s)
        val thr = BigInt(target) * D / counts(s)
        assert(got.filter(_._1 == s).forall { case (_, id) => knuth(id) < thr },
          s"seed $seed source $s: survivor fails rate threshold")
        assert(math.abs(kept - target) <= 4 * math.sqrt(target.toDouble + 1) + 2,
          s"seed $seed source $s: kept $kept vs target $target")
      }
    }
  }
}
