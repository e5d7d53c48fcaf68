package graft.pipeline

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential fuzz of the distributed prefix-sum packers vs a naive
  * sequential scan: packByBudget's shard assignment is a pure function
  * of the id-ordered weight prefix sum, so any disagreement with the
  * naive single-threaded cumsum exposes a partition-boundary or
  * offset-credit bug in the two-level plan. packSequences additionally
  * checks the chunk split arithmetic. splitByGroup fuzzes the
  * leakage-free invariant on random group shapes.
  */
class ShardingFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("packByBudget ≡ naive id-ordered prefix-sum sharding (10 seeds × varied partitions)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 4019 + 3)
      val rows = (1L to (40 + rnd.nextInt(60)).toLong).map { id =>
        (id, (1 + rnd.nextInt(50)).toLong)
      }
      val budget = (20 + rnd.nextInt(100)).toLong
      val parts = 1 + rnd.nextInt(7)
      val got = Sharding.packByBudget(rows.toDF("id", "w"), "id", "w", budget, numParts = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      var acc = 0L
      val want = rows.sortBy(_._1).map { case (id, w) =>
        val s = acc / budget; acc += w; id -> s
      }.toMap
      assert(got == want, s"seed $seed budget $budget parts $parts")
    }
  }

  test("packSequences ≡ naive chunk-then-pack (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 6871 + 13)
      val rows = (1L to (15 + rnd.nextInt(25)).toLong).map { id =>
        (id, rnd.nextInt(120).toLong) // includes zero-weight docs (dropped)
      }
      val maxLen = (5 + rnd.nextInt(20)).toLong
      val budget = (15 + rnd.nextInt(60)).toLong
      val got = Sharding.packSequences(rows.toDF("id", "w"), "id", "w",
          maxLen, budget, numParts = 1 + rnd.nextInt(5))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
      val chunks = rows.filter(_._2 > 0).sortBy(_._1).flatMap { case (id, w) =>
        val n = ((w + maxLen - 1) / maxLen).toInt
        (0 until n).map(i => (id, i.toLong, math.min(maxLen, w - i * maxLen)))
      }
      var acc = 0L
      val want = chunks.map { case (id, ci, cw) =>
        val s = acc / budget; acc += cw; (id, ci) -> ((cw, s))
      }.toMap
      assert(got == want, s"seed $seed maxLen $maxLen budget $budget")
    }
  }

  test("percentileCut exact path ≡ naive interpolated percentile per group (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 15881 + 7)
      val rows = (for (g <- Seq("a", "b", "c"); i <- 0 until 5 + rnd.nextInt(20))
        yield (g, i, rnd.nextInt(1000) / 10.0)).toSeq
      val q = Seq(0.0, 0.25, 0.5, 0.9, 1.0)(rnd.nextInt(5))
      val got = Sampling.percentileCut(rows.toDF("grp", "id", "score"),
          "grp", "score", q, exact = true)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getDouble(3), r.getBoolean(4)))).toMap
      // naive: linear-interpolated percentile (Spark `percentile` semantics)
      val thr = rows.groupBy(_._1).view.mapValues { rs =>
        val s = rs.map(_._3).sorted
        val pos = q * (s.size - 1)
        val lo = s(pos.toInt)
        val hi = s(math.min(pos.toInt + 1, s.size - 1))
        lo + (pos - pos.toInt) * (hi - lo)
      }.toMap
      for ((g, id, sc) <- rows) {
        val (gthr, gkeep) = got((g, id))
        assert(math.abs(gthr - thr(g)) < 1e-9, s"seed $seed group $g: $gthr vs ${thr(g)}")
        assert(gkeep == (sc >= gthr), s"seed $seed row ($g,$id)")
      }
    }
  }

  test("splitByGroup never straddles a group across splits (8 seeds, both hash families)") {
    for (seed <- 0 until 8; portable <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed * 9109 + 41)
      val rows = (1 to 120).map { i =>
        (i.toLong, s"g${rnd.nextInt(12)}")
      }
      val r = Sampling.splitByGroup(rows.toDF("id", "grp"), "grp",
          trainPct = 60, valPct = 20, portable = portable)
        .collect().map(x => (x.getString(1), x.getString(2)))
      val byGroup = r.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      assert(byGroup.values.forall(_.size == 1),
        s"seed $seed portable $portable: straddling groups ${byGroup.filter(_._2.size > 1).keys}")
      assert(r.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    }
  }
}
