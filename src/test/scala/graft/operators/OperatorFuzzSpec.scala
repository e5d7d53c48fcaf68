package graft.operators

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the temporal operators vs naive nested-loop
  * evaluation: as-of join (both directions × inner/left × the salted
  * bucket plan), interval containment join (bucketed + the
  * giant-interval broadcast path), and sessionize (gap partition
  * equality). These operators' boundary rules — inclusive ties,
  * greatest-tie-break, half-open intervals — are exactly where
  * window/bucket plans drift from the spec.
  */
class OperatorFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("asOfJoin ≡ naive per-row scan: directions × join types × salted plan (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 24001 + 9)
      val lefts = (0 until 15 + rnd.nextInt(15)).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, i.toLong)
      }.distinct
      val rights = (0 until 15 + rnd.nextInt(15)).map { _ =>
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, rnd.nextInt(100).toLong)
      }.distinct
      val lDf = lefts.toDF("k", "lts", "lid")
      val rDf = rights.toDF("k", "rts", "pay")
      for (dir <- Seq("backward", "forward"); jt <- Seq("inner", "left")) {
        def naivePick(k: Long, lts: Long): Option[Long] = {
          val cand =
            if (dir == "backward") rights.filter(r => r._1 == k && r._2 <= lts)
            else rights.filter(r => r._1 == k && r._2 >= lts)
          if (cand.isEmpty) None
          else {
            val bestTs = if (dir == "backward") cand.map(_._2).max else cand.map(_._2).min
            Some(cand.filter(_._2 == bestTs).map(_._3).max) // greatest tie-break
          }
        }
        val want: Set[(Long, Long, Long, Option[Long])] = lefts.flatMap { case (k, lts, lid) =>
          naivePick(k, lts) match {
            case Some(p) => Some((k, lts, lid, Some(p)))
            case None => if (jt == "left") Some((k, lts, lid, None)) else None
          }
        }.toSet
        for (bucket <- Seq(None, Some(7L))) {
          val got = AsOfJoin.asOfJoin(lDf, rDf, Seq("k"), "lts", "rts",
              tieBreak = Seq("pay"), joinType = jt, direction = dir,
              bucketWidthMicros = bucket)
            .select("k", "lts", "lid", "pay").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
          assert(got == want, s"seed $seed dir $dir jt $jt bucket $bucket")
        }
      }
    }
  }

  test("intervalJoin ≡ naive containment scan incl. giant-interval broadcast path (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 50261 + 77)
      val points = (0 until 20 + rnd.nextInt(15)).map { i =>
        (rnd.nextInt(60).toLong, i.toLong)
      }.distinct
      val intervals = (0 until 8 + rnd.nextInt(8)).map { i =>
        val s = rnd.nextInt(55).toLong
        // mix of short intervals and giants exceeding 4 buckets × W=2
        val len = if (rnd.nextInt(4) == 0) 10 + rnd.nextInt(30) else rnd.nextInt(6)
        (s, s + len, (1000 + i).toLong)
      }
      val got = RangeJoin.intervalJoin(
          points.toDF("v", "pid"), "v",
          intervals.toDF("s", "e", "iid"), "s", "e",
          bucketWidthMicros = 2L, maxBucketsPerInterval = 4)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (v, pid) <- points
        (s, e, iid) <- intervals
        if v >= s && v < e // half-open
      } yield (pid, iid)).toSet
      assert(got == want, s"seed $seed")
    }
  }

  test("sessionize epoch-salted path splits at gaps OR epoch boundaries, exactly (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 84211 + 31)
      val g = (2 + rnd.nextInt(4)).toLong
      val epoch = g + 3 + rnd.nextInt(10)
      val events = (for (k <- 0 until 2) yield {
        rnd.shuffle((0 until 60).toList).take(10 + rnd.nextInt(12))
          .map(t => (k.toLong, t.toLong))
      }).flatten
      val got = graft.pipeline.Sessionize.sessionize(
          events.toDF("k", "ts"), Seq("k"), "ts", gapMicros = g,
          epochMicros = Some(epoch))
        .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSet
      // naive: per key sort; break where delta > G OR epoch changes
      val want = events.groupBy(_._1).values.flatMap { es =>
        val sorted = es.map(_._2).sorted
        val groups = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(sorted.head))
        for (Seq(a, b) <- sorted.sliding(2) if sorted.size > 1)
          if (b - a > g || b / epoch != a / epoch)
            groups += scala.collection.mutable.ArrayBuffer(b)
          else groups.last += b
        groups.map(_.toSet)
      }.toSet
      assert(got == want, s"seed $seed gap $g epoch $epoch")
    }
  }

  test("sessionize partitions each key's events at gaps > G exactly like a naive split (10 seeds)") {
    for (seed <- 0 until 10) {
      val rnd = new scala.util.Random(seed * 11939 + 5)
      val g = (2 + rnd.nextInt(6)).toLong
      val events = (for (k <- 0 until 3) yield {
        val ts = rnd.shuffle((0 until 50).toList).take(8 + rnd.nextInt(10))
        ts.map(t => (k.toLong, t.toLong))
      }).flatten
      val got = graft.pipeline.Sessionize.sessionize(
          events.toDF("k", "ts"), Seq("k"), "ts", gapMicros = g)
        .collect().map(r => (r.getLong(0), r.getString(2)) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).values.toSet
      // naive: sort per key, break where delta > G
      val want = events.groupBy(_._1).values.flatMap { es =>
        val sorted = es.map(_._2).sorted
        val groups = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer(sorted.head))
        for (Seq(a, b) <- sorted.sliding(2) if sorted.size > 1)
          if (b - a > g) groups += scala.collection.mutable.ArrayBuffer(b)
          else groups.last += b
        groups.map(_.toSet)
      }.toSet
      assert(got == want, s"seed $seed gap $g")
    }
  }
}
