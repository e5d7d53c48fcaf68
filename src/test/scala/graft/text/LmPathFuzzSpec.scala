package graft.text

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of (a) the bigram-LM perplexity pipeline vs a
  * naive in-memory model trained on the same corpus (Laplace bigrams
  * over unigram contexts, unsmoothed first-token unigram), and (b) the
  * driver-side Dijkstra/Yen path rules vs a naive Dijkstra — path
  * VALIDITY and optimal cost on random weighted digraphs.
  */
class LmPathFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee")

  test("bigramPerplexity ≡ naive corpus-trained model (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 94121 + 17)
      val docs = (1L to 8L).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      }
      val got = LanguageModel.bigramPerplexity(
          docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("id", "text"),
          "id", "text", round = -1)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val uni = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = uni.values.sum.toDouble
      val v = uni.size.toDouble
      val big = docs.flatMap(_._2.sliding(2).filter(_.size == 2).map(s => (s(0), s(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      for ((id, toks) <- docs) {
        val lp1 = math.log(uni(toks.head) / n)
        val lpb = toks.sliding(2).filter(_.size == 2).map { s =>
          math.log((big((s(0), s(1))) + 1.0) / (uni(s(0)) + v))
        }.sum
        val want = math.exp(-(lp1 + lpb) / toks.size)
        assert(math.abs(got(id) - want) < 1e-9 * want, s"seed $seed doc $id")
      }
    }
  }

  test("dijkstraPaths: optimal costs match naive Dijkstra and reported paths are valid (8 seeds)") {
    for (seed <- 0 until 8) {
      val rnd = new scala.util.Random(seed * 35742 + 29)
      val n = 7 + rnd.nextInt(5)
      val es = (0 until 14 + rnd.nextInt(12)).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(9)).toDouble)
      }.distinct.filter(e => e._1 != e._2)
      val starts = Seq(rnd.nextInt(n).toLong).distinct
      val goals = Seq(rnd.nextInt(n).toLong, rnd.nextInt(n).toLong).distinct
      val got = graphs.pathsToMap(
        graft.graphs.Graphs.dijkstraPaths(
          es.toDF("src", "dst", "weight"),
          starts.toDF("start"), goals.toDF("goal")))
      // naive Dijkstra per start
      val adj = es.groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
      for (s <- starts; g <- goals) {
        val dist = scala.collection.mutable.Map(s -> 0.0)
        val done = scala.collection.mutable.Set.empty[Long]
        while (dist.keys.exists(!done(_))) {
          val u = dist.filter(kv => !done(kv._1)).minBy(_._2)._1
          done += u
          for ((vtx, w) <- adj.getOrElse(u, Nil))
            if (dist.get(vtx).forall(dist(u) + w < _)) dist(vtx) = dist(u) + w
        }
        (dist.get(g), got.get((s.toString, g.toString))) match {
          case (Some(dc), Some((gc, path))) =>
            assert(math.abs(gc - dc) < 1e-9, s"seed $seed $s→$g: cost $gc vs $dc")
            // the reported path must exist edge-by-edge and sum to cost
            val hops = path.sliding(2).filter(_.size == 2).toSeq
            val wsum = hops.map { case Seq(a, b) =>
              es.collectFirst { case (x, y, w) if x.toString == a && y.toString == b => w }
                .getOrElse(fail(s"seed $seed: path edge $a→$b not in graph"))
            }.sum
            assert(path.head == s.toString && path.last == g.toString)
            assert(math.abs(wsum - gc) < 1e-9 || path.size == 1, s"seed $seed path sum")
          case (None, None) => () // unreachable on both sides
          case other => fail(s"seed $seed $s→$g reachability mismatch: $other")
        }
      }
    }
  }

  private object graphs {
    def pathsToMap(df: org.apache.spark.sql.DataFrame)
        : Map[(String, String), (Double, Seq[String])] =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getSeq[String](3)))).toMap
  }
}
