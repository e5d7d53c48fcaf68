package graft.search

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the reference-exact FTS scorer: random tiny
  * corpora and random query ASTs, [[Fts.searchRef]]'s relational plan
  * vs an INDEPENDENT per-doc evaluator implementing
  * fts/indexing.rs:110-247 directly on token lists — literal
  * last-entry-wins tf with found-ENTRY df, And = intersect+sum,
  * Or = union+max, Not = remove, NEAR chained pairwise windows with
  * first-entry positions, summed boosters and node-level df. The
  * vocabulary contains shared prefixes so `word*` literals exercise
  * multi-term entries (largest-term tf, entry-count df) on both paths.
  */
class FtsRefFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import Fts._

  private val vocab = Vector("alpha", "alphabet", "alphax", "beta", "bet",
    "gamma", "delta", "eps")

  private def idf(n: Int, df: Double): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** (term, doc, positions) rows matching the literal, for all docs. */
  private def entries(docs: Map[Long, Seq[String]], l: Term): Seq[(String, Long, Seq[Int])] =
    for {
      (id, toks) <- docs.toSeq
      (term, occ) <- toks.zipWithIndex.groupBy(_._1).toSeq
      if (if (l.prefix) term.startsWith(l.t) else term == l.t)
    } yield (term, id, occ.map(_._2))

  private def naive(docs: Map[Long, Seq[String]], n: Int, q: Q,
                    kind: String): Map[Long, Double] = {
    def score(tf: Double, df: Double, boost: Double): Double =
      if (kind == "tf") tf * boost else tf * idf(n, df) * boost
    def eval(node: Q): Map[Long, Double] = node match {
      case t: Term =>
        val es = entries(docs, t)
        val df = es.size.toDouble
        // entry iteration is (term, doc)-ordered and the LAST insert
        // wins per doc (FxHashMap::insert) → the largest matching term
        es.groupBy(_._2).map { case (id, xs) =>
          id -> score(xs.maxBy(_._1)._3.size.toDouble, df, t.boost)
        }
      case And(qs) =>
        val ms = qs.map(eval)
        ms.map(_.keySet).reduce(_ intersect _).iterator
          .map(id => id -> ms.map(_(id)).sum).toMap
      case Or(qs) =>
        qs.map(eval).flatMap(_.toSeq).groupBy(_._1)
          .map { case (id, xs) => id -> xs.map(_._2).max }
      case Not(pos, neg) =>
        val nk = eval(neg).keySet
        eval(pos).filter { case (id, _) => !nk(id) }
      case Near(ts, dist) =>
        // per literal per doc the FIRST (smallest) matching term's
        // positions; then the chained pairwise window
        val per = ts.map(t => entries(docs, t).groupBy(_._2)
          .map { case (id, xs) => id -> xs.minBy(_._1)._3 })
        var cur: Map[Long, Seq[Int]] = per.head
        for (i <- 1 until ts.length) {
          cur = cur.flatMap { case (id, run) =>
            per(i).get(id).flatMap { ps =>
              val kept = (run.filter(p => ps.exists(c => c > p && c - p <= dist)) ++
                ps.filter(c => run.exists(p => c <= p && p - c <= dist))).distinct
              if (kept.nonEmpty) Some(id -> kept) else None
            }
          }
        }
        val df = cur.size.toDouble
        val boost = ts.map(_.boost).sum
        cur.map { case (id, run) => id -> score(run.size.toDouble, df, boost) }
    }
    eval(q)
  }

  private def randQuery(rng: scala.util.Random, depth: Int): Q = {
    def leaf(): Term =
      if (rng.nextInt(4) == 0)
        Term(Seq("alpha", "bet", "ga")(rng.nextInt(3)), prefix = true,
          boost = if (rng.nextBoolean()) 1.0 else 2.5)
      else Term(vocab(rng.nextInt(vocab.size)),
        boost = if (rng.nextInt(3) == 0) 2.5 else 1.0)
    if (depth == 0) leaf()
    else rng.nextInt(6) match {
      case 0 => And((0 until 2 + rng.nextInt(2)).map(_ => randQuery(rng, depth - 1)))
      case 1 => Or((0 until 2 + rng.nextInt(2)).map(_ => randQuery(rng, depth - 1)))
      case 2 => Not(randQuery(rng, depth - 1), randQuery(rng, depth - 1))
      case 3 => Near((0 until 2 + rng.nextInt(2)).map(_ => leaf()),
        dist = Seq(1, 3, 10)(rng.nextInt(3)))
      case _ => leaf()
    }
  }

  test("searchRef ≡ independent per-doc reference evaluator on 30 random corpora × 4 queries × both score kinds") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814L)
    for (trial <- 1 to 30) {
      val nDocs = 8 + rng.nextInt(7)
      val docs: Map[Long, Seq[String]] = (1L to nDocs.toLong).map { id =>
        id -> Seq.fill(3 + rng.nextInt(23))(vocab(rng.nextInt(vocab.size)))
      }.toMap
      val ix = Fts.Index.build(
        docs.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("id", "text"),
        "id", "text")
      for (_ <- 1 to 4; kind <- Seq("tf_idf", "tf")) {
        val q = randQuery(rng, 2)
        val got = searchRef(ix, q, kind).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val want = naive(docs, nDocs, q, kind)
        assert(got.keySet == want.keySet,
          s"trial $trial kind $kind match set mismatch for $q")
        for ((id, s) <- want)
          assert(math.abs(got(id) - s) <= 1e-9 * math.max(1.0, math.abs(s)),
            s"trial $trial kind $kind doc $id: got ${got(id)}, want $s for $q")
      }
    }
  }
}
