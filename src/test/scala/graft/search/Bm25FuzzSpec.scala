package graft.search

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the beyond-reference BM25 scorer (score_kind:
  * 'bm25') vs a naive per-doc implementation of the standard formula —
  * including PREFIX literals, whose postings must range-expand into
  * the score (a doc matched only through `word*` previously vanished
  * from the BM25 output entirely; caught by this spec).
  */
class Bm25FuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import Fts._

  private val vocab = Vector("alpha", "alphabet", "alphax", "beta", "bet",
    "gamma", "delta", "eps")

  test("bm25 search ≡ naive formula incl. prefix expansion (20 corpora × 4 queries)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 20) {
      val nDocs = 6 + rnd.nextInt(6)
      val docs: Map[Long, Seq[String]] = (1L to nDocs.toLong).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
      }.toMap
      val ix = Fts.Index.build(
        docs.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("id", "text"),
        "id", "text")
      val avgdl = docs.values.map(_.size).sum.toDouble / nDocs
      def idf(df: Double): Double = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
      for (_ <- 1 to 4) {
        val lits = (0 until 1 + rnd.nextInt(3)).map { _ =>
          if (rnd.nextInt(3) == 0)
            Term(Seq("alpha", "bet", "ga")(rnd.nextInt(3)), prefix = true)
          else Term(vocab(rnd.nextInt(vocab.size)))
        }
        val q: Q = if (lits.size == 1) lits.head else Or(lits)
        val got = search(ix, q).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        // naive: matched docs = any literal matches; per distinct
        // matching (doc, term): idf(df_term) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
        val (k1, b) = (1.2, 0.75)
        val matchTerms: Map[Long, Set[String]] = docs.map { case (id, toks) =>
          id -> toks.distinct.filter(t =>
            lits.exists(l => if (l.prefix) t.startsWith(l.t) else t == l.t)).toSet
        }
        val dfT: Map[String, Int] = matchTerms.values.flatten
          .groupBy(identity).view.mapValues(_ => 0).toMap.keys
          .map(t => t -> docs.count(_._2.contains(t))).toMap
        val want = matchTerms.collect { case (id, ts) if ts.nonEmpty =>
          val dl = docs(id).size.toDouble
          id -> ts.toSeq.map { t =>
            val tf = docs(id).count(_ == t).toDouble
            idf(dfT(t)) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
          }.sum
        }
        assert(got.keySet == want.keySet, s"trial $trial q $q")
        for ((id, s) <- want)
          assert(math.abs(got(id) - s) <= 1e-9 * math.max(1.0, s),
            s"trial $trial doc $id: ${got(id)} vs $s for $q")
      }
    }
  }
}
