package graft.search

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Differential verification of [[Fts.searchMany]] (the stream-probe
  * batched BM25 plan): for a seed-fixed pool of random queries —
  * term bags, explicit OR chains, unknown terms, near-empty strings —
  * the batch answer must equal the per-query [[Fts.search]] loop,
  * which evaluates through a DIFFERENT code path (matchSet semi-joins
  * + per-query scoring vs one conjunct-counted join). k is set above
  * the corpus size so ranking cannot mask a scoring difference. */
class FtsStreamFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("searchMany ≡ per-query search for 40 random flat queries (full match sets, exact scores)") {
    import spark.implicits._
    val pool = Vector("spark", "hash", "join", "merge", "scan", "shuffle",
      "sort", "filter", "codegen", "columnar", "vector", "page")
    val rng = new scala.util.Random(42)
    val docs = (0 until 90).map { i =>
      val n = 3 + rng.nextInt(12)
      (i.toLong, Seq.fill(n)(pool(rng.nextInt(pool.length))).mkString(" "))
    }.toDF("id", "text")
    val ix = Fts.Index.build(docs, "id", "text")
    val queries = (0 until 40).map { _ =>
      val n = 1 + rng.nextInt(3)
      val ts = Seq.fill(n)(
        if (rng.nextInt(10) == 0) "zzz_unknown" else pool(rng.nextInt(pool.length)))
      if (rng.nextBoolean()) ts.mkString(" ") else ts.mkString(" OR ")
    } :+ "zzz_unknown" :+ "spark spark"
    // both scorers: the reference tf·idf (batch vs searchRef) and the
    // beyond-reference BM25 (batch vs the legacy per-query path)
    for (kind <- Seq("tf_idf", "bm25")) {
      val batch = Fts.searchMany(ix, queries, k = 10000, scoreKind = kind)
        .select(col("query"), col("id"), round(col("score"), 9).as("score"))
        .collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet).toMap
      for (q <- queries.distinct) {
        val ref =
          if (kind == "bm25") Fts.search(ix, Fts.parseQuery(q))
          else Fts.searchRef(ix, Fts.parseQuery(q))
        val loop = ref
          .select(col("id"), round(col("score"), 9).as("score"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
        assert(batch.getOrElse(q, Set.empty) == loop, s"kind $kind query '$q'")
      }
    }
  }
}
