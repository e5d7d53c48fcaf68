package graft

import org.scalatest.funsuite.AnyFunSuite

/** The five driver queries whose operator output no SQL engine can
  * reproduce (seeded LSH, louvain, pseudo-random walk, simhash,
  * fake-decode KNN) emit driver-checked invariant relations instead —
  * every row must come back (name, true). The DuckDB oracle compares
  * them against the constant truth table; this spec asserts the same
  * thing locally, at whichever scale `GRAFT_SF_DIR` points to
  * (default sf0.001 for speed).
  */
class InvariantQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")

  for (q <- Seq("graph_louvain", "graph_walk", "dedup_simhash", "ann_lsh",
      "mm_features_knn", "graph_betweenness", "ann_pq", "ann_hnsw",
      "ann_hnsw_stream", "mm_decode", "dedup_semantic", "text_bpe"))
    test(s"$q invariants all hold at $dir") {
      val rows = Queries.queries(q)(spark, dir).collect()
      assert(rows.nonEmpty)
      val failed = rows.filter(r => r.isNullAt(1) || !r.getBoolean(1)).map(_.getString(0))
      assert(failed.isEmpty, s"failed invariants: ${failed.mkString(", ")}")
    }
}
