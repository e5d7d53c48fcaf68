package graft.similarity

import graft.dedup.Dedup
import graft.functions.{VectorFunctions => VF}
import graft.operators.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns.
  *
  * The reference's vector search is a per-probe HNSW walk
  * (cozo-core/src/runtime/hnsw.rs:869-1019, surfaced as `HnswSearchRA`
  * query/ra.rs:1068-1122). HNSW is a single-node pointer structure and
  * does not survive a 1000-executor cluster; the Spark-native shapes
  * are:
  *   - brute-force: broadcast the (small) query set against the corpus
  *     scan, codegen'd cosine kernel, per-query top-k via window — exact,
  *     one pass over the corpus, no shuffle of the corpus itself;
  *   - LSH-bucketed: hyperplane sign buckets prefilter candidates, then
  *     exact re-rank — approximate, corpus-side work drops to the
  *     collision set (the 100 TB path).
  */
object Ann {

  /** Exact top-k cosine neighbors for each query row.
    * queries: (query_id, vec); corpus: (id, vec).
    * Returns (query_id, id, cosine, rank), self-match excluded when ids
    * coincide.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = queries.select(col("query_id"), col("vec").as("qvec"))
      .hint("broadcast")
      .crossJoin(corpus.select(col("id"), col("vec")))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", VF.cosineSimilarity(col("qvec"), col("vec")))
      .select("query_id", "id", "cosine")
    TopK.perGroup(joined, Seq("query_id"),
      Seq(col("cosine").desc, col("id").asc), k, rankCol = Some("rank"))
  }

  /** Approximate top-k: candidates from multi-probe hyperplane-LSH
    * bucket join (several independent `tables` of `planes`-bit
    * signatures, unioned), exact cosine re-rank of candidates only.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 12, tables: Int = 4): DataFrame = {
    val cand = (0 until tables).map { t =>
      val sigC = corpus.withColumn("bucket",
        Dedup.hyperplaneSignature(col("vec"), planes) + lit(t.toLong << 32))
      val sigQ = queries.withColumn("bucket",
        Dedup.hyperplaneSignature(col("vec"), planes) + lit(t.toLong << 32))
      sigQ.select(col("query_id"), col("vec").as("qvec"), col("bucket"))
        .join(sigC.select(col("id"), col("vec"), col("bucket")), Seq("bucket"))
        .select("query_id", "qvec", "id", "vec")
    }.reduce(_ union _).dropDuplicates("query_id", "id")
      .filter(col("query_id") =!= col("id"))
    val scored = cand.withColumn("cosine", VF.cosineSimilarity(col("qvec"), col("vec")))
      .select("query_id", "id", "cosine")
    TopK.perGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("id").asc), k, rankCol = Some("rank"))
  }
}
