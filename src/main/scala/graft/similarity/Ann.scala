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

  /** Approximate top-k: candidates from a multi-table hyperplane-LSH
    * bucket join — `tables` independent `planes`-bit sign families
    * computed in ONE pass over each side (Dedup.hyperplaneBuckets), one
    * equi-join on (table, bucket), then exact cosine re-rank of the
    * candidate set only. Each table is seeded independently, so recall
    * compounds as 1-(1-p^planes)^tables.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 12, tables: Int = 4): DataFrame = {
    val bkC = Dedup.hyperplaneBuckets(corpus, "id", "vec", planes, tables)
      .join(corpus.select(col("id"), col("vec")), Seq("id"))
    val bkQ = Dedup.hyperplaneBuckets(queries, "query_id", "vec", planes, tables)
      .withColumnRenamed("id", "query_id")
      .join(queries.select(col("query_id"), col("vec").as("qvec")), Seq("query_id"))
    val cand = bkQ.join(bkC, Seq("table", "bucket"))
      .select("query_id", "qvec", "id", "vec")
      .dropDuplicates("query_id", "id")
      .filter(col("query_id") =!= col("id"))
    val scored = cand.withColumn("cosine", VF.cosineSimilarity(col("qvec"), col("vec")))
      .select("query_id", "id", "cosine")
    TopK.perGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("id").asc), k, rankCol = Some("rank"))
  }
}
