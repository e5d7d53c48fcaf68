package graft.search

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text search: inverted index + BM25 scoring.
  *
  * The reference builds a persistent inverted index per FTS index
  * (`::fts create`; build/search cozo-core/src/fts/indexing.rs:62-298;
  * tokenizers fts/mod.rs:77-238) and scores with a BM25-ish formula.
  * Spark-first: the inverted index is a (term, doc, tf) DataFrame —
  * bucketable by term at scale so a query touches only its terms'
  * partitions; scoring is one join + groupBy.
  */
object Fts {

  /** Build the postings relation (term, id, tf) plus per-doc length. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(TF.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TF.tokenCount(col(textCol)).as("dl"))

  /** BM25 scores of all documents matching ≥1 query term.
    * Returns (id, score). k1/b are the standard Robertson parameters;
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) as in Lucene/the reference.
    */
  def searchBm25(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val index = buildIndex(docs, idCol, textCol).localCheckpoint()
    val lens = docLengths(docs, idCol, textCol).localCheckpoint()
    val n = lens.count().toDouble
    val avgdl = lens.agg(avg(col("dl"))).head().getDouble(0)
    val terms = queryTerms.map(_.toLowerCase).distinct
    val termDf = index.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(countDistinct(col("id")).as("df"))
    index.filter(col("term").isin(terms: _*))
      .join(termDf, Seq("term"))
      .join(lens, Seq("id"))
      .withColumn("idf", log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("score_t",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("id").agg(sum(col("score_t")).as("score"))
  }
}
