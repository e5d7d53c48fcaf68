import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("rel_scan_filter", "rel_join_revenue", "rel_agg_q1", "dedup_minhash", "ann_knn", "text_stats")) {
      println(s"===== $q =====")
      println(graft.Queries.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(3000))
    }
    spark.stop()
  }
}
