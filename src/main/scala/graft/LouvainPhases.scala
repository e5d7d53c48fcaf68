package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graphs.Graphs
import graft.plan._
object LouvainPhases {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    Queries.queries("graph_louvain")(spark, dir).write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $n%-18s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val e = t("eventEdges+ckpt") { Queries.eventEdges(Tables.load(spark, dir, "events")).ckpt() }
    val und = t("und+ckpt") { Graphs.undirectedWeighted(e).ckpt() }
    val louv = t("louvain") { Graphs.louvainOnUnd(und, maxOuter = 2, maxInner = 5) }
    val lp = t("labelprop") { Graphs.labelPropagationOnUnd(und.select("src", "dst")) }
    t("louv force") { louv.write.format("noop").mode("overwrite").save() }
    t("lp force") { lp.write.format("noop").mode("overwrite").save() }
    val nodesDf = e.select(col("src").as("node")).unionByName(e.select(col("dst").as("node"))).distinct()
    val tagged = louv.select(col("node"), col("community").as("comm"), lit("louv").as("tag"))
      .unionByName(lp.select(col("node"), col("label").as("comm"), lit("lp").as("tag")))
      .unionByName(nodesDf.select(col("node"), col("node").as("comm"), lit("single").as("tag")))
    val qByTag = t("qByTag build") { Graphs.modularityByTag(und, tagged).ckptLazy() }
    t("qByTag force") { qByTag.write.format("noop").mode("overwrite").save() }
    t("full query") { Queries.queries("graph_louvain")(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
