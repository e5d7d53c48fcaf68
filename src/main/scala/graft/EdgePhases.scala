package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EdgePhases {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.plan._
    // warm
    Queries.eventEdges(Tables.load(spark, dir, "events")).ckpt()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $n%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val ev = Tables.load(spark, dir, "events")
    println("events rows = " + ev.count())
    t("scan only noop") { ev.select("user_id","event_type","ts","event_id").write.format("noop").mode("overwrite").save() }
    val bucketUs = 21600000000L
    val base = ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("__b", expr(s"unix_micros(ts) div ${bucketUs}L"))
    val wAsc = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"), col("__b")).orderBy(col("ts"), col("event_id"))
    val inBucket = base.withColumn("next_user", lead(col("user_id"), 1).over(wAsc))
      .filter(col("next_user").isNotNull).select(col("user_id"), col("next_user"))
    t("window pass noop") { inBucket.write.format("noop").mode("overwrite").save() }
    val full = Queries.eventEdges(ev)
    t("full no-distinct noop") { full.write.format("noop").mode("overwrite").save() }
    val e2 = t("full+ckpt") { Queries.eventEdges(ev).ckpt() }
    println("edges = " + e2.count())
    spark.stop()
  }
}
