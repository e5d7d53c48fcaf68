package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scratch harness for plan/perf attribution at sf0.1 (enable with
  * GRAFT_SCRATCH=1) — not part of the regular suite. */
class PlanScratchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val on = sys.env.contains("GRAFT_SCRATCH")
  private val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")

  test("attribute rel_agg_q1 cost") {
    assume(on)
    val li = Tables.load(spark, dir, "lineitem")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then measure twice
      df.write.format("noop").mode("overwrite").save()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("full (with count_distinct)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"),
          count_distinct(col("l_orderkey")).as("n_orders"))
    }
    time("no distinct") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
    }
    time("distinct only") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count_distinct(col("l_orderkey")).as("n_orders"))
    }
    time("scan only") { li.select("l_returnflag", "l_quantity") }
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(count_distinct(col("l_orderkey")).as("n_orders"))
      .explain("formatted")
  }

  test("attribute text_novelty cost") {
    assume(on)
    import graft.functions.{TextFunctions => TF}
    import org.apache.spark.sql.graftbridge.ListenerBridge
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val c = ListenerBridge.measure(spark.sparkContext, s"scratch-$name-$i") {
          df.write.format("noop").mode("overwrite").save()
        }
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s  $c")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
    }
    val dp = graft.plan.Parallelism.ensureIngestParallelism(docs, Seq(col("doc_id")))
    time("tokens only") { dp.select(TF.tokens(col("text")).as("t")) }
    time("shingle arrays (no hash)") { dp.select(TF.wordShingles(col("text"), 6).as("sh")) }
    time("shingle arrays hashed") {
      dp.select(transform(TF.wordShingles(col("text"), 6), s => xxhash64(s)).as("sh")) }
    time("explode + df agg") {
      dp.select(col("doc_id"), explode(transform(TF.wordShingles(col("text"), 6), s => xxhash64(s))).as("s"))
        .groupBy("s").agg(count(lit(1)).as("df"), min("doc_id").as("o")) }
    time("full novelty") {
      graft.text.TextAnalysis.novelty(docs, "doc_id", "text", n = 6) }
    def shingled = dp.select(col("doc_id").as("id"),
      transform(TF.wordShingles(col("text"), 6), s => xxhash64(s)).as("__sh"))
      .filter(size(col("__sh")) >= 1)
    time("new shape, no ckpt") {
      val withSh = shingled
      val novel = withSh.select(col("id"), explode(col("__sh")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("__df"), min(col("id")).as("__owner"))
        .filter(col("__df") === 1)
        .groupBy(col("__owner").as("id"))
        .agg(count(lit(1)).as("novel_shingles"))
      withSh.select(col("id"), size(col("__sh")).cast("long").as("n_shingles"))
        .join(novel, Seq("id"), "left")
        .withColumn("novel_shingles", coalesce(col("novel_shingles"), lit(0L)))
        .withColumn("novelty",
          round(col("novel_shingles").cast("double") / col("n_shingles"), 6))
    }
    locally {
      import graft.plan._
      import org.apache.spark.sql.graftbridge.ListenerBridge
      val withSh = shingled.ckptLazy()
      def step(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val c = ListenerBridge.measure(spark.sparkContext, s"scratch-step-$name") {
          df.write.format("noop").mode("overwrite").save()
        }
        println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s  $c")
      }
      step("withSh materialize")(withSh)
      val novel = withSh.select(col("id"), explode(col("__sh")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("__df"), min(col("id")).as("__owner"))
        .filter(col("__df") === 1)
        .groupBy(col("__owner").as("id"))
        .agg(count(lit(1)).as("novel_shingles"))
      step("novel branch from ckpt")(novel)
      step("totals join from ckpt")(
        withSh.select(col("id"), size(col("__sh")).cast("long").as("n_shingles"))
          .join(novel, Seq("id"), "left"))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    time("driver lambda text_novelty") {
      Queries.queries("text_novelty")(spark, dir)
    }
    locally {
      import org.apache.spark.sql.graftbridge.ListenerBridge
      val stageLog = new scala.collection.mutable.ArrayBuffer[String]()
      val sl = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          stageLog += s"stage ${si.stageId} '${si.name.take(60)}' tasks=${si.numTasks} " +
            f"runTime=${si.taskMetrics.executorRunTime / 1000.0}%.1fs " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.1fs"
        }
      }
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      var nv: org.apache.spark.sql.DataFrame = null
      val c0 = ListenerBridge.measure(spark.sparkContext, "scratch-nv-construct") {
        nv = graft.text.TextAnalysis.novelty(docs, "doc_id", "text", n = 6)
      }
      println(f"novelty CONSTRUCT (incl eager ckpt): ${(System.nanoTime() - t0) / 1e9}%.3f s  $c0")
      spark.sparkContext.removeSparkListener(sl)
      Thread.sleep(500)
      stageLog.foreach(println)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
        println(s"persisted rdd $id: ${r.getNumPartitions} partitions") }
      val t1 = System.nanoTime()
      val c1 = ListenerBridge.measure(spark.sparkContext, "scratch-nv-act1") {
        nv.write.format("noop").mode("overwrite").save()
      }
      println(f"novelty ACTION 1: ${(System.nanoTime() - t1) / 1e9}%.3f s  $c1")
      val t2 = System.nanoTime()
      val c2 = ListenerBridge.measure(spark.sparkContext, "scratch-nv-act2") {
        nv.write.format("noop").mode("overwrite").save()
      }
      println(f"novelty ACTION 2: ${(System.nanoTime() - t2) / 1e9}%.3f s  $c2")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    time("old shape (freq join-back)") {
      val sh = dp.select(col("doc_id").as("id"),
        explode(transform(TF.wordShingles(col("text"), 6), s => xxhash64(s))).as("s"))
      val freq = sh.groupBy("s").agg(count(lit(1)).as("__df"))
      sh.join(freq, Seq("s"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("__df") === 1, 1L).otherwise(0L)).as("novel_shingles"))
        .withColumn("novelty",
          round(col("novel_shingles").cast("double") / col("n_shingles"), 6))
    }
  }
}
