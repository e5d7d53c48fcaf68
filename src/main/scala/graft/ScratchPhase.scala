package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Ann
import graft.plan._

/** Throwaway phase-bisection main for optimization forensics: times each
  * phase of a composite operator with the noop sink. Not part of the
  * driver surface. `runMain graft.ScratchPhase [sfDir]`.
  */
object ScratchPhase {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.taskMetrics.executorRunTime
        val gc = i.taskMetrics.jvmGCTime
        if (ms >= 300)
          println(f"  stage ${i.stageId}%4d tasks ${i.numTasks}%3d task_ms $ms%7d gc $gc%5d ${i.name.take(70)}")
      }
    })
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // A/B the random-walk step shapes
    {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(spark, d, "events")
      val e0 = Queries.eventEdges(ev).ckpt()
      val starts = e0.filter(col("src") < 5).select(col("src").as("start")).distinct()
        .withColumn("walk_id", col("start"))
      def walkOld(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        var walk = starts.select(col("walk_id"), col("start"), col("start").as("node"), lit(0).as("step")).ckpt()
        var frontier = walk
        var s = 0
        while (s < 5 && !frontier.isEmpty) {
          val cand = frontier.join(e, frontier("node") === e("src"))
            .select(col("walk_id"), col("start"), col("dst"), (col("step") + 1).as("step"),
              xxhash64(col("walk_id"), col("step"), col("dst")).as("__h"))
          val w = Window.partitionBy(col("walk_id"), col("step")).orderBy(col("__h"), col("dst"))
          frontier = cand.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
            .select(col("walk_id"), col("start"), col("dst").as("node"), col("step"))
            .ckptLazy()
          walk = walk.union(frontier).ckptLazy()
          s += 1
        }
        walk
      }
      for (r <- 1 to 3) {
        val e = e0
        time("walk OLD window") { sink(walkOld(e)) }
        time("walk NEW minby") { sink(graft.graphs.Graphs.randomWalk(e, starts, 5)) }
      }
    }

    val emb = Tables.load(spark, d, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("vec"))
    // warm the session
    sink(corpus)

    // micro-bisect of the Lloyd assign stage
    {
      val cb0 = Ann.pqCodebooks(corpus, subspaces = 16, codes = 64, iters = 0)
      val train = corpus.select(col("id"), col("vec"))
        .withColumn("__h", xxhash64(col("id"), lit(0)))
        .orderBy("__h", "id").limit(65536).drop("__h")
        .repartition(32, col("id"))
      val sv = Ann.subvecsPublic(train, "id", 16).ckpt()
      val cbArr = cb0.groupBy("m")
        .agg(sort_array(collect_list(struct(col("code"), col("cvec")))).as("__cs"))
        .select(col("m"), transform(col("__cs"), x => x.getField("code")).as("__codes"),
          transform(col("__cs"), x => x.getField("cvec")).as("__cvecs"))
      for (r <- 1 to 2) {
        println(s"— micro rep $r —")
        val asg = sv.join(broadcast(cbArr), Seq("m"))
          .withColumn("__j", graft.functions.VectorFunctions.nearestL2Index(col("sub"), col("__cvecs")))
          .filter(col("__j") >= 0)
          .select(col("id"), col("m"),
            element_at(col("__codes"), col("__j") + 1).as("code"), col("sub"))
        time("U1 nearest-assign") { sink(asg) }
        val dims = time("U2 +posexplode avg") {
          val d = asg.select(col("m"), col("code"), posexplode(col("sub"))).toDF("m", "code", "i", "v")
            .groupBy("m", "code", "i").agg(avg("v").as("mu"))
          sink(d); d
        }
        time("U3 +collect_list sort") {
          sink(dims.groupBy("m", "code")
            .agg(transform(array_sort(collect_list(struct(col("i"), col("mu")))),
              x => x.getField("mu").cast("float")).as("cvec")))
        }
        time("NULL range-agg") {
          sink(spark.range(128000).repartition(32).groupBy((col("id") % 4096).as("k"))
            .agg(avg(col("id"))))
        }
        time("NULL explode-arr") {
          sink(sv.select(col("m"), posexplode(col("sub"))).toDF("m", "i", "v")
            .groupBy("m", "i").agg(avg("v")))
        }
        time("SEED window") {
          sink(sv.withColumn("__h", xxhash64(col("id"), lit(0), col("m")))
            .withColumn("__rk", org.apache.spark.sql.functions.row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("m").orderBy("__h", "id")))
            .filter(col("__rk") <= 64))
        }
      }
    }

    for (rep <- 1 to 2) {
      println(s"— rep $rep —")
      val cb = time("pqCodebooks") {
        val c = Ann.pqCodebooks(corpus, subspaces = 16, codes = 64); c.count(); c
      }
      val pq = time("pqTopK") {
        val p = Ann.pqTopK(corpus, queries, k = 5, subspaces = 16, codes = 64,
          refine = 8, codebooks = Some(cb)).ckpt(); p
      }
      val exact = time("bruteForceTopK") {
        Ann.bruteForceTopK(corpus, queries, k = 5).ckpt()
      }
      time("recall+intersect") {
        sink(pq.select("query_id", "id").intersect(exact.select("query_id", "id"))
          .agg(count(lit(1)).as("__nh"))
          .crossJoin(exact.agg(count(lit(1)).as("__ne")))
          .select((col("__nh") >= col("__ne") * lit(0.7)).as("ok")))
      }
      time("exactCosineFor-drift") {
        sink(pq.select(col("query_id"), col("id"), col("cosine").as("__c"))
          .join(Ann.exactCosineFor(pq.select("query_id", "id"), corpus, queries)
            .withColumnRenamed("cosine", "__e"), Seq("query_id", "id"))
          .filter(abs(col("__c") - col("__e")) > 1e-9))
      }
      time("pqEncode-check") {
        val enc = Ann.pqEncode(corpus, cb, subspaces = 16)
        sink(enc.groupBy("id").agg(count(lit(1)).as("__n")).filter(col("__n") =!= 16))
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
