package graft.streaming

import graft.SparkFixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedStats aggregates a micro-batch stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val agg = Streaming.windowedStats(df, "ts", "user_id",
      window = "10 minutes", slide = "10 minutes", watermark = "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_stats")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 00:01:00"), 1L, 2.0),
        (ts("2024-01-01 00:02:00"), 1L, 3.0),
        (ts("2024-01-01 00:11:00"), 1L, 5.0),
        (ts("2024-01-01 00:03:00"), 2L, 7.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, cnt, sum_value FROM win_stats ORDER BY user_id, cnt")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows.contains((1L, 2L, 5.0))) // first window for user 1
      assert(rows.contains((1L, 1L, 5.0))) // second window
      assert(rows.contains((2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("streamingDedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "id", "payload")
    val deduped = Streaming.streamingDedup(df, "ts", Seq("id"), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), 1L, "a"),
        (ts("2024-01-01 00:00:30"), 1L, "a-dup"),
        (ts("2024-01-01 00:01:00"), 2L, "b"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 00:02:00"), 2L, "b-dup"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM dedup_stream").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("intoRelation puts micro-batches through the trigger/callback path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val db = new graft.lang.CozoDb(spark)
    db.registerTable("live", Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"))
    db.registerTable("audit", Seq.empty[(Long, String)].toDF("id", "v"), Seq("id"))
    db.run(
      """::set_triggers live
        |on put {
        |  ?[id, v] := _new[id, v]
        |  :put audit {id}
        |}""".stripMargin)
    var callbackRows = 0L
    db.registerCallback("live")((op, nw, _) => if (op == "put") callbackRows += nw.count())
    val input = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val q = Streaming.intoRelation(db, "live", input.toDF().toDF("id", "v"), dir)
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      assert(db.relation("live").count() == 3) // upsert by key
      assert(db.relation("audit").count() == 3) // trigger mirrored every key
      assert(callbackRows == 4L) // two batches of two rows each
    } finally q.stop()
  }

  test("stream/batch parity: windowedStats over a stream equals the batch groupBy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 200).map(i =>
      (ts(f"2024-01-01 00:${i / 10}%02d:${i % 10}0"), (i % 7).toLong, i.toDouble))
    val input = MemoryStream[(Timestamp, Long, Double)]
    val agg = Streaming.windowedStats(input.toDF().toDF("ts", "user_id", "value"),
      "ts", "user_id", window = "5 minutes", slide = "5 minutes", watermark = "1 minute")
    val q = agg.writeStream.format("memory").queryName("parity_win")
      .outputMode("complete").start()
    try {
      data.grouped(37).foreach { batch => input.addData(batch); q.processAllAvailable() }
      val streamed = spark.sql("SELECT * FROM parity_win")
        .select(col("window.start"), col("user_id"), col("cnt"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = data.toDF("ts", "user_id", "value")
        .groupBy(window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
        .select(col("window.start"), col("user_id"), col("cnt"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("decontaminateStream flags streamed docs sharing n-grams with the static eval set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val eval = Seq((100L, "the quick brown fox jumps")).toDF("id", "text")
    val input = MemoryStream[(Long, String)]
    val flagged = Streaming.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), "text", eval, "text", n = 5)
    val q = flagged.writeStream.format("memory").queryName("decontam_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "here the quick brown fox jumps over everything"),
        (2L, "a completely unrelated document"),
        (3L, ""))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, overlap_ngrams, contaminated FROM decontam_stream")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(rows(1L) == ((1L, true)))
      assert(rows(2L) == ((0L, false)))
      assert(rows(3L) == ((0L, false))) // empty text: no shingles, no crash
    } finally q.stop()
  }

  test("stream/batch parity: decontaminateStream equals the batch ngramOverlap report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val eval = docs.filter(col("doc_id") % 11 === 0)
    val train = docs.filter(col("doc_id") % 11 =!= 0)
    val trainRows = train.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val flagged = Streaming.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), "text", eval, "text", n = 5)
    val q = flagged.writeStream.format("memory").queryName("decontam_parity")
      .outputMode("append").start()
    try {
      trainRows.grouped(100).foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.sql(
        "SELECT doc_id, overlap_ngrams FROM decontam_parity WHERE contaminated")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.pipeline.Decontaminate.ngramOverlap(
          train, "doc_id", "text", eval, "doc_id", "text", n = 5)
        .select(col("train_id"), col("overlap_ngrams"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("nearDedupStream suppresses near-dups against history and within a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val dir = java.nio.file.Files.createTempDirectory("neardedup").toString
    val q = Streaming.nearDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      sink = b => out.synchronized { out ++= b.select("doc_id").collect().map(_.getLong(0)) })
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"), // in-batch twin
        (3L, "completely different words appear in this unrelated document here"))
      q.processAllAvailable()
      assert(out.sorted == Seq(1L, 3L), s"in-batch twin suppressed, got $out")
      input.addData(
        (4L, "the quick brown fox jumps over the lazy dog again and again"), // history twin
        (5L, "yet another entirely distinct piece of text nothing shares"),
        (6L, "")) // shingle-less: passes through
      q.processAllAvailable()
      assert(out.sorted == Seq(1L, 3L, 5L, 6L), s"history twin suppressed, got $out")
    } finally q.stop()
  }

  test("nearDedupStream recovers accepted-band history across a query restart (ADVICE r6)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val dir = java.nio.file.Files.createTempDirectory("neardedup_restart").toString
    def sink(b: org.apache.spark.sql.DataFrame): Unit =
      out.synchronized { out ++= b.select("doc_id").collect().map(_.getLong(0)) }
    val q1 = Streaming.nearDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, sink)
    try {
      input.addData((1L, "the quick brown fox jumps over the lazy dog again and again"))
      q1.processAllAvailable()
      assert(out.sorted == Seq(1L))
    } finally q1.stop()
    // restart from the SAME checkpoint: the accepted-band state must
    // come back from the durable parquet deltas, not a driver-side var
    val q2 = Streaming.nearDedupStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, sink)
    try {
      input.addData(
        (2L, "the quick brown fox jumps over the lazy dog again and again"), // pre-restart twin
        (3L, "completely different words appear in this unrelated document here"))
      q2.processAllAvailable()
      assert(out.sorted == Seq(1L, 3L), s"pre-restart twin must stay suppressed, got $out")
    } finally q2.stop()
  }

  test("qualityGate scores and keeps per-row on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val gated = Streaming.qualityGate(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", minQuality = 0.5)
    val q = gated.writeStream.format("memory").queryName("quality_gate")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "this is a perfectly ordinary sentence with plenty of common words in it"),
        (2L, "!!! ### $$$ %%%"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, keep FROM quality_gate")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows(1L) && !rows(2L))
    } finally q.stop()
  }

  test("sessionize tracks per-key state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val sessions = Streaming.sessionize(input.toDS(), gapSecs = 3600)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      input.addData((1L, 1000L), (1L, 1060L), (2L, 2000L))
      q.processAllAvailable()
      input.addData((1L, 1120L))
      q.processAllAvailable()
      val byKey = spark.sql("SELECT key, max(count) AS c, max(durationSecs) AS d FROM sessions GROUP BY key")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(byKey(1L) == ((3L, 120L))) // three events spanning 120s
      assert(byKey(2L)._1 == 1L)
    } finally q.stop()
  }
}
