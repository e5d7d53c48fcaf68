package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling (pipeline/Dsir.scala): the distributed
  * estimator is checked against a from-scratch driver-side Scala
  * reference (own tokenizer, own md5 bucketing, own smoothing/log
  * arithmetic — shares no code with the operator), plus the semantic
  * property the method exists for (target-like documents outrank the
  * rest) and Gumbel-top-k determinism.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // ——— independent reference implementation (driver-side Scala) ———
  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
  private def refGrams(text: String): Seq[String] = {
    val t = refTokens(text)
    t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
  }
  private def refBucket(g: String, buckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets
  }
  private def refWeights(raw: Seq[(Long, String)], tgt: Seq[(Long, String)],
                         buckets: Int): Map[Long, (Long, Double)] = {
    val rawB = raw.map { case (id, t) => id -> refGrams(t).map(refBucket(_, buckets)) }
    val tgtB = tgt.flatMap { case (_, t) => refGrams(t).map(refBucket(_, buckets)) }
    val cr = rawB.flatMap(_._2).groupBy(identity).map { case (b, v) => b -> v.size }
    val ct = tgtB.groupBy(identity).map { case (b, v) => b -> v.size }
    val nr = rawB.map(_._2.size).sum.toDouble
    val nt = tgtB.size.toDouble
    rawB.filter(_._2.nonEmpty).map { case (id, bs) =>
      val lw = bs.map { b =>
        math.log(ct.getOrElse(b, 0) + 1.0) - math.log(nt + buckets) -
          math.log(cr(b) + 1.0) + math.log(nr + buckets)
      }.sum
      id -> (bs.size.toLong, lw)
    }.toMap
  }

  test("importanceWeights matches the independent reference on real docs") {
    val raw = docs.filter(col("doc_id") % 7 =!= 0)
    val tgt = docs.filter(col("doc_id") % 7 === 0)
    val got = Dsir.importanceWeights(raw, "doc_id", "text", tgt, "doc_id", "text",
        buckets = 997, round = -1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rawL = raw.select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val tgtL = tgt.select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = refWeights(rawL, tgtL, 997)
    assert(got.keySet == want.keySet)
    for ((id, (n, lw)) <- want) {
      assert(got(id)._1 == n, s"n_grams of $id")
      assert(math.abs(got(id)._2 - lw) < 1e-8, s"logw of $id: got ${got(id)._2}, want $lw")
    }
  }

  test("target-like documents outrank the rest") {
    // target = half the corpus; raw = everything. The raw docs that ARE
    // target members must average a higher weight than non-members —
    // the selection signal DSIR exists to produce.
    val tgt = docs.filter(col("doc_id") % 2 === 0)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", tgt, "doc_id", "text")
    val Array(inT, outT) = w
      .groupBy((col("doc_id") % 2 === 0).as("m")).agg(avg("logw").as("a"))
      .orderBy(col("m").desc).collect().map(_.getDouble(1))
    assert(inT > outT, s"member avg $inT should beat non-member avg $outT")
  }

  test("resampleTopK: deterministic, k rows, temperature→0 is plain top-k") {
    val tgt = docs.filter(col("doc_id") % 5 === 0)
    val w = Dsir.importanceWeights(docs, "doc_id", "text", tgt, "doc_id", "text").cache()
    try {
      val a = Dsir.resampleTopK(w, "doc_id", 40).collect().map(_.getLong(0)).toSeq
      val b = Dsir.resampleTopK(w, "doc_id", 40).collect().map(_.getLong(0)).toSeq
      assert(a == b, "same draw on every run")
      assert(a.size == 40 && a.distinct.size == 40)
      val greedy = Dsir.resampleTopK(w, "doc_id", 40, temperature = 0).collect().map(_.getLong(0)).toSet
      val byW = w.orderBy(col("logw").desc, col("doc_id")).limit(40)
        .collect().map(_.getLong(0)).toSet
      assert(greedy == byW, "t=0 degrades to plain top-k")
      // a hot temperature produces a DIFFERENT (noisier) draw than greedy
      val hot = Dsir.resampleTopK(w, "doc_id", 40, temperature = 5.0).collect().map(_.getLong(0)).toSet
      assert(hot != greedy, "Gumbel noise actually perturbs the draw")
    } finally w.unpersist()
  }
}
