package graft.pipeline

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

class BalanceSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("equal weights downsample every source to the smallest") {
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 400L).map(i => (i, "b")) ++
      (400L until 1000L).map(i => (i, "c"))).toDF("id", "src")
    val out = Balance.balanceSources(df, "src", "id")
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 100L, "b" -> 100L, "c" -> 100L))
    // the anchor keeps ALL its rows
    assert(out.filter($"src" === "a").count() == 100)
  }

  test("weights shape the mixture; targets are floor(w * Nanchor / wanchor)") {
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 1000L).map(i => (i, "b"))).toDF("id", "src")
    // a:b = 1:3 → anchor a (100/1 < 900/3), target_b = 300
    val out = Balance.balanceSources(df, "src", "id", Map("a" -> 1L, "b" -> 3L))
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 100L, "b" -> 300L))
  }

  test("rate-only scale path lands within sampling noise of the targets") {
    val df = ((0L until 2000L).map(i => (i, "a")) ++
      (2000L until 12000L).map(i => (i, "b"))).toDF("id", "src")
    val out = Balance.balanceSources(df, "src", "id", exact = false)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets are 2000/2000; hash-rate keeps each within ±5·sqrt(target)
    assert(math.abs(counts("a") - 2000L) <= 225, counts)
    assert(math.abs(counts("b") - 2000L) <= 225, counts)
  }

  test("selection is deterministic and stable across repartitioning") {
    val df = (0L until 500L).map(i => (i, if (i < 50) "small" else "big")).toDF("id", "src")
    val once = Balance.balanceSources(df, "src", "id").select("id").as[Long].collect().sorted.toSeq
    val again = Balance.balanceSources(df.repartition(13), "src", "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(once == again)
  }
}
