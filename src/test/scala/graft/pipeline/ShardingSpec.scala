package graft.pipeline

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("packByBudget equals the single-window prefix-sum definition") {
    val docs = (0L until 500L).map(i => (i, 1L + (i * 2654435761L % 97))).toDF("id", "w")
    val naive = docs
      .withColumn("shard",
        ((sum(col("w")).over(Window.orderBy("id")) - col("w")) / lit(1000L)).cast("long"))
      .select("id", "shard")
    // small bucketWidth forces many buckets → exercises the offset join
    val packed = Sharding.packByBudget(docs, "id", "w", budget = 1000L, bucketWidth = 32)
      .select("id", "shard")
    assert(packed.except(naive).isEmpty && naive.except(packed).isEmpty)
  }

  test("documents straddling a boundary belong to the shard of their first unit") {
    val docs = Seq((0L, 600L), (1L, 600L), (2L, 600L)).toDF("id", "w")
    val out = Sharding.packByBudget(docs, "id", "w", budget = 1000L)
      .orderBy("id").select("shard").as[Long].collect().toSeq
    // starts at 0, 600, 1200 → shards 0, 0, 1
    assert(out == Seq(0L, 0L, 1L))
  }

  test("sparse ids and empty buckets are harmless") {
    val docs = Seq((5L, 10L), (100000L, 10L), (300000L, 10L)).toDF("id", "w")
    val out = Sharding.packByBudget(docs, "id", "w", budget = 15L, bucketWidth = 64)
      .orderBy("id").select("shard").as[Long].collect().toSeq
    // starts 0, 10, 20 → shards 0, 0, 1
    assert(out == Seq(0L, 0L, 1L))
  }
}
