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
    // small numParts still exercises the offset join; large forces
    // near-empty range partitions
    for (parts <- Seq(4, 64)) {
      val packed = Sharding.packByBudget(docs, "id", "w", budget = 1000L, numParts = parts)
        .select("id", "shard")
      assert(packed.except(naive).isEmpty && naive.except(packed).isEmpty)
    }
  }

  test("sparse 1e12-range id domain packs without a data-sized single-partition window") {
    // ids scattered across [0, 1e12] — the fixed-width bucketing this
    // replaced would have pushed ~1.5e7 offset rows through ONE window
    // partition; the range-partitioned cumsum's only unpartitioned
    // window is over numParts rows by construction
    val docs = (0L until 400L).map(i => (i * 2_500_000_000L + (i * 48271 % 1000), 1L + i % 7))
      .toDF("id", "w")
    val packed = Sharding.packByBudget(docs, "id", "w", budget = 100L, numParts = 8)
    val naive = docs
      .withColumn("shard",
        ((sum(col("w")).over(Window.orderBy("id")) - col("w")) / lit(100L)).cast("long"))
      .select("id", "shard")
    assert(packed.select("id", "shard").except(naive).isEmpty
      && naive.except(packed.select("id", "shard")).isEmpty)
    // every unpartitioned (global) window in the plan must sit above an
    // aggregate (the per-partition totals), never above the raw data
    val plan = packed.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val globals = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(globals.nonEmpty)
    globals.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        "global window must run over per-partition totals, not the data")
    }
  }

  test("documents straddling a boundary belong to the shard of their first unit") {
    val docs = Seq((0L, 600L), (1L, 600L), (2L, 600L)).toDF("id", "w")
    val out = Sharding.packByBudget(docs, "id", "w", budget = 1000L)
      .orderBy("id").select("shard").as[Long].collect().toSeq
    // starts at 0, 600, 1200 → shards 0, 0, 1
    assert(out == Seq(0L, 0L, 1L))
  }

  test("packSequences splits overlong docs then packs the chunk stream") {
    val docs = Seq((0L, 2500L), (1L, 300L), (2L, 1000L)).toDF("id", "w")
    val out = Sharding.packSequences(docs, "id", "w", maxLen = 1000L, budget = 2000L)
      .orderBy("id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // doc 0 → chunks 1000, 1000, 500; doc 1 → 300; doc 2 → 1000
    // prefix starts: 0, 1000, 2000, 2500, 2800 → shards 0, 0, 1, 1, 1
    assert(out == Seq(
      (0L, 0L, 1000L, 0L), (0L, 1L, 1000L, 0L), (0L, 2L, 500L, 1L),
      (1L, 0L, 300L, 1L), (2L, 0L, 1000L, 1L)))
  }

  test("packSequences equals the naive definition on random weights") {
    val docs = (0L until 200L).map(i => (i, 1L + (i * 2654435761L % 3000))).toDF("id", "w")
    val out = Sharding.packSequences(docs, "id", "w", maxLen = 1000L, budget = 4000L)
    // naive: enumerate chunks driver-side, single cumsum
    val naive = docs.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      .flatMap { case (id, w) =>
        (0L until ((w + 999) / 1000)).map(ci => (id, ci, math.min(1000L, w - ci * 1000L)))
      }
    var cum = 0L
    val expect = naive.map { case (id, ci, cw) =>
      val start = cum; cum += cw
      (id, ci, cw, start / 4000L)
    }.toSet
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("sparse ids and empty range partitions are harmless") {
    val docs = Seq((5L, 10L), (100000L, 10L), (300000L, 10L)).toDF("id", "w")
    val out = Sharding.packByBudget(docs, "id", "w", budget = 15L, numParts = 64)
      .orderBy("id").select("shard").as[Long].collect().toSeq
    // starts 0, 10, 20 → shards 0, 0, 1
    assert(out == Seq(0L, 0L, 1L))
  }
}
