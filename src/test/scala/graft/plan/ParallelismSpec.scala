package graft.plan

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the ingest-parallelism guard: fires ONLY on low-split
  * sources (where the scan stage would serialize CPU-heavy map work),
  * never on already-parallel or already-shuffled inputs — at 100 TB the
  * guard must be a provable no-op, because a full-corpus repartition
  * nobody asked for would be the bug.
  */
class ParallelismSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def partsOf(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("fires on a single-row-group file scan, restoring parallelism") {
    val docs = Tables.load(spark, dir, "documents")
    val floor = spark.sparkContext.defaultParallelism
    assert(partsOf(docs) < floor, "fixture assumption: low-split source")
    val guarded = Parallelism.ensureIngestParallelism(docs, Seq(col("doc_id")))
    assert(partsOf(guarded) >= floor)
    // values unchanged
    assert(guarded.count() == docs.count())
  }

  test("no-op on an already-shuffled input (plan contains an exchange)") {
    val docs = Tables.load(spark, dir, "documents").repartition(4, col("doc_id"))
    val guarded = Parallelism.ensureIngestParallelism(docs, Seq(col("doc_id")))
    assert(guarded eq docs, "guard must not stack a second repartition")
    val agg = Tables.load(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("n"))
    assert(Parallelism.ensureIngestParallelism(agg) eq agg,
      "an aggregate's shuffle already restores parallelism")
  }

  test("no-op on a checkpointed frame that is already parallel") {
    import graft.plan._
    val ck = Tables.load(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id")).ckpt()
    assert(Parallelism.ensureIngestParallelism(ck) eq ck)
  }

  test("fires on a single-partition checkpointed frame") {
    import graft.plan._
    val ck1 = Tables.load(spark, dir, "documents").coalesce(1).ckpt()
    val guarded = Parallelism.ensureIngestParallelism(ck1, Seq(col("doc_id")))
    assert(!(guarded eq ck1))
    assert(partsOf(guarded) >= spark.sparkContext.defaultParallelism)
  }

  test("idempotent through operator composition") {
    val docs = Tables.load(spark, dir, "documents")
    val once = Parallelism.ensureIngestParallelism(docs, Seq(col("doc_id")))
    val twice = Parallelism.ensureIngestParallelism(once, Seq(col("doc_id")))
    assert(twice eq once, "a guarded frame must pass through untouched")
  }

  test("light class: no-op on a sub-split file source (work ∝ bytes)") {
    val emb = Tables.load(spark, dir, "embeddings") // few KiB ≪ lightSplitBytes
    assert(Parallelism.ensureIngestParallelism(emb, Seq(col("vec_id")),
      light = true) eq emb,
      "light widening of a tiny input only buys per-task overhead")
  }

  test("light class: no-op on a tiny materialized checkpoint (block sizes known)") {
    import graft.plan._
    val ck1 = Tables.load(spark, dir, "embeddings").coalesce(1).ckpt()
    assert(Parallelism.ensureIngestParallelism(ck1, Seq(col("vec_id")),
      light = true) eq ck1,
      "persisted-ancestor byte estimate must reach through CheckpointBridge's re-frame")
    // the HEAVY class still widens the same frame — bytes don't gate it
    val heavy = Parallelism.ensureIngestParallelism(ck1, Seq(col("vec_id")))
    assert(!(heavy eq ck1))
  }

  test("light class: widens proportionally to bytes on a larger file") {
    val li = Tables.load(spark.newSession(), "/root/testdata/sf0.1", "lineitem")
    val bytes = new java.io.File("/root/testdata/sf0.1/lineitem.parquet").length
    val expected = math.min(2L * spark.sparkContext.defaultParallelism,
      (bytes + Parallelism.lightSplitBytes - 1) / Parallelism.lightSplitBytes).toInt
    assume(expected > 1, "fixture assumption: sf0.1 lineitem spans >1 light split")
    val guarded = Parallelism.ensureIngestParallelism(li, Seq(col("l_orderkey")),
      light = true)
    assert(partsOf(guarded) == expected)
  }

  test("light class: unknown bytes fall back to the heavy width") {
    import graft.plan._
    // lazy ckpt, never materialized: the RDD is marked persistent but
    // holds no blocks yet — bytes unknowable without a job
    val lz = Tables.load(spark, dir, "documents").coalesce(1).ckptLazy()
    val guarded = Parallelism.ensureIngestParallelism(lz, Seq(col("doc_id")),
      light = true)
    assert(partsOf(guarded) >= spark.sparkContext.defaultParallelism,
      "unsizable input must degrade to the pre-classification behavior, not to serial")
  }

  test("session kill-switch disables the guard entirely") {
    val docs = Tables.load(spark, dir, "documents")
    spark.conf.set("spark.graft.ingestGuard", "off")
    try assert(Parallelism.ensureIngestParallelism(docs, Seq(col("doc_id"))) eq docs)
    finally spark.conf.unset("spark.graft.ingestGuard")
  }
}
