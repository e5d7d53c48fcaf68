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
}
