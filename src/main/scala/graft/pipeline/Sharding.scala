package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous shard packing for training-data exports (beyond the
  * reference): assign each document a shard id such that shards hold a
  * contiguous id-range worth ~`budget` units (tokens, bytes) each — the
  * shape every tokenized-corpus export needs (fixed-size .bin shards,
  * sequence-packing pre-pass, curriculum chunking).
  *
  * The greedy sequential rule is `shard = floor(start / budget)` where
  * `start` is the document's exclusive prefix sum of weights in id
  * order: a document whose span crosses a boundary belongs to the shard
  * its first unit lands in. Deterministic for a given (id-order, weight)
  * — reproducible in any engine with a window cumsum, which is exactly
  * how the DuckDB oracle states it.
  *
  * 100 TB note: a naive `Window.orderBy(id)` cumsum is a SINGLE-PARTITION
  * sort — a driver-killer at scale. This implementation is the classic
  * two-level distributed prefix sum instead:
  *   1. coarse bucket per document (id range / `bucketWidth`) — no sort;
  *   2. per-bucket cumsum (parallel window, partitioned by bucket);
  *   3. tiny per-bucket totals → bucket offsets (a window over #buckets
  *      rows, not #docs);
  *   4. global prefix = bucket offset + local cumsum.
  * Every stage is a hash shuffle or a broadcast-size aggregate; nothing
  * materializes a global sort.
  */
object Sharding {

  /** (id, weight, …) → original columns + `shard` (long). `bucketWidth`
    * controls parallelism of the per-bucket cumsum: ~budget-sized ranges
    * of the id domain per bucket work well (dense ids assumed; sparse
    * ids simply make buckets lighter, which is harmless). */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
                   budget: Long, bucketWidth: Long = 1 << 16): DataFrame = {
    require(budget > 0, "budget must be positive")
    val bucket = (col(idCol).cast("long") / lit(bucketWidth)).cast("long")
    val inBucket = Window.partitionBy(col("__bucket")).orderBy(col(idCol))
    val withLocal = df
      .withColumn("__bucket", bucket)
      .withColumn("__local_end", sum(col(weightCol)).over(inBucket))
    // per-bucket totals are one row per bucket — the only sequential
    // window runs over THAT relation, which is broadcast-small
    val overBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy("__bucket")
      .agg(sum(col(weightCol)).as("__bucket_total"))
      .withColumn("__offset", coalesce(sum(col("__bucket_total")).over(overBuckets), lit(0L)))
      .select("__bucket", "__offset")
    withLocal.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("shard",
        ((col("__offset") + col("__local_end") - col(weightCol)) / lit(budget))
          .cast("long"))
      .drop("__bucket", "__local_end", "__offset")
  }
}
