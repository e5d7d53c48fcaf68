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

  /** Sequence packing: documents longer than `maxLen` split into
    * `ceil(w / maxLen)` chunks (all maxLen except a short tail), then
    * every chunk packs contiguously into `budget`-unit shards via
    * [[packByBudget]] over the chunk stream — the standard tokenized
    * pre-pass for fixed-context training (chunk, then pack the
    * chunks). Returns (id, chunk_idx, chunk_w, shard). The chunk
    * explode is a codegen'd `sequence` generator — no UDFs, no skew
    * beyond the documents' own length distribution. Chunk ids must
    * stay ordered inside a doc, so the chunk key is id·2^20 + idx
    * (caller guarantees < 2^20 chunks/doc = 1B-unit docs at the
    * default 1k maxLen). */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    maxLen: Long, budget: Long,
                    bucketWidth: Long = 1 << 16): DataFrame = {
    require(maxLen > 0 && budget > 0, "maxLen and budget must be positive")
    val chunks = df
      .select(col(idCol), col(weightCol))
      .filter(col(weightCol) > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), ceil(col(weightCol) / lit(maxLen.toDouble)).cast("long") - 1)))
      .withColumn("chunk_w",
        least(lit(maxLen), col(weightCol) - col("chunk_idx") * lit(maxLen)))
      .withColumn("__ck", col(idCol).cast("long") * lit(1L << 20) + col("chunk_idx"))
    packByBudget(chunks, "__ck", "chunk_w", budget, bucketWidth * (1L << 20))
      .select(col(idCol), col("chunk_idx"), col("chunk_w"), col("shard"))
  }
}
