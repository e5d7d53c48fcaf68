package graft.pipeline

import graft.plan._
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
  * range-partitioned distributed prefix sum:
  *   1. `repartitionByRange(id)` — Spark's sampled range partitioner
  *      balances partitions by the DATA distribution, so a sparse or
  *      skewed id domain still yields even partitions (a fixed
  *      id-range/width bucketing does not: a 1e12-wide sparse domain
  *      once pushed millions of bucket-offset rows through one window
  *      partition);
  *   2. per-partition cumsum (parallel window, keyed by partition id);
  *   3. per-partition totals → partition offsets — the ONLY
  *      unpartitioned window, over exactly `numParts` rows, bounded by
  *      construction;
  *   4. global prefix = partition offset + local cumsum.
  * All arithmetic is integer (`div`, never `/`): long `/` in Spark is a
  * double divide that loses exactness past 2^53, which real token
  * prefix sums cross in the billions-of-docs regime.
  */
object Sharding {

  /** (id, weight, …) → original columns + `shard` (long). `numParts`
    * controls the parallelism of the distributed cumsum; 0 (default)
    * uses `spark.sql.shuffle.partitions`. Ids are assumed unique (they
    * are document keys); weights must be non-negative longs. */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
                   budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val n =
      if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // ckpt FREEZES the range partitioning: the offsets branch and the
    // main branch below both consume `ranged`, and without a shared
    // materialization they can compile to two separate range exchanges
    // whose sampled boundaries differ (RangePartitioner's sample seed
    // involves the RDD id), silently crediting a boundary row's weight
    // to one partition while the row itself lands in the other
    val ranged = df.repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id().cast("long"))
      .ckptLazy()
    val inPart = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    val withLocal = ranged
      .withColumn("__local_end", sum(col(weightCol).cast("long")).over(inPart))
    // per-partition totals are one row per range partition — the only
    // sequential window runs over THAT relation (`n` rows, broadcast-
    // small by construction regardless of the id distribution)
    val overParts = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy("__pid")
      .agg(sum(col(weightCol).cast("long")).as("__part_total"))
      .withColumn("__offset",
        coalesce(sum(col("__part_total")).over(overParts), lit(0L)))
      .select("__pid", "__offset")
    withLocal.join(broadcast(offsets), Seq("__pid"))
      .withColumn("shard",
        expr(s"(__offset + __local_end - cast(`$weightCol` as bigint)) div ${budget}L"))
      .drop("__pid", "__local_end", "__offset")
  }

  /** Sequence packing: documents longer than `maxLen` split into
    * `ceil(w / maxLen)` chunks (all maxLen except a short tail), then
    * every chunk packs contiguously into `budget`-unit shards via
    * [[packByBudget]] over the chunk stream — the standard tokenized
    * pre-pass for fixed-context training (chunk, then pack the
    * chunks). Returns (id, chunk_idx, chunk_w, shard). The chunk
    * explode is a codegen'd `sequence` generator — no UDFs, no skew
    * beyond the documents' own length distribution. Chunk ids must
    * stay ordered inside a doc, so the chunk key is id·2^20 + idx;
    * the composite stays exact (integer ops throughout) for
    * id < 2^43 ≈ 8.8e12 with < 2^20 chunks/doc (1B-unit docs at the
    * default 1k maxLen). */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    maxLen: Long, budget: Long,
                    numParts: Int = 0): DataFrame = {
    require(maxLen > 0 && budget > 0, "maxLen and budget must be positive")
    val chunks = df
      .select(col(idCol), col(weightCol))
      .filter(col(weightCol) > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          expr(s"(cast(`$weightCol` as bigint) + ${maxLen - 1}L) div ${maxLen}L") - 1)))
      .withColumn("chunk_w",
        least(lit(maxLen), col(weightCol) - col("chunk_idx") * lit(maxLen)))
      .withColumn("__ck", col(idCol).cast("long") * lit(1L << 20) + col("chunk_idx"))
    packByBudget(chunks, "__ck", "chunk_w", budget, numParts)
      .select(col(idCol), col("chunk_idx"), col("chunk_w"), col("shard"))
  }
}
