package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row-number: rank every row of a relation under a
  * total order WITHOUT the single-partition stage that
  * `row_number().over(Window.orderBy(...))` compiles to (Spark funnels
  * an unpartitioned window through ONE task — the canonical
  * works-at-test-scale, dies-at-100× shape).
  *
  * Same range-partitioned prefix-sum scheme as
  * [[graft.pipeline.Sharding]], applied to counts instead of weights:
  *   1. `repartitionByRange(ordering)` — the sampled range partitioner
  *      puts every partition's rows strictly before the next
  *      partition's under the order (ties share a partition: boundary
  *      lookup is a deterministic binary search on the key);
  *   2. per-partition `row_number` — a parallel window keyed by
  *      partition id;
  *   3. per-partition row counts → exclusive prefix offsets: the ONLY
  *      unpartitioned window, over exactly `numPartitions` rows,
  *      bounded by construction;
  *   4. global rank = partition offset + local rank.
  *
  * Ranks are 1-based, contiguous, and agree with the single-window
  * shape on any relation (among ties the assignment is an arbitrary
  * permutation — exactly as nondeterministic as `row_number` itself;
  * GlobalRankSpec pins set-equality against the old shape).
  */
object GlobalRank {

  /** `df` plus `rankCol` (long, 1-based) under `ordering`. */
  def withRank(df: DataFrame, ordering: Seq[Column], rankCol: String): DataFrame = {
    // ckpt FREEZES the range partitioning: the offsets branch and the
    // main branch both consume `ranged`; without a shared
    // materialization they can compile to two separate range exchanges
    // whose sampled boundaries differ (RangePartitioner's seed involves
    // the RDD id), misaligning offsets with the rows they pay for
    import graft.plan._
    val ranged = df.repartitionByRange(ordering: _*)
      .withColumn("__gr_pid", spark_partition_id().cast("long"))
      .ckptLazy()
    val inPart = Window.partitionBy(col("__gr_pid")).orderBy(ordering: _*)
    val local = ranged.withColumn("__gr_local", row_number().over(inPart).cast("long"))
    val overParts = Window.orderBy(col("__gr_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__gr_pid")
      .agg(count(lit(1)).as("__gr_n"))
      .withColumn("__gr_off", coalesce(sum(col("__gr_n")).over(overParts), lit(0L)))
      .select("__gr_pid", "__gr_off")
    local.join(broadcast(offsets), Seq("__gr_pid"))
      .withColumn(rankCol, col("__gr_off") + col("__gr_local"))
      .drop("__gr_pid", "__gr_local", "__gr_off")
  }
}
