package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Join, LocalRelation, LogicalPlan, RepartitionOperation, Sort, Window}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Minimum INGEST parallelism for CPU-bound per-row stages.
  *
  * Spark's scan parallelism is bounded by the source's split count —
  * files × row groups for parquet. A corpus that arrives as one small
  * file with one row group (a single gzip dump, one hot shard, this
  * repo's driver-generated test parquet) scans as ONE task, so every
  * pre-shuffle map stage — tokenization, shingling, hashing, vector
  * math, the expensive part of most curation operators — runs on one
  * core no matter how many the cluster has. Measured on dedup_lines at
  * sf1: 43 core-seconds of task time under a 36 s wall (parallelism
  * ~1.2 on 32 cores); with the guard, 8.7 s.
  *
  * `ensureIngestParallelism` repartitions ONLY when the source's
  * estimated split count is below the cluster's core count, so it is a
  * no-op on any real multi-file/multi-row-group corpus — at 100 TB the
  * input is thousands of splits and the guard never fires; firing
  * there would be the bug (a full-corpus shuffle nobody asked for).
  * The estimate never runs a job:
  *   - file sources: #files when that already clears the floor, else
  *     Σ ceil(size / maxPartitionBytes) from the file index Spark has
  *     already listed (an upper bound on real splits — a giant
  *     single-row-group file can fool it high, in which case we skip
  *     the repartition: false negatives only degrade to today's
  *     behavior, never add a surprise shuffle);
  *   - checkpointed frames (LogicalRDD): the RDD's own partition count;
  *   - in-memory literals (LocalRelation): 1;
  *   - anything else (already-shuffled subtrees, streaming): treated as
  *     parallel — a shuffle boundary restores parallelism by itself.
  *
  * When `keys` are given the repartition hash-partitions on them
  * (deterministic, no round-robin presort, and a downstream
  * groupBy/join on the same keys can reuse the exchange); otherwise
  * round-robin.
  */
object Parallelism {

  def ensureIngestParallelism(df: DataFrame, keys: Seq[Column] = Nil): DataFrame = {
    val floor = df.sparkSession.sparkContext.defaultParallelism
    // idempotence / composition: operators guard their own inputs, and
    // composites pass already-guarded frames into guarded primitives —
    // a plan that already contains an exchange-inducing node either
    // carries a guard's repartition or restores parallelism at its own
    // shuffle boundary, so a second repartition would be pure cost
    if (hasExchangeAbove(df.queryExecution.analyzed)) df
    else if (estimatedSplits(df, floor) >= floor) df
    else if (keys.nonEmpty) df.repartition(floor * 2, keys: _*)
    else df.repartition(floor * 2)
  }

  private def hasExchangeAbove(plan: LogicalPlan): Boolean = plan.exists {
    case _: RepartitionOperation | _: Aggregate | _: Join | _: Window |
         _: Distinct => true
    case s: Sort => s.global
    case _ => false
  }

  /** Upper-bound split estimate (capped reads: the file-size listing is
    * only consulted when the file count alone can't clear `enough`). */
  private def estimatedSplits(df: DataFrame, enough: Int): Long = {
    val maxSplit = maxPartitionBytes(df)
    val perLeaf = df.queryExecution.analyzed.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val nFiles = fs.location.inputFiles.length.toLong
          if (nFiles >= enough) nFiles
          else fs.location.listFiles(Nil, Nil)
            .iterator.flatMap(_.files)
            .map(f => math.max(1L, (f.getLen + maxSplit - 1) / maxSplit))
            .sum
        case _ => enough.toLong // non-file relation: assume parallel
      }
      case rdd: LogicalRDD => rdd.rdd.getNumPartitions.toLong
      case _: LocalRelation => 1L
      // unknown leaf (stream, view, cached subtree): assume parallel
      // rather than inject a shuffle on speculation
      case _ => enough.toLong
    }
    math.max(perLeaf.sum, 1L)
  }

  private def maxPartitionBytes(df: DataFrame): Long = {
    val raw = df.sparkSession.conf
      .get("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    // the conf accepts byte-suffixed forms ("128m", "134217728b")
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
  }
}
