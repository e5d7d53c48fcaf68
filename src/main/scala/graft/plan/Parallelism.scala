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

  /** Bytes of input per guard split for `light` call sites. Sized so a
    * light task's real work (~µs/row vector arithmetic over ~4 MiB of
    * columnar input ≈ 50-150 ms) clearly dominates Spark's fixed
    * per-task cost — measured r11 (Attribute harness, local[32]):
    * blanket 64-way widening of a sub-MiB embeddings input charged a
    * CONSTANT ~35-40 core-s of width-proportional overhead per query
    * (dedup_semantic 39.0 vs 1.0 core-s, ann_ivf 44.0 vs 2.2, identical
    * at sf0.1 and sf1 — fixed per-task, not data) while the widening
    * saved nothing at any measured SF for this work class. */
  val lightSplitBytes: Long = 4L * 1024 * 1024

  /** `light = false` (default): per-row CPU is text-transform class
    * (tokenization, shingling, line splits — ~ms/row) where COMPRESSED
    * bytes do not predict work (a 10×-twinned corpus compresses to the
    * size of its distinct content but costs 10× the CPU: dedup_lines at
    * sf1 is a 0.9 MiB file carrying 43 core-s of work, 35.7 s → 7.0 s
    * with full widening) — the guard widens to 2×cores whenever splits
    * run below the core count, as before.
    *
    * `light = true`: per-row CPU is vector-arithmetic class (~µs/row),
    * so work IS proportional to bytes — the guard widens only to
    * ceil(bytes / [[lightSplitBytes]]), capped at 2×cores, and skips
    * entirely when the input is under one light split (the widened
    * layout's per-task overhead would exceed the work being spread).
    * When bytes can't be estimated without a job, fall back to the
    * heavy width — never worse than the pre-classification behavior.
    */
  def ensureIngestParallelism(df: DataFrame, keys: Seq[Column] = Nil,
                              light: Boolean = false): DataFrame = {
    // ops/attribution kill-switch (session conf, settable at runtime):
    // lets a session that KNOWS its inputs are small-and-cheap trade the
    // guard's exchange away, and lets the perf harness A/B the guard
    // without rebuilding — see Attribute.main
    if (df.sparkSession.conf.get("spark.graft.ingestGuard", "on") == "off") return df
    val floor = df.sparkSession.sparkContext.defaultParallelism
    // idempotence / composition: operators guard their own inputs, and
    // composites pass already-guarded frames into guarded primitives —
    // a plan that already contains an exchange-inducing node either
    // carries a guard's repartition or restores parallelism at its own
    // shuffle boundary, so a second repartition would be pure cost
    if (hasExchangeAbove(df.queryExecution.analyzed)) df
    else {
      val splits = estimatedSplits(df, floor)
      if (splits >= floor) df
      else {
        val width =
          if (!light) floor * 2
          else estimatedBytes(df) match {
            case Some(b) => math.min(floor * 2L,
              (b + lightSplitBytes - 1) / lightSplitBytes).toInt
            case None => floor * 2
          }
        if (width <= splits) df
        else if (keys.nonEmpty) df.repartition(width, keys: _*)
        else df.repartition(width)
      }
    }
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

  /** Job-free input-byte estimate of a frame whose leaves are file
    * scans, checkpointed frames, or literals — None when any leaf is
    * unsizable. Public for operators that gate a broadcast decision on
    * input size without spending a count job (e.g. the adjacency
    * broadcast in [[graft.graphs.Graphs.clusteringCoefficients]]). */
  def persistedInputBytes(df: DataFrame): Option[Long] = estimatedBytes(df)

  /** Job-free byte estimate for light-width sizing: file sources sum
    * their listed file lengths (compressed — a LOW estimate, which for
    * light work only errs toward fewer, larger splits); checkpointed
    * frames read their persisted block sizes from the BlockManager
    * (they were just materialized); literals are negligible. Any leaf
    * we can't size → None (caller falls back to the heavy width). */
  private def estimatedBytes(df: DataFrame): Option[Long] = {
    val sc = df.sparkSession.sparkContext
    val perLeaf = df.queryExecution.analyzed.collectLeaves().map {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          Some(fs.location.listFiles(Nil, Nil).iterator.flatMap(_.files)
            .map(_.getLen).sum)
        case _ => None
      }
      case rdd: LogicalRDD =>
        // CheckpointBridge.truncate re-frames the persisted checkpoint
        // RDD through a thin mapping, so the LEAF's own id is not the
        // persisted one — walk the (short) narrow-dependency chain to
        // the first persisted ancestor that actually holds blocks
        val info = sc.getRDDStorageInfo
        def persistedBytes(r: org.apache.spark.rdd.RDD[_], depth: Int): Option[Long] =
          if (depth > 4) None
          else info.find(i => i.id == r.id && i.numCachedPartitions > 0)
            .map(i => i.memSize + i.diskSize)
            .orElse(r.dependencies.iterator
              .flatMap(d => persistedBytes(d.rdd, depth + 1)).nextOption())
        persistedBytes(rdd.rdd, 0)
      case _: LocalRelation => Some(0L)
      case _ => None
    }
    if (perLeaf.exists(_.isEmpty)) None else Some(perLeaf.flatten.sum)
  }

  private def maxPartitionBytes(df: DataFrame): Long = {
    val raw = df.sparkSession.conf
      .get("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
    // the conf accepts byte-suffixed forms ("128m", "134217728b")
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
  }
}
