package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan, Window}
import org.apache.spark.sql.execution.LogicalRDD
import org.scalatest.funsuite.AnyFunSuite

/** Scale-honesty regression gate over EVERY registered driver query:
  * the physical plan must not contain an unpartitioned cartesian
  * product, and logical Window nodes must be partitioned — the two
  * plan shapes that quietly work at test scale and melt down at 100×
  * (all-pairs work, single-partition windows).
  *
  * Exceptions are enumerated here WITH their justification, so a new
  * query (or a regression in an existing one) that introduces either
  * shape fails the suite and forces the author to either fix the plan
  * or argue the case in this file.
  */
class PlanHealthSpec extends AnyFunSuite with PredicateHelper {
  lazy val spark = SparkFixture.spark
  private val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.001")

  // ——— ckpt-resets-stats lint (r9 verdict #5) ———————————————————————
  // CheckpointBridge.truncate re-frames a DataFrame as a LogicalRDD
  // with DEFAULT (huge) leaf statistics. Equi joins are safe (AQE
  // re-plans from runtime sizes) and empty-grouping aggregates are safe
  // (their row count is 1 by construction, not by stats) — but a
  // NON-EQUI join whose strategy depends on leaf stats silently flips
  // to CartesianProduct/huge-build BNLJ when a ckpt sits below it
  // (caught live on dedup_simhash in r9). This lint generalizes that
  // incident: every registered query's OPTIMIZED plan is walked, and
  // any non-equi join that (a) has a LogicalRDD leaf in a subtree,
  // (b) has no side whose maxRows is statically bounded, and (c)
  // carries no explicit broadcast hint, fails the suite.

  private def refsSplit(j: Join, a: Expression, b: Expression): Boolean = {
    val l = j.left.outputSet; val r = j.right.outputSet
    (a.references.subsetOf(l) && b.references.subsetOf(r)) ||
      (a.references.subsetOf(r) && b.references.subsetOf(l))
  }

  private def isEqui(j: Join): Boolean = j.condition.exists { cond =>
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => refsSplit(j, a, b)
      case EqualNullSafe(a, b) => refsSplit(j, a, b)
      case _ => false
    }
  }

  /** Violation strings for every stats-blind non-equi join downstream
    * of a checkpoint; empty = clean. Public shape so the sensitivity
    * test below can aim it at a deliberately broken plan. */
  private def ckptNonEquiViolations(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case j: Join if !isEqui(j) &&
          (j.left.exists(_.isInstanceOf[LogicalRDD]) ||
            j.right.exists(_.isInstanceOf[LogicalRDD])) &&
          Seq(j.left, j.right).forall(_.maxRows.forall(_ > 100000L)) &&
          !Seq(j.hint.leftHint, j.hint.rightHint).flatten
            .exists(_.strategy.contains(BROADCAST)) =>
        s"non-equi ${j.joinType} join over a checkpointed frame (stats " +
          s"reset to default-huge) without an explicit broadcast hint; " +
          s"condition=${j.condition}"
    }

  /** Queries whose ckpt-downstream non-equi join is legitimately
    * unhinted: the shape is argued Θ(n²) by problem statement.
    * (dedup_embed left this list in r11: its exact regime now runs the
    * mapPartitions kernel over a broadcast matrix — no join at all.) */
  private val ckptNonEquiAllowed: Map[String, String] = Map.empty[String, String]

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * every instance is a join against an explicitly broadcast SMALL
    * side (bounded independent of the data scale), which is exactly
    * how a non-equi join should run on a cluster. */
  private val bnljAllowed: Map[String, String] = Map(
    // (ann_knn left this list in r12: bruteForceTopK's exact scan is
    // now the partial-top-k mapPartitions kernel — no join at all)
    "ann_ivf" -> "Lloyd assignment + probe: centroid table (k<=256) broadcast",
    "ann_pq" -> "PQ codebooks (k*m<=4096 rows) broadcast for ADC scan; recall referee crossJoins 1-row aggregates",
    "ann_ivfpq" -> ("centroids (nCells<=16) + codebooks (<=1024 rows) + probe-cell list " +
      "broadcast for the pruned ADC scan; recall referee crossJoins two 1-row aggregates"),
    "ann_lsh" -> "recall referee crossJoins two 1-row aggregates (bounded probes)",
    "ann_hnsw" -> "recall referee crossJoins two 1-row aggregates (exact scan is the top-k kernel since r12)",
    "ann_hnsw_stream" -> ("recall referee crossJoins two 1-row aggregates; the PROBE path " +
      "walks persisted partition-local graphs " +
      "(IndexesSpec asserts that plan is crossJoin/BNLJ-free)"),
    "dedup_simhash" -> "sample-vs-banded referee: 1K-doc sample broadcast for exact hamming",
    "dedup_semantic" -> "Lloyd assignment: centroid table (k<=256) broadcast",
    "decontam_embed" -> "benchmark-sized eval embedding set explicitly broadcast against the train scan",
    "mm_features_knn" -> "probe features (15 rows) broadcast against extracted features",
    "graph_louvain" -> "scalar 2m total-weight row broadcast into the modularity invariant",
    "op_range_join" -> ("degenerate-giant fallback side (intervals spanning > maxBuckets " +
      "buckets, empty here) is explicitly broadcast; the main path is the bucketed equi-join"),
    "text_perplexity" -> "one-row N/V model-totals relation broadcast onto the scoring joins",
    "pipe_dsir" -> "one-row model-totals relations broadcast into the <=buckets-row llr table build",
    "agg_sketch" -> "one-row approx-median relation broadcast for the exact-bracket referee")

  /** Queries whose logical plan legitimately contains an unpartitioned
    * Window: the two-level prefix sums run their TOP level over
    * per-bucket offsets — a relation whose cardinality is bounded by
    * the bucket count (bucketWidth auto-scales with max(id), see
    * Sharding.scala), not by the data. */
  private val globalWindowAllowed: Map[String, String] = Map(
    "pipe_pack_shards" -> "top-level offsets window over <=bucketCount rows (two-level prefix sum)",
    "pipe_pack_sequences" -> "same two-level prefix sum over chunk buckets",
    "pipe_shuffle" -> "top-level offsets window over numParts per-partition count rows (two-level prefix sum)",
    "pipe_classifier_holdout" -> ("tie-aware AUC rank prefix-sum over the per-SCORE aggregate — " +
      "scores are rounded @6, so that relation is <=10^6+1 rows regardless of corpus size"),
    "lang_reorder_sort" -> ("GlobalRank's offsets window over numPartitions per-partition " +
      "count rows (range-partitioned prefix rank — the fix for r9's single-partition ReorderSort)"))

  /** Queries whose plan may legitimately contain a CartesianProduct:
    * problems whose WORK is Θ(n²) by statement, where the blocked
    * partition-pair scan is the cheapest physical shape for that work
    * (vs. a degenerate "LSH" join that touches the same pairs plus a
    * shuffled pair-dedup — measured 35x slower at sf1). */
  private val cartesianAllowed: Map[String, String] = Map(
    "dedup_embed" -> ("exhaustive cosine>=0.4 pair mining over dense vectors " +
      "is Θ(n²·d) compute by problem statement; the blocked exact scan is " +
      "that compute with codegen dots over partition pairs (Dedup.scala " +
      "embeddingNearDup low-threshold regime)"))

  for (name <- Queries.queries.keys.toSeq.sorted) {
    test(s"$name: no cartesian, no unpartitioned window, BNLJ only where argued") {
      val df = Queries.queries(name)(spark, dir)
      val phys = df.queryExecution.executedPlan.toString

      if (!cartesianAllowed.contains(name))
        assert(!phys.contains("CartesianProduct"),
          s"$name has a CartesianProduct — all-pairs work does not survive scale")

      if (!bnljAllowed.contains(name))
        assert(!phys.contains("BroadcastNestedLoopJoin"),
          s"$name grew a BroadcastNestedLoopJoin; if the build side is " +
            "provably small, add it to bnljAllowed with the argument")

      if (!ckptNonEquiAllowed.contains(name)) {
        val v = ckptNonEquiViolations(df.queryExecution.optimizedPlan)
        assert(v.isEmpty,
          s"$name: ${v.mkString("; ")} — hint the provably-small side " +
            "with broadcast() or argue the shape in ckptNonEquiAllowed")
      }

      val globalWins = df.queryExecution.optimizedPlan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      if (!globalWindowAllowed.contains(name))
        assert(globalWins.isEmpty,
          s"$name has ${globalWins.size} unpartitioned Window node(s) — " +
            "a single-partition stage at scale; partition it or argue " +
            "the bound in globalWindowAllowed")
    }
  }

  test("allowlists only name registered queries") {
    val known = Queries.queries.keySet
    for (n <- bnljAllowed.keys ++ globalWindowAllowed.keys ++
        cartesianAllowed.keys ++ ckptNonEquiAllowed.keys)
      assert(known.contains(n), s"stale allowlist entry: $n")
  }

  test("ckpt lint sensitivity: dedup_simhash's referee minus its hint is caught") {
    import org.apache.spark.sql.functions._
    import graft.plan._
    // the exact r9 regression, reconstructed: fingerprints ckpt'd (a
    // full tokenize+hash pass reused by three consumers), sampled, then
    // the non-equi self-join WITHOUT the broadcast hint the shipped
    // query carries — the lint must flag it, and must pass the hinted
    // form (dedup_simhash itself is covered by the per-query loop)
    val docs = Tables.load(spark, dir, "documents")
    val fp = graft.dedup.Dedup.simhashFingerprints(docs, "doc_id", "text").ckpt()
    val sfp = fp.filter(col("id") < 1000)
    val bad = sfp.select(col("id").as("id_a"), col("fp").as("fa"))
      .join(sfp.select(col("id").as("id_b"), col("fp").as("fb")),
        col("id_a") < col("id_b"))
    assert(ckptNonEquiViolations(bad.queryExecution.optimizedPlan).nonEmpty,
      "lint failed to flag the hintless ckpt-downstream non-equi join")
    val good = broadcast(sfp.select(col("id").as("id_a"), col("fp").as("fa")))
      .join(sfp.select(col("id").as("id_b"), col("fp").as("fb")),
        col("id_a") < col("id_b"))
    assert(ckptNonEquiViolations(good.queryExecution.optimizedPlan).isEmpty,
      "lint flagged the hinted (shipped) form")
  }
}
