package graft.fixpoint

import graft.plan._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-side stratified/semi-naive fixpoint evaluation.
  *
  * The reference evaluates recursive Datalog rules with a semi-naive
  * delta loop (cozo-core/src/query/eval.rs:113-303, delta threading at
  * eval.rs:571-610; total/delta stores temp_store.rs:249-333). Spark has
  * no recursive operator, so the fixpoint is a driver loop over delta
  * DataFrames. Datalog set semantics (dedup on insert,
  * temp_store.rs:27-60) map to `except`/`dropDuplicates`.
  *
  * Scale notes: every iteration truncates lineage via a LAZY local
  * checkpoint (mandatory — an un-checkpointed 30-iteration loop
  * re-executes the whole prefix each action and overflows the planner).
  * Lazy + the convergence check (`delta.isEmpty`) costs ONE job per
  * iteration: `doCheckpoint` materializes every marked ancestor during
  * that job, so the eager-checkpoint job it replaces is pure overhead.
  * `step` must only consume the delta so per-iteration work is
  * proportional to new facts, not the accumulated total.
  */
object Fixpoint {

  /** Classic semi-naive least-fixpoint: total := base; repeat
    * delta := step(delta) \ total until empty. `step` must be
    * monotone and preserve the schema of `base`.
    */
  /** One-shuffle merge step shared by the set-semantics loops: the old
    * total (flagged) unions the raw candidate rows and ONE groupBy over
    * the full row computes the new total AND marks which rows are new —
    * the dropDuplicates + except + union triple (three full shuffles of
    * candidates/total per round) collapses into a single hash
    * aggregation. Returns (newTotal, delta), both views over one lazily
    * checkpointed frame, so the round costs one materialization.
    */
  private def mergeNew(total: DataFrame, candidates: DataFrame): (DataFrame, DataFrame, Long) = {
    val cols = total.columns.toSeq
    val merged = total.withColumn("__old", lit(true))
      .unionByName(candidates.select(cols.map(col): _*).withColumn("__old", lit(false)))
      .groupBy(cols.map(col): _*).agg(max(col("__old")).as("__old"))
      .ckptLazy()
    // the delta's materializing count persists BOTH frames (merged is a
    // lazy ckpt underneath it) and doubles as the convergence probe —
    // one job per round for (materialize, probe)
    val (delta, nNew) = merged.filter(!col("__old"))
      .select(cols.map(col): _*).ckptCount()
    (merged.select(cols.map(col): _*), delta, nNew)
  }

  def semiNaive(base: DataFrame, step: DataFrame => DataFrame,
                maxIter: Int = 100): DataFrame = {
    var total = base.dropDuplicates().ckpt()
    var delta = total
    var iter = 0
    var converged = delta.isEmpty
    while (!converged && iter < maxIter) {
      val (t, d, n) = mergeNew(total, step(delta))
      delta = d
      if (n == 0) converged = true
      else total = t
      iter += 1
    }
    total
  }

  /** Bounded expansion: exactly `hops` rounds of `step`, no convergence
    * requirement (k-hop traversals; pokec expansion benchmarks).
    */
  def boundedExpand(base: DataFrame, step: DataFrame => DataFrame,
                    hops: Int): DataFrame = {
    var total = base.dropDuplicates().ckpt()
    var frontier = total
    var nNew = -1L
    var i = 0
    while (i < hops && nNew != 0 && !(i == 0 && frontier.isEmpty)) {
      val (t, d, n) = mergeNew(total, step(frontier))
      frontier = d
      nNew = n
      total = t
      i += 1
    }
    total
  }

  /** Meet-semilattice fixpoint with `min` as the meet operator over
    * `valCol`, grouped by `keyCols` — the mechanism that lets cozo keep
    * recursion through aggregations like `min_cost`/`shortest` in a
    * single stratum (cozo-core/src/data/aggr.rs:799-939, MeetAggrStore
    * runtime/temp_store.rs:92-220). Each round folds the meet inside
    * the loop; convergence = no key's value improved.
    *
    * `step` receives the improved-rows delta and must return candidate
    * rows with the same schema (keyCols :+ valCol).
    */
  def meetMin(base: DataFrame, step: DataFrame => DataFrame,
              keyCols: Seq[String], valCol: String,
              maxIter: Int = 50): DataFrame = {
    def fold(df: DataFrame): DataFrame =
      df.groupBy(keyCols.map(col): _*).agg(min(col(valCol)).as(valCol))
        .select((keyCols :+ valCol).map(col): _*)
    val outCols = (keyCols :+ valCol).map(col)
    var total = fold(base).ckpt()
    var delta = total
    var iter = 0
    var converged = delta.isEmpty
    while (!converged && iter < maxIter) {
      // one-shuffle merge: the old total rides along with its value
      // duplicated into __old (min ignores the candidates' nulls, and
      // total has unique keys, so min(__old) IS the key's prior value);
      // a key improved iff it is new (__old null) or the folded value
      // beat it. This replaces fold(candidates) + fold(union) + except —
      // three full shuffles per round — with one hash aggregation.
      val candidates = step(delta)
      val merged = total.withColumn("__old", col(valCol))
        .unionByName(candidates.select(outCols: _*)
          .withColumn("__old", lit(null).cast(total.schema(valCol).dataType)))
        .groupBy(keyCols.map(col): _*)
        .agg(min(col(valCol)).as(valCol), min(col("__old")).as("__old"))
        .ckptLazy()
      // materialize + probe in one job (the delta count persists the
      // lazily checkpointed merged underneath it)
      val (d, nNew) = merged.filter(col("__old").isNull || col(valCol) < col("__old"))
        .select(outCols: _*).ckptCount()
      delta = d
      if (nNew == 0) converged = true
      else total = merged.select(outCols: _*)
      iter += 1
    }
    total
  }
}
