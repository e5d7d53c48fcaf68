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
  def semiNaive(base: DataFrame, step: DataFrame => DataFrame,
                maxIter: Int = 100): DataFrame = {
    var total = base.dropDuplicates().ckpt()
    var delta = total
    var iter = 0
    var converged = delta.isEmpty
    while (!converged && iter < maxIter) {
      delta = step(delta).dropDuplicates().except(total).ckptLazy()
      if (delta.isEmpty) converged = true
      else total = total.union(delta).ckptLazy()
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
    var i = 0
    while (i < hops && !frontier.isEmpty) {
      frontier = step(frontier).dropDuplicates().except(total).ckptLazy()
      total = total.union(frontier).ckptLazy()
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
    var total = fold(base).ckpt()
    var delta = total
    var iter = 0
    var converged = delta.isEmpty
    while (!converged && iter < maxIter) {
      val candidates = fold(step(delta))
      val merged = fold(total.union(candidates)).ckptLazy()
      delta = merged.except(total).ckptLazy()
      if (delta.isEmpty) converged = true
      else total = merged
      iter += 1
    }
    total
  }
}
