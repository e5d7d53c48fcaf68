package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/** Stats-free lineage truncation for iterative DataFrame loops.
  *
  * Spark 4's `Dataset.localCheckpoint` builds its `LogicalRDD` with
  * `rewriteStatsAndConstraints`, so the checkpoint LEAF inherits the
  * origin plan's computed `Statistics`. In a driver-side fixpoint loop
  * every round's plan joins several checkpointed leaves, and join-stat
  * estimation multiplies children's `sizeInBytes` (BigInt) — so the
  * inherited number's DIGIT COUNT grows ~(#joins)× per round.  After a
  * dozen rounds the stats visitor is doing million-digit Toom-Cook
  * multiplications and the driver livelocks in `BigInteger.multiply`
  * (observed: Louvain level-2 rounds going 0.8s → 41s → stuck).
  *
  * `truncate` re-frames the checkpointed RDD through
  * `internalCreateDataFrame`, producing a fresh `LogicalRDD` with
  * default leaf statistics — constant-size stats per round, and AQE
  * still measures real sizes at runtime for join strategy selection.
  */
object CheckpointBridge {
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val ck = df.localCheckpoint(eager).asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ck.sparkSession
    spark.internalCreateDataFrame(ck.queryExecution.toRdd, ck.schema)
  }

  /** Eager truncation that returns the row count for free: driver loops
    * pair every eager checkpoint with a convergence probe (`isEmpty` /
    * `count`), which costs a SECOND job over the just-persisted blocks.
    * Counting the internal RDD is itself the materializing action — the
    * lazy local checkpoint persists during the count job — so the loop's
    * (materialize, probe) pair collapses into one job.
    */
  def truncateCount(df: DataFrame): (DataFrame, Long) = {
    val ck = df.localCheckpoint(eager = false)
      .asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = ck.sparkSession
    val rdd = ck.queryExecution.toRdd
    val n = rdd.count()
    (spark.internalCreateDataFrame(rdd, ck.schema), n)
  }
}
