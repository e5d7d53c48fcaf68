package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** Plan utilities shared by iterative operators. */
package object plan {

  /** Use `.ckpt()` instead of `.localCheckpoint()` inside loops: it
    * truncates lineage AND drops the inherited leaf statistics whose
    * BigInt sizeInBytes otherwise compounds exponentially across
    * fixpoint rounds (see CheckpointBridge).
    */
  implicit final class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = CheckpointBridge.truncate(df)
    def ckptLazy(): DataFrame = CheckpointBridge.truncate(df, eager = false)

    /** Eager ckpt + row count in ONE job (driver loops pair every
      * materialization with a convergence probe — fusing them halves
      * the loop's action count). */
    def ckptCount(): (DataFrame, Long) = CheckpointBridge.truncateCount(df)

    /** Drop a ckpt'd frame's persisted blocks once its LAST consumer has
      * materialized — corpus-scale intermediates must not pile up in
      * block storage for the rest of the query (r10 advice: the shingle
      * relation was held TWICE, pre- and post-collapse, ~2× the corpus).
      * Walks each leaf RDD's narrow-dependency chain to the persisted
      * ancestor (CheckpointBridge re-frames the checkpoint through a
      * thin mapping, so the leaf itself is never the persisted one).
      * No-op on frames that hold nothing. */
    def unckpt(): DataFrame = {
      import org.apache.spark.sql.execution.LogicalRDD
      def walk(r: org.apache.spark.rdd.RDD[_], depth: Int): Unit =
        if (depth <= 4) {
          if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
            r.unpersist(blocking = false)
          else r.dependencies.foreach(d => walk(d.rdd, depth + 1))
        }
      df.queryExecution.analyzed.collectLeaves().foreach {
        case l: LogicalRDD => walk(l.rdd, 0)
        case _ =>
      }
      df
    }
  }
}
