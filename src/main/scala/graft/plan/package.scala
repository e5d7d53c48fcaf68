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
  }
}
