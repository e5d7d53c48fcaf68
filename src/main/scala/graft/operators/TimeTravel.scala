package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time travel: "as of t" reads over versioned relations.
  *
  * In the reference a relation opts into time travel by making its last
  * key column a `Validity` (timestamp µs + assert flag, sorted
  * descending; cozo-core/src/data/value.rs:112-131). A scan `@ t` walks
  * each logical key's versions newest-first, keeps the first assertion
  * ≤ t, and drops retractions (tuple.rs:54+, relation.rs:370
  * `skip_scan_all`).
  *
  * Spark-first equivalent: a window `row_number` per logical key over
  * versions ordered descending, filtered to `ts <= t`, rank 1, keep
  * asserts. One shuffle on the key prefix; at 100 TB the version column
  * should be a sort column within partitions so the window is
  * sort-free after AQE.
  */
object TimeTravel {

  /** Rows visible at time `asOf`: newest version per `keyCols` with
    * `tsCol <= asOf` and (if given) `assertCol == true`.
    * `tieBreak` orders within identical timestamps for determinism.
    */
  def asOf(df: DataFrame, keyCols: Seq[String], tsCol: String, asOf: Column,
           assertCol: Option[String] = None, tieBreak: Seq[String] = Nil): DataFrame = {
    val ordering = (col(tsCol).desc +: tieBreak.map(col(_).desc))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    val ranked = df.filter(col(tsCol) <= asOf)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    assertCol.fold(ranked)(a => ranked.filter(col(a)))
  }

  /** Full history ordered per key (the reference's plain historical scan). */
  def history(df: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame =
    df.orderBy((keyCols.map(col) :+ col(tsCol).desc): _*)
}
