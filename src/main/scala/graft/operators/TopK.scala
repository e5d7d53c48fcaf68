package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k. The reference expresses this with `smallest_by` /
  * `collect` head aggregations (cozo-core/src/data/aggr.rs:759-797) and
  * its search operators impose per-probe `k` limits
  * (query/ra.rs:896-1122). In Spark: `row_number` over a partitioned
  * window — AQE turns the shuffle into a partial top-k per mapper when
  * a limit follows (WindowGroupLimit pushdown in Spark 3.5+), which is
  * the 100 TB-safe shape.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String], ordering: Seq[Column],
               k: Int, rankCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    val ranked = df.withColumn("__rank", row_number().over(w)).filter(col("__rank") <= k)
    rankCol.fold(ranked.drop("__rank"))(n => ranked.withColumnRenamed("__rank", n))
  }
}
