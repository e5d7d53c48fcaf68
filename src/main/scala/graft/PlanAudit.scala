package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic main: prints the plan-health lines (pushdown, join
  * strategy, codegen spans) for the headline queries — the quick check
  * that a change didn't silently drop a PushedFilters or turn a
  * broadcast join into a shuffle. `runMain graft.PlanAudit [sfDir]`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("rel_scan_filter", "rel_join_revenue", "rel_agg_q1",
      "dedup_minhash", "ann_knn", "tt_asof")
    for (name <- interesting) {
      val df = Queries.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"—— $name ——")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.matches(".*(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin).*") ||
          l.matches("\\s*\\* .*WholeStageCodegen.*"))
        .foreach(l => println(l.trim.take(200)))
    }
    spark.stop()
  }
}
