package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scratch harness for plan/perf attribution at sf0.1 (enable with
  * GRAFT_SCRATCH=1) — not part of the regular suite. */
class PlanScratchSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val on = sys.env.contains("GRAFT_SCRATCH")
  private val dir = sys.env.getOrElse("GRAFT_SF_DIR", "/root/testdata/sf0.1")

  test("attribute rel_agg_q1 cost") {
    assume(on)
    val li = Tables.load(spark, dir, "lineitem")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once, then measure twice
      df.write.format("noop").mode("overwrite").save()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("full (with count_distinct)") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"),
          count_distinct(col("l_orderkey")).as("n_orders"))
    }
    time("no distinct") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
    }
    time("distinct only") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count_distinct(col("l_orderkey")).as("n_orders"))
    }
    time("scan only") { li.select("l_returnflag", "l_quantity") }
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(count_distinct(col("l_orderkey")).as("n_orders"))
      .explain("formatted")
  }
}
