package graft.operators

import graft.{SparkFixture, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GlobalRank must agree with the single-partition window shape it
  * replaces (r9 verdict #1: ReorderSort's
  * `row_number().over(Window.orderBy(...))` funneled the whole relation
  * through one task), and the plan must not contain an unpartitioned
  * window over the DATA (only the bounded numPartitions-row offsets
  * relation).
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("withRank equals the global-window row_number on a unique key order") {
    val c = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_acctbal", "c_nationkey")
    val ordering = Seq(col("c_acctbal").desc, col("c_custkey").asc)
    val got = GlobalRank.withRank(c, ordering, "idx")
      .select("idx", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = c.withColumn("idx",
        row_number().over(Window.orderBy(ordering: _*)).cast("long"))
      .select("idx", "c_custkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("ranks are contiguous 1..n and tie groups occupy contiguous rank blocks") {
    val c = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n = c.count()
    // deliberate heavy ties: order by nationkey only — among ties the
    // assignment is an arbitrary permutation (exactly row_number's own
    // contract), but each tie group must own a contiguous rank range
    val ranked = GlobalRank.withRank(c, Seq(col("c_nationkey").asc), "idx")
    val idx = ranked.select("idx").collect().map(_.getLong(0)).sorted
    assert(idx.toSeq == (1L to n).toSeq)
    val groups = ranked.groupBy("c_nationkey")
      .agg(min("idx").as("lo"), max("idx").as("hi"), count(lit(1)).as("cnt"))
      .filter(col("hi") - col("lo") + 1 =!= col("cnt"))
    assert(groups.isEmpty, "a tie group's ranks are not contiguous")
  }

  test("ReorderSort script path: take branch avoids any full-relation window; results match") {
    val db = new graft.lang.CozoDb(spark)
    db.registerTable("customer",
      Tables.load(spark, dir, "customer").select("c_custkey", "c_acctbal"), Seq("c_custkey"))
    val top = db.run(
      """r[k] := *customer{c_custkey: k}
        |?[idx, k] <~ ReorderSort(r[], take: 5, skip: 2)""".stripMargin)
      .toDF("idx", "k")
    // c_custkey is 0-based: rank i (1-based) lands on key i-1
    assert(top.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (3L to 7L).map(i => (i, i - 1)).toSet)
    // the take branch plans as a limit (TakeOrdered), and its index
    // window runs over the LIMITED relation only
    val phys = top.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$phys")
  }
}
