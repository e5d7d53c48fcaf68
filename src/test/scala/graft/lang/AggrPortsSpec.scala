package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's aggregation test corpus
  * (cozo-core/src/data/tests/aggrs.rs, all 22 test fns), driven through
  * the script front-end: each reference normal_op/meet_op sequence
  * becomes a head aggregation over a const relation with the same
  * values. Meet-op variants are the same operators inside recursion and
  * are covered by the recursion suites (LangSpec rec_*, AirRoutesSpec
  * dijkstra/shortest goldens).
  *
  * Documented deviations: `unique` returns its set SORTED (distributed
  * evaluation has no insertion order; the reference's meet form is a
  * sorted Set too, aggrs.rs:153); numeric aggregate results surface in
  * the column's static type (sum over ints is 15, not 15.0).
  */
class AggrPortsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def db() = new CozoDb(spark)
  def one(script: String): Any = db().run(script).collect().head.get(0)
  def num(script: String): Double = one(script) match {
    case n: java.lang.Number => n.doubleValue()
    case other => fail(s"expected number, got $other")
  }
  def seqOf(script: String): Seq[Any] = one(script) match {
    case s: scala.collection.Seq[_] => s.toSeq.map {
      case inner: scala.collection.Seq[_] => inner.toSeq
      case x => x
    }
    case other => fail(s"expected list, got $other")
  }

  test("and (aggrs.rs:16)") {
    assert(one("?[and(x)] := x in [true, true]") == true)
    assert(one("?[and(x)] := x in [true, true, false]") == false)
  }

  test("or (aggrs.rs:45)") {
    assert(one("?[or(x)] := x in [false, false]") == false)
    assert(one("?[or(x)] := x in [false, false, true]") == true)
  }

  test("unique dedups (sorted; aggrs.rs:75)") {
    assert(seqOf("?[unique(x)] := x in [3, 1, 2, 1]") == Seq(1L, 2L, 3L))
  }

  test("group_count pairs values with multiplicities (aggrs.rs:95)") {
    val pairs = one("?[group_count(x)] := x in [1.0, 2.0, 3.0, 3.0, 1.0, 3.0]") match {
      case s: scala.collection.Seq[_] => s.toSeq.map {
        case r: org.apache.spark.sql.Row => (r.get(0), r.get(1))
        case inner: scala.collection.Seq[_] => (inner.head, inner(1))
        case other => fail(s"unexpected pair shape: $other")
      }
      case other => fail(s"expected list, got $other")
    }
    assert(pairs == Seq((1.0, 2L), (2.0, 1L), (3.0, 3L)))
  }

  test("union of lists (aggrs.rs:117)") {
    val r = seqOf(
      """r[v] <- [[[1, 3, 5, 2]], [[10, 2, 4, 6]]]
        |?[union(v)] := r[v]""".stripMargin)
    assert(r == Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L))
  }

  test("intersection of lists (aggrs.rs:163)") {
    val r = seqOf(
      """r[v] <- [[[1, 3, 5, 2]], [[10, 2, 4, 6]]]
        |?[intersection(v)] := r[v]""".stripMargin)
    assert(r == Seq(2L))
  }

  test("count_unique (aggrs.rs:199)") {
    assert(one("?[count_unique(x)] := x in [1, 2, 3, 1, 2, 1]") == 3L)
  }

  test("collect keeps duplicates (aggrs.rs:214)") {
    assert(seqOf("?[collect(x)] := x in [1, 2, 3, 1, 2, 1]").sorted(
      Ordering.by((a: Any) => a.asInstanceOf[Long])) == Seq(1L, 1L, 1L, 2L, 2L, 3L))
  }

  test("count includes nulls (aggrs.rs:237)") {
    assert(one("?[count(x)] := x in [null, null, null, null, true, true]") == 6L)
  }

  test("variance is sample variance (aggrs.rs:252)") {
    assert(num("?[variance(x)] := x in [1, 2]") == 0.5)
  }

  test("std_dev (aggrs.rs:263)") {
    assert(math.abs(num("?[std_dev(x)] := x in [1, 2]") - math.sqrt(0.5)) < 1e-10)
  }

  test("mean (aggrs.rs:275)") {
    assert(num("?[mean(x)] := x in [1, 2, 3, 4, 5]") == 3.0)
  }

  test("sum (aggrs.rs:289)") {
    assert(num("?[sum(x)] := x in [1, 2, 3, 4, 5]") == 15.0)
  }

  test("product (aggrs.rs:303)") {
    assert(num("?[product(x)] := x in [1, 2, 3, 4, 5]") == 120.0)
  }

  test("min / max (aggrs.rs:317/341)") {
    assert(one("?[min(x)] := x in [10, 9, 1, 2, 3]") == 1L)
    assert(one("?[max(x)] := x in [10, 9, 1, 2, 3]") == 10L)
  }

  test("choice_rand picks a member (aggrs.rs:365)") {
    val v = one("?[choice_rand(x)] := x in [1, 2, 3]")
    assert(Seq(1L, 2L, 3L).contains(v))
  }

  test("min_cost picks the cheapest pair (aggrs.rs:378)") {
    val r = db().run(
      """r[x, c] <- [[null, 3], [true, 1], [false, 2]]
        |?[min_cost(p)] := r[x, c], p = [x, c]""".stripMargin).collect().head.get(0)
    r match {
      case row: org.apache.spark.sql.Row =>
        assert(row.get(0) == true && row.get(1) == 1L)
      case s: scala.collection.Seq[_] => assert(s.head == true)
      case other => fail(s"unexpected min_cost shape: $other")
    }
  }

  test("latest_by returns the payload of the max key — here null (aggrs.rs:425)") {
    assert(one(
      """r[x, c] <- [[null, 3], [true, 1], [false, 2]]
        |?[latest_by(p)] := r[x, c], p = [x, c]""".stripMargin) == null)
  }

  test("shortest list wins (aggrs.rs:449)") {
    assert(seqOf(
      """r[v] <- [[[1, 2, 3]], [[2]], [[2, 3]]]
        |?[shortest(v)] := r[v]""".stripMargin) == Seq(2L))
  }

  test("choice takes the first non-null in store order (aggrs.rs:496)") {
    assert(one("?[choice(x)] := x in [null, 1, 2]") == 1L)
  }

  test("bit_and / bit_or / bit_xor over bytes (aggrs.rs:528-574)") {
    // 0b11100 = 28 = 'HA==', 0b01011 = 11 = 'Cw=='
    def bytes(script: String): Seq[Byte] = one(script) match {
      case a: Array[Byte] => a.toSeq
      case s: scala.collection.Seq[_] => s.toSeq.map(_.asInstanceOf[Byte])
      case other => fail(s"not bytes: $other")
    }
    val rel = "r[v] <- [['HA=='], ['Cw==']]\n"
    assert(bytes(rel + "?[bit_and(b)] := r[v], b = decode_base64(v)") == Seq(0x08.toByte))
    assert(bytes(rel + "?[bit_or(b)] := r[v], b = decode_base64(v)") == Seq(0x1f.toByte))
    assert(bytes(rel + "?[bit_xor(b)] := r[v], b = decode_base64(v)") == Seq(0x17.toByte))
  }

  // — beyond-reference sketch aggregates (no aggrs.rs counterpart):
  // single-pass mergeable sketches for the scales where exact distinct
  // counting / exact quantiles are the bottleneck —

  test("count_approx: HLL++ estimate lands within the rsd bound of exact") {
    val d = db()
    d.registerTable("big", spark.range(1000).toDF("x"))
    def n(s: String): Double = d.run(s).collect().head.get(0) match {
      case v: java.lang.Number => v.doubleValue(); case o => fail(s"not a number: $o")
    }
    assert(n("?[count_unique(x)] := *big[x]") == 1000.0)
    val approx = n("?[count_approx(x)] := *big[x]")
    assert(math.abs(approx - 1000.0) / 1000.0 < 0.1, s"default rsd 5%: got $approx")
    val tight = n("?[count_approx(x, 0.01)] := *big[x]")
    assert(math.abs(tight - 1000.0) / 1000.0 < 0.03, s"rsd 1%: got $tight")
  }

  test("quantile_approx / median: exact on small inputs, loud without p") {
    val rel = "r[x] := x in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]\n"
    assert(num(rel + "?[quantile_approx(x, 0.5)] := r[x]") == 5.0)
    assert(num(rel + "?[quantile_approx(x, 0.9)] := r[x]") == 9.0)
    assert(num(rel + "?[median(x)] := r[x]") == 5.5)
    intercept[Exception](db().run(rel + "?[quantile_approx(x)] := r[x]"))
  }
}
