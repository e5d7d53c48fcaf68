package graft.lang

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of reference end-to-end tests from
  * cozo-core/src/runtime/tests.rs not covered by the other suites.
  */
class RuntimePortsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def db() = new CozoDb(spark)

  def rows(d: CozoDb, script: String): Seq[Seq[Any]] =
    d.run(script).collect().toSeq.map(_.toSeq)

  test("test_limit_offset (tests.rs:29; row choice under :limit is engine-defined)") {
    val d = db()
    def q(suffix: String) = rows(d, s"?[a] := a in [5,3,1,2,4] $suffix").map(_.head.asInstanceOf[Long])
    val domain = Set(1L, 2L, 3L, 4L, 5L)
    assert(q("").sorted == Seq(1L, 2L, 3L, 4L, 5L))
    assert(q(":limit 2").length == 2 && q(":limit 2").forall(domain))
    assert(q(":limit 2 :offset 1").length == 2)
    assert(q(":limit 2 :offset 4").length == 1)
    assert(q(":limit 2 :offset 5").isEmpty)
  }

  test("test_normal_aggr_empty (tests.rs:54): count over empty input is one row of 0") {
    assert(rows(db(), "?[count(a)] := a in []") == Seq(Seq(0L)))
  }

  test("test_meet_aggr_empty (tests.rs:61): min over empty input is null") {
    assert(rows(db(), "?[min(a)] := a in []") == Seq(Seq(null)))
    assert(rows(db(), "?[min(a), count(a)] := a in []") == Seq(Seq(null, 0L)))
  }

  test("test_conditions (tests.rs:93)") {
    val d = db()
    d.run(
      """{
        |    ?[code] <- [['a'],['b'],['c']]
        |    :create airport {code}
        |}
        |{
        |    ?[fr, to, dist] <- [['a', 'b', 1.1], ['a', 'c', 0.5], ['b', 'c', 9.1]]
        |    :create route {fr, to => dist}
        |}""".stripMargin)
    val res = rows(d,
      """r[code, dist] := *airport{code}, *route{fr: code, dist};
        |?[dist] := r['a', dist], dist > 0.5, dist <= 1.1;""".stripMargin)
    assert(res == Seq(Seq(1.1)))
  }

  test("test_custom_rules (tests.rs:530): SumCols with an integer option") {
    FixedRules.register("SumCols", (rels, opts, _) => {
      val in = rels.head
      val mult = opts.get("mult").map(_.asInstanceOf[Long]).getOrElse(2L)
      in.select((in.columns.map(col).map(_.cast("long")).reduce(_ + _) * lit(mult)).as("x"))
    })
    try {
      val res = rows(db(),
        """rel[] <- [[1,2,3,4],[5,6,7,8]]
          |?[x] <~ SumCols(rel[], mult: 100)""".stripMargin)
      assert(res.map(_.head).toSet == Set(1000L, 2600L))
    } finally FixedRules.unregister("SumCols")
  }

  test("test_vec_types (tests.rs:671): vector columns round-trip and distance kernels") {
    val d = db()
    d.run(":create a {k: String => v: <F32; 8>}")
    d.run("?[k, v] <- [['k', [1,2,3,4,5,6,7,8]]] :put a {k => v}")
    val v = rows(d, "?[k, v] := *a{k, v}").head(1).asInstanceOf[scala.collection.Seq[Any]]
      .map(_.toString.toDouble)
    assert(v == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))
    val lit8 = rows(d, "?[v] <- [[vec([1,2,3,4,5,6,7,8])]]").head.head
      .asInstanceOf[scala.collection.Seq[Any]].map(_.toString.toDouble)
    assert(lit8 == Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))
    assert(rows(d, "?[v] <- [[rand_vec(5)]]").head.head
      .asInstanceOf[scala.collection.Seq[Any]].length == 5)
    val dists = rows(d,
      """val[v] <- [[vec([1,2,3,4,5,6,7,8])]]
        |?[x,y,z] := val[v], x=l2_dist(v, v), y=cos_dist(v, v), nv = l2_normalize(v), z=ip_dist(nv, nv)""".stripMargin)
      .head.map(_.asInstanceOf[Double])
    assert(dists(0) == 0.0 && math.abs(dists(1)) < 1e-9 && math.abs(dists(2)) < 1e-6)
  }

  test("test_index_short (tests.rs:580): covering index + choose_index auto-selection") {
    val d = db()
    d.run(":create friends {fr: Int, to: Int => data: Any}")
    d.run("?[fr, to, data] <- [[1,2,3],[4,5,6]] :put friends {fr, to => data}")
    d.run("::index create friends:rev {to}")
    d.run("?[fr, to, data] <- [[1,2,5],[6,5,7]] :put friends {fr, to => data}")
    d.run("?[fr, to] <- [[4,5]] :rm friends {fr, to}")
    assert(d.relation("friends").collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 2L, 5L), Seq(6L, 5L, 7L)))
    // the index stores the named columns + remaining key columns only
    assert(d.relation("friends:rev").collect().map(_.toSeq).toSet ==
      Set(Seq(2L, 1L), Seq(5L, 6L)))
    val rels = d.run("::relations").collect().map(r => (r.getString(0), r.getInt(1), r.getString(4)))
    assert(rels.contains(("friends:rev", 2, "index")))
    assert(d.run("::columns friends:rev").count() == 2)
    // ::explain surfaces the auto-selected index like the reference
    val plan = d.run("::explain { ?[fr, data] := *friends{to: 2, fr, data} }")
      .collect().head.getString(0)
    assert(plan.contains(":friends:rev"), plan.take(200))
    // and the indexed scan returns the right rows
    assert(rows(d, "?[fr, data] := *friends{to: 2, fr, data}") == Seq(Seq(1L, 5L)))
  }
}
