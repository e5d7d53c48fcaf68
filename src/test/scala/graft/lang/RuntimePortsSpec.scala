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

  test("filtering (tests.rs:914): literal field filter does not bind the variable") {
    val d = db()
    assert(rows(d,
      """{
        |    ?[x, y] <- [[1, 2]]
        |    :create _rel {x => y}
        |    :returning
        |}
        |{
        |    ?[x, y] := x = 1, *_rel{x, y: 3}, y = 2
        |}""".stripMargin).isEmpty)
    assert(rows(d,
      """{
        |    ?[x, u, y] <- [[1, 0, 2]]
        |    :create _rel2 {x, u => y}
        |    :returning
        |}
        |{
        |    ?[x, y] := x = 1, *_rel2{x, y: 3}, y = 2
        |}""".stripMargin).isEmpty)
  }

  test("test_lsh_indexing (tests.rs:973): index internals scan, probe, drop") {
    val d = db()
    d.run(":create a {k: String => v: String}")
    d.run("?[k, v] <- [['a', 'hello world!'], ['b', 'the world is round']] :put a {k => v}")
    d.run("::lsh create a:lsh {extractor: v, tokenizer: Simple, n_gram: 3, target_threshold: 0.3 }")
    d.run(
      """?[k, v] <- [
        |    ['b', 'the world is square!'],
        |    ['c', 'see you at the end of the world!'],
        |    ['d', 'the world is the world and makes the world go around'],
        |    ['e', 'the world is the world and makes the world not go around']
        |] :put a {k => v}""".stripMargin)
    assert(d.run("::columns a:lsh").count() >= 2)
    assert(d.run("?[src_k, h] := *a:lsh{src_k, hash: h}").count() > 0)
    val hits = rows(d, "?[k, v] := ~a:lsh{k, v | query: 'see him at the end of the world'}")
    assert(hits.map(_.head).contains("c"))
    assert(d.run("::indices a").collect().map(_.getString(0)).contains("a:lsh"))
    d.run("::lsh drop a:lsh")
    intercept[Exception](d.run("?[k] := ~a:lsh{k | query: 'x'}"))
  }

  test("test_lsh_indexing2 (tests.rs:857): self-match found at every threshold") {
    for (i <- 1 until 10) {
      val d = db()
      d.run(":create a {k: String => v: String}")
      d.run("::lsh create a:lsh {extractor: v, tokenizer: NGram, n_gram: 3, target_threshold: $t }",
        Map("t" -> i / 10.0))
      d.run("?[k, v] <- [['a', 'ewiygfspeoighjsfcfxzdfncalsdf']] :put a {k => v}")
      assert(rows(d, "?[k] := ~a:lsh{k | query: 'ewiygfspeoighjsfcfxzdfncalsdf', k: 1}").nonEmpty,
        s"threshold ${i / 10.0}")
    }
  }

  test("test_lsh_indexing3 (tests.rs:879): defaults fill omitted columns; named probe binds") {
    val text = "This function first generates 32 random bytes using the os.urandom function. " +
      "It then base64 encodes these bytes using base64.urlsafe_b64encode, removes the padding, " +
      "and decodes the result to a string."
    for (i <- Seq(1, 5, 9)) {
      val d = db()
      d.run(":create text {id: String, => text: String, url: String? default null, " +
        "dt: Float default now(), dup_for: String? default null }")
      d.run("::lsh create text:lsh { extractor: text, tokenizer: NGram, n_perm: 200, " +
        "target_threshold: $t, n_gram: 7 }", Map("t" -> i / 10.0))
      d.run(s"?[id, text] <- [['a', '$text']] :put text {id, text}")
      val res = rows(d, s"?[id, dup_for] := ~text:lsh{id: id, dup_for: dup_for | query: '$text'}")
      assert(res.nonEmpty, s"threshold ${i / 10.0}")
      assert(res.head == Seq("a", null)) // dup_for defaulted to null
      // dt defaulted to now(): a recent epoch-seconds float
      val dt = rows(d, "?[dt] := *text{dt}").head.head.toString.toDouble
      assert(math.abs(dt - System.currentTimeMillis() / 1000.0) < 600)
    }
  }

  test("test_lsh_indexing4 (tests.rs:950): probe reflects :rm") {
    val d = db()
    d.run(":create a {k: String => v: String}")
    d.run("::lsh create a:lsh {extractor: v, tokenizer: NGram, n_gram: 3, target_threshold: 0.5 }")
    d.run("?[k, v] <- [['a', 'ewiygfspeoighjsfcfxzdfncalsdf']] :put a {k => v}")
    d.run("?[k] <- [['a']] :rm a {k}")
    assert(rows(d, "?[k] := ~a:lsh{k | query: 'ewiygfspeoighjsfcfxzdfncalsdf', k: 1}").isEmpty)
  }

  test("test_insertions (tests.rs:1040): vector defaults, admission + probe filters, radius") {
    val d = db()
    d.run(":create a {k => v: <F32; 64> default rand_vec(64)}")
    d.run("?[k] <- [[1]] :put a {k}")
    assert(rows(d, "?[k, v] := *a{k, v}").head(1)
      .asInstanceOf[scala.collection.Seq[Any]].length == 64)
    d.run("::hnsw create a:i { fields: [v], dim: 64, ef: 16, filter: k % 3 == 0, m: 32 }")
    // the index scans as its proximity graph (the reference's own
    // scan here is ?[count(fr_k)] := *a:i{fr_k}, tests.rs:1054); one
    // layer-0 self-loop per admitted row
    def admitted(): Seq[Seq[Any]] =
      rows(d, "?[count(fr_k)] := *a:i{layer: 0, fr_k, to_k}, fr_k == to_k")
    assert(admitted() == Seq(Seq(0L))) // k=1 not admitted
    d.run("?[k] <- [[1]] :put a {k}") // upsert regenerates the default
    d.run("?[k] := k in int_range(300) :put a {k}")
    assert(admitted() == Seq(Seq(100L))) // 0,3,...,297
    val res = rows(d,
      """?[dist, k] := ~a:i{k | query: v, bind_distance: dist, k: 10, ef: 50,
        |                     filter: k % 2 == 0, radius: 245}, *a{k: 96, v}""".stripMargin)
    assert(res.length <= 10 && res.nonEmpty)
    assert(res.forall { r =>
      val k = r(1).asInstanceOf[Long]
      k % 2 == 0 && k % 3 == 0 && r.head.asInstanceOf[Double] <= 245.0
    })
    // the probe vector is k=96's own (admitted, even): self at distance 0
    assert(res.exists(r => r(1) == 96L && r.head.asInstanceOf[Double] == 0.0))
  }

  test("test_vec_index_insertion (tests.rs:742 shape): admission filter reacts to :update") {
    val d = db()
    d.run(
      """?[k, v, m] <- [['a', [1.0, 2.0], true],
        |               ['b', [2.0, 3.0], false]]
        |:create a {k: String => v: <F32; 2>, m: Bool}""".stripMargin)
    d.run("::hnsw create a:vec { dim: 2, m: 50, dtype: F32, fields: [v], distance: L2, ef_construction: 20, filter: m }")
    // only m=true rows are admitted (the reference scans its HNSW graph
    // rows here; our scannable surface is the admitted flat set)
    assert(rows(d, "?[k] := *a:vec[k, v]") == Seq(Seq("a")))
    d.run("?[k, m] <- [['a', false]] :update a {}")
    assert(rows(d, "?[k] := *a:vec[k, v]").isEmpty)
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
