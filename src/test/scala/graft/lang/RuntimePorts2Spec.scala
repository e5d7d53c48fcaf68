package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Second batch of reference runtime-test ports
  * (cozo-core/src/runtime/tests.rs) — mutation shorthands, underscore
  * semantics, temp-relation scoping, imperative corner cases, index
  * lifecycle. Together with RuntimePortsSpec this covers every
  * assertion-bearing test in the file (into_payload is ported against
  * the programmatic put/rm API, our analogue of the NamedRows helper).
  */
class RuntimePorts2Spec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def db() = new CozoDb(spark)
  def rows(d: CozoDb, s: String): Seq[Seq[Any]] =
    d.run(s).collect().toSeq.map(_.toSeq)
  def ok(d: CozoDb, s: String): Unit = { d.run(s).collect(); () }
  def fails(d: CozoDb, s: String): Unit = {
    val r = scala.util.Try(d.run(s).collect())
    assert(r.isFailure, s"expected failure from: $s")
  }

  test("default_columns (tests.rs): ts default now() fills on put") {
    val d = db()
    ok(d, ":create status {uid: String, ts default now() => quitted: Bool, mood: String}")
    ok(d, "?[uid, quitted, mood] <- [['z', true, 'x']] :put status {uid => quitted, mood}")
    val r = rows(d, "?[uid, ts] := *status{uid, ts}")
    assert(r.length == 1 && r.head(1) != null) // ts filled by its default
  }

  test("rm_does_not_need_all_keys (tests.rs)") {
    val d = db()
    ok(d, ":create status2 {uid => mood}")
    ok(d, "?[uid, mood] <- [[1, 2]] :put status2 {uid => mood}")
    fails(d, "?[uid, mood] <- [[2]] :put status2 {uid}")
    ok(d, "?[uid, mood] <- [[3, 2]] :rm status2 {uid => mood}")
    ok(d, "?[uid] <- [[1]] :rm status2 {uid}")
    assert(rows(d, "?[uid] := *status2{uid}").isEmpty)
  }

  test("deletion (tests.rs): delete requires the key to exist") {
    val d = db()
    ok(d, ":create da {x => y}")
    fails(d, "?[x] <- [[1]] :delete da {x}")
    ok(d, "?[x, y] <- [[1, 2]] :insert da {x => y}")
    ok(d, "?[x] <- [[1]] :delete da {x}")
    assert(rows(d, "?[x] := *da[x, y]").isEmpty)
  }

  test("update_shall_work (tests.rs): partial update keeps other columns") {
    val d = db()
    ok(d, "?[x, y, z] <- [[1, 2, 3]] :create uz {x => y, z}")
    assert(rows(d, "?[x, y, z] := *uz {x, y, z}") == Seq(Seq(1L, 2L, 3L)))
    ok(d, "?[x, y] <- [[1, 4]] :update uz {x, y}")
    assert(rows(d, "?[x, y, z] := *uz {x, y, z}") == Seq(Seq(1L, 4L, 3L)))
  }

  test("update_shall_not_destroy_values (tests.rs): key-only update is a no-op") {
    val d = db()
    ok(d, "?[x, y] <- [[1, 2]] :create uw {x => y default 0}")
    ok(d, "?[x] <- [[1]] :update uw {x}")
    assert(rows(d, "?[x, y] := *uw {x, y}") == Seq(Seq(1L, 2L)))
  }

  test("short_hand (tests.rs): empty braces mean all declared columns") {
    val d = db()
    ok(d, ":create sh {x => y, z}")
    ok(d, "?[x, y, z] <- [[1, 2, 3]] :put sh {}")
    assert(rows(d, "?[x, y, z] := *sh {x, y, z}") == Seq(Seq(1L, 2L, 3L)))
  }

  test("param_shorthand (tests.rs): $params in const rows name the columns") {
    val d = db()
    val r = d.run("?[] <- [[$x, $y, $z]] :create px {}",
      Map("x" -> 1L, "y" -> 2L, "z" -> 3L))
    assert(rows(d, "?[x, y, z] := *px {x, y, z}") == Seq(Seq(1L, 2L, 3L)))
  }

  test("do_not_unify_underscore (tests.rs)") {
    val d = db()
    assert(rows(d,
      """r1[] <- [[1, 'a'], [2, 'b']]
        |r2[] <- [[2, 'B'], [3, 'C']]
        |?[l1, l2] := r1[_, l1], r2[_, l2]""".stripMargin).length == 4)
    fails(d, "?[_] := _ = 1")
    assert(rows(d, "?[x] := x = 1, _ = 1, _ = 2").length == 1)
  }

  test("returning_relations (tests.rs): _temp relations live per-script") {
    val d = db()
    val r = rows(d,
      """{:create _xxz {a}}
        |{?[a] := a in [5,4,1,2,3] :put _xxz {a}}
        |{?[a] := *_xxz[a], a % 2 == 0 :rm _xxz {a}}
        |{?[a] := *_xxz[b], a = b * 2}""".stripMargin)
    assert(r.map(_.head).toSet == Set(2L, 6L, 10L))
    // _xxz was temporary: a later script must not see it
    fails(d, "{?[a] := *_xxz[b], a = b * 2}")
  }

  test("parser_corner_case (tests.rs)") {
    val d = db()
    assert(rows(d, "?[x] := x = 1 or x = 2").length == 2)
    ok(d, "?[C] := C = 1  orx[C] := C = 1")
    ok(d, "?[C] := C = true, C  inx[C] := C = 1")
    assert(rows(d, "?[k] := k in int_range(300)").length == 300)
    assert(rows(d, "ywcc[a] <- [[1]] noto[A] := ywcc[A] ?[A] := noto[A]") == Seq(Seq(1L)))
  }

  test("bad_parse (tests.rs): truncated script is a parse error") {
    val d = db()
    ok(d, ":create named_hero_history {name: String, value: Bool, when_: Int}")
    fails(d, "?[hero] :=")
  }

  test("ensure_not under %ignore_error is an idempotent init (tests.rs)") {
    val d = db()
    ok(d,
      """%ignore_error { :create id_alloc {id: Int => next_id: Int, last_id: Int} }
        |%ignore_error {
        |  ?[id, next_id, last_id] <- [[0, 1, 1000]]
        |  :ensure_not id_alloc {id => next_id, last_id}
        |}""".stripMargin)
    // second run: create fails (exists) but is ignored; ensure_not sees
    // no conflicting row (nothing was ever put) so the script succeeds
    ok(d,
      """%ignore_error { :create id_alloc {id: Int => next_id: Int, last_id: Int} }
        |%ignore_error {
        |  ?[id, next_id, last_id] <- [[0, 1, 1000]]
        |  :ensure_not id_alloc {id => next_id, last_id}
        |}""".stripMargin)
  }

  test("crashy_imperative (tests.rs): loop with count guard terminates") {
    // the reference's own assertion is only that this does not crash —
    // a query condition is truthy when it returns ROWS
    // (imperative.rs:63), so the `z >= 10` row triggers %return on the
    // first pass there too (the 10-row variant is commented out in the
    // reference, tests.rs imperative_script)
    val d = db()
    d.run(
      """{:create _test {a}}
        |%loop
        |  %if { len[count(x)] := *_test[x]; ?[x] := len[z], x = z >= 10 }
        |    %then %return _test
        |  %end
        |  { ?[a] := a = rand_uuid_v4(); :put _test {a} }
        |%end""".stripMargin).collect()
  }

  test("as_store_in_imperative_script (tests.rs)") {
    val d = db()
    val r = rows(d,
      """{ ?[x, y, z] <- [[1, 2, 3], [4, 5, 6]] } as _store
        |{ ?[x, y, z] := *_store{x, y, z} }""".stripMargin)
    assert(r.toSet == Set(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))
    // aggregation results store too
    val r2 = rows(d,
      """{
        |  x[y] <- [[1], [2], [3]]
        |  ?[sum(y)] := x[y]
        |} as _last
        |{ ?[s] := *_last[s] }""".stripMargin)
    assert(r2.length == 1 && r2.head.head.asInstanceOf[Number].doubleValue() == 6.0)
  }

  test("sysop_in_imperatives (tests.rs): index creation inside blocks") {
    val d = db()
    ok(d,
      """{ :create cm_txt {tid: String => tag: String, dup_for: String?, text: String} }
        |{ ?[tid, tag, dup_for, text] <- [['t1', 'a', null, 'hello world hello']] :put cm_txt {} }
        |{ ::lsh create cm_txt:lsh {extractor: text, n_perm: 32, target_threshold: 0.5, n_gram: 3} }
        |{ ::relations }""".stripMargin)
  }

  test("multi_index_vec (tests.rs): hnsw over two vector fields + ::indices") {
    val d = db()
    ok(d, ":create product {id => name, price, name_vec: <F32; 1>, description_vec: <F32; 1>}")
    ok(d, "::hnsw create product:semantic {fields: [name_vec, description_vec], dim: 1, ef: 16, m: 32}")
    ok(d, """?[id, name, price, name_vec, description_vec] <- [[1, "name", 100, [1.0], [1.0]]]
            |:put product {}""".stripMargin)
    assert(rows(d, "::indices product").nonEmpty)
  }

  test("fts_drop (tests.rs)") {
    val d = db()
    ok(d, ":create entity {name}")
    ok(d, "::fts create entity:fts_index {extractor: name, tokenizer: Simple, filters: [Lowercase]}")
    ok(d, "::fts drop entity:fts_index")
  }

  test("strict_checks_for_fixed_rules_args (tests.rs): repeated bindings are illegal") {
    ok(db(), "r[] <- [[1, 2]]\n?[] <~ PageRank(r[_, _])")
    ok(db(), "r[] <- [[1, 2]]\n?[] <~ PageRank(r[a, b])")
    fails(db(), "r[] <- [[1, 2]]\n?[] <~ PageRank(r[a, a])")
  }

  test("hnsw_index (tests.rs): rich :create + hnsw over two fields + bound probe") {
    val d = db()
    ok(d,
      """:create beliefs {
        |  belief_id, character_id, belief,
        |  =>
        |  details: String default "",
        |  valence: Float default 0,
        |  belief_embedding: <F32; 8>,
        |  details_embedding: <F32; 8>,
        |}""".stripMargin)
    ok(d,
      """::hnsw create beliefs:embedding_space {
        |  dim: 8, m: 50, dtype: F32,
        |  fields: [belief_embedding, details_embedding],
        |  distance: Cosine, ef_construction: 20,
        |}""".stripMargin)
    ok(d,
      """?[belief_id, character_id, belief, belief_embedding, details_embedding] <-
        |  [[1, 10, "test", [1.0,0,0,0,0,0,0,1], [0,1.0,0,0,0,0,0,1]]]
        |:put beliefs {}""".stripMargin)
    val r = d.run(
      """?[belief, valence, dist, vector] := ~beliefs:embedding_space{ belief, valence |
        |  query: vec([1.0,0,0,0,0,0,0,1]), k: 10, ef: 20,
        |  bind_distance: dist, bind_vector: vector }
        |:order -valence
        |:order dist""".stripMargin).collect()
    assert(r.nonEmpty && r.head.getString(0) == "test")
    // bind_vector binds the MATCHED field's vector — here the
    // belief_embedding, which is closer to the query than details
    assert(r.head.getSeq[Float](3).head == 1.0f)
    // declared dim is enforced on probe queries
    fails(d,
      """?[belief] := ~beliefs:embedding_space{ belief |
        |  query: vec([1.0, 0]), k: 1 }""".stripMargin)
  }

  test("test_dependencies (query/stratify.rs:315): multi-layer aggregation strata") {
    ok(db(),
      """x[a] <- [[1], [2]]
        |w[a] := a in [2]
        |w[a] := w[b], a = b + 1, a < 10
        |y[count(a)] := x[a]
        |y[count(a)] := w[a]
        |z[count(a)] := y[a]
        |z[count(a)] := y[b], a = b + 1
        |?[a] := z[a]
        |?[a] := w[a]""".stripMargin)
  }

  test("strange_case (query/magic.rs:642): underscore in rule application") {
    val r = rows(db(),
      """x[A] := A = 1
        |y[A, A] := A = 1
        |y[A, B] := A = 0, B = 1, x[B]
        |?[C] := y[A, _], y[C, A]
        |:disable_magic_rewrite true""".stripMargin)
    assert(r.map(_.head).toSet == Set(0L, 1L))
  }

  test("test_mat_join (query/ra.rs:2381): unify before positional bind") {
    val r = rows(db(),
      """data[a, b] <- [[1, 2], [1, 3], [2, 3]]
        |?[x] := a = 3, data[x, a]""".stripMargin)
    assert(r.map(_.head).toSet == Set(1L, 2L))
  }

  test("into_payload analogue: query results feed back as mutations (tests.rs)") {
    val d = db()
    ok(d, ":create pa {x => y}")
    ok(d, "?[x, y] <- [[1, 2], [3, 4]] :insert pa {x => y}")
    val res = d.run("?[x, y] := *pa[x, y]")
    assert(res.count() == 2)
    d.rm("pa", res)
    assert(rows(d, "?[x, y] := *pa[x, y]").isEmpty)
    ok(d, ":create pb {m => n}")
    d.put("pb", res.toDF("m", "n"))
    assert(rows(d, "?[m, n] := *pb[m, n]").length == 2)
  }
}
