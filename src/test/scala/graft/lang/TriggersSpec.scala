package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Script-level triggers and change callbacks, ported from the
  * reference's runtime tests (cozo-core/src/runtime/tests.rs:348
  * test_trigger, :397 test_callback; machinery relation.rs:553-585,
  * db.rs:789-830, query/stored.rs:696-737).
  */
class TriggersSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  def db2(): CozoDb = {
    val db = new CozoDb(spark)
    db.registerTable("friends",
      Seq.empty[(Long, Long, Long)].toDF("fr", "to", "data"), Seq("fr", "to"))
    db.registerTable("friends_rev",
      Seq.empty[(Long, Long, Long)].toDF("to", "fr", "data"), Seq("to", "fr"))
    db
  }

  test("::set_triggers fires put/rm queries with _new/_old bound (tests.rs:348)") {
    val db = db2()
    db.run(
      """::set_triggers friends
        |on put {
        |  ?[to, fr, data] := _new[fr, to, data]
        |  :put friends_rev {to, fr}
        |}
        |on rm {
        |  ?[to, fr] := _old[fr, to, data]
        |  :rm friends_rev {to, fr}
        |}""".stripMargin)
    db.run("?[fr, to, data] <- [[1, 2, 3]] :put friends {fr, to}")
    assert(db.relation("friends").collect().map(_.toSeq).toSeq == Seq(Seq(1L, 2L, 3L)))
    assert(db.relation("friends_rev").collect().map(_.toSeq).toSeq == Seq(Seq(2L, 1L, 3L)))
    db.run("?[fr, to] <- [[1, 2], [2, 3]] :rm friends {fr, to}")
    assert(db.relation("friends").isEmpty)
    assert(db.relation("friends_rev").isEmpty)
  }

  test("::show_triggers lists them; bare ::set_triggers clears") {
    val db = db2()
    db.run("::set_triggers friends on put { ?[fr, to, data] := _new[fr, to, data] :put friends_rev {to, fr} }")
    val shown = db.run("::show_triggers friends").collect()
    assert(shown.length == 1 && shown.head.getString(0) == "put")
    db.run("::set_triggers friends")
    assert(db.run("::show_triggers friends").isEmpty)
  }

  test("registerCallback observes put and rm with new/old rows (tests.rs:397)") {
    val db = db2()
    val collected = ArrayBuffer.empty[(String, Long, Long)]
    val id = db.registerCallback("friends") { (op, nw, old) =>
      collected += ((op, nw.count(), old.count()))
    }
    db.run("?[fr, to, data] <- [[1, 2, 3], [4, 5, 6]] :put friends {fr, to}")
    db.run("?[fr, to, data] <- [[1, 2, 4], [4, 7, 6]] :put friends {fr, to}")
    db.run("?[fr, to] <- [[1, 9], [4, 5]] :rm friends {fr, to}")
    assert(collected.toSeq == Seq(("put", 2L, 0L), ("put", 2L, 1L), ("rm", 2L, 1L)))
    assert(db.unregisterCallback(id))
    db.run("?[fr, to, data] <- [[8, 9, 1]] :put friends {fr, to}")
    assert(collected.length == 3)
  }

  test("mutations inside a trigger do not re-fire triggers (propagate_triggers=false)") {
    val db = db2()
    // a self-feeding put trigger would loop forever if nested mutations fired
    db.run(
      """::set_triggers friends
        |on put {
        |  ?[fr, to, data] := _new[fr, to, data], to2 = to + 1, fr2 = fr
        |  :put friends {fr, to}
        |}""".stripMargin)
    db.run("?[fr, to, data] <- [[1, 2, 3]] :put friends {fr, to}")
    assert(db.relation("friends").count() == 1)
  }
}
