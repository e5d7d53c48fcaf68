package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's validity test (cozo-core/src/data/tests/
  * validity.rs:16 test_validity): `col: Validity` schema annotation,
  * raw `[micros, is_assert]` pair literals, reserved-sentinel
  * rejection, ASSERT/RETRACT coercions, and the @ "NOW" / @ "END"
  * travel sentinels.
  */
class ValidityPortsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def count(db: CozoDb, script: String): Long = db.run(script).count()

  test("test_validity (validity.rs:16): Validity column end-to-end") {
    val db = new CozoDb(spark)
    db.run(":create vld {a, v: Validity => d}")

    // i64 MAX/MIN are the reserved inf/neg_inf sentinels — rejected
    assert(scala.util.Try(db.run(
      "?[a, v, d] <- [[1, [9223372036854775807, true], null]] :put vld {a, v => d}")).isFailure)
    assert(scala.util.Try(db.run(
      "?[a, v, d] <- [[1, [-9223372036854775808, true], null]] :put vld {a, v => d}")).isFailure)

    db.run("?[a, v, d] <- [[1, [0, true], 0]] :put vld {a, v => d}")
    assert(count(db, "?[a, v, d] := *vld{a, v, d @ 'NOW'}") == 1)
    assert(count(db, "?[a, v, d] := *vld{a, v, d}") == 1)

    // a later retraction hides the key at NOW but adds a version
    db.run("?[a, v, d] <- [[1, [1, false], 1]] :put vld {a, v => d}")
    assert(count(db, "?[a, v, d] := *vld{a, v, d @ 'NOW'}") == 0)
    assert(count(db, "?[a, v, d] := *vld{a, v, d}") == 2)

    // "ASSERT" = assert at the current instant — visible again
    db.run("?[a, v, d] <- [[1, 'ASSERT', 2]] :put vld {a, v => d}")
    val rows = db.run("?[a, v, d] := *vld{a, v, d @ 'NOW'}").collect()
    assert(rows.length == 1 && rows.head.get(2) == 2L)
    assert(count(db, "?[a, v, d] := *vld{a, v, d}") == 3)

    // "RETRACT" = retract at the current instant
    db.run("?[a, v, d] <- [[1, 'RETRACT', 3]] :put vld {a, v => d}")
    assert(count(db, "?[a, v, d] := *vld{a, v, d @ 'NOW'}") == 0)
    assert(count(db, "?[a, v, d] := *vld{a, v, d}") == 4)

    // a far-future assert (i64 MAX - 1 µs) is invisible at NOW but is
    // the newest version at END
    db.run("?[a, v, d] <- [[1, [9223372036854775806, true], null]] :put vld {a, v => d}")
    assert(count(db, "?[a, v, d] := *vld{a, v, d @ 'NOW'}") == 0)
    val endRows = db.run("?[a, v, d] := *vld{a, v, d @ 'END'}").collect()
    assert(endRows.length == 1 && endRows.head.get(2) == null)
    assert(count(db, "?[a, v, d] := *vld{a, v, d}") == 5)
  }
}
