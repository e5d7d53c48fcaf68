package graft.lang

import graft.SparkFixture
import graft.functions.MemKey
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the cross-type total order (data/value.rs:
  * 143-174): the memcomparable key ([[graft.functions.MemKey]]) under
  * UTF8String binary comparison — exactly how Spark compares the key
  * column — must agree with an independent driver-side comparator
  * implementing the reference order directly over decoded values
  * (Null < Bool < Num < Str < List; numbers by value with int before
  * float on ties and exact int order beyond 2^53; strings by code
  * point; lists element-wise, recursively). Random values include
  * nested lists, NaN/±Infinity, 2^53-boundary longs, and strings
  * carrying the key's own terminator/escape code points.
  */
class AnyOrderFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  // ——— independent reference comparator over VALUES ———
  private def rank(v: Any): Int = v match {
    case null => 0
    case _: Boolean => 1
    case _: Long | _: Double => 2
    case _: String => 3
    case _: Seq[_] => 4
    case other => sys.error(s"unexpected $other")
  }
  private def cmpStr(a: String, b: String): Int = {
    val (x, y) = (a.codePoints.toArray, b.codePoints.toArray)
    var i = 0
    while (i < x.length && i < y.length) {
      if (x(i) != y(i)) return Integer.compare(x(i), y(i))
      i += 1
    }
    Integer.compare(x.length, y.length)
  }
  private def refCmp(a: Any, b: Any): Int = {
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) return Integer.compare(ra, rb)
    (a, b) match {
      case (null, null) => 0
      case (x: Boolean, y: Boolean) => x.compareTo(y)
      case (x: String, y: String) => cmpStr(x, y)
      case (x: Seq[_], y: Seq[_]) =>
        var i = 0
        while (i < x.length && i < y.length) {
          val c = refCmp(x(i), y(i))
          if (c != 0) return c
          i += 1
        }
        Integer.compare(x.length, y.length)
      case _ => // Num band
        def dbl(v: Any) = v match {
          case l: Long => l.toDouble
          case d: Double => d
        }
        // Double.compare is the reference's f64 band order (NaN last,
        // -0.0 < 0.0 — fuzz below avoids the -0.0 corner, where the
        // reference's OrderedFloat says Equal)
        val c = java.lang.Double.compare(dbl(a), dbl(b))
        if (c != 0) c
        else (a, b) match {
          case (_: Long, _: Double) => -1 // int before float on ties
          case (_: Double, _: Long) => 1
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case _ => 0
        }
    }
  }

  private def keyCmp(a: Any, b: Any): Int = Integer.signum(
    UTF8String.fromString(MemKey.keyOf(enc(a)))
      .compareTo(UTF8String.fromString(MemKey.keyOf(enc(b)))))
  private def enc(v: Any): String = AnyValue.encode(v) match {
    case null => null
    case s => s.toString
  }

  // ——— random value generator ———
  private def randValue(r: scala.util.Random, depth: Int): Any =
    r.nextInt(if (depth > 0) 12 else 9) match {
      case 0 => null
      case 1 => r.nextBoolean()
      case 2 => r.nextInt(21).toLong - 10
      case 3 => r.nextLong() // full-range longs, far past 2^53
      case 4 => Seq(9007199254740992L, 9007199254740993L, 9007199254740994L)(
        r.nextInt(3)) * (if (r.nextBoolean()) 1 else -1) // 2^53 boundary
      case 5 => (r.nextInt(21) - 10) / 2.0
      case 6 => Seq(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 9.007199254740992E15, 1.0E300,
        -1.0E-300)(r.nextInt(6))
      case 7 | 8 =>
        // grapheme units, never lone surrogates (lone surrogates have
        // no UTF-8 form, so byte order is undefined for them)
        val units = Seq("a", "b", ",", "\"", "\\", "[", "]", "{", "\n",
          "\t", 0.toChar.toString, 1.toChar.toString, 2.toChar.toString, "ü", "语", "😀")
        (0 until r.nextInt(6)).map(_ => units(r.nextInt(units.size))).mkString
      case _ => // list, recursive
        (0 until r.nextInt(4)).map(_ => randValue(r, depth - 1))
    }

  test("memcomparable key order ≡ reference value order on 6000 random pairs") {
    val r = new scala.util.Random(20260815)
    var checked = 0
    for (_ <- 0 until 6000) {
      val (a, b) = (randValue(r, 3), randValue(r, 3))
      val rc = Integer.signum(refCmp(a, b))
      val kc = keyCmp(a, b)
      assert(kc == rc,
        s"order mismatch: $a vs $b — ref $rc, key $kc " +
          s"(keys ${MemKey.keyOf(enc(a))} / ${MemKey.keyOf(enc(b))})")
      // injectivity: distinct values never collide on keys
      if (rc != 0) assert(MemKey.keyOf(enc(a)) != MemKey.keyOf(enc(b)))
      checked += 1
    }
    assert(checked == 6000)
  }

  test("key order is transitive on a fully sorted random sample") {
    val r = new scala.util.Random(7)
    val vs = (0 until 400).map(_ => randValue(r, 2)).toVector
    val bySort = vs.sortWith((a, b) => keyCmp(a, b) < 0)
    // adjacent pairs must satisfy the reference comparator
    for (Seq(a, b) <- bySort.sliding(2))
      assert(refCmp(a, b) <= 0, s"sorted order violates reference: $a > $b")
  }

  test("documented JSON-dump misorderings now match the reference: [2] < [10], [1] < ['a']") {
    assert(keyCmp(Seq(2L), Seq(10L)) == -1)
    assert(keyCmp(Seq(1L), Seq("a")) == -1)
    assert(keyCmp(Seq(1L, 2L), Seq(1L, 2L)) == 0)
    assert(keyCmp(Seq(1L), Seq(1.0)) == -1) // int-before-float inside lists
    assert(keyCmp(Seq(1L), Seq(1L, 0L)) == -1) // prefix first
    assert(keyCmp(null, Seq.empty[Any]) == -1)
  }

  test(":sort over a mixed Any column (lists included) orders by the reference total order") {
    val db = new CozoDb(spark)
    val rows = db.run(
      """?[i, v] <- [
        |  [0, [10]], [1, [2]], [2, ['a']], [3, [1, 'a']], [4, []],
        |  [5, 'b'], [6, 3], [7, 2.5], [8, true], [9, null],
        |  [10, [1, 2]], [11, [1]], [12, 3.0], [13, false], [14, 'a10'],
        |  [15, 'a2'], [16, [[2]]], [17, [[10]]]
        |]
        |:sort v""".stripMargin).collect().map(_.getLong(0)).toSeq
    // reference order: null < false < true < 2.5 < 3(int) < 3.0(float)
    // < 'a10' < 'a2' < 'b' < [] < [1] < [1,2] < [1,'a'] < [2] < [10]
    // < ['a'] < [[2]] < [[10]]
    assert(rows == Seq(9, 13, 8, 7, 6, 12, 14, 15, 5, 4, 11, 10, 3, 1, 0, 2, 16, 17),
      s"got $rows")
  }

  test("comparisons against LIST literals work on Any columns and follow the total order") {
    val db = new CozoDb(spark)
    val lt = db.run(
      """d[i, v] <- [[0, [2]], [1, [10]], [2, [1, 'a']], [3, 'z'], [4, 3]]
        |?[i] := d[i, v], v < [2]""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    // < [2]: numbers and strings rank below lists; [1,'a'] < [2]
    assert(lt == Set(2L, 3L, 4L), s"got $lt")
    val eq = db.run(
      """d[i, v] <- [[0, [1, 'a']], [1, [1]], [2, 'x']]
        |?[i] := d[i, v], v == [1, 'a']""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(eq == Set(0L), s"got $eq")
  }
}
