package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Complete port of the reference's scalar-function test corpus
  * (cozo-core/src/data/tests/functions.rs, all 55 test fns), driven
  * through the script front-end so parser, compiler dispatch and
  * registry are all exercised.
  *
  * Documented deviations from the reference (static column typing):
  * - results that the reference types per-VALUE (int vs float) surface
  *   as one static Spark type (e.g. `max(1.0, 2, 3, 4)` is 4.0 not 4;
  *   `signum(0.1)` is 1.0 not 1) — values always match, asserted via
  *   numeric comparison;
  * - comparisons with null operands yield null (SQL 3VL) where the
  *   reference raises — asserted as null, never as a wrong value;
  * - heterogeneous list literals (`[1, []]`) lower to struct pairs, so
  *   the nested-empty-list case of test_list is not expressible.
  */
class FunctionPortsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def db() = new CozoDb(spark)
  def one(script: String): Any = db().run(script).collect().head.get(0)
  /** evaluate a scalar expression */
  def v(expr: String): Any = one(s"?[x] := x = $expr")
  def num(expr: String): Double = v(expr) match {
    case n: java.lang.Number => n.doubleValue()
    case other => fail(s"expected number from $expr, got $other")
  }
  def seqOf(expr: String): Seq[Any] = v(expr) match {
    case s: scala.collection.Seq[_] => s.toSeq.map {
      case inner: scala.collection.Seq[_] => inner.toSeq
      case x => x
    }
    case a: Array[_] => a.toSeq
    case other => fail(s"expected list from $expr, got $other")
  }
  def fails(expr: String): Unit = {
    val r = scala.util.Try(v(expr))
    assert(r.isFailure, s"expected an error from $expr, got ${r.getOrElse("?")}")
  }
  def approx(a: Double, b: Double, tol: Double = 1e-5): Boolean = math.abs(a - b) <= tol

  test("add (functions.rs:19)") {
    assert(v("1 + 2") == 3L)
    assert(v("1 + 2.5") == 3.5)
    assert(v("1.5 + 2.5") == 4.0)
  }

  test("sub (functions.rs:37)") {
    assert(v("1 - 2") == -1L)
    assert(v("1 - 2.5") == -1.5)
    assert(v("1.5 - 2.5") == -1.0)
  }

  test("mul (functions.rs:53)") {
    assert(v("2 * 3") == 6L)
    assert(v("0.5 * 0.25") == 0.125)
    assert(v("0.5 * 3") == 1.5)
  }

  test("div is always float division (functions.rs:70)") {
    assert(v("1 / 1") == 1.0)
    assert(v("1 / 2") == 0.5)
    assert(v("7.0 / 0.5") == 14.0)
  }

  test("eq / neq across int-float (functions.rs:87)") {
    assert(v("1 == 1.0") == true)
    assert(v("123 == 123") == true)
    assert(v("1 != 1.0") == false)
    assert(v("123 != 123.0") == false)
    assert(v("123 == 123.1") == false)
  }

  test("list constructor (functions.rs:111)") {
    assert(seqOf("[]") == Seq())
    assert(seqOf("list(1)") == Seq(1L))
    assert(seqOf("list(1, 2)") == Seq(1L, 2L))
  }

  test("is_in (functions.rs:124)") {
    assert(v("is_in(1, [1, 2])") == true)
    assert(v("is_in(3, [1, 2])") == false)
    assert(v("is_in(3, [])") == false)
  }

  test("comparators int-float mixes (functions.rs:148)") {
    assert(v("2 >= 1") == true); assert(v("2.0 >= 1") == true)
    assert(v("2 >= 1.0") == true); assert(v("1 >= 1") == true)
    assert(v("1 >= 1.0") == true); assert(v("1 >= 2") == false)
    assert(v("2 > 1") == true); assert(v("2.0 > 1") == true)
    assert(v("2 > 1.0") == true); assert(v("1 > 1") == false)
    assert(v("1 > 1.0") == false); assert(v("1 > 2") == false)
    assert(v("2 <= 1") == false); assert(v("2.0 <= 1") == false)
    assert(v("2 <= 1.0") == false); assert(v("1 <= 1") == true)
    assert(v("1 <= 1.0") == true); assert(v("1 <= 2") == true)
    assert(v("2 < 1") == false); assert(v("1 < 1") == false)
    assert(v("1 < 2") == true)
    // deviation: reference raises on null operands; SQL 3VL yields null
    assert(v("null >= true") == null)
  }

  test("scalar max / min (functions.rs:253)") {
    assert(num("max(1)") == 1)
    assert(num("max(1, 2, 3, 4)") == 4)
    assert(num("max(1.0, 2, 3, 4)") == 4)
    assert(num("max(1, 2, 3, 4.0)") == 4)
    assert(num("min(1)") == 1)
    assert(num("min(1, 2, 3, 4)") == 1)
    assert(num("min(1.0, 2, 3, 4)") == 1)
    assert(num("min(1, 2, 3, 4.0)") == 1)
    fails("max(true)")
    fails("min('a', 'b')")
  }

  test("minus incl. infinities (functions.rs:322)") {
    assert(v("minus(-1)") == 1L)
    assert(v("minus(1)") == -1L)
    assert(num("minus(to_float('INF'))") == Double.NegativeInfinity)
    assert(num("minus(to_float('NEG_INF'))") == Double.PositiveInfinity)
  }

  test("abs (functions.rs:342)") {
    assert(v("abs(-1)") == 1L)
    assert(v("abs(1)") == 1L)
    assert(v("abs(-1.5)") == 1.5)
  }

  test("signum: sign bit of -0.0, NaN passthrough (functions.rs:352)") {
    assert(num("signum(0.1)") == 1)
    assert(num("signum(-0.1)") == -1)
    assert(num("signum(0.0)") == 0)
    assert(num("signum(-0.0)") == -1)
    assert(num("signum(-3)") == -1)
    assert(num("signum(to_float('NEG_INF'))") == -1)
    assert(num("signum(to_float('NAN'))").isNaN)
  }

  test("floor / ceil preserve int-ness (functions.rs:385)") {
    assert(v("floor(-1)") == -1L)
    assert(v("floor(-1.5)") == -2.0)
    assert(v("floor(1.5)") == 1.0)
    assert(v("ceil(-1)") == -1L)
    assert(v("ceil(-1.5)") == -1.0)
    assert(v("ceil(1.5)") == 2.0)
  }

  test("round half-away-from-zero (functions.rs:413)") {
    assert(num("round(0.6)") == 1.0)
    assert(num("round(0.5)") == 1.0)
    assert(num("round(1.5)") == 2.0)
    assert(num("round(-0.6)") == -1.0)
    assert(num("round(-0.5)") == -1.0)
    assert(num("round(-1.5)") == -2.0)
  }

  test("exp / exp2 / ln / log2 / log10 (functions.rs:441-478)") {
    assert(approx(num("exp(1)"), math.E))
    assert(approx(num("exp(50.1)"), math.exp(50.1), math.exp(50.1) * 1e-10))
    assert(num("exp2(10.0)") == 1024.0)
    assert(approx(num("ln(exp(1))"), 1.0))
    assert(num("log2(1024)") == 10.0)
    assert(num("log10(1000)") == 3.0)
  }

  test("trig (functions.rs:486)") {
    val pi = math.Pi
    assert(approx(num(s"sin($pi / 2)"), 1.0))
    assert(approx(num(s"cos($pi / 2)"), 0.0))
    assert(approx(num(s"tan($pi / 4)"), 1.0))
  }

  test("inverse trig (functions.rs:505)") {
    assert(approx(num("asin(1.0)"), math.Pi / 2))
    assert(approx(num("acos(0)"), math.Pi / 2))
    assert(approx(num("atan(1)"), math.Pi / 4))
    assert(approx(num("atan2(-1, -1)"), -3 * math.Pi / 4))
  }

  test("pow returns float (functions.rs:529)") {
    assert(v("pow(2, 10)") == 1024.0)
  }

  test("mod: remainder semantics, int % 0 errors (functions.rs:537)") {
    assert(v("mod(-10, 7)") == -3L)
    assert(num("mod(5, 0.0)").isNaN)
    assert(num("mod(5.0, 0.0)").isNaN)
    assert(num("mod(5.0, 0)").isNaN)
    fails("mod(5, 0)")
  }

  test("boolean and / or / negate (functions.rs:549)") {
    assert(v("true && false") == false)
    assert(v("true || false") == true)
    assert(v("negate(false)") == true)
    assert(v("!false") == true)
  }

  test("bytes bitwise ops (functions.rs:567)") {
    // 0b111000 = 56 = base64 'OA==', 0b010101 = 21 = 'FQ=='
    def bytes(expr: String): Seq[Byte] = v(expr) match {
      case a: Array[Byte] => a.toSeq
      case s: Seq[_] => s.map(_.asInstanceOf[Byte])
      case other => fail(s"not bytes: $other")
    }
    assert(bytes("bit_and(decode_base64('OA=='), decode_base64('FQ=='))") == Seq(0x10.toByte))
    assert(bytes("bit_or(decode_base64('OA=='), decode_base64('FQ=='))") == Seq(0x3d.toByte))
    assert(bytes("bit_not(decode_base64('OA=='))") == Seq(0xc7.toByte))
    assert(bytes("bit_xor(decode_base64('OA=='), decode_base64('FQ=='))") == Seq(0x2d.toByte))
  }

  test("pack_bits / unpack_bits (functions.rs:599)") {
    assert(v("encode_base64(pack_bits([true]))") == "gA==") // 0b10000000
    assert(seqOf("unpack_bits(decode_base64('qg=='))") == // 0b10101010
      Seq(true, false, true, false, true, false, true, false))
  }

  test("concat on strings and lists (functions.rs:620)") {
    assert(v("concat('abc', 'def')") == "abcdef")
    assert(seqOf("concat([true, false], [true])") == Seq(true, false, true))
    assert(seqOf("[true, false] ++ [true]") == Seq(true, false, true))
  }

  test("str_includes (functions.rs:641)") {
    assert(v("str_includes('abcdef', 'bcd')") == true)
    assert(v("str_includes('abcdef', 'bd')") == false)
  }

  test("casings are unicode-aware (functions.rs:657)") {
    assert(v("lowercase('NAÏVE')") == "naïve")
    assert(v("uppercase('naïve')") == "NAÏVE")
  }

  test("trim / trim_start / trim_end (functions.rs:669)") {
    assert(v("trim(' a ')") == "a")
    assert(v("trim_start(' a ')") == "a ")
    assert(v("trim_end(' a ')") == " a")
  }

  test("starts_with / ends_with (functions.rs:685)") {
    assert(v("starts_with('abcdef', 'abc')") == true)
    assert(v("starts_with('abcdef', 'bc')") == false)
    assert(v("ends_with('abcdef', 'def')") == true)
    assert(v("ends_with('abcdef', 'bc')") == false)
  }

  test("regex matches / replace / extract (functions.rs:713)") {
    assert(v("regex_matches('abcdef', 'c.e')") == true)
    assert(v("regex_matches('abcdef', 'c.ef$')") == true)
    assert(v("regex_matches('abcdef', 'c.e$')") == false)
    assert(v("regex_replace('abcdef', '[be]', 'x')") == "axcdef")
    assert(v("regex_replace_all('abcdef', '[be]', 'x')") == "axcdxf")
    assert(seqOf("regex_extract('abCDefGH', '[xayef]|(GH)')") == Seq("a", "e", "f", "GH"))
    assert(v("regex_extract_first('abCDefGH', '[xayef]|(GH)')") == "a")
    assert(seqOf("regex_extract('abCDefGH', 'xyz')") == Seq())
    assert(v("regex_extract_first('abCDefGH', 'xyz')") == null)
  }

  test("type predicates (functions.rs:801)") {
    assert(v("is_null(null)") == true)
    assert(v("is_int(1)") == true)
    assert(v("is_int(1.0)") == false)
    assert(v("is_float(1)") == false)
    assert(v("is_float(1.0)") == true)
    assert(v("is_num(1)") == true)
    assert(v("is_num(1.0)") == true)
    assert(v("is_num(null)") == false)
    assert(v("is_bytes(decode_base64('AQ=='))") == true)
    assert(v("is_bytes(null)") == false)
    assert(v("is_list([])") == true)
    assert(v("is_list(null)") == false)
    assert(v("is_string('')") == true)
    assert(v("is_string(null)") == false)
    assert(v("is_finite(1.0)") == true)
    assert(v("is_finite(to_float('INF'))") == false)
    assert(v("is_finite(to_float('NAN'))") == false)
    assert(v("is_infinite(1.0)") == false)
    assert(v("is_infinite(to_float('INF'))") == true)
    assert(v("is_infinite(to_float('NEG_INF'))") == true)
    assert(v("is_infinite(to_float('NAN'))") == false)
    assert(v("is_nan(1.0)") == false)
    assert(v("is_nan(to_float('INF'))") == false)
    assert(v("is_nan(to_float('NAN'))") == true)
  }

  test("prepend / append accept null (functions.rs:909)") {
    assert(seqOf("prepend([1, 2], null)") == Seq(null, 1L, 2L))
    assert(seqOf("append([1, 2], null)") == Seq(1L, 2L, null))
  }

  test("length on strings, lists, bytes (functions.rs:937)") {
    assert(v("length('abc')") == 3)
    assert(v("length([])") == 0)
    assert(v("length(decode_base64(''))") == 0)
  }

  test("unicode_normalize nfc identity (functions.rs:953)") {
    assert(v("unicode_normalize('abc', 'nfc')") == "abc")
  }

  test("sorted / reverse with nulls (functions.rs:962)") {
    // mixed int/float lists are one static double column here (the
    // reference keeps 2 and 2.0 distinct; values match numerically)
    assert(seqOf("sorted([2.0, 1, 2, null])") == Seq(null, 1.0, 2.0, 2.0))
    assert(seqOf("reverse([2.0, 1, 2, null])") == Seq(null, 2.0, 1.0, 2.0))
  }

  test("haversine quarter-circle (functions.rs:996)") {
    assert(approx(num("haversine(0, 0, 0, 1.5707963267948966)"), math.Pi / 2))
    assert(approx(num("haversine_deg_input(0, 0, 0, 90)"), math.Pi / 2))
  }

  test("deg / rad conversions (functions.rs:1032)") {
    assert(approx(num("deg_to_rad(180)"), math.Pi))
    assert(approx(num("rad_to_deg(3.141592653589793)"), 180.0))
  }

  test("first / last: null on empty (functions.rs:1044)") {
    assert(v("first([])") == null)
    assert(v("last([])") == null)
    assert(v("first([1, 2])") == 1L)
    assert(v("last([1, 2])") == 2L)
  }

  test("chunks / chunks_exact / windows (functions.rs:1072)") {
    assert(seqOf("chunks([1, 2, 3, 4, 5], 2)") == Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L)))
    assert(seqOf("chunks_exact([1, 2, 3, 4, 5], 2)") == Seq(Seq(1L, 2L), Seq(3L, 4L)))
    assert(seqOf("windows([1, 2, 3, 4, 5], 3)") ==
      Seq(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), Seq(3L, 4L, 5L)))
  }

  test("get errors out-of-bounds, maybe_get is null (functions.rs:1141)") {
    fails("get([], 0)")
    assert(v("get([1, 2, 3], 1)") == 2L)
    assert(v("maybe_get([], 0)") == null)
    assert(v("maybe_get([1, 2, 3], 1)") == 2L)
  }

  test("slice: negative indices, out-of-bound errors (functions.rs:1174)") {
    fails("slice([1, 2, 3], 1, 4)")
    assert(seqOf("slice([1, 2, 3], 1, 3)") == Seq(2L, 3L))
    assert(seqOf("slice([1, 2, 3], 1, -1)") == Seq(2L))
  }

  test("chars round-trips through from_substrings (functions.rs:1213)") {
    assert(v("from_substrings(chars('abc'))") == "abc")
  }

  test("base64 round-trip (functions.rs:1221)") {
    assert(v("encode_base64(decode_base64('AQID'))") == "AQID")
  }

  test("to_string (functions.rs:1230)") {
    assert(v("to_string(false)") == "false")
  }

  test("to_unity (functions.rs:1238)") {
    assert(v("to_unity(null)") == 0L)
    assert(v("to_unity(false)") == 0L)
    assert(v("to_unity(true)") == 1L)
    assert(v("to_unity(10)") == 1L)
    assert(v("to_unity(1.0)") == 1L)
    assert(v("to_unity(to_float('NAN'))") == 1L)
    assert(v("to_unity('0')") == 1L)
    assert(v("to_unity('')") == 0L)
    assert(v("to_unity([])") == 0L)
    assert(v("to_unity([null])") == 1L)
  }

  test("to_float: named constants and strings (functions.rs:1279)") {
    assert(v("to_float(null)") == 0.0)
    assert(v("to_float(false)") == 0.0)
    assert(v("to_float(true)") == 1.0)
    assert(v("to_float(1)") == 1.0)
    assert(v("to_float(1.0)") == 1.0)
    assert(num("to_float('NAN')").isNaN)
    assert(num("to_float('INF')").isInfinite)
    assert(num("to_float('NEG_INF')").isInfinite)
    assert(num("to_float('PI')") == math.Pi)
    assert(num("to_float('E')") == math.E)
    assert(v("to_float('3')") == 3.0)
  }

  test("rand family shapes and bounds (functions.rs:1325)") {
    val f = num("rand_float()")
    assert(f >= 0.0 && f <= 1.0)
    assert(v("rand_bernoulli(0)") == false)
    assert(v("rand_bernoulli(1)") == true)
    fails("rand_bernoulli(2)")
    val n = num("rand_int(100, 200)")
    assert(n >= 100 && n <= 200)
    assert(v("rand_choose([])") == null)
    assert(v("rand_choose([123])") == 123L)
  }

  test("union / intersection / difference are n-ary (functions.rs:1355)") {
    assert(seqOf("union([1, 2, 3], [2, 3, 4], [3, 4, 5])").sortBy(_.toString) ==
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(seqOf("intersection([1, 2, 3, 4, 5, 6], [2, 3, 4], [3, 4, 5])") == Seq(3L, 4L))
    assert(seqOf("difference([1, 2, 3, 4, 5, 6], [2, 3, 4], [3, 4, 5])") == Seq(1L, 6L))
  }

  test("uuid helpers (functions.rs:1396)") {
    assert(v("is_uuid(rand_uuid_v4())") == true)
    assert(num("uuid_timestamp(rand_uuid_v1())") > 0)
    fails("to_uuid('')")
    assert(v("to_uuid('f3b4958c-52a1-11e7-802a-010203040506')") ==
      "f3b4958c-52a1-11e7-802a-010203040506")
  }

  test("now / format_timestamp / parse_timestamp round-trip (functions.rs:1406)") {
    val now = num("now()")
    assert(now > 1.7e9)
    val rt = num("parse_timestamp(format_timestamp(now()))")
    assert(math.abs(rt - now) <= 1.0)
  }

  test("to_bool by type (functions.rs:1414)") {
    assert(v("to_bool(null)") == false)
    assert(v("to_bool(true)") == true)
    assert(v("to_bool(false)") == false)
    assert(v("to_bool(0)") == false)
    assert(v("to_bool(0.0)") == false)
    assert(v("to_bool(1)") == true)
    assert(v("to_bool('')") == false)
    assert(v("to_bool('a')") == true)
    assert(v("to_bool([])") == false)
    assert(v("to_bool([0])") == true)
  }

  test("coalesce operator ~ (functions.rs:1458)") {
    assert(v("null ~ 1 ~ 2") == 1L)
    assert(v("null ~ null ~ null") == null)
    assert(v("2 ~ null ~ 1") == 2L)
  }

  test("expression_eval (data/tests/exprs.rs:12): if with no else is null") {
    assert(v("if(2 + 3 > 1 * 99999, 190291021 + 14341234212 / 2121)") == null)
    assert(v("if(2 + 3 > 1, true, false)") == true)
  }

  test("int_range incl. negative step (functions.rs:1472)") {
    assert(seqOf("int_range(1, 5)") == Seq(1L, 2L, 3L, 4L))
    assert(seqOf("int_range(5)") == Seq(0L, 1L, 2L, 3L, 4L))
    assert(seqOf("int_range(15, 3, -2)") == Seq(15L, 13L, 11L, 9L, 7L, 5L))
    assert(seqOf("int_range(3, 15, -2)") == Seq())
    assert(seqOf("int_range(5, 5)") == Seq())
  }
}
