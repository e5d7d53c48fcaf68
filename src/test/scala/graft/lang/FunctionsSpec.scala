package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function semantics ported from the reference's function tests
  * (cozo-core/src/data/tests/functions.rs), exercised through the
  * script front-end so registry + compiler dispatch are both covered.
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  def db() = new CozoDb(spark)

  def one(script: String): Any =
    db().run(script).collect().head.get(0)

  test("regex_replace replaces only the first occurrence (functions.rs:1401)") {
    assert(one("?[x] := x = regex_replace('aaa', 'a', 'b')") == "baa")
    assert(one("?[x] := x = regex_replace('x1y2z', '[0-9]', '_')") == "x_y2z")
  }

  test("regex_replace_all replaces every occurrence (functions.rs:1411)") {
    assert(one("?[x] := x = regex_replace_all('aaa', 'a', 'b')") == "bbb")
  }

  test("regex_extract_first returns first match or null (functions.rs:1435)") {
    assert(one("?[x] := x = regex_extract_first('ab12cd34', '[0-9]+')") == "12")
    assert(one("?[x] := x = regex_extract_first('abcd', '[0-9]+')") == null)
  }

  test("regex_matches works with a non-literal pattern") {
    val out = db().run(
      """r[s, p] <- [['hello', 'l+o'], ['world', '^x']]
        |?[s, m] := r[s, p], m = regex_matches(s, p)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("hello" -> true, "world" -> false))
  }

  test("pad_start / pad_end honor length and pad arguments") {
    assert(one("?[x] := x = pad_start('7', 3, '0')") == "007")
    assert(one("?[x] := x = pad_end('7', 3, '0')") == "700")
    assert(one("?[x] := x = pad_start('ab', 4)") == "  ab")
    // lpad truncates when the string is longer than the target length
    assert(one("?[x] := x = pad_start('hello', 3, '0')") == "hel")
  }

  test("unicode_normalize applies literal forms and rejects non-literal") {
    assert(one("?[x] := x = unicode_normalize('Ａｂｃ', 'nfkc')") == "Abc")
    val e = intercept[Compiler.CompileException](
      db().run("?[x] := f = 'nfc', x = unicode_normalize('a', f)"))
    assert(e.getMessage.contains("literal"))
  }

  test("uuid_timestamp extracts time from v1 surrogate, null for v4 (functions.rs:2556)") {
    val ts = one("?[x] := x = uuid_timestamp(rand_uuid_v1())").asInstanceOf[Double]
    assert(math.abs(ts - System.currentTimeMillis() / 1000.0) < 300)
    assert(one("?[x] := x = uuid_timestamp(rand_uuid_v4())") == null)
  }

  test("bytes bitwise scalars (functions.rs:1126-1176)") {
    // 0xF0 & 0x3C = 0x30; | = 0xFC; ^ = 0xCC; ~0xF0 = 0x0F
    assert(one("?[x] := x = encode_base64(bit_and(decode_base64('8A=='), decode_base64('PA==')))") == "MA==")
    assert(one("?[x] := x = encode_base64(bit_or(decode_base64('8A=='), decode_base64('PA==')))") == "/A==")
    assert(one("?[x] := x = encode_base64(bit_xor(decode_base64('8A=='), decode_base64('PA==')))") == "zA==")
    assert(one("?[x] := x = encode_base64(bit_not(decode_base64('8A==')))") == "Dw==")
    // length mismatch → null (reference errors; null is our non-throwing analogue)
    assert(one("?[x] := x = bit_and(decode_base64('8A=='), decode_base64('8PA='))") == null)
  }

  test("bit_and/or/xor AGGREGATES fold bytes byte-wise (aggr.rs:985-1123)") {
    def agg(name: String, expect: String) = {
      val script =
        s"""r[$name(x)] := x in [decode_base64('8A=='), decode_base64('PA==')]
           |?[y] := r[b], y = encode_base64(b)""".stripMargin
      assert(one(script) == expect, name)
    }
    agg("bit_and", "MA==") // 0xF0 & 0x3C = 0x30
    agg("bit_or", "/A==")  // 0xF0 | 0x3C = 0xFC
    agg("bit_xor", "zA==") // 0xF0 ^ 0x3C = 0xCC
    // mismatched operand lengths must error, as in the reference
    val e = intercept[Exception](db().run(
      "?[bit_or(x)] := x in [decode_base64('8A=='), decode_base64('8PA=')]").collect())
    assert(e.getMessage != null)
  }

  test("json_object builds objects with literal keys (functions.rs:185)") {
    assert(one("?[x] := x = json_object('a', 1, 'b', 'two')") == """{"a":1,"b":"two"}""")
    assert(one("?[x] := x = json_object()") == "{}")
  }

  test("get_json_path navigates nested keys; set/remove handle top level") {
    assert(one("""?[x] := x = get_json_path('{"a": {"b": 5}}', ['a', 'b'])""") == "5")
    assert(one("""?[x] := x = set_json_path('{"a":"1"}', ['b'], 'y')""") == """{"a":"1","b":"y"}""")
    assert(one("""?[x] := x = remove_json_path('{"a":"1","b":"2"}', ['b'])""") == """{"a":"1"}""")
  }

  test("json_to_scalar unquotes strings and passes scalars through (functions.rs:316)") {
    assert(one("""?[x] := x = json_to_scalar('"hello"')""") == "hello")
    assert(one("?[x] := x = json_to_scalar('42')") == "42")
  }

  test("-> and get_json_path reject non-literal paths") {
    val e = intercept[Compiler.CompileException](
      db().run("""?[x] := k = 'a', x = get_json_path('{"a":1}', k)"""))
    assert(e.getMessage.contains("literal"))
  }

  test("split accepts non-literal separators") {
    val out = db().run(
      """r[s, sep] <- [['a,b,c', ','], ['x-y', '-']]
        |?[parts] := r[s, sep], parts = split(s, sep)""".stripMargin)
      .collect().map(_.getSeq[String](0).toSeq).toSet
    assert(out == Set(Seq("a", "b", "c"), Seq("x", "y")))
  }

  test("exp2 / is_uuid / is_vec / is_json / json / validity constructors") {
    assert(one("?[x] := x = exp2(10)") == 1024.0)
    assert(one("?[x] := x = is_uuid(rand_uuid_v4())") == true)
    assert(one("?[x] := x = is_uuid('nope')") == false)
    assert(one("?[x] := x = is_vec(vec([1.0, 2.0]))") == true)
    assert(one("?[x] := x = is_vec('hello')") == false)
    assert(one("""?[x] := x = is_json('{"a": 1}')""") == true)
    assert(one("?[x] := x = is_json('plain words')") == false)
    assert(one("?[x] := x = json([1, 2])") == "[1,2]")
    assert(one("?[x] := x = json(5)") == "5")
    val v = one("?[x] := x = validity('~2024-01-01T00:00:00Z')")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(!v.getBoolean(1)) // retraction flag
  }

  test("rand_bernoulli and rand_vec have the right shapes") {
    val b = one("?[x] := x = rand_bernoulli(0.5)")
    assert(b.isInstanceOf[Boolean])
    assert(one("?[x] := x = length(rand_vec(4))") == 4)
    // p outside [0, 1] is an error (functions.rs:1337)
    assert(scala.util.Try(one("?[x] := x = rand_bernoulli(1.1)")).isFailure)
  }
}
