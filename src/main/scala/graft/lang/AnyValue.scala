package graft.lang

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** Mixed-type (`Any`) column support.
  *
  * The reference's `DataValue` carries a TOTAL ORDER across all value
  * types (data/value.rs:143-174, derived Ord over the variant order
  * Null < Bool < Num < Str < Bytes < ... < List < ... < Json), with
  * numbers ordered by value and int before float on ties
  * (value.rs:575-598) — so cozo relations can sort and key columns that
  * mix types. Spark columns are mono-typed, so an `Any` column is
  * stored as its CANONICAL JSON ENCODING in a StringType column tagged
  * with [[marker]] metadata:
  *
  *   null → SQL NULL · true/false bare · integers bare ("42") ·
  *   floats with a decimal point or exponent ("1.0") · strings
  *   JSON-quoted ("\"a\"") · lists as JSON arrays.
  *
  * The encoding is injective across types (int 1 = "1", float 1.0 =
  * "1.0", string "1" = "\"1\"" — all distinct), so Datalog set
  * semantics, equality joins and `<=>` unification work unchanged on
  * the encoded column. Ordering does NOT coincide with the string
  * order, so `:sort` on a tagged column goes through [[sortKey]] — a
  * struct (rank, bool, num, isFloat, str) whose lexicographic struct
  * comparison reproduces the reference order for scalars; lists sort
  * by their JSON dump among themselves (the reference itself orders
  * Json values "by string repr", value.rs:186-190; its List ordering
  * is element-wise — a documented deviation at this depth).
  */
object AnyValue {

  val markerKey = "graft.any"

  val marker: Metadata =
    new MetadataBuilder().putBoolean(markerKey, value = true).build()

  def isAny(m: Metadata): Boolean =
    m.contains(markerKey) && m.getBoolean(markerKey)

  /** Driver-side canonical encoding of a const value (None = SQL NULL). */
  def encode(v: Any): Any = v match {
    case null => null
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case f: Float => encodeDouble(f.toDouble)
    case d: Double => encodeDouble(d)
    case s: String => quote(s)
    case xs: Seq[_] => xs.map(encodeJsonElem).mkString("[", ",", "]")
    case other => quote(other.toString)
  }

  private def encodeDouble(d: Double): String = {
    val s = d.toString // Scala doubles always render with '.', 'E' or Infinity/NaN
    if (s.contains('.') || s.contains('e') || s.contains('E') ||
      s.contains("Infinity") || s == "NaN") s
    else s + ".0"
  }

  private def encodeJsonElem(v: Any): String = v match {
    case null => "null"
    case other => encode(other).toString
  }

  private def quote(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""

  /** Display decoding for an encoded Any column at result
    * materialization: strings lose their JSON quoting/escaping (the
    * reference returns the string `a`, not `"a"`); every other encoding
    * (bools, ints, floats, lists) already reads as its display form.
    * Note the decoded DISPLAY is not injective (int 1 and string "1"
    * both render `1`) — set semantics / joins all run on the injective
    * encoding BEFORE this final projection, so only the rendering, never
    * the result set, can collide.
    */
  def decodeDisplay(c: Column): Column =
    when(c.startsWith("\""), get_json_object(c, "$")).otherwise(c)

  /** Total-order sort key for an encoded Any column: a struct whose
    * field-by-field comparison is the reference's cross-type order.
    * All branches are codegen'd string tests over the encoding.
    */
  def sortKey(c: Column): Column = {
    val isBool = c === "true" || c === "false"
    // non-finite float encodings (NaN, Infinity, -Infinity) must rank in
    // the Num band (cast('double') parses all three); Spark sorts NaN
    // after every other double, which is where the reference's Num band
    // ends anyway
    val isNum = c.rlike("^(-?([0-9.]|Infinity)|NaN)")
    val isStr = c.startsWith("\"")
    val isList = c.startsWith("[")
    struct(
      // SQL NULL propagates through the whens to the otherwise branch,
      // so Null needs the explicit rank 0 (sorts first asc, last desc —
      // the reference's Null-first total order)
      when(c.isNull, 0).when(isBool, 1).when(isNum, 2).when(isStr, 3).when(isList, 4)
        .otherwise(5).as("rank"),
      when(isBool, c === "true").otherwise(lit(false)).as("bool"),
      when(isNum, c.cast("double")).otherwise(lit(0.0)).as("num"),
      // int < float at equal numeric value (value.rs:575-598); NaN and
      // (-)Infinity are float encodings despite containing no [.eE]
      when(isNum && c.rlike("[.eE]|NaN|Infinity"), 1).otherwise(0).as("isFloat"),
      // strings compare unquoted/unescaped; lists by their JSON dump
      when(isStr, get_json_object(c, "$")).when(isList, c).otherwise(lit("")).as("str"))
  }
}
