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
  * order, so `:sort` and `<`-family comparisons on a tagged column go
  * through [[sortKey]] — the memcomparable key
  * ([[graft.functions.MemKey]]) whose plain string order reproduces
  * the reference's total order exactly, INCLUDING element-wise
  * (recursive) list comparison — e.g. [2] < [10] and [1] < ['a'],
  * which the previous struct key's JSON-dump list ordering misordered.
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

  /** Total-order sort key for an encoded Any column: the memcomparable
    * key ([[graft.functions.MemKey]]) — a single string whose plain
    * lexicographic order is the reference's cross-type total order,
    * recursive element-wise list comparison included. Non-null even
    * for SQL NULL input (Null keys as the lowest rank, the reference's
    * Null-first order, and `null < x` comparisons stay total instead
    * of SQL-three-valued).
    */
  def sortKey(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.MemKey(ColumnBridge.expression(c)))
  }
}
