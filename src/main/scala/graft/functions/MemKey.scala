package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Memcomparable sort key for the canonical `Any` encoding
  * (graft.lang.AnyValue): a STRING whose plain lexicographic
  * (code-point / UTF-8-byte) order reproduces the reference's
  * cross-type total order (data/value.rs:143-174) — including
  * ELEMENT-WISE list comparison, recursively, which a struct-shaped
  * sort key cannot express for arbitrary nesting. This is the same
  * idea as the reference's own order-preserving storage key encoding
  * (it sorts mixed-type keys in RocksDB byte order); here the key is
  * computed on the fly for `:sort` and `<`-family comparisons over
  * Any-tagged columns, never stored.
  *
  * Key grammar (every value key is self-delimiting):
  *   Null   → '1'
  *   Bool   → '2' then '0' (false) / '1' (true)
  *   Num    → '3' then 16 lowercase hex digits of the order-flipped
  *            IEEE-754 bits (sign bit flipped for positives, all bits
  *            for negatives — unsigned hex order = numeric order, NaN
  *            after +Inf), then '0' + 16-hex sign-bit-flipped int64
  *            bits for ints / '1' for floats (int-before-float on numeric
  *            ties, value.rs:575-598; the int tail keeps >2^53 longs
  *            exactly ordered where the double projection collides)
  *   Str    → '4' then the string with U+0000 mapped to U+0001,U+0001
  *            and U+0001 mapped to U+0001,U+0002, then a U+0000
  *            terminator (it sorts below all content, so prefixes
  *            order first — the escape keeps content containing the
  *            terminator ordered correctly)
  *   List   → '5' then each element's key, then a U+0000 terminator
  *   other  → '6' then the raw encoding (encodings this parser does
  *            not know keep their current raw-string order, after all
  *            known ranks — matching the previous struct key's
  *            `otherwise` band)
  *
  * Evaluated (CodegenFallback): sorts and Any-typed comparisons are
  * not scan-hot paths — Any columns arise from mixed-type const
  * relations and script sort heads, both far off the 100 TB scan.
  */
case class MemKey(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "any_mem_key"

  // null input encodes as the Null rank, so eval must NOT short-circuit
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    UTF8String.fromString(
      MemKey.keyOf(if (v == null) null else v.toString))
  }

  override protected def withNewChildInternal(newChild: Expression): MemKey =
    copy(child = newChild)
}

object MemKey {
  private final val TNull = '1'
  private final val TBool = '2'
  private final val TNum = '3'
  private final val TStr = '4'
  private final val TList = '5'
  private final val TOther = '6'
  private final val End = 0.toChar
  private final val Esc = 1.toChar
  private final val EscEnd = 1.toChar // End escapes to Esc,EscEnd
  private final val EscEsc = 2.toChar // Esc escapes to Esc,EscEsc

  /** Order-preserving key of one canonically-encoded value; total
    * function (unparseable encodings fall into the `other` band, keyed
    * by their raw encoding).
    */
  def keyOf(enc: String): String = {
    if (enc == null) return String.valueOf(TNull)
    val sb = new java.lang.StringBuilder(enc.length + 8)
    try {
      val end = emit(enc, 0, sb)
      if (end != enc.length) throw new IllegalArgumentException("trailing")
      sb.toString
    } catch {
      case _: RuntimeException => TOther.toString + enc
    }
  }

  private def padHex(f: Long, sb: java.lang.StringBuilder): Unit = {
    val hex = java.lang.Long.toHexString(f)
    var pad = 16 - hex.length
    while (pad > 0) { sb.append('0'); pad -= 1 }
    sb.append(hex)
  }

  /** IEEE-754 bit flip: negatives complement fully (their bit patterns
    * order REVERSED to their values), positives flip the sign bit —
    * unsigned hex order of the result = double order, NaN last.
    */
  private def flippedHex(bits: Long, sb: java.lang.StringBuilder): Unit =
    padHex(if (bits < 0) ~bits else bits ^ java.lang.Long.MIN_VALUE, sb)

  /** Signed-long sign-bit flip: two's-complement bit patterns already
    * order correctly within each sign, so ONLY the sign bit flips
    * (a full complement would reverse the negative band — caught by
    * AnyOrderFuzzSpec's sorted-sample transitivity test).
    */
  private def signFlippedHex(v: Long, sb: java.lang.StringBuilder): Unit =
    padHex(v ^ java.lang.Long.MIN_VALUE, sb)

  private def appendEscaped(sb: java.lang.StringBuilder, c: Char): Unit =
    if (c == End) sb.append(Esc).append(EscEnd)
    else if (c == Esc) sb.append(Esc).append(EscEsc)
    else sb.append(c)

  /** Emit the key of the value starting at `i`; returns the index just
    * after it. Throws on malformed input (caught in [[keyOf]]).
    */
  private def emit(s: String, i: Int, sb: java.lang.StringBuilder): Int =
    s.charAt(i) match {
      case 'n' if s.startsWith("null", i) => sb.append(TNull); i + 4
      case 't' if s.startsWith("true", i) => sb.append(TBool).append('1'); i + 4
      case 'f' if s.startsWith("false", i) => sb.append(TBool).append('0'); i + 5
      case '"' =>
        sb.append(TStr)
        var j = i + 1
        while (s.charAt(j) != '"') {
          val c = s.charAt(j)
          if (c == '\\') {
            j += 1
            s.charAt(j) match {
              case 'n' => appendEscaped(sb, '\n')
              case 'r' => appendEscaped(sb, '\r')
              case 't' => appendEscaped(sb, '\t')
              case 'b' => appendEscaped(sb, '\b')
              case 'f' => appendEscaped(sb, '\f')
              case 'u' =>
                appendEscaped(sb,
                  Integer.parseInt(s.substring(j + 1, j + 5), 16).toChar)
                j += 4
              case lit => appendEscaped(sb, lit) // \\ and \" (and raw)
            }
          } else appendEscaped(sb, c)
          j += 1
        }
        sb.append(End)
        j + 1
      case '[' =>
        sb.append(TList)
        var j = i + 1
        if (s.charAt(j) == ']') { sb.append(End); return j + 1 }
        var open = true
        while (open) {
          j = emit(s, j, sb)
          s.charAt(j) match {
            case ',' => j += 1
            case ']' => open = false; j += 1
            case bad => throw new IllegalArgumentException(s"list sep $bad")
          }
        }
        sb.append(End)
        j
      case c if c == '-' || c == 'N' || c == 'I' || (c >= '0' && c <= '9') =>
        var j = i
        while (j < s.length && s.charAt(j) != ',' && s.charAt(j) != ']') j += 1
        val tok = s.substring(i, j)
        val isFloat = tok.indexOf('.') >= 0 || tok.indexOf('e') >= 0 ||
          tok.indexOf('E') >= 0 || tok == "NaN" ||
          tok == "Infinity" || tok == "-Infinity"
        val d = java.lang.Double.parseDouble(tok) // throws on garbage
        sb.append(TNum)
        flippedHex(java.lang.Double.doubleToLongBits(d), sb)
        if (isFloat) sb.append('1')
        else { sb.append('0'); signFlippedHex(java.lang.Long.parseLong(tok), sb) }
        j
      case other => throw new IllegalArgumentException(s"lead $other")
    }
}
