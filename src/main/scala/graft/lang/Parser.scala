package graft.lang

import Ast._
import scala.collection.mutable.ArrayBuffer

/** Hand-rolled lexer + recursive-descent parser for the CozoScript
  * subset (grammar cozo-core/src/cozoscript.pest; expression
  * precedence follows cozo-core/src/parse/expr.rs:15-55). No parser
  * library — zero-dependency, and error messages carry source offsets.
  */
object Parser {

  final case class ParseException(msg: String, pos: Int)
    extends RuntimeException(s"$msg (at offset $pos)")

  // ———————————————————————— lexer ————————————————————————

  sealed trait Tok { def pos: Int }
  case class TIdent(s: String, pos: Int) extends Tok
  case class TStar(s: String, pos: Int) extends Tok   // *ident
  case class TParam(s: String, pos: Int) extends Tok  // $ident
  case class TInt(v: Long, pos: Int) extends Tok
  case class TFloat(v: Double, pos: Int) extends Tok
  case class TStr(v: String, pos: Int) extends Tok
  case class TPunct(s: String, pos: Int) extends Tok
  case class TEof(pos: Int) extends Tok

  private val punct2plus = Seq("::", ":=", "<-", "<~", "==", "!=", "<=", ">=", "++", "||", "&&", "->", "=>")

  def lex(src: String): Vector[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    var i = 0
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && src.charAt(i) != '\n') i += 1 }
      else if (c == '/' && peek(1) == '*') {
        i += 2; while (i + 1 < n && !(src.charAt(i) == '*' && src.charAt(i + 1) == '/')) i += 1
        i += 2
      }
      else if (c == '"' || c == '\'') {
        val start = i; val quote = c; i += 1
        val sb = new StringBuilder
        while (i < n && src.charAt(i) != quote) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            src.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case '\'' => sb.append('\''); i += 2
              case '"' => sb.append('"'); i += 2
              case 'u' =>
                val hex = src.substring(i + 2, math.min(i + 6, n))
                sb.append(Integer.parseInt(hex, 16).toChar); i += 6
              case other => sb.append(other); i += 2
            }
          } else { sb.append(ch); i += 1 }
        }
        if (i >= n) throw ParseException("unterminated string", start)
        i += 1
        out += TStr(sb.toString, start)
      }
      else if (c.isDigit) {
        val start = i
        while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '_')) i += 1
        var isFloat = false
        if (i < n && src.charAt(i) == '.' && i + 1 < n && src.charAt(i + 1).isDigit) {
          isFloat = true; i += 1
          while (i < n && src.charAt(i).isDigit) i += 1
        }
        if (i < n && (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
          isFloat = true; i += 1
          if (i < n && (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
          while (i < n && src.charAt(i).isDigit) i += 1
        }
        val text = src.substring(start, i).replace("_", "")
        out += (if (isFloat) TFloat(text.toDouble, start) else TInt(text.toLong, start))
      }
      else if (c == '*' && (peek(1).isLetter || peek(1) == '_')) {
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_' || src.charAt(i) == '.')) {
          sb.append(src.charAt(i)); i += 1
        }
        out += TStar(sb.toString, start)
      }
      else if (c == '$' && (peek(1).isLetter || peek(1) == '_')) {
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) {
          sb.append(src.charAt(i)); i += 1
        }
        out += TParam(sb.toString, start)
      }
      else if (c.isLetter || c == '_') {
        val start = i
        val sb = new StringBuilder
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) {
          sb.append(src.charAt(i)); i += 1
        }
        out += TIdent(sb.toString, start)
      }
      else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (punct2plus.contains(two)) { out += TPunct(two, i); i += 2 }
        else { out += TPunct(c.toString, i); i += 1 }
      }
    }
    out += TEof(n)
    out.toVector
  }

  // ———————————————————————— parser ————————————————————————

  final class P(toks: Vector[Tok]) {
    private var pos = 0
    def cur: Tok = toks(pos)
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def save(): Int = pos
    def restore(p: Int): Unit = { pos = p }
    def at(s: String): Boolean = cur match { case TPunct(p, _) => p == s; case _ => false }
    def atIdent(s: String): Boolean = cur match { case TIdent(p, _) => p == s; case _ => false }
    def eat(s: String): Unit =
      if (at(s)) pos += 1 else throw ParseException(s"expected '$s' but found $cur", cur.pos)
    def tryEat(s: String): Boolean = if (at(s)) { pos += 1; true } else false
    def ident(): String = cur match {
      case TIdent(s, _) => pos += 1; s
      case t => throw ParseException(s"expected identifier, found $t", t.pos)
    }

    def program(): Program = {
      if (at("::")) { // sys op: capture the rest verbatim
        eat("::")
        val sb = new StringBuilder
        while (!cur.isInstanceOf[TEof]) {
          sb.append(next() match {
            case TIdent(s, _) => s; case TStar(s, _) => "*" + s; case TStr(s, _) => "'" + s + "'"
            case TInt(v, _) => v.toString; case TFloat(v, _) => v.toString
            case TParam(s, _) => "$" + s; case TPunct(s, _) => s; case TEof(_) => ""
          })
          sb.append(' ')
        }
        return Program(Nil, Options(), Some(sb.toString.trim))
      }
      val rules = ArrayBuffer.empty[RuleDef]
      var opts = Options()
      while (!cur.isInstanceOf[TEof]) {
        if (at(":")) opts = option(opts)
        else rules += ruleDef()
        tryEat(";")
      }
      Program(rules.toSeq, opts)
    }

    private def option(o: Options): Options = {
      eat(":")
      val name = ident()
      name match {
        case "limit" => o.copy(limit = Some(constLong()))
        case "offset" => o.copy(offset = Some(constLong()))
        case "sort" | "order" =>
          val args = ArrayBuffer.empty[(String, Boolean)]
          var more = true
          while (more) {
            val desc = if (tryEat("-")) true else { tryEat("+"); false }
            val v = ident()
            // out_arg may be aggr(var): keep the display form — the
            // runner resolves it against the result's columns, falling
            // back to the bare var when there is no collision column
            val sortVar = if (tryEat("(")) { val inner = ident(); eat(")"); s"$v($inner)" } else v
            args += ((sortVar, desc))
            more = tryEat(",")
          }
          o.copy(sort = args.toSeq)
        case "assert" =>
          ident() match {
            case "none" => o.copy(assertNone = true)
            case "some" => o.copy(assertSome = true)
            case other => throw ParseException(s"unknown :assert $other", cur.pos)
          }
        case op @ ("create" | "replace" | "insert" | "put" | "update" | "rm" | "delete" | "ensure" | "ensure_not") =>
          val rel = ident()
          val spec = if (at("{")) tableSchemaKeys() else SchemaSpec()
          o.copy(relationOp = Some((op, rel, spec)))
        case "timeout" =>
          // reference: timeout <= 0 means no timeout (parse/query.rs:268-272)
          val secs = constDouble()
          o.copy(timeout = if (secs > 0) Some(secs) else None)
        case "sleep" =>
          o.copy(sleep = Some(constDouble()))
        case "disable_magic_rewrite" =>
          constExprSkip(); o // accepted, no-op on Spark (Catalyst plans both shapes)
        case "returning" => o
        case other => throw ParseException(s"unknown option :$other", cur.pos)
      }
    }

    /** {k1, k2 => v1, v2 default expr, ...} — key/all column names and
      * default generator expressions; type annotations are accepted and
      * ignored (Spark schemas come from the data), EXCEPT `Validity`,
      * which marks the relation time-travelable (value.rs:112-131). */
    private def tableSchemaKeys(): SchemaSpec = {
      eat("{")
      val keys = ArrayBuffer.empty[String]
      val all = ArrayBuffer.empty[String]
      val defaults = scala.collection.mutable.LinkedHashMap.empty[String, Expr]
      var validityCol = Option.empty[String]
      var afterArrow = false
      while (!at("}")) {
        if (tryEat("=>")) afterArrow = true
        else {
          val name = ident()
          if (!afterArrow) keys += name
          all += name
          // optional type annotation `: Type`, optional `default expr`
          if (tryEat(":")) {
            if (typeSkip().contains("Validity")) validityCol = Some(name)
          }
          if (atIdent("default")) { ident(); defaults(name) = expr() }
          tryEat(",")
        }
      }
      eat("}")
      SchemaSpec(keys.toSeq, all.toSeq, defaults.toMap, validityCol)
    }

    /** Skip a type annotation, returning the leading type name when the
      * type is a plain named type (None for bracketed forms). */
    private def typeSkip(): Option[String] = {
      def balanced(open: String, close: String): Boolean =
        if (!tryEat(open)) false
        else {
          var depth = 1
          while (depth > 0) next() match {
            case TPunct(`open`, _) => depth += 1
            case TPunct(`close`, _) => depth -= 1
            case TEof(p) => throw ParseException("unterminated type", p)
            case _ => ()
          }
          true
        }
      // `<F32; 8>` vectors, `[Int]`/`[Int; 3]` lists, `(T1, T2)` tuples
      // start with a bracket; named types (`Int`, `String?`, …) with an
      // identifier optionally followed by a bracketed argument list
      val name =
        if (!balanced("<", ">") && !balanced("[", "]") && !balanced("(", ")")) {
          val n = ident()
          balanced("<", ">")
          balanced("[", "]")
          balanced("(", ")")
          Some(n)
        } else None
      if (tryEat("?")) ()
      name
    }

    private def constLong(): Long = expr() match {
      case Lit(v: Long) => v
      case Un("-", Lit(v: Long)) => -v
      case e => throw ParseException(s"expected integer literal, got $e", cur.pos)
    }
    private def constDouble(): Double = expr() match {
      case Lit(v: Long) => v.toDouble
      case Lit(v: Double) => v
      case Un("-", Lit(v: Long)) => -v.toDouble
      case Un("-", Lit(v: Double)) => -v
      case e => throw ParseException(s"expected numeric literal, got $e", cur.pos)
    }
    private def constExprSkip(): Unit = { expr(); () }

    private def ruleDef(): RuleDef = {
      val name = cur match {
        case TPunct("?", _) => next(); "?"
        case _ => ident()
      }
      eat("[")
      val head = ArrayBuffer.empty[HeadArg]
      while (!at("]")) {
        head += headArg()
        tryEat(",")
      }
      eat("]")
      if (tryEat(":=")) HornClause(name, head.toSeq, ruleBody())
      else if (tryEat("<-")) ConstRule(name, head.toSeq, expr())
      else if (tryEat("<~")) {
        val algo = ident()
        eat("(")
        val rels = ArrayBuffer.empty[FixedRel]
        val opts = scala.collection.mutable.LinkedHashMap.empty[String, Expr]
        while (!at(")")) {
          cur match {
            case TStar(s, _) =>
              next()
              val cols = ArrayBuffer.empty[String]
              if (tryEat("[")) { while (!at("]")) { cols += ident(); tryEat(",") }; eat("]") }
              else if (tryEat("{")) { while (!at("}")) { cols += ident(); if (tryEat(":")) ident(); tryEat(",") }; eat("}") }
              rels += FixedStoredRel(s, cols.toSeq)
            case TIdent(s, _) if toks(pos + 1) == TPunct("[", toks(pos + 1).pos) =>
              next(); eat("[")
              val binds = ArrayBuffer.empty[String]
              while (!at("]")) { binds += ident(); tryEat(",") }
              eat("]")
              // repeated bindings in a fixed-rule input head are illegal
              // (runtime/tests.rs strict_checks_for_fixed_rules_args;
              // `_` repeats freely)
              val named = binds.filter(_ != "_")
              if (named.distinct.length != named.length)
                throw ParseException(
                  s"repeated binding in fixed-rule input $s[${binds.mkString(", ")}]", cur.pos)
              rels += FixedRuleRel(s)
            case TIdent(s, _) =>
              next(); eat(":")
              opts(s) = expr()
            case t => throw ParseException(s"unexpected token in fixed-rule args: $t", t.pos)
          }
          tryEat(",")
        }
        eat(")")
        FixedApply(name, head.toSeq, algo, rels.toSeq, opts.toMap)
      }
      else throw ParseException(s"expected :=, <- or <~ after rule head", cur.pos)
    }

    private def headArg(): HeadArg = cur match {
      case TIdent(name, _) if toks(pos + 1) == TPunct("(", toks(pos + 1).pos) =>
        next(); eat("(")
        val v = ident()
        val extra = ArrayBuffer.empty[Expr]
        while (tryEat(",")) extra += expr()
        eat(")")
        HeadArg(Some(name), v, extra.toSeq)
      case _ => HeadArg(None, ident())
    }

    private def ruleBody(): Seq[Atom] = {
      val atoms = ArrayBuffer.empty[Atom]
      atoms += disjunction()
      var more = tryEat(",")
      while (more) {
        // tolerate a trailing comma before options / end / next rule
        if (at(":") || at(";") || cur.isInstanceOf[TEof]) more = false
        else { atoms += disjunction(); more = tryEat(",") }
      }
      atoms.toSeq
    }

    private def disjunction(): Atom = {
      val alts = ArrayBuffer[Seq[Atom]](Seq(atom()))
      while (atIdent("or")) {
        ident()
        alts += Seq(atom())
      }
      if (alts.length == 1) alts.head.head match {
        case single => single
      } else Or(alts.toSeq)
    }

    private def atom(): Atom = {
      if (atIdent("not")) { ident(); return Neg(atom()) }
      cur match {
        case TPunct("~", _) =>
          // index probe ~rel:idx{bindings | opts} (cozoscript.pest:90)
          next()
          var name = ident()
          while (tryEat(":")) name += ":" + ident()
          eat("{")
          val pairs = ArrayBuffer.empty[(String, String)]
          val opts = collection.mutable.LinkedHashMap.empty[String, Expr]
          var inOpts = false
          while (!at("}")) {
            if (tryEat("|")) inOpts = true
            else if (!inOpts) {
              val c = ident()
              val v = if (tryEat(":")) ident() else c
              pairs += ((c, v))
              tryEat(",")
            } else {
              val k = ident(); eat(":")
              opts(k) = expr()
              tryEat(",")
            }
          }
          eat("}")
          SearchApply(name, pairs.toSeq, opts.toMap)
        case TStar(name0, _) =>
          next()
          // index-internals scan *rel:idx{...} (compound_or_index_ident)
          var name = name0
          while (at(":") && toks(pos + 1).isInstanceOf[TIdent] &&
                 (toks(pos + 2) match {
                   case TPunct(p, _) => p == "[" || p == "{" || p == ":"
                   case _ => false
                 })) {
            eat(":"); name += ":" + ident()
          }
          if (tryEat("[")) {
            val args = ArrayBuffer.empty[Expr]
            var validity: Option[Expr] = None
            while (!at("]")) {
              if (tryEat("@")) validity = Some(expr())
              else { args += expr(); () }
              tryEat(",")
            }
            eat("]")
            RelApply(name, args.toSeq, stored = true, validity)
          } else if (tryEat("{")) {
            val pairs = ArrayBuffer.empty[(String, Option[Expr])]
            var validity: Option[Expr] = None
            while (!at("}")) {
              if (tryEat("@")) validity = Some(expr())
              else {
                val f = ident()
                val e = if (tryEat(":")) Some(expr()) else None
                pairs += ((f, e))
              }
              tryEat(",")
            }
            eat("}")
            NamedApply(name, pairs.toSeq, validity)
          } else throw ParseException(s"expected [ or {{ after *$name", cur.pos)
        case TPunct("(", _) =>
          // grouped body: ( conj , conj ) possibly with or
          next()
          val inner = ruleBody()
          eat(")")
          if (inner.length == 1) inner.head else Or(Seq(inner))
        case TIdent(name, p) =>
          // rule apply name[...], unify v = e, unify-multi v in e, or plain expr
          toks(pos + 1) match {
            case TPunct("[", _) if name != "_" =>
              next(); eat("[")
              val args = ArrayBuffer.empty[Expr]
              while (!at("]")) { args += expr(); tryEat(",") }
              eat("]")
              RelApply(name, args.toSeq, stored = false)
            case TPunct("=", _) =>
              next(); eat("=")
              Unify(name, expr())
            case TIdent("in", _) =>
              next(); ident()
              UnifyIn(name, expr())
            case _ => Cond(expr())
          }
        case _ => Cond(expr())
      }
    }

    // —————————————————— expressions (precedence climbing) ——————————————————

    def expr(): Expr = orExpr()

    private def orExpr(): Expr = {
      var l = andExpr()
      while (at("||")) { next(); l = Bin("||", l, andExpr()) }
      l
    }
    private def andExpr(): Expr = {
      var l = cmpExpr()
      while (at("&&")) { next(); l = Bin("&&", l, cmpExpr()) }
      l
    }
    private def cmpExpr(): Expr = {
      var l = coalesceExpr()
      var go = true
      while (go) {
        val op = cur match {
          case TPunct(p @ ("==" | "!=" | "<" | ">" | "<=" | ">="), _) => Some(p)
          case _ => None
        }
        op match {
          case Some(p) => next(); l = Bin(p, l, coalesceExpr())
          case None => go = false
        }
      }
      l
    }
    private def coalesceExpr(): Expr = {
      var l = addExpr()
      while (at("~")) { next(); l = Bin("~", l, addExpr()) }
      l
    }
    private def addExpr(): Expr = {
      var l = mulExpr()
      var go = true
      while (go) {
        if (at("++")) { next(); l = Bin("++", l, mulExpr()) }
        else if (at("+")) { next(); l = Bin("+", l, mulExpr()) }
        else if (at("-")) { next(); l = Bin("-", l, mulExpr()) }
        else go = false
      }
      l
    }
    private def mulExpr(): Expr = {
      var l = powExpr()
      var go = true
      while (go) {
        if (at("*")) { next(); l = Bin("*", l, powExpr()) }
        else if (at("/")) { next(); l = Bin("/", l, powExpr()) }
        else if (at("%")) { next(); l = Bin("%", l, powExpr()) }
        else go = false
      }
      l
    }
    private def powExpr(): Expr = {
      val l = unaryExpr()
      if (at("^")) { next(); Bin("^", l, powExpr()) } // right assoc
      else l
    }
    private def unaryExpr(): Expr = {
      if (at("-")) { next(); Un("-", unaryExpr()) }
      else if (at("!")) { next(); Un("!", unaryExpr()) }
      else postfixExpr()
    }
    private def postfixExpr(): Expr = {
      var t = term()
      while (at("->")) { next(); t = Bin("->", t, term()) } // json field access
      t
    }

    private def term(): Expr = cur match {
      case TInt(v, _) => next(); Lit(v)
      case TFloat(v, _) => next(); Lit(v)
      case TStr(v, _) => next(); Lit(v)
      case TParam(s, _) => next(); Param(s)
      case TPunct("(", _) => next(); val e = expr(); eat(")"); e
      case TPunct("[", _) =>
        next()
        val items = ArrayBuffer.empty[Expr]
        while (!at("]")) { items += expr(); tryEat(",") }
        eat("]")
        ListE(items.toSeq)
      case TPunct("{", _) =>
        // JSON object literal {'k': v, ...} (runtime/tests.rs:518
        // test_json_objects) — lowers onto json_object
        next()
        val kvs = ArrayBuffer.empty[Expr]
        while (!at("}")) {
          val k = cur match {
            case TStr(s, _) => next(); Lit(s)
            case TIdent(s, _) => next(); Lit(s)
            case t => throw ParseException(s"object key must be a string, got $t", t.pos)
          }
          eat(":")
          kvs += k
          kvs += expr()
          tryEat(",")
        }
        eat("}")
        App("json_object", kvs.toSeq)
      case TIdent("true", _) => next(); Lit(true)
      case TIdent("false", _) => next(); Lit(false)
      case TIdent("null", _) => next(); Lit(null)
      case TIdent(name, _) =>
        next()
        if (tryEat("(")) {
          val args = ArrayBuffer.empty[Expr]
          while (!at(")")) { args += expr(); tryEat(",") }
          eat(")")
          App(name, args.toSeq)
        } else V(name)
      case t => throw ParseException(s"unexpected token $t in expression", t.pos)
    }
  }

  def parse(src: String): Program = new P(lex(src)).program()

  /** Parse a bare `ident: expr, ...` option list (the payload of
    * `::fts create rel:idx { … }`-style sys ops, parse/sys.rs:391-655). */
  def parseOptMap(src: String): Map[String, Ast.Expr] = {
    val p = new P(lex(src))
    val m = collection.mutable.LinkedHashMap.empty[String, Ast.Expr]
    while (!p.cur.isInstanceOf[TEof]) {
      val k = p.ident()
      p.eat(":")
      m(k) = p.expr()
      p.tryEat(",")
    }
    m.toMap
  }
  def parseExpr(src: String): Expr = new P(lex(src)).expr()
}
