package graft.lang

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Imperative mini-language over query blocks
  * (cozo-core/src/runtime/imperative.rs:67-250, grammar
  * cozoscript.pest:238-260): sequences of `{ query }` blocks with
  * `as _temp` captures, `%if`/`%if_not` chains, `%loop` with
  * `%break`/`%continue`, `%return`, `%swap`, `%debug`. A condition is a
  * temp relation name or a query block; truthy = at least one row
  * (imperative.rs:63). Temp relations (`_name`) live in the CozoDb
  * relation store for the session.
  */
object Imperative {

  sealed trait Stmt
  final case class QueryStmt(script: String, storeAs: Option[String]) extends Stmt
  /** `::sysop ... as _temp` inside an imperative script — the
    * reference's ImperativeSysop with store_as (parse/mod.rs:70-76,
    * pest:242 imperative_sysop): the sysop's result relation is
    * stashed as a temp for later statements. */
  final case class SysopStmt(script: String, storeAs: Option[String]) extends Stmt
  /** %ignore_error { query } — failures are swallowed (parse dispatch
    * cozoscript.pest:253, parse/imperative.rs:206). */
  final case class IgnoreErrorStmt(inner: QueryStmt) extends Stmt
  final case class IfStmt(cond: Cond, negated: Boolean,
                          thenB: Seq[Stmt], elseB: Seq[Stmt]) extends Stmt
  /** optional `%mark label` before %loop (pest:257). */
  final case class LoopStmt(body: Seq[Stmt], label: Option[String] = None) extends Stmt
  final case class BreakStmt(label: Option[String] = None) extends Stmt
  final case class ContinueStmt(label: Option[String] = None) extends Stmt
  /** `%return [val val ...]` — zero values returns the EMPTY relation
    * (imperative.rs:88 Termination(NamedRows::default())); several
    * values all evaluate (store_as side effects included) and the
    * FIRST is the primary result — the head of the reference's
    * NamedRows `next` chain, which is what run_script surfaces. */
  final case class ReturnStmt(values: Seq[Cond]) extends Stmt
  final case class SwapStmt(a: String, b: String) extends Stmt
  final case class DebugStmt(name: String) extends Stmt

  sealed trait Cond
  final case class RelCond(name: String) extends Cond
  final case class QueryCond(script: String, storeAs: Option[String]) extends Cond

  final case class ImperativeException(msg: String) extends RuntimeException(msg)

  def looksImperative(script: String): Boolean = {
    val t = script.trim
    // a script beginning with a sysop is imperative only when MORE
    // statements follow (pest:13 imperative_script = stmt+); a lone
    // `::sysop` goes through the plain path — SysopStmt execution
    // re-enters db.run with exactly that single-statement text, so this
    // distinction is also what terminates the recursion
    t.startsWith("%") || t.startsWith("{") ||
      (t.startsWith("::") && {
        // scan exactly one sysop statement (brace-aware — a create's
        // { ... } options block may start on the next line) and call
        // the script imperative only if ANOTHER STATEMENT follows it
        // ('{', '%', '::'); a remainder like set_triggers' `on put
        // { ... }` clauses belongs to the sysop's own grammar and goes
        // through the plain path. This is also what terminates
        // SysopStmt's re-entry into db.run.
        val p = new P(t)
        try {
          p.sysop(); p.skipWs()
          !p.eof && {
            val c = t.charAt(p.pos)
            c == '{' || c == '%' || t.startsWith("::", p.pos)
          }
        } catch { case _: Throwable => true }
      })
  }

  // ———————————————————————— parsing ————————————————————————

  def parse(src: String): Seq[Stmt] = {
    val p = new P(src)
    val stmts = p.stmts(atTop = true)
    p.skipWs()
    if (!p.eof) throw ImperativeException(s"unexpected input at offset ${p.pos}")
    stmts
  }

  private final class P(src: String) {
    var pos = 0
    def eof: Boolean = pos >= src.length
    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = src.charAt(pos)
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (!eof && src.charAt(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def peekWord(): String = {
      skipWs()
      var k = pos
      while (k < src.length && (src.charAt(k).isLetterOrDigit || src.charAt(k) == '_' || src.charAt(k) == '%')) k += 1
      src.substring(pos, k)
    }
    def word(): String = { val w = peekWord(); pos += w.length; w }

    def block(): String = { // balanced { ... }, strings respected
      skipWs()
      if (eof || src.charAt(pos) != '{') throw ImperativeException(s"expected {{ at $pos")
      var depth = 0
      var i = pos
      var inStr: Char = 0
      while (i < src.length) {
        val c = src.charAt(i)
        if (inStr != 0) {
          if (c == '\\') i += 1 else if (c == inStr) inStr = 0
        } else c match {
          case '\'' | '"' => inStr = c
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) {
              val inner = src.substring(pos + 1, i)
              pos = i + 1
              return inner
            }
          case _ => ()
        }
        i += 1
      }
      throw ImperativeException("unbalanced { }")
    }

    /** One `::...` sysop statement: to end of line, except balanced
      * braces/strings may span lines (::fts create rel { ... }). A
      * trailing `as _name` is the store_as capture (pest:242 puts it
      * after sys_script_inner; no sysop's own grammar ends in `as`). */
    def sysop(): (String, Option[String]) = {
      skipWs()
      val start = pos
      var i = pos
      var inStr: Char = 0
      var depth = 0
      var sawBrace = false
      // ops whose grammar takes a { ... } options block — for these a
      // newline before the brace is still the same statement (the
      // plain-path indexOpRe is (?s) and spans it); for anything else
      // a following '{' starts the next imperative statement
      def takesBraceBlock(text: String): Boolean =
        "^(index|fts|lsh|hnsw)\\s+create\\b".r
          .findFirstIn(text.stripPrefix("::").trim).isDefined
      var done = false
      while (!done && i < src.length) {
        val c = src.charAt(i)
        if (depth == 0 && inStr == 0 && c == '\n') {
          var j = i
          while (j < src.length && src.charAt(j).isWhitespace) j += 1
          if (!sawBrace && j < src.length && src.charAt(j) == '{' &&
            takesBraceBlock(src.substring(start, i)))
            i = j // opts block on the next line: same statement
          else done = true
        }
        if (!done) {
          val c2 = src.charAt(i)
          if (inStr != 0) { if (c2 == '\\') i += 1 else if (c2 == inStr) inStr = 0 }
          else c2 match {
            case '\'' | '"' => inStr = c2
            case '{' => depth += 1; sawBrace = true
            case '}' => depth -= 1
            case _ => ()
          }
          i += 1
        }
      }
      pos = i
      val text = src.substring(start, pos).trim
      val m = "\\bas\\s+(_\\w+)$".r.findFirstMatchIn(text)
      m match {
        case Some(g) => (text.substring(0, g.start).trim, Some(g.group(1)))
        case None => (text, None)
      }
    }

    private def storeAs(): Option[String] = {
      val save = pos
      if (peekWord() == "as") {
        word()
        val n = word()
        if (n.startsWith("_")) Some(n)
        else throw ImperativeException(s"temp relation name must start with _: $n")
      } else { pos = save; None }
    }

    def cond(): Cond = {
      skipWs()
      if (!eof && src.charAt(pos) == '{') {
        val b = block()
        QueryCond(b, storeAs())
      } else {
        val n = word()
        if (!n.startsWith("_")) throw ImperativeException(s"condition must be _temp or {{query}}: $n")
        RelCond(n)
      }
    }

    def stmts(atTop: Boolean): Seq[Stmt] = {
      val out = ArrayBuffer.empty[Stmt]
      var go = true
      while (go) {
        skipWs()
        if (eof) go = false
        else if (src.charAt(pos) == '{') {
          val b = block()
          out += QueryStmt(b, storeAs())
        } else if (src.startsWith("::", pos)) {
          val (text, as) = sysop()
          out += SysopStmt(text, as)
        } else {
          peekWord() match {
            case "%if" | "%if_not" =>
              val negated = word() == "%if_not"
              val c = cond()
              if (peekWord() == "%then") word()
              val thenB = stmts(atTop = false)
              val elseB = if (peekWord() == "%else") { word(); stmts(atTop = false) } else Nil
              if (word() != "%end") throw ImperativeException("%if without %end")
              out += IfStmt(c, negated, thenB, elseB)
            case "%mark" =>
              word()
              val label = word()
              if (word() != "%loop") throw ImperativeException("%mark must label a %loop")
              val body = stmts(atTop = false)
              if (word() != "%end") throw ImperativeException("%loop without %end")
              out += LoopStmt(body, Some(label))
            case "%loop" =>
              word()
              val body = stmts(atTop = false)
              if (word() != "%end") throw ImperativeException("%loop without %end")
              out += LoopStmt(body)
            case "%ignore_error" =>
              word()
              val b = block()
              out += IgnoreErrorStmt(QueryStmt(b, storeAs()))
            case "%break" =>
              word()
              val l = peekWord()
              out += BreakStmt(if (l.nonEmpty && !l.startsWith("%")) Some(word()) else None)
            case "%continue" =>
              word()
              val l = peekWord()
              out += ContinueStmt(if (l.nonEmpty && !l.startsWith("%")) Some(word()) else None)
            case "%return" =>
              word()
              val vs = ArrayBuffer.empty[Cond]
              var more = true
              while (more) {
                skipWs()
                if (!eof && src.charAt(pos) == '{') vs += cond()
                else if (peekWord().startsWith("_")) vs += RelCond(word())
                else more = false
              }
              out += ReturnStmt(vs.toSeq)
            case "%swap" =>
              word(); out += SwapStmt(word(), word())
            case "%debug" =>
              word(); out += DebugStmt(word())
            case "%else" | "%end" | "%then" => go = false // closed by caller
            case "" => go = false
            case other => throw ImperativeException(s"unknown statement $other at $pos")
          }
        }
      }
      out.toSeq
    }
  }

  // ———————————————————————— execution ————————————————————————

  private final case class BreakEx(label: Option[String]) extends RuntimeException
  private final case class ContinueEx(label: Option[String]) extends RuntimeException
  private final case class ReturnEx(df: DataFrame) extends RuntimeException

  def execute(db: CozoDb, stmts: Seq[Stmt], params: Map[String, Any]): DataFrame = {
    var ret: DataFrame = db.spark.emptyDataFrame

    def evalCond(c: Cond): (Boolean, DataFrame) = c match {
      case RelCond(n) =>
        val df = db.relation(n)
        (!df.isEmpty, df)
      case QueryCond(script, as) =>
        val df = db.runQueryText(script, params)
        as.foreach(n => db.registerTable(n, df.ckptLazy()))
        (!df.isEmpty, df)
    }

    def exec(ss: Seq[Stmt]): Unit = ss.foreach {
      case QueryStmt(script, as) =>
        ret = db.runQueryText(script, params)
        as.foreach(n => db.registerTable(n, ret.ckptLazy()))
      case SysopStmt(script, as) =>
        ret = db.run(script, params)
        as.foreach(n => db.registerTable(n, ret.ckptLazy()))
      case IfStmt(c, negated, thenB, elseB) =>
        val (truthy, _) = evalCond(c)
        if (truthy != negated) exec(thenB) else exec(elseB)
      case IgnoreErrorStmt(inner) =>
        try exec(Seq(inner))
        catch { case scala.util.control.NonFatal(_) => () }
      case LoopStmt(body, label) =>
        var iters = 0
        var looping = true
        while (looping) {
          if (iters > 100000) throw ImperativeException("%loop exceeded 100000 iterations")
          try exec(body)
          catch {
            case BreakEx(l) if l.isEmpty || l == label => looping = false
            case ContinueEx(l) if l.isEmpty || l == label => ()
          }
          iters += 1
        }
      case BreakStmt(l) => throw BreakEx(l)
      case ContinueStmt(l) => throw ContinueEx(l)
      case ReturnStmt(vs) =>
        val out =
          if (vs.isEmpty) db.spark.emptyDataFrame
          else vs.map(evalCond(_)._2).head // all evaluate; first is primary
        throw ReturnEx(out)
      case SwapStmt(a, b) =>
        val (da, db_) = (db.relation(a), db.relation(b))
        db.registerTable(a, db_)
        db.registerTable(b, da)
      case DebugStmt(n) =>
        System.err.println(s"[%debug] $n:")
        db.relation(n).show(20, truncate = false)
    }

    try { exec(stmts); ret }
    catch {
      case ReturnEx(df) => df
      case BreakEx(_) => throw ImperativeException("%break outside %loop")
      case ContinueEx(_) => throw ImperativeException("%continue outside %loop")
    }
  }

  private implicit class LazyCkpt(private val df: DataFrame) extends AnyVal {
    def ckptLazy(): DataFrame =
      org.apache.spark.sql.graftbridge.CheckpointBridge.truncate(df, eager = false)
  }
}
