package graft.lang

/** AST for the CozoScript subset (grammar:
  * cozo-core/src/cozoscript.pest:67-160, parse dispatch
  * cozo-core/src/parse/query.rs:260-400). The shapes mirror the
  * grammar, not the reference's internal normalized program — the
  * compiler lowers straight onto DataFrames.
  */
object Ast {

  sealed trait Expr
  case class Lit(v: Any) extends Expr // null | Boolean | Long | Double | String
  case class V(name: String) extends Expr
  case class Param(name: String) extends Expr // $name
  case class ListE(items: Seq[Expr]) extends Expr
  case class App(fn: String, args: Seq[Expr]) extends Expr
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Un(op: String, e: Expr) extends Expr

  sealed trait Atom
  /** *stored[args] (relation_apply) or rule[args] (rule_apply) — which
    * one is decided by the leading `*`. */
  case class RelApply(name: String, args: Seq[Expr], stored: Boolean,
                      validity: Option[Expr] = None) extends Atom
  /** *stored{col: expr, col2, ...} */
  case class NamedApply(name: String, pairs: Seq[(String, Option[Expr])],
                        validity: Option[Expr] = None) extends Atom
  case class Cond(e: Expr) extends Atom
  case class Unify(v: String, e: Expr) extends Atom
  case class UnifyIn(v: String, e: Expr) extends Atom
  case class Neg(a: Atom) extends Atom
  /** or-connected alternatives, each a conjunction. */
  case class Or(alts: Seq[Seq[Atom]]) extends Atom
  /** ~rel:idx{col, col2: var | query: …, k: …, bind_score: s}
    * (search_apply, cozoscript.pest:90) — probe a created index. */
  case class SearchApply(index: String, pairs: Seq[(String, String)],
                         opts: Map[String, Expr]) extends Atom

  /** Head argument: plain var or aggr(var, extra...). */
  case class HeadArg(aggr: Option[String], v: String, extra: Seq[Expr] = Nil)

  sealed trait RuleDef { def name: String; def head: Seq[HeadArg] }
  case class HornClause(name: String, head: Seq[HeadArg], body: Seq[Atom]) extends RuleDef
  case class ConstRule(name: String, head: Seq[HeadArg], data: Expr) extends RuleDef
  case class FixedApply(name: String, head: Seq[HeadArg], algo: String,
                        rels: Seq[FixedRel], opts: Map[String, Expr]) extends RuleDef

  sealed trait FixedRel
  case class FixedRuleRel(name: String) extends FixedRel
  case class FixedStoredRel(name: String, cols: Seq[String]) extends FixedRel

  /** Parsed `{k1, k2 => v1 default e, ...}` schema braces: key column
    * names, all column names in declared order, and per-column default
    * generator expressions (relation.rs:114-118 ColumnDef.default_gen).
    * Types are parsed but not carried — Spark schemas come from data. */
  case class SchemaSpec(keys: Seq[String] = Nil, all: Seq[String] = Nil,
                        defaults: Map[String, Expr] = Map.empty,
                        validity: Option[String] = None) // `col: Validity` annotation

  /** :limit / :offset / :sort / :assert / :timeout / :sleep / relation ops. */
  case class Options(limit: Option[Long] = None, offset: Option[Long] = None,
                     sort: Seq[(String, Boolean)] = Nil, // (var, descending)
                     assertNone: Boolean = false, assertSome: Boolean = false,
                     relationOp: Option[(String, String, SchemaSpec)] = None, // (op, relName, schema)
                     timeout: Option[Double] = None, // seconds; <=0 disables (parse/query.rs:260-273)
                     sleep: Option[Double] = None)   // seconds, after eval (db.rs:903-911)

  case class Program(rules: Seq[RuleDef], options: Options, sysOp: Option[String] = None)
}
