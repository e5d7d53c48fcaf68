package graft.lang

import Ast._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lowers parsed CozoScript clauses onto DataFrames.
  *
  * The reference compiles rules to a pipeline of RA nodes
  * (cozo-core/src/query/ra.rs) and evaluates bottom-up with semi-naive
  * deltas (query/eval.rs:65-303). Here a clause body IS the logical
  * plan: each atom extends a growing DataFrame by a (pushdown-friendly)
  * filtered scan + natural join, negation is a left-anti join, and the
  * head is a project/dedup or groupBy/agg — Catalyst then reorders /
  * pushes / broadcasts as it sees fit, which is the whole point of
  * building on Spark instead of porting the reference's tuple-at-a-time
  * iterators.
  */
class Compiler(spark: SparkSession,
               storedResolve: String => DataFrame,
               ruleResolve: String => Option[DataFrame],
               params: Map[String, Any],
               validityScan: (String, Column) => DataFrame =
                 (n, _) => throw Compiler.CompileException(
                   s"relation *$n has no validity column (register with validity=...)"),
               searchResolve: (String, Seq[(String, String)], Map[String, Ast.Expr], Option[DataFrame]) => DataFrame =
                 (n, _, _, _) => throw Compiler.CompileException(
                   s"no search index $n (create one with ::fts/::lsh/::hnsw create)"),
               /** choose_index analogue (runtime/relation.rs:196-246):
                 * given a named-field scan's literally-bound columns,
                 * may return an index-backed plan instead of the base
                 * relation scan (same schema). */
               namedStoredResolve: (String, Set[String]) => Option[DataFrame] =
                 (_, _) => None) {

  import Compiler.CompileException

  // ———————————————————————— expressions ————————————————————————

  def compileExpr(e: Expr): Column = e match {
    case Lit(null) => lit(null)
    case Lit(v) => lit(v)
    case V(name) => col(name)
    case Param(name) => lit(params.getOrElse(name,
      throw CompileException(s"missing parameter $$$name")))
    case ListE(items) =>
      if (items.isEmpty) array()
      else {
        val cols = items.map(compileExpr)
        // cozo lists are heterogeneous (value.rs:163); Spark arrays are
        // not. When the frame's schema shows no common element type,
        // lower the list to a struct<_1.._n> pair — the shape the
        // pair-taking aggregations (min_cost/latest_by/smallest_by) and
        // first/last/get understand. Homogeneous lists stay arrays.
        if (cols.size < 2 || frame.isEmpty || typed(array(cols: _*)).isDefined)
          array(cols: _*)
        else
          struct(cols.zipWithIndex.map { case (c, i) => c.as(s"_${i + 1}") }: _*)
      }
    case Un("-", x) => -compileExpr(x)
    case Un("!", x) => !compileExpr(x)
    case Un(op, _) => throw CompileException(s"unknown unary op $op")
    // comparisons touching an Any-tagged (JSON-encoded) column compare
    // in the ENCODED domain: the literal side is encoded driver-side so
    // `x == 'a'` matches the stored `"a"`, and ordering goes through the
    // cross-type sort key (value.rs:143-174 total order) instead of the
    // encoding's string order. Non-literal non-Any operands (a typed
    // column from another relation) stay opaque — documented limit.
    // arithmetic over an Any-tagged column (e.g. an int/float-mixed
    // const relation) reads the encoding back as a number — the
    // encoding renders numerics exactly as SQL double literals
    case Bin(op @ ("+" | "-" | "*" | "/" | "%" | "^"), l, r)
        if anyMarked(l) || anyMarked(r) =>
      def num(e: Expr): Column = {
        val c = compileExpr(e)
        if (anyMarked(e)) c.cast("double") else c
      }
      val (cl, cr) = (num(l), num(r))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr
        case "%" => modSemantics(cl, cr)
        case "^" => pow(cl, cr)
      }
    case Bin(op @ ("==" | "!=" | "<" | ">" | "<=" | ">="), l, r)
        if anyMarked(l) || anyMarked(r) =>
      // constant-fold the literal side into the ENCODED domain —
      // including list literals (a ListE of constants would otherwise
      // compile to a typed array column, which can never equal or
      // order against the JSON-encoded Any column)
      def constVal(e: Expr): Option[Any] = e match {
        case Lit(v) => Some(v)
        case Param(name) => Some(params.getOrElse(name,
          throw CompileException(s"missing parameter $$$name")))
        case ListE(items) =>
          val vs = items.map(constVal)
          if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
        case Un("-", x) => constVal(x).collect {
          case l: Long => -l
          case i: Int => -i.toLong
          case d: Double => -d
        }
        case _ => None
      }
      def operand(e: Expr): Column = constVal(e) match {
        case Some(v) => lit(AnyValue.encode(v))
        case None => compileExpr(e)
      }
      val (cl, cr) = (operand(l), operand(r))
      op match {
        case "==" => cl === cr
        case "!=" => cl =!= cr
        case "<" => AnyValue.sortKey(cl) < AnyValue.sortKey(cr)
        case ">" => AnyValue.sortKey(cl) > AnyValue.sortKey(cr)
        case "<=" => AnyValue.sortKey(cl) <= AnyValue.sortKey(cr)
        case ">=" => AnyValue.sortKey(cl) >= AnyValue.sortKey(cr)
      }
    case Bin(op, l, r) =>
      val (cl, cr) = (compileExpr(l), compileExpr(r))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        case "/" => cl / cr
        case "%" => modSemantics(cl, cr)
        case "^" => pow(cl, cr)
        case "++" => concat(cl, cr)
        case "==" => cl === cr
        case "!=" => cl =!= cr
        case "<" => cl < cr
        case ">" => cl > cr
        case "<=" => cl <= cr
        case ">=" => cl >= cr
        case "&&" => cl && cr
        case "||" => cl || cr
        case "~" => coalesce(cl, cr)
        case "->" => get_json_object(cl, "$." + litString(r, "->"))
        case other => throw CompileException(s"unknown operator $other")
      }
    case App("cond", args) =>
      // cond(c1, v1, c2, v2, ..., [default])
      val pairs = args.grouped(2).toSeq
      val branches = pairs.filter(_.length == 2)
      val default = if (args.length % 2 == 1) compileExpr(args.last) else lit(null)
      branches.foldRight(default) { case (Seq(c, v), acc) =>
        when(compileExpr(c), compileExpr(v)).otherwise(acc)
      }
    case App("length", Seq(x)) =>
      val cx = compileExpr(x)
      if (isListValued(x)) size(cx)
      else typed(cx) match {
        case Some(_: org.apache.spark.sql.types.ArrayType) => size(cx)
        case _ => length(cx)
      }
    case App("json", Seq(x)) =>
      // functions.rs:76 — complex values serialize to JSON text,
      // scalars render as their literal; dispatch on the static type
      val cx = compileExpr(x)
      import org.apache.spark.sql.types.{ArrayType, StructType, MapType}
      if (isListValued(x)) to_json(cx)
      else typed(cx) match {
        case Some(_: ArrayType) | Some(_: StructType) | Some(_: MapType) => to_json(cx)
        case _ => cx.cast("string")
      }
    case App("unicode_normalize", Seq(x, form)) =>
      graft.functions.CozoFunctions.unicodeNormalize(
        compileExpr(x), litString(form, "unicode_normalize"))
    case App("get_json_path", Seq(x, path)) =>
      get_json_object(compileExpr(x), "$." + litPathKeys(path, "get_json_path").mkString("."))
    // functions.rs:185 json_object(k1, v1, k2, v2, ...) with literal keys
    case App("json_object", args) =>
      if (args.length % 2 != 0)
        throw CompileException("json_object takes alternating key, value arguments")
      val fields = args.grouped(2).toSeq.map {
        case Seq(k, v) => compileExpr(v).as(litString(k, "json_object key"))
      }
      if (fields.isEmpty) lit("{}") else to_json(struct(fields: _*))
    // functions.rs:81/156 — top-level single-key paths (nested paths are
    // a documented non-goal of the string-encoded JSON representation)
    case App("set_json_path", Seq(x, path, v)) =>
      graft.functions.CozoFunctions.jsonSet(
        compileExpr(x), singleKey(path, "set_json_path"), compileExpr(v))
    case App("remove_json_path", Seq(x, path)) =>
      graft.functions.CozoFunctions.jsonRemove(
        compileExpr(x), singleKey(path, "remove_json_path"))
    // struct-pair accessors (heterogeneous lists lowered by ListE above)
    case App("first", Seq(x)) if structFields(x).isDefined =>
      compileExpr(x).getField(structFields(x).get.head)
    case App("last", Seq(x)) if structFields(x).isDefined =>
      compileExpr(x).getField(structFields(x).get.last)
    case App("get" | "maybe_get", Seq(x, i)) if structFields(x).isDefined =>
      val fields = structFields(x).get
      val idx = i match {
        case Lit(n: Long) => n.toInt
        case Lit(n: Int) => n
        case other => throw CompileException(
          s"get on a heterogeneous pair requires a literal index, got $other")
      }
      if (idx < 0 || idx >= fields.length)
        throw CompileException(s"get index $idx out of range for pair of ${fields.length}")
      compileExpr(x).getField(fields(idx))
    // numeric type preservation (functions.rs:711-737): floor/ceil keep
    // float inputs float; Spark's floor/ceil return LONG for doubles
    case App(fn @ ("floor" | "ceil"), Seq(x)) =>
      val cx = compileExpr(x)
      val f = if (fn == "floor") floor(cx) else ceil(cx)
      typed(cx) match {
        case Some(org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType) =>
          f.cast("double")
        case _ => f
      }
    // functions.rs:693-709: signum(-0.0) = -1 (sign-bit semantics), NaN
    // passes through. Spark's signum maps -0.0 → 0.0, so build the sign
    // from comparisons; float results stay double (a static column can't
    // hold both the int signs and a NaN).
    case App("signum", Seq(x)) =>
      val cx = compileExpr(x)
      typed(cx) match {
        case Some(org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType) =>
          // -0.0 detection via string render (ANSI forbids the 1/x probe)
          when(isnan(cx), cx)
            .when(cx > 0, 1.0)
            .when(cx < 0 || (cx === 0.0 && cx.cast("string").startsWith("-")), -1.0)
            .otherwise(0.0)
        case _ => signum(cx).cast("long")
      }
    // functions.rs:1995-2012: to_float accepts the named constants; an
    // ANSI cast would throw on "PI"/"NAN"/"INF"/"NEG_INF"
    case App("to_float", Seq(x)) =>
      val cx = compileExpr(x)
      val r = typed(cx) match {
        case Some(org.apache.spark.sql.types.StringType) =>
          when(cx === "PI", math.Pi).when(cx === "E", math.E)
            .when(cx === "NAN", Double.NaN)
            .when(cx === "INF", Double.PositiveInfinity)
            .when(cx === "NEG_INF", Double.NegativeInfinity)
            .otherwise(cx.cast("double"))
        case _ => cx.cast("double")
      }
      coalesce(r, lit(0.0)) // functions.rs:1998: to_float(null) = 0.0
    // functions.rs:1920-1942: truthiness by type — non-empty for
    // strings/bytes/lists, nonzero for numbers (NaN is truthy), never an
    // ANSI string-to-boolean cast; null → false
    case App(fn @ ("to_bool" | "to_unity"), Seq(x)) =>
      val cx = compileExpr(x)
      import org.apache.spark.sql.types._
      val b = typed(cx) match {
        case Some(BooleanType) => cx
        case Some(StringType) => length(cx) > 0
        case Some(_: ArrayType) => size(cx) > 0
        case Some(BinaryType) => length(cx) > 0
        case Some(_: NumericType) => cx =!= 0 // NaN != 0 → truthy (get_int() != Some(0))
        case Some(NullType) => lit(false)
        case _ => cx.cast("boolean")
      }
      val t = coalesce(b, lit(false))
      if (fn == "to_bool") t else t.cast("long") // to_unity (functions.rs:1947): 0/1
    case App("mod", Seq(l, r)) => modSemantics(compileExpr(l), compileExpr(r))
    // functions.rs:453/468: scalar max/min require numbers
    case App(fn @ ("max" | "min"), args) if args.nonEmpty =>
      val cs = args.map(compileExpr)
      cs.foreach(c => typed(c) match {
        case Some(t) if !t.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
          t != org.apache.spark.sql.types.NullType =>
          throw CompileException(s"scalar $fn requires numeric arguments, got $t")
        case _ => ()
      })
      if (cs.length == 1) cs.head
      else if (fn == "max") greatest(cs: _*) else least(cs: _*)
    case App(fn, args) =>
      Builtins.scalar.get(fn) match {
        case Some(impl) => impl(args.map(compileExpr))
        case None => throw CompileException(s"unknown function $fn/${args.length}")
      }
  }

  /** `@ t` timestamp exactly as the reference's expr2vld_spec
    * (parse/query.rs:1086-1102): the spec must be CONSTANT — an
    * integer is MICROSECONDS since epoch, "NOW" the current instant,
    * "END" the maximum validity (Validity::inf — i64 MAX µs), any
    * other string parses as RFC3339 (str2vld, functions.rs:2520);
    * floats and non-constant expressions are "bad specification of
    * validity". */
  private def asOfExpr(v: Expr): Column = {
    def bad(what: Any): Nothing =
      throw CompileException(s"bad specification of validity: $what")
    def ofConst(c: Any): Column = c match {
      case "NOW" => current_timestamp()
      case "END" => timestamp_micros(lit(Long.MaxValue))
      case s: String =>
        val inst =
          try java.time.OffsetDateTime.parse(s).toInstant
          catch { case _: java.time.format.DateTimeParseException => bad(s) }
        timestamp_micros(lit(inst.getEpochSecond * 1000000L + inst.getNano / 1000L))
      case n: Long => timestamp_micros(lit(n))
      case n: Int => timestamp_micros(lit(n.toLong))
      case d: Double if d.isWhole => timestamp_micros(lit(d.toLong))
      case other => bad(other)
    }
    v match {
      case Lit(c) => ofConst(c)
      case Param(name) => ofConst(params.getOrElse(name, bad(s"$$$name")))
      case other => bad(other)
    }
  }

  /** Rust remainder semantics (functions.rs:537-546): a float mod zero
    * is NaN, not an ANSI REMAINDER_BY_ZERO; integer mod 0 stays an
    * error like the reference. */
  private def modSemantics(cl: Column, cr: Column): Column = {
    import org.apache.spark.sql.types._
    def integral(c: Column) = typed(c).exists {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral(cl) && integral(cr)) cl % cr
    else when(cr =!= 0.0, cl % cr).otherwise(lit(Double.NaN))
  }

  /** Field names when `e` is a struct-lowered heterogeneous pair in the
    * current frame, else None (array path). */
  private def structFields(e: Expr): Option[Seq[String]] =
    typed(compileExpr(e)) match {
      case Some(st: org.apache.spark.sql.types.StructType) => Some(st.fieldNames.toSeq)
      case _ => None
    }

  /** Compile-time literal string: a Lit or a bound $parameter. Anything
    * runtime-valued throws — never silently stringify a Column
    * (Column.toString is a plan pretty-print, not a value). */
  private def litString(e: Expr, where: String): String = e match {
    case Lit(s: String) => s
    case Param(name) => params.get(name) match {
      case Some(s: String) => s
      case Some(other) => throw CompileException(
        s"$where requires a string parameter, got $other")
      case None => throw CompileException(s"missing parameter $$$name")
    }
    case other => throw CompileException(
      s"$where requires a literal string argument, got $other")
  }

  /** JSON path as literal key list: accepts 'key' or ['k1', 'k2']. */
  private def litPathKeys(e: Expr, where: String): Seq[String] = e match {
    case ListE(items) => items.map(litString(_, where))
    case other => Seq(litString(other, where))
  }

  private def singleKey(e: Expr, where: String): String =
    litPathKeys(e, where) match {
      case Seq(k) => k
      case ks => throw CompileException(
        s"$where supports top-level (single-key) paths only, got ${ks.mkString("[", ", ", "]")}")
    }

  /** Is `e` a variable bound to an Any-tagged column in the current
    * frame? (Any columns carry [[AnyValue.marker]] metadata.) */
  private def anyMarked(e: Expr): Boolean = e match {
    case V(n) => frame.exists(f =>
      f.columns.contains(n) && AnyValue.isAny(f.schema(n).metadata))
    case _ => false
  }

  /** Frame the current atom compiles against — lets generic functions
    * (`length`) resolve an argument's Spark type at compile time. */
  private var frame: Option[DataFrame] = None
  private def typed(c: Column): Option[org.apache.spark.sql.types.DataType] =
    // fall back to a dummy frame so pure-literal expressions (const
    // rules' first atom, where no frame exists yet) still resolve types
    frame.orElse(Some(one())).flatMap(f =>
      scala.util.Try(f.select(c).schema.head.dataType).toOption)

  private def isListValued(e: Expr): Boolean = e match {
    case ListE(_) => true
    case App(fn, _) => Builtins.listReturning.contains(fn)
    case Bin("++", l, _) => isListValued(l)
    case _ => false
  }

  /** Free variables of an expression. */
  def freeVars(e: Expr): Set[String] = e match {
    case V(n) => Set(n)
    case ListE(items) => items.flatMap(freeVars).toSet
    case App(_, args) => args.flatMap(freeVars).toSet
    case Bin(_, l, r) => freeVars(l) ++ freeVars(r)
    case Un(_, x) => freeVars(x)
    case _ => Set.empty
  }

  // ———————————————————————— body compilation ————————————————————————

  /** Compile a conjunction of atoms to a DataFrame whose columns are the
    * bound variable names. */
  def compileBody(atoms: Seq[Atom]): DataFrame = {
    // well-ordering lite (reorder.rs:34-150): a `~probe` whose `query:`
    // references a variable is deferred until an earlier atom binds it —
    // the reference reorders atoms so every variable is bound before use
    var cur = Option.empty[DataFrame]
    val pending = scala.collection.mutable.Queue.empty[Atom]
    def bound = cur.map(_.columns.toSet).getOrElse(Set.empty[String])
    def ready(a: Atom): Boolean = a match {
      case SearchApply(_, _, opts) => opts.get("query") match {
        case Some(V(n)) => bound.contains(n)
        case _ => true
      }
      case _ => true
    }
    def flush(): Unit = {
      var progress = true
      while (progress) pending.dequeueFirst(ready) match {
        case Some(a) => cur = Some(step(cur, a))
        case None => progress = false
      }
    }
    atoms.foreach { a =>
      if (!ready(a)) pending += a
      else { cur = Some(step(cur, a)); flush() }
    }
    if (pending.nonEmpty)
      throw CompileException(
        s"probe query variable is never bound in the rule body (${pending.head})")
    cur.getOrElse(throw CompileException("empty rule body"))
  }

  private def one(): DataFrame = spark.range(1).toDF("__one").drop("__one")

  private def step(cur: Option[DataFrame], atom: Atom): DataFrame = atom match {
    case RelApply(name, args, stored, validity) =>
      // in-SCC rule with no facts yet: the whole clause derives nothing
      val df = validity match {
        case Some(v) if stored => validityScan(name, asOfExpr(v))
        case Some(_) => throw CompileException(s"validity scan @ only applies to stored relations")
        case None => resolveAtomRel(name, stored).getOrElse(throw Compiler.EmptyRelation(name))
      }
      if (args.length != df.columns.length)
        throw CompileException(
          s"*$name has arity ${df.columns.length}, applied with ${args.length} args")
      applyPositional(cur, df, df.columns.toSeq.zip(args))

    case NamedApply(name, pairs, validity) =>
      val df = validity match {
        case Some(v) => validityScan(name, asOfExpr(v))
        case None =>
          val bound = pairs.collect { case (f, Some(Lit(_))) => f }.toSet
          namedStoredResolve(name, bound).getOrElse(
            resolveAtomRel(name, stored = true).getOrElse(throw Compiler.EmptyRelation(name)))
      }
      val cols = df.columns.toSet
      val binds = pairs.map {
        case (f, _) if !cols.contains(f) =>
          throw CompileException(s"*$name has no column $f (has: ${df.columns.mkString(", ")})")
        case (f, None) => f -> V(f)
        case (f, Some(e)) => f -> e
      }
      applyPositional(cur, df.select(binds.map(_._1).map(col): _*), binds)

    case Cond(e) =>
      val base = cur.getOrElse(throw CompileException(s"filter $e with no bound relation"))
      frame = Some(base)
      base.filter(compileExpr(e))

    case Unify("_", e) =>
      // `_` never unifies or binds (tests.rs do_not_unify_underscore):
      // the expression is discarded; repeated `_ = …` atoms are
      // independent no-ops
      frame = cur
      cur.getOrElse(one())

    case Unify(v, e) =>
      frame = cur
      cur match {
        // Datalog unification: null = null holds (value.rs derives total
        // Eq; no SQL three-valued logic) — hence <=> not ===
        case Some(df) if df.columns.contains(v) => df.filter(col(v) <=> compileExpr(e))
        case Some(df) => df.withColumn(v, compileExpr(e))
        case None => one().select(compileExpr(e).as(v))
      }

    case UnifyIn(v, e) =>
      frame = cur
      cur match {
        case Some(df) if df.columns.contains(v) => df.filter(array_contains(compileExpr(e), col(v)))
        case Some(df) => df.withColumn(v, explode(compileExpr(e)))
        case None => one().select(explode(compileExpr(e)).as(v))
      }

    case Neg(inner) =>
      val base = cur.getOrElse(throw CompileException("negation with no bound relation (unsafe)"))
      // a negand over a rule that derived NOTHING keeps every row
      // (`not empty` = true) — it must not drop the clause
      try {
        val ndf = step(None, inner)
        val shared = base.columns.intersect(ndf.columns)
        if (shared.isEmpty)
          throw CompileException("negated atom shares no variable with the rest of the body (unsafe)")
        nullSafeJoin(base, ndf.select(shared.map(col): _*).dropDuplicates(),
          shared.toSeq, "left_anti")
      } catch { case Compiler.EmptyRelation(_) => base }

    case SearchApply(index, pairs, opts) =>
      // the probe result is a small top-k relation: join it into the
      // frame on shared vars (or cross when it only seeds the clause);
      // variable-driven probes (query: v) receive the current frame and
      // return one top-k set per distinct query value (HnswSearchRA's
      // left-stream drive, ra.rs:1068-1122)
      val df = searchResolve(index, pairs, opts, cur)
      cur match {
        case None => df
        case Some(c) =>
          val shared = c.columns.intersect(df.columns)
          if (shared.nonEmpty) c.join(df, shared.toSeq)
          else c.crossJoin(df)
      }

    case Or(alts) if alts.forall(_.forall(_.isInstanceOf[Cond])) && cur.isDefined =>
      // pure-condition disjunction over an existing frame: ONE filter
      // with an or-ed predicate — no union, no dedup shuffle, and
      // trivially set-correct (each frame row appears once). This is
      // the common `(x < 3 or y == 'a')` shape; branches that bind
      // relations fall through to the union form below.
      val base = cur.get
      frame = Some(base)
      val pred = alts.map(conj =>
          conj.map { case Cond(e) => compileExpr(e) }.reduce(_ && _))
        .reduce(_ || _)
      base.filter(pred)

    case Or(alts) =>
      // a branch whose rule derived nothing contributes no rows but must
      // not lose the other branches; all-empty = the whole atom is empty
      val branches = alts.flatMap { conj =>
        try Some(conj.foldLeft(cur)((c, a) => Some(step(c, a)))
          .getOrElse(throw CompileException("empty or-branch")))
        catch { case Compiler.EmptyRelation(_) => None }
      }
      if (branches.isEmpty) throw Compiler.EmptyRelation("or")
      val common = branches.map(_.columns.toSet).reduce(_ intersect _).toSeq.sorted
      if (common.isEmpty) throw CompileException("or-branches bind no common variable")
      // SET semantics across branches: a binding satisfying several
      // disjuncts appears ONCE — without the dedup an aggregation head
      // double-counts it (caught by DifferentialFuzzSpec). DELIBERATE
      // DIVERGENCE from the reference for the aggregated case: cozo's
      // DNF normalization (program.rs:635 into_normalized_program →
      // one clause per disjunct) feeds every clause's stream into one
      // shared aggregation with no cross-clause dedup
      // (eval.rs:420-445), so there `x[sum(a)] := y[a], (c or c)`
      // doubles the sum — `or` loses idempotence. For non-aggregated
      // rules the reference's set store dedups and the two engines
      // agree; we extend the set semantics to aggregation inputs.
      branches.map(_.select(common.map(col): _*)).reduce(_ unionByName _)
        .dropDuplicates()
  }

  private def resolveAtomRel(name: String, stored: Boolean): Option[DataFrame] =
    if (stored) Some(storedResolve(name)) else ruleResolve(name)

  /** Bind a relation's columns to argument expressions positionally and
    * join into the current frame. Literal/duplicate-var equalities are
    * applied BEFORE the join (they reach the parquet scan as pushed
    * filters); expressions over outer variables are applied after.
    */
  private def applyPositional(cur: Option[DataFrame], df0: DataFrame,
                              colArgs0: Seq[(String, Expr)]): DataFrame = {
    // a rule head with repeated variables yields duplicate column
    // names; positional consumption renames them apart first
    val (df, colArgs) =
      if (df0.columns.distinct.length != df0.columns.length) {
        val tmp = df0.columns.indices.map(i => s"__p$i")
        (df0.toDF(tmp: _*), tmp.zip(colArgs0.map(_._2)))
      } else (df0, colArgs0)
    var varOf = Map.empty[String, String] // var -> original column
    var preFilters = List.empty[Column]
    var postFilters = List.empty[(String, Expr)] // fresh col -> expr
    var keepCols = List.empty[Column]
    var newVars = List.empty[String]
    var freshIdx = 0
    colArgs.foreach { case (orig, arg) =>
      arg match {
        case V("_") => ()
        case V(v) if varOf.contains(v) =>
          preFilters ::= (col(orig) <=> col(varOf(v)))
        case V(v) =>
          varOf += v -> orig
          keepCols ::= col(orig).as(v)
          newVars ::= v
        case Lit(x) =>
          preFilters ::= (if (x == null) col(orig).isNull else col(orig) === lit(x))
        case e =>
          val fresh = s"__a$freshIdx"; freshIdx += 1
          keepCols ::= col(orig).as(fresh)
          postFilters ::= (fresh, e)
      }
    }
    val filtered = preFilters.foldLeft(df)(_ filter _)
    val projected = filtered.select(keepCols.reverse: _*)
    val joined = cur match {
      case None => projected
      case Some(c) =>
        val shared = c.columns.toSeq.intersect(newVars)
        if (shared.nonEmpty) nullSafeJoin(c, projected, shared, "inner")
        else c.crossJoin(projected)
    }
    postFilters.foldLeft(joined) { case (d, (fresh, e)) =>
      frame = Some(d)
      d.filter(col(fresh) <=> compileExpr(e)).drop(fresh)
    }
  }

  /** Equi-join on shared variables with Datalog unification semantics:
    * equal NULLs match (`<=>`, EqualNullSafe — still a hashable join
    * key for Catalyst, so broadcast/SMJ planning is unaffected). The
    * right side's key columns are renamed away and dropped so output
    * column names stay unambiguous like a USING join. */
  private def nullSafeJoin(left: DataFrame, right: DataFrame,
                           shared: Seq[String], how: String): DataFrame = {
    val renamed = shared.foldLeft(right)((d, s) => d.withColumnRenamed(s, s"__nsj_$s"))
    val cond = shared.map(s => left(s) <=> renamed(s"__nsj_$s")).reduce(_ && _)
    val joined = left.join(renamed, cond, how)
    if (how == "left_anti" || how == "left_semi") joined
    else shared.foldLeft(joined)((d, s) => d.drop(s"__nsj_$s"))
  }

  // ———————————————————————— heads ————————————————————————

  /** Apply a clause head to a compiled body: project + set-dedup, or
    * groupBy + aggregations when any head arg is an aggregation
    * (cozo head aggrs, data/aggr.rs). Output column names are the head
    * variable names, in head order.
    */
  def applyHead(head: Seq[HeadArg], body: DataFrame): DataFrame = {
    head.foreach { h =>
      if (h.v == "_")
        throw CompileException("`_` cannot appear in a rule head (it never binds)")
      if (!body.columns.contains(h.v))
        throw CompileException(s"head variable ${h.v} is not bound in rule body")
    }
    val plain = head.filter(_.aggr.isEmpty).map(_.v)
    if (!head.exists(_.aggr.isDefined)) {
      // positional aliases first: a repeated head variable (y[A, A])
      // would otherwise produce duplicate column names mid-plan
      body.select(plain.zipWithIndex.map { case (v, i) => col(v).as(s"__p$i") }: _*)
        .dropDuplicates().toDF(plain: _*)
    } else {
      frame = Some(body)
      // bounded-memory rewrite for the common top-n shape: a SINGLE
      // capped collect(v, n) pre-filters each group to its n smallest
      // rows by v (partitioned window — hash-distributed) so the
      // collect buffers n values, not the whole group. The value
      // multiset is identical: ties beyond the cut contribute equal
      // values either way. Skipped when other aggregations share the
      // head (the pre-filter would corrupt their inputs) or n < 1
      // (groups must still surface with an empty list).
      val body1 = head.collect {
        case HeadArg(Some("collect"), v, Seq(Lit(n: Long))) => (v, n)
      } match {
        case Seq((v, n)) if head.count(_.aggr.isDefined) == 1 && n >= 1
            && head.exists(h => h.aggr.isEmpty) =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(head.collect { case HeadArg(None, pv, _) => col(pv) }: _*)
            .orderBy(col(v))
          body.withColumn("__cap_rn", row_number().over(w))
            .filter(col("__cap_rn") <= n).drop("__cap_rn")
        case _ => body
      }
      val aggs = head.collect { case HeadArg(Some(a), v, extra) =>
        val c = Builtins.aggrTyped(a, col(v), extra.map(compileExpr),
          body.schema(v).dataType)
        // collect(v, cap) caps the list length post-aggregation
        val capped = (a, extra) match {
          case ("collect", Seq(Lit(n: Long))) => slice(c, 1, n.toInt)
          case _ => c
        }
        capped.as(v)
      }
      val grouped =
        if (plain.nonEmpty) body1.groupBy(plain.map(col): _*).agg(aggs.head, aggs.tail: _*)
        else body1.agg(aggs.head, aggs.tail: _*)
      grouped.select(head.map(h => col(h.v)): _*)
    }
  }
}

object Compiler {
  final case class CompileException(msg: String) extends RuntimeException(msg)
  /** Signals that a referenced rule has derived no facts yet (recursion
    * round 0): the enclosing clause contributes nothing this round. */
  final case class EmptyRelation(name: String) extends RuntimeException(name)
}
