package graft.lang

import graft.functions.{CozoAggregates => CA, CozoFunctions => CF, VectorFunctions => VF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function and aggregation registries for the CozoScript
  * compiler: cozo name → Spark Column mapping. Coverage follows
  * cozo-core/src/data/functions.rs (scalars) and data/aggr.rs
  * (aggregations); nearly all are codegen'd Spark built-ins.
  */
object Builtins {

  private def arg(args: Seq[Column], i: Int): Column = args(i)

  /** name → implementation; `args.length` dispatch is the caller's job
    * (Spark built-ins throw reasonable errors on arity mismatch). */
  val scalar: Map[String, Seq[Column] => Column] = Map(
    // — comparison / logic (functions.rs:297-372)
    "eq" -> (a => a(0) === a(1)),
    "neq" -> (a => a(0) =!= a(1)),
    "gt" -> (a => a(0) > a(1)),
    "ge" -> (a => a(0) >= a(1)),
    "lt" -> (a => a(0) < a(1)),
    "le" -> (a => a(0) <= a(1)),
    "and" -> (_.reduce(_ && _)),
    "or" -> (_.reduce(_ || _)),
    "negate" -> (a => !a(0)),
    "is_in" -> (a => array_contains(a(1), a(0))),
    "coalesce" -> (a => coalesce(a: _*)),
    "if" -> (a => if (a.length == 3) when(a(0), a(1)).otherwise(a(2)) else when(a(0), a(1))),
    "if_else" -> (a => when(a(0), a(1)).otherwise(a(2))),
    "assert" -> (a => assert_true(a(0))),
    // — arithmetic / math (functions.rs:382-1069)
    "add" -> (_.reduce(_ + _)),
    "sub" -> (a => a(0) - a(1)),
    "mul" -> (_.reduce(_ * _)),
    "div" -> (a => a(0) / a(1)),
    "minus" -> (a => -a(0)),
    "abs" -> (a => abs(a(0))),
    "signum" -> (a => signum(a(0))),
    "floor" -> (a => floor(a(0))),
    "ceil" -> (a => ceil(a(0))),
    "round" -> (a => if (a.length > 1) round(a(0), 0) else round(a(0))), // cozo round is arity-1
    "mod" -> (a => a(0) % a(1)),
    "pow" -> (a => pow(a(0), a(1))),
    "sqrt" -> (a => sqrt(a(0))),
    "exp" -> (a => exp(a(0))),
    "exp2" -> (a => pow(lit(2.0), a(0))),
    "ln" -> (a => log(a(0))),
    "log2" -> (a => log2(a(0))),
    "log10" -> (a => log10(a(0))),
    "sin" -> (a => sin(a(0))), "cos" -> (a => cos(a(0))), "tan" -> (a => tan(a(0))),
    "asin" -> (a => asin(a(0))), "acos" -> (a => acos(a(0))), "atan" -> (a => atan(a(0))),
    "atan2" -> (a => atan2(a(0), a(1))),
    "sinh" -> (a => sinh(a(0))), "cosh" -> (a => cosh(a(0))), "tanh" -> (a => tanh(a(0))),
    "asinh" -> (a => asinh(a(0))), "acosh" -> (a => acosh(a(0))), "atanh" -> (a => atanh(a(0))),
    "deg_to_rad" -> (a => radians(a(0))),
    "rad_to_deg" -> (a => degrees(a(0))),
    "haversine" -> (a => CF.haversine(a(0), a(1), a(2), a(3))),
    "haversine_deg_input" -> (a => CF.haversineDeg(a(0), a(1), a(2), a(3))),
    // scalar min/max over args (functions.rs:453/468)
    "max" -> (a => greatest(a: _*)),
    "min" -> (a => least(a: _*)),
    // — strings (functions.rs:1253-1868)
    // `length` works on strings and lists in cozo; both branches of a
    // `when` are analyzed so runtime dispatch is impossible — the
    // compiler dispatches on the argument's AST (listReturning), this
    // entry is the string fallback
    "length" -> (a => length(a(0))),
    "list_len" -> (a => size(a(0))),
    "str_len" -> (a => length(a(0))),
    "lowercase" -> (a => lower(a(0))),
    "uppercase" -> (a => upper(a(0))),
    "trim" -> (a => trim(a(0))),
    "trim_start" -> (a => ltrim(a(0))),
    "trim_end" -> (a => rtrim(a(0))),
    "starts_with" -> (a => a(0).startsWith(a(1))),
    "ends_with" -> (a => a(0).endsWith(a(1))),
    "str_includes" -> (a => a(0).contains(a(1))),
    "concat" -> (a => concat(a: _*)),
    "split" -> (a => call_function("split", a(0), a(1))),
    "chars" -> (a => CF.chars(a(0))),
    "from_substrings" -> (a => CF.fromSubstrings(a(0))),
    // literal form handled at the App call site; anything else is an error,
    // never a silent no-op
    "unicode_normalize" -> (_ => throw Compiler.CompileException(
      "unicode_normalize requires a literal normalization-form argument ('nfc'|'nfd'|'nfkc'|'nfkd')")),
    "t2s" -> (a => CF.t2s(a(0))),
    "pad_start" -> (a => lpad(a(0), a(1).cast("int"),
      if (a.length > 2) a(2) else lit(" "))),
    "pad_end" -> (a => rpad(a(0), a(1).cast("int"),
      if (a.length > 2) a(2) else lit(" "))),
    "slice_string" -> (a => CF.sliceString(a(0), a(1), a(2))),
    // — regex (functions.rs:1380-1435); regex_replace is FIRST-occurrence
    // only (Rust Regex::replace), _all is Spark's regexp_replace
    "regex_matches" -> (a => regexp_like(a(0), a(1))),
    "regex_replace" -> (a => CF.regexReplaceFirst(a(0), a(1), a(2))),
    "regex_replace_all" -> (a => regexp_replace(a(0), a(1), a(2))),
    "regex_extract" -> (a => regexp_extract_all(a(0), a(1), lit(0))),
    "regex_extract_first" -> (a => regexp_substr(a(0), a(1))),
    // — lists (functions.rs:1657-2409)
    "list" -> (a => array(a: _*)),
    "first" -> (a => CF.first_(a(0))),
    "last" -> (a => CF.last_(a(0))),
    "get" -> (a => element_at(a(0), a(1).cast("int") + 1)),
    // maybe_get returns null out-of-bounds (functions.rs:1712) where get
    // errors — try_element_at vs ANSI element_at
    "maybe_get" -> (a => try_element_at(a(0), a(1).cast("int") + 1)),
    "slice" -> (a => CF.sliceList(a(0), a(1), a(2))),
    "sorted" -> (a => sort_array(a(0))),
    "reverse" -> (a => reverse(a(0))),
    "append" -> (a => concat(a(0), array(a(1)))),
    "prepend" -> (a => concat(array(a(1)), a(0))),
    "unique" -> (a => array_distinct(a(0))),
    "union" -> (a => array_distinct(a.reduce(concat(_, _)))),
    "intersection" -> (a => a.reduce(array_intersect)),
    "difference" -> (a => a.reduce(array_except)),
    "int_range" -> (a =>
      if (a.length == 1) CF.intRange(lit(0L), a(0))
      else if (a.length == 2) CF.intRange(a(0), a(1))
      else CF.intRangeStep(a(0), a(1), a(2))),
    "zip" -> (a => arrays_zip(a: _*)),
    "chunks" -> (a => CF.chunks(a(0), a(1))),
    "chunks_exact" -> (a => CF.chunksExactC(a(0), a(1))),
    "windows" -> (a => CF.windowsC(a(0), a(1))),
    "sum_of" -> (a => aggregate(a(0), lit(0.0), (acc, x) => acc + x)),
    "product_of" -> (a => aggregate(a(0), lit(1.0), (acc, x) => acc * x)),
    // — type predicates / casts
    "is_null" -> (a => a(0).isNull),
    "is_num" -> (a => typeof(a(0)).isin("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")),
    "is_int" -> (a => typeof(a(0)).isin("tinyint", "smallint", "int", "bigint")),
    "is_float" -> (a => typeof(a(0)).isin("float", "double")),
    "is_string" -> (a => typeof(a(0)) === "string"),
    "is_bytes" -> (a => typeof(a(0)) === "binary"),
    "is_list" -> (a => typeof(a(0)).startsWith("array")),
    "is_bool" -> (a => typeof(a(0)) === "boolean"),
    "is_nan" -> (a => isnan(a(0))),
    "is_uuid" -> (a => a(0).rlike("^[0-9a-fA-F]{8,12}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")),
    "is_vec" -> (a => typeof(a(0)).isin("array<float>", "array<double>")),
    // string-encoded JSON: a value is "json" when it parses as an
    // object/array or is a JSON scalar literal (functions.rs:311 checks
    // the Json runtime type, which our encoding folds into strings)
    "is_json" -> (a => a(0).rlike("^\\s*([\\[{\"]|-?[0-9]|true$|false$|null$)")),
    "is_finite" -> (a => !isnan(a(0)) && a(0) =!= Double.PositiveInfinity && a(0) =!= Double.NegativeInfinity),
    "is_infinite" -> (a => a(0) === Double.PositiveInfinity || a(0) === Double.NegativeInfinity),
    "to_int" -> (a => a(0).cast("long")),
    "to_float" -> (a => a(0).cast("double")),
    "to_string" -> (a => a(0).cast("string")),
    "to_bool" -> (a => a(0).cast("boolean")),
    "to_unity" -> (a => when(a(0).isNull || a(0) === false || a(0) === 0 || a(0) === "" || size_safe(a(0)) === 0, 0).otherwise(1)),
    // — JSON (functions.rs:76-316); json_object/set_json_path/
    // remove_json_path are Lit-gated at the App call site in Compiler
    "parse_json" -> (a => a(0)), // JSON kept as string; access via get_json_object / ->
    // functions.rs:76 `json` — scalar fallback; complex inputs are
    // dispatched to to_json at the App call site (static-type dispatch,
    // since both when-branches would be analyzed)
    "json" -> (a => a(0).cast("string")),
    // functions.rs:1380 `regex` — a compile-time pattern marker; our
    // regex functions accept pattern strings directly
    "regex" -> (a => a(0)),
    // functions.rs:2571 `validity` — build a (timestamp, assert) pair
    // from an RFC3339 string, `~`-prefixed for retractions
    "validity" -> (a => struct(
      to_timestamp(regexp_replace(a(0), "^~", "")).as("ts"),
      (!a(0).startsWith("~")).as("assert"))),
    "dump_json" -> (a => to_json(a(0))),
    "get_json_path" -> (_ => throw Compiler.CompileException(
      "get_json_path requires a literal path argument")),
    // functions.rs:316 — unwrap a JSON scalar: ints/floats/bools parse,
    // quoted strings unquote, objects/arrays pass through as text
    "json_to_scalar" -> (a => when(a(0).rlike("^\"((?s).*)\"$"),
        regexp_extract(a(0), "^\"((?s).*)\"$", 1))
      .otherwise(a(0))),
    "pack_bits" -> (a => CF.packBits(a(0))),
    "unpack_bits" -> (a => CF.unpackBits(a(0))),
    // — bytes bitwise scalars (functions.rs:1126-1176)
    "bit_and" -> (a => CF.bytesAnd(a(0), a(1))),
    "bit_or" -> (a => CF.bytesOr(a(0), a(1))),
    "bit_xor" -> (a => CF.bytesXor(a(0), a(1))),
    "bit_not" -> (a => CF.bytesNot(a(0))),
    // — encoding / hashing
    "encode_base64" -> (a => base64(a(0))),
    "decode_base64" -> (a => unbase64(a(0))),
    "hash" -> (a => xxhash64(a: _*)),
    // — vectors
    "l2_dist" -> (a => VF.l2Dist(a(0), a(1))),
    "ip_dist" -> (a => VF.ipDist(a(0), a(1))),
    "cos_dist" -> (a => VF.cosineDistance(a(0), a(1))),
    "l2_normalize" -> (a => CF.l2Normalize(a(0))),
    "vec" -> (a => a(0).cast("array<float>")),
    // — random (functions.rs:2305-2550; nondeterministic by nature)
    "rand_float" -> (_ => rand()),
    "rand_int" -> (a => (rand() * (a(1) - a(0) + 1) + a(0)).cast("long")),
    "rand_bernoulli" -> (a => CF.randBernoulli(a(0))),
    "rand_vec" -> (a => CF.randVec(a(0))),
    "rand_uuid_v4" -> (_ => uuid()),
    "rand_uuid_v1" -> (_ => CF.timeUuid(current_timestamp(), rand())),
    "rand_choose" -> (a => try_element_at(shuffle(a(0)), lit(1))), // empty list → null (functions.rs:2422)
    // — time (functions.rs:2441-2520)
    "now" -> (_ => unix_timestamp(current_timestamp()).cast("double")),
    "format_timestamp" -> (a => date_format(timestamp_seconds(a(0)), "yyyy-MM-dd'T'HH:mm:ssXXX")),
    "parse_timestamp" -> (a => unix_timestamp(to_timestamp(a(0))).cast("double")),
    // — uuid
    // functions.rs:2536: parse-or-error, never a silent passthrough
    "to_uuid" -> (a => when(
      a(0).rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
      a(0).cast("string"))
      .otherwise(raise_error(concat(lit("cannot convert to uuid: "), a(0).cast("string"))))),
    "uuid_timestamp" -> (a => CF.uuidTimestamp(a(0)))
  )

  private def size_safe(c: Column): Column = when(typeof(c).startsWith("array"), size(c)).otherwise(lit(null))

  /** Head aggregations: name → (value column, extra args) → aggregate
    * expression (data/aggr.rs registry aggr.rs:1158-1185). */
  val aggr: Map[String, (Column, Seq[Column]) => Column] = Map(
    // cozo count counts ROWS, nulls included (aggrs.rs:237-249) — Spark's
    // count(col) would skip null values
    "count" -> ((_, _) => count(lit(1))),
    "count_unique" -> ((c, _) => count_distinct(c)),
    "sum" -> ((c, _) => sum(c)),
    "product" -> ((c, _) => CA.product(c)),
    "min" -> ((c, _) => min(c)),
    "max" -> ((c, _) => max(c)),
    "mean" -> ((c, _) => avg(c)),
    "variance" -> ((c, _) => var_samp(c)),
    "std_dev" -> ((c, _) => stddev_samp(c)),
    "and" -> ((c, _) => bool_and(c)),
    "or" -> ((c, _) => bool_or(c)),
    "unique" -> ((c, _) => CA.unique(c)),
    "collect" -> ((c, extra) => extra.headOption match {
      case Some(_) => CA.collect(c, None) // cap applied post-hoc when literal
      case None => CA.collect(c)
    }),
    "group_count" -> ((c, _) => CA.groupCount(c)),
    "union" -> ((c, _) => CA.unionAgg(c)),
    "intersection" -> ((c, _) => CA.intersectionAgg(c)),
    "choice" -> ((c, _) => CA.choice(c)),
    "choice_rand" -> ((c, _) => CA.choiceRand(c)),
    "min_cost" -> ((c, _) => CA.minCost(c)),
    "shortest" -> ((c, _) => CA.shortest(c)),
    "latest_by" -> ((c, extra) => CA.latestBy(c, extra.head)),
    "smallest_by" -> ((c, extra) => CA.smallestBy(c, extra.head)),
    "bit_and" -> ((c, _) => CA.bitAnd(c)),
    "bit_or" -> ((c, _) => CA.bitOr(c)),
    "bit_xor" -> ((c, _) => CA.bitXor(c)),
    // ——— beyond-reference sketch aggregates: at 100 TB exact distinct
    // counts and exact quantiles are full-shuffle operations; these are
    // the single-pass mergeable-sketch answers (HyperLogLog++ and an
    // approximate percentile), exposed to script under names that make
    // the approximation explicit. Optional extra args: count_approx(x,
    // rsd) bounds the relative error; quantile_approx(x, p, accuracy).
    "count_approx" -> ((c, extra) => extra.headOption match {
      case Some(rsd) => call_function("approx_count_distinct", c, rsd)
      case None => approx_count_distinct(c)
    }),
    "quantile_approx" -> ((c, extra) => extra match {
      case Seq(p) => percentile_approx(c, p, lit(10000))
      case Seq(p, acc) => percentile_approx(c, p, acc)
      case _ => throw Compiler.CompileException(
        "quantile_approx(x, p) needs the percentile argument p in [0, 1]")
    }),
    "median" -> ((c, _) => median(c))
  )

  def isAggr(name: String): Boolean = aggr.contains(name)

  /** Schema-aware aggregation dispatch. Cozo's heterogeneous pair lists
    * ([payload, cost] — the canonical shortest-path idiom, aggr.rs:719/
    * 759/799) compile to struct<_1.._n> columns when no common Spark
    * element type exists (see Compiler's ListE case); the pair-taking
    * aggregations then act on the first/last struct fields. Homogeneous
    * (array) pairs keep the element_at-based implementations. */
  def aggrTyped(name: String, c: Column, extra: Seq[Column],
                dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    (name, dt) match {
      case ("min_cost", st: StructType) if st.size >= 2 =>
        // ties on cost break to the shortest-then-lexicographic payload
        // — deterministic under distributed evaluation, and the path a
        // sequential BFS-ordered engine (the reference) encounters first
        val costF = c.getField(st.fieldNames.last)
        val payload = c.getField(st.fieldNames.head)
        val ord = st.fields.head.dataType match {
          case _: ArrayType => struct(costF, size(payload), payload)
          case _ => struct(costF, payload)
        }
        min_by(c, ord)
      case ("latest_by", st: StructType) if extra.isEmpty && st.size >= 2 =>
        max_by(c.getField(st.fieldNames.head), c.getField(st.fieldNames.last))
      case ("smallest_by", st: StructType) if extra.isEmpty && st.size >= 2 =>
        min_by(c.getField(st.fieldNames.head), c.getField(st.fieldNames.last))
      case ("latest_by", _) if extra.isEmpty => max_by(element_at(c, 1), element_at(c, 2))
      case ("smallest_by", _) if extra.isEmpty => min_by(element_at(c, 1), element_at(c, 2))
      case _ => aggr.getOrElse(name,
        throw Compiler.CompileException(s"unknown aggregation $name"))(c, extra)
    }
  }

  /** Functions whose result is a list — used by the compiler to
    * dispatch generic `length` to `size` at the AST level. */
  val listReturning: Set[String] = Set(
    "list", "sorted", "reverse", "slice", "chars", "split", "unique",
    "union", "intersection", "difference", "int_range", "zip", "chunks",
    "chunks_exact", "windows", "append", "prepend", "regex_extract", "vec",
    "l2_normalize", "rand_vec")
}
