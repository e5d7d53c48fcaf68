package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** Column-level let-binding.
  *
  * Higher-order functions bind only their ARRAY argument; every other
  * expression a lambda captures is re-evaluated per element. A window
  * builder like `transform(sequence(0, size(toks)-n), i -> slice(toks,
  * i+1, n))` therefore re-runs the whole `toks` expression — a regex
  * tokenizer, a lowercase of the document — once per WINDOW, turning
  * linear work quadratic (the dedup_jaccard shingle stage measured
  * 164 task-seconds, ~33 ms/doc, from exactly this).
  *
  * `Let.once(e)(v => body(v))` evaluates `e` once per row by making it
  * the lone element of the driving array; inside `body`, `v` is a
  * lambda variable — a plain slot read per element, no re-evaluation.
  * NULL flows through like any value (`array(e)` is `[null]`, not
  * null), so `body` sees exactly the value semantics it saw before.
  */
object Let {
  def once(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
