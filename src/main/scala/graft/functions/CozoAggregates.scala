package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The reference's 25 head aggregations (cozo-core/src/data/aggr.rs,
  * registry aggr.rs:1158-1185) mapped to Spark aggregate expressions.
  * Most are built-ins; `product` and the byte-wise bit folds need
  * `Aggregator`s. Meet-semilattice aggregations (aggr.rs:1190-1206) are
  * additionally usable inside recursion via
  * [[graft.fixpoint.Fixpoint.meetMin]].
  */
object CozoAggregates {

  private class ProductAgg extends Aggregator[java.lang.Double, Double, Double] {
    def zero: Double = 1.0
    def reduce(b: Double, a: java.lang.Double): Double = if (a == null) b else b * a
    def merge(b1: Double, b2: Double): Double = b1 * b2
    def finish(r: Double): Double = r
    def bufferEncoder = Encoders.scalaDouble
    def outputEncoder = Encoders.scalaDouble
  }

  /** aggr.rs:547 `product`. */
  lazy val productUdaf = udaf(new ProductAgg, Encoders.DOUBLE)
  def product(c: Column): Column = productUdaf(c)

  /** aggr.rs:420 `count` → count; :195 `count_unique` → count_distinct. */
  def countUnique(c: Column): Column = count_distinct(c)

  /** aggr.rs:153 `unique`: distinct values as a deterministic (sorted) list. */
  def unique(c: Column): Column = sort_array(collect_set(c))

  /** aggr.rs:355 `collect` with optional cap (aggr.rs:1234-1250). */
  def collect(c: Column, cap: Option[Int] = None): Column = {
    val l = sort_array(collect_list(c))
    cap.fold(l)(n => slice(l, 1, n))
  }

  /** aggr.rs:171 `group_count`: distinct values with their counts,
    * sorted by value (the reference returns [value, count] 2-lists; a
    * typed engine returns array<struct<value, count>>). */
  def groupCount(c: Column): Column = {
    val lst = collect_list(c)
    transform(array_sort(array_distinct(lst)),
      v => struct(v.as("value"), size(filter(lst, x => x === v)).cast("long").as("count")))
  }

  /** aggr.rs:217 `union` (set union of list values). */
  // result is a sorted set, like the reference's BTreeSet (aggrs.rs:133)
  def unionAgg(c: Column): Column = array_sort(array_distinct(flatten(collect_list(c))))

  /** aggr.rs:273 `intersection` (set intersection of list values). */
  def intersectionAgg(c: Column): Column = {
    val lst = collect_list(c)
    when(size(lst) === 0, array()).otherwise(
      aggregate(slice(lst, lit(2), greatest(size(lst) - 1, lit(0))),
        element_at(lst, 1), (acc, x) => array_intersect(acc, x)))
  }

  /** aggr.rs:941 `choice`: an arbitrary non-null member. The reference
    * surfaces the first value of its sorted store iteration, i.e. the
    * smallest — `min` reproduces that observably AND is deterministic
    * under distributed evaluation (Spark's `first` is partition-order
    * dependent). */
  def choice(c: Column): Column = min(c)

  /** aggr.rs:388 `choice_rand`: uniform-ish random member. True RNG is
    * not reproducible across cluster sizes; we pick the member
    * minimizing its own hash — pseudo-random yet deterministic. */
  def choiceRand(c: Column): Column = min_by(c, xxhash64(c))

  /** aggr.rs:799 `min_cost` over [payload, cost] pairs: keep the pair
    * with the least cost. */
  def minCost(c: Column): Column = min_by(c, element_at(c, 2))

  /** aggr.rs:719 `latest_by` → max_by; :759 `smallest_by` → min_by;
    * :799 `min_cost` → min_by + min. */
  def latestBy(v: Column, ts: Column): Column = max_by(v, ts)
  def smallestBy(v: Column, key: Column): Column = min_by(v, key)

  /** aggr.rs:882 `shortest`: keeps the shortest list; ties break
    * lexicographically so distributed evaluation is deterministic (the
    * reference keeps whichever arrived first in its sequential loop). */
  def shortest(c: Column): Column = min_by(c, struct(size(c), c))

  /** aggr.rs:68/113 `and`/`or` boolean folds. */
  def andAgg(c: Column): Column = bool_and(c)
  def orAgg(c: Column): Column = bool_or(c)

  /** aggr.rs:438-497: cozo's variance/std_dev are the *sample* variants. */
  def variance(c: Column): Column = var_samp(c)
  def stdDev(c: Column): Column = stddev_samp(c)

  /** aggr.rs:985-1123 bit folds: byte-wise over Bytes, operands must
    * share a length (the reference `ensure!`s this), empty-so-far
    * buffer adopts the first value. Commutative + associative, so the
    * partial (map-side) / merge split is sound. */
  private class BytesBitAgg(op: (Byte, Byte) => Byte, name: String)
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    private def fold(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      if (a == null || a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(b.length == a.length,
          s"operands of '$name' must have the same lengths, got ${b.length} and ${a.length} bytes")
        val out = new Array[Byte](b.length)
        var i = 0
        while (i < b.length) { out(i) = op(b(i), a(i)); i += 1 }
        out
      }
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = fold(b, a)
    def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = fold(b1, b2)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  lazy val bitAndUdaf = udaf(new BytesBitAgg((l, r) => (l & r).toByte, "bit_and"), Encoders.BINARY)
  lazy val bitOrUdaf = udaf(new BytesBitAgg((l, r) => (l | r).toByte, "bit_or"), Encoders.BINARY)
  lazy val bitXorUdaf = udaf(new BytesBitAgg((l, r) => (l ^ r).toByte, "bit_xor"), Encoders.BINARY)
  def bitAnd(c: Column): Column = bitAndUdaf(c)
  def bitOr(c: Column): Column = bitOrUdaf(c)
  def bitXor(c: Column): Column = bitXorUdaf(c)
}
