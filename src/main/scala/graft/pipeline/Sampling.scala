package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / shuffling for training-data
  * pipelines (beyond the reference — cozo has `rand_*` scalars,
  * data/functions.rs:2305-2350, but nothing reproducible across engines
  * or cluster sizes; a 100 TB pipeline needs sampling that is stable
  * under retries, repartitioning and re-runs).
  *
  * Two hash families:
  *   - [[xxhashBucket]] — xxhash64 over arbitrary key columns; the
  *     production default (well-dispersed for any key type).
  *   - [[knuthBucket]] — Knuth multiplicative hashing over integer ids
  *     (h = id·2654435761 mod 2³²). Pure integer arithmetic, so any SQL
  *     engine reproduces it bit-for-bit — the driver's DuckDB oracle
  *     cross-checks these paths end-to-end.
  *
  * Every operator is a stateless, codegen'd column expression over the
  * scan — no RNG state, no driver coordination, no skew (hash buckets
  * are uniform); filters push down to the parquet scan.
  */
object Sampling {

  /** Knuth multiplicative hash bucket in [0, buckets) for integer ids.
    * Portable: reproducible in any engine with 64-bit integer math.
    *
    * Computed as (id·2654435761) mod 2³² — but overflow-free: a naive
    * `id * 2654435761L` Long product overflows for id ≥ ~3.47e9 (throws
    * under Spark 4 ANSI mode), exactly the billions-of-docs regime this
    * targets. Since (id·K) mod 2³² ≡ ((id mod 2³²)·K) mod 2³², we mask
    * id to its low 32 bits and split K = 40503·2¹⁶ + 31153 so every
    * intermediate stays below 2⁴⁸. Identical results to the naive form
    * wherever that form doesn't overflow. Negative ids hash via their
    * low 32 bits (two's complement), keeping the bucket non-negative. */
  def knuthBucket(id: Column, buckets: Int): Column = {
    val lo32 = id.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val prod = pmod(
      lo32 * lit(31153L) + pmod(lo32 * lit(40503L), lit(65536L)) * lit(65536L),
      lit(4294967296L))
    pmod(prod, lit(buckets))
  }

  /** xxhash64 bucket in [0, buckets) for arbitrary (possibly compound) keys. */
  def xxhashBucket(buckets: Int, keys: Column*): Column =
    pmod(xxhash64(keys: _*), lit(buckets))

  /** Deterministic uniform sample: keeps rows whose id-hash bucket falls
    * below `fraction` of the bucket space. Same row set on every run,
    * any partitioning, any engine.
    */
  def sample(df: DataFrame, idCol: String, fraction: Double,
             buckets: Int = 1000000): DataFrame =
    df.filter(knuthBucket(col(idCol), buckets) < (fraction * buckets).toLong)

  /** Stratified deterministic sample: per-stratum keep fractions with a
    * default for unlisted strata. One pass, no shuffle — the stratum
    * column only selects the threshold.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], default: Double = 0.0,
                       buckets: Int = 1000000): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * buckets).toLong)) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit((f * buckets).toLong)).otherwise(acc)
    }
    df.filter(knuthBucket(col(idCol), buckets) < threshold)
  }

  /** Deterministic train/validation/test split assignment. Percentages
    * are of the hash space ([0,train) → "train", [train,train+val) →
    * "val", rest → "test"), so the split is disjoint, exhaustive and
    * stable under re-runs and data growth (a row's split never changes
    * when other rows arrive — the property file-order splits lack).
    */
  def split(df: DataFrame, idCol: String, trainPct: Int = 80,
            valPct: Int = 10): DataFrame = {
    val b = knuthBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic per-group "reservoir": the `n` rows of each group
    * with the smallest id-hash — a uniform without-replacement sample
    * per group, stable across runs. One shuffle (the window partition).
    */
  def reservoirPerGroup(df: DataFrame, idCol: String, groupCols: Seq[String],
                        n: Int, buckets: Int = 1000000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(knuthBucket(col(idCol), buckets), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic global shuffle: total order by id-hash. Spark executes
    * this as a range-partitioned sort (sampled range boundaries, then
    * per-partition sorts) — no single-point bottleneck; writing the
    * result yields globally shuffled training shards. */
  def shuffled(df: DataFrame, idCol: String, buckets: Int = 1000000): DataFrame =
    df.orderBy(knuthBucket(col(idCol), buckets), col(idCol))
}
