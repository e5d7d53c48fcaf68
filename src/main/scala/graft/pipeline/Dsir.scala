package graft.pipeline

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): rank a raw pre-training corpus by how much each
  * document looks like a small TARGET set (a quality corpus, a domain,
  * a benchmark's training split) under cheap hashed-n-gram bag models,
  * then resample with Gumbel-top-k. The published recipe behind
  * "select 100B tokens that look like Wikipedia+books from Common
  * Crawl" — the missing step between raw curation (dedup, decontam)
  * and mixture balancing.
  *
  * Model: every unigram and bigram hashes into one of `buckets` slots
  * (feature hashing — collisions are part of the estimator, both
  * distributions collide identically). Fit Laplace-smoothed bucket
  * distributions p̂ (target) and q̂ (raw); a document's importance
  * weight is the log-likelihood ratio of its gram sequence:
  * log w(doc) = Σ_{g ∈ grams(doc)} (log p̂[b(g)] − log q̂[b(g)]).
  *
  * Plan (Spark-first, no UDFs, no driver collect): grams come straight
  * off the token array inside one project (unigrams ++ adjacent
  * bigrams, occurrence-counted — NOT distinct); the exploded
  * (id, bucket) relation feeds (a) the raw model's bucket counts — a
  * hash aggregate over ≤`buckets` groups, map-side partials make it
  * corpus-linear with a tiny shuffle — and (b) the scoring join. Both
  * model relations are ≤`buckets` rows (10K default ⇒ KBs), so the
  * score pass is one broadcast join + one per-doc aggregate: the 100 TB
  * corpus shuffles once, keyed by doc id, with byte-sized rows.
  * Resampling is a global top-k (TakeOrdered: per-partition heads, one
  * driver merge of k·partitions rows — never a full sort).
  *
  * The bucket hash is the portable md5 key ([[Sampling.md5Key]]), so
  * any engine — the DuckDB oracle included — recomputes the same
  * buckets, the same smoothed models, and the same scores bit-for-bit
  * up to float-sum order (bounded by rounding, as text_perplexity).
  */
object Dsir {

  /** Unigram + adjacent-bigram grams of a token-array column, with
    * multiplicity (a gram scoring twice counts twice — the model is a
    * bag, not a set). Bigrams are space-joined, matching the oracle's
    * `toks[i] || ' ' || toks[i+1]`. The column must be named `__toks`.
    */
  private[pipeline] val gramsOfToks: Column = concat(col("__toks"), expr(
    "transform(slice(__toks, 2, greatest(size(__toks) - 1, 0)), " +
      "(w, i) -> concat(element_at(__toks, i + 1), ' ', w))"))

  /** (id, bucket) rows, one per gram OCCURRENCE. */
  private def bucketed(df: DataFrame, idCol: String, textCol: String,
                       buckets: Int): DataFrame =
    graft.plan.Parallelism.ensureIngestParallelism(df, Seq(col(idCol)))
      .select(col(idCol).as("__id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), explode(gramsOfToks).as("__g"))
      .select(col("__id"), Sampling.md5Bucket(buckets, col("__g")).as("__b"))

  /** Importance weights for every raw document with ≥1 token:
    * (id, n_grams, logw) where logw = Σ_grams (log p̂_target − log q̂_raw),
    * rounded to `round` decimals (negative ⇒ unrounded). Higher ⇒ more
    * target-like. Feature hashing uses the portable md5 bucket so the
    * score is engine-reproducible.
    */
  def importanceWeights(raw: DataFrame, rawId: String, rawText: String,
                        target: DataFrame, targetId: String, targetText: String,
                        buckets: Int = 10000, round: Int = 4): DataFrame = {
    // The raw bucket relation feeds the model fit AND the score pass.
    // Deliberately NOT checkpointed/cached: it is the corpus ×
    // grams-per-doc exploded — materializing it would write something
    // LARGER than the 100 TB input to executor storage. Re-running the
    // scan+tokenize+hash projection twice (all codegen'd, behind
    // column pruning) is the cheaper side of that trade at every scale
    // past a laptop.
    val rawB = bucketed(raw, rawId, rawText, buckets)
    val tgtB = bucketed(target, targetId, targetText, buckets)

    // per-bucket counts (≤ buckets rows each); totals derive from the
    // count relations, not another corpus scan
    val rawCounts = rawB.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val tgtCounts = tgtB.groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rawTotal = rawCounts.agg(sum(col("__cr")).as("__nr"))
    val tgtTotal = tgtCounts.agg(sum(col("__ct")).as("__nt"))

    // the per-bucket log-likelihood ratio table: full outer over the
    // two count relations (both tiny), smoothed on each side
    val llr = rawCounts.join(tgtCounts, Seq("__b"), "full_outer")
      .crossJoin(broadcast(rawTotal)).crossJoin(broadcast(tgtTotal))
      .select(col("__b"),
        (log(coalesce(col("__ct"), lit(0L)) + lit(1.0)) -
          log(col("__nt") + lit(buckets.toDouble)) -
          log(coalesce(col("__cr"), lit(0L)) + lit(1.0)) +
          log(col("__nr") + lit(buckets.toDouble))).as("__llr"))

    // score: every raw gram occurrence picks up its bucket's llr via a
    // broadcast probe, then one per-doc aggregate (the corpus's only
    // shuffle). The inner join is lossless for raw grams: every raw
    // bucket is in rawCounts hence in the full-outer llr table.
    val scored = rawB.join(broadcast(llr), Seq("__b"))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_grams"), sum(col("__llr")).as("__lw"))
    scored.select(col("__id").as(rawId), col("n_grams"),
      (if (round >= 0) org.apache.spark.sql.functions.round(col("__lw"), round)
       else col("__lw")).as("logw"))
  }

  /** Gumbel-top-k resample of a scored corpus: keep the k documents
    * maximizing logw / temperature + Gumbel(id) — equivalent to
    * sampling WITHOUT replacement ∝ w^(1/temperature) (the Gumbel-max
    * trick). The noise is hash-derived from the id (portable md5 →
    * uniform → −ln(−ln u)), so the draw is deterministic and
    * reproducible on any engine; temperature → 0 degrades to plain
    * top-k. Executes as TakeOrdered — no global sort.
    */
  def resampleTopK(scored: DataFrame, idCol: String, k: Int,
                   temperature: Double = 1.0): DataFrame = {
    val u = (Sampling.md5Key(col(idCol)).cast("double") + lit(0.5)) / lit(4294967296.0)
    val key =
      if (temperature <= 0) col("logw")
      else col("logw") / lit(temperature) - log(-log(u))
    scored.withColumn("__k", key)
      .orderBy(col("__k").desc, col(idCol))
      .limit(k)
      .drop("__k")
  }
}
