package graft.text

import graft.plan._
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level n-gram language-model scoring: train a Laplace-smoothed
  * bigram model on the corpus itself and score each document's
  * perplexity under it — the CCNet/Gopher-style "how surprising is
  * this document relative to the collection" quality signal used to
  * rank and filter pre-training data (high perplexity ⇒ boilerplate,
  * gibberish, or wrong-language text the rest of the corpus doesn't
  * predict).
  *
  * Model: p(w₁) = c(w₁)/N;  p(wᵢ | wᵢ₋₁) = (c(wᵢ₋₁wᵢ) + 1)/(c(wᵢ₋₁) + V)
  * with c counts over the whole corpus, N total tokens, V vocabulary
  * size. perplexity(doc) = exp(−(ln p(w₁) + Σᵢ ln p(wᵢ|wᵢ₋₁)) / n).
  *
  * Plan (Spark-first, no UDFs, no driver collect): bigrams come
  * straight off the token ARRAY via `transform` (a per-token window
  * over doc_id would shuffle every token row; the array form keeps
  * pairing inside one project). Counting is two hash aggregates
  * (token, and (prev, cur)); scoring is two shuffle equi-joins of the
  * exploded doc bigrams against those count relations — all linear,
  * all AQE-skew-splittable, nothing broadcast-dependent (a 100 TB
  * corpus vocabulary outgrows a broadcast). The model scalars N and V
  * ride along as a broadcast one-row cross join, so the whole operator
  * stays one lazy plan.
  */
object LanguageModel {

  /** (id, n_tokens, perplexity) per document with ≥1 token, under the
    * corpus-trained smoothed bigram model. `round` decimals bound
    * cross-engine float-sum drift (~1e-11 relative) for oracle
    * comparison; pass a negative value for unrounded.
    */
  def bigramPerplexity(docs0: DataFrame, idCol: String, textCol: String,
                       round: Int = 4): DataFrame = {
    val docs = Parallelism.ensureIngestParallelism(docs0, Seq(col(idCol)))
    // Deliberately NOT checkpointed: the tokenized relation is
    // corpus-sized, and localCheckpoint would copy the whole corpus
    // into executor storage (and die with an executor). Re-running the
    // pruned scan+tokenize per consumer is the cheaper, fault-tolerant
    // side of the trade at scale.
    val d = docs.select(col(idCol).as("__id"), TF.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)

    val uni = d.select(explode(col("__toks")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__c"))
    // N (total tokens) and V (vocab) are the model's only scalars —
    // a one-row relation, broadcast onto the scoring joins
    val totals = uni.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))

    // (prev, cur) pairs straight off the array: element i (0-based) of
    // the tail slice pairs with its predecessor element_at(toks, i+1)
    val pairs = expr(
      "transform(slice(__toks, 2, greatest(size(__toks) - 1, 0)), " +
        "(w, i) -> struct(element_at(__toks, i + 1) AS prev, w AS cur))")
    val docBigrams = d.select(col("__id"), explode(pairs).as("__bg"))
      .select(col("__id"), col("__bg.prev").as("__prev"), col("__bg.cur").as("__cur"))
    val bgCounts = docBigrams.groupBy("__prev", "__cur").agg(count(lit(1)).as("__cb"))

    // Σ ln p(cur|prev) per doc: join each doc bigram to its corpus
    // count and its prev-token unigram count (inner joins are lossless:
    // the corpus contains every doc bigram by construction)
    val bgScores = docBigrams
      .join(bgCounts, Seq("__prev", "__cur"))
      .join(uni.select(col("__t").as("__prev"), col("__c").as("__cp")), Seq("__prev"))
      .crossJoin(broadcast(totals))
      .groupBy("__id")
      .agg(sum(log((col("__cb") + lit(1.0)) / (col("__cp") + col("__v")))).as("__lpb"))

    // ln p(w₁) + token count per doc
    val firsts = d.select(col("__id"), element_at(col("__toks"), 1).as("__t"),
        size(col("__toks")).cast("long").as("n_tokens"))
      .join(uni, Seq("__t"))
      .crossJoin(broadcast(totals))
      .select(col("__id"), col("n_tokens"),
        log(col("__c") * lit(1.0) / col("__n")).as("__lp1"))

    val ppl = exp(-(col("__lp1") + coalesce(col("__lpb"), lit(0.0))) / col("n_tokens"))
    firsts.join(bgScores, Seq("__id"), "left")
      .select(col("__id").as(idCol), col("n_tokens"),
        (if (round >= 0) org.apache.spark.sql.functions.round(ppl, round) else ppl)
          .as("perplexity"))
  }
}
