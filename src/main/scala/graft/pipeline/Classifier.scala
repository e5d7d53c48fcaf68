package graft.pipeline

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the FineWeb-Edu / DCLM recipe: train
  * a linear classifier on hashed bag-of-token features over a LABELED
  * sample (LLM-judged quality, known-good vs known-bad sources, a
  * target language…), then score the whole corpus with the broadcast
  * weights and keep what clears a threshold. This is the step modern
  * curation pipelines run after dedup/decontamination and before
  * mixture balancing; fastText-style classifiers are exactly this
  * shape (a linear model over hashed n-gram features).
  *
  * Model: logistic regression. Every token hashes into one of
  * `buckets` feature slots (feature hashing — collisions are part of
  * the estimator); a document's feature value for bucket b is its term
  * frequency c_b / n_tokens (so total feature mass is 1 and batch
  * gradient descent is stable without per-feature scaling), plus a
  * constant bias feature in the reserved bucket -1. Training is full
  * batch gradient descent for a FIXED iteration count:
  * w ← w − lr · (1/N) Σ_d (σ(x_d·w) − y_d) x_d.
  *
  * Plan (Spark-first): the labeled sample is packed ONCE into
  * (id, y, feats: array⟨(b, x)⟩) — one aggregation — and persisted;
  * every iteration is then (a) a zero-shuffle margin/σ projection (the
  * dot product is a Catalyst `aggregate` fold over the packed array
  * against the broadcast weight-map literal) and (b) one gradient
  * aggregation over ≤ buckets+1 groups (map-side partials make it
  * sample-linear with a KB-sized shuffle). Weights live on the driver
  * between iterations — the model is `buckets`+1 doubles, which is the
  * point of feature hashing. Labels are the expensive input, so the
  * training set is assumed sample-sized (≤ millions of rows); the
  * 100 TB corpus only ever meets the final weights in [[score]], a
  * single zero-shuffle projection pass.
  *
  * Engine-portability: buckets use the md5 hash ([[Sampling.md5Bucket]])
  * and every cross-engine float boundary is pinned — σ is rounded to 8
  * decimals, gradient sums and weights to 6 — so any engine (the
  * DuckDB driver oracle included) retrains the identical model and
  * reproduces every score bit-for-bit after rounding (same drift
  * argument as `text_perplexity` / `pipe_dsir`: un-rounded sums differ
  * only in addition order, ~1e-12 relative, far under the rounding
  * grid).
  *
  * Reference scope note: the reference engine has no model-training
  * surface; this operator is part of the beyond-reference LLM-pipeline
  * tier (as DSIR, BPE, decontamination).
  */
object Classifier {

  /** Trained model: weights keyed by feature bucket (-1 = bias) and the
    * per-iteration mean log-loss (losses.head is the loss of the
    * all-zero model = ln 2; training should decrease it).
    */
  final case class Model(buckets: Int, weights: Map[Long, Double],
                         losses: Seq[Double], ngrams: Int = 1)

  /** The hashed gram array: tokens, plus adjacent-pair "a b" strings
    * when `ngrams >= 2` — the published fastText recipe hashes word
    * bigrams into the SAME bucket space as unigrams (wordNgrams=2),
    * which is what lets a linear model see local word order. Pure
    * zero-shuffle column expression.
    */
  def gramsOf(textCol: Column, ngrams: Int): Column = {
    val toks = TF.tokens(textCol)
    if (ngrams <= 1) toks
    else {
      val bi = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b))
      when(size(toks) >= 2, concat(toks, bi)).otherwise(toks)
    }
  }

  /** Hashed-feature relation (__id, __b, __x) for every document:
    * term-frequency features for each gram bucket (x = c_b / n_grams,
    * so total feature mass stays 1 with or without bigrams) plus the
    * bias feature (__b = -1, __x = 1) for EVERY document — zero-token
    * documents carry just the bias and still train/score.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int, ngrams: Int = 1): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      gramsOf(col(textCol), ngrams).as("__toks"))
    val tf = toks
      .select(col("__id"), size(col("__toks")).as("__n"),
        explode(col("__toks")).as("__t"))
      .groupBy(col("__id"), Sampling.md5Bucket(buckets, col("__t")).as("__b"))
      .agg((count(lit(1)) / first(col("__n"))).as("__x"))
    val bias = toks.select(col("__id"), lit(-1L).as("__b"), lit(1.0).as("__x"))
    tf.unionByName(bias)
  }

  /** σ rounded to 8 decimals — the cross-engine pin for exp's last-ulp
    * libm differences. */
  private def sigmoid8(margin: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-margin)), 8)

  /** Weight-lookup strategy knee: `element_at` on a `typedLit` map is a
    * LINEAR scan in codegen (GetMapValue has no hash path), so a
    * wide model (8192 buckets) pays |W| comparisons per gram —
    * ~3×10⁶ per document. Above this size the dot product switches to
    * a hash-map UDF: O(1) per gram, same array-order FP summation, so
    * scores are bit-identical either way (AUC/oracle unaffected). */
  private val MapLookupKnee = 128

  private def javaMap(w: Map[Long, Double]): java.util.HashMap[Long, java.lang.Double] = {
    val jm = new java.util.HashMap[Long, java.lang.Double](w.size * 2 + 8)
    for ((k, v) <- w) jm.put(k, v)
    jm
  }

  /** Exact Scala mirror of [[Sampling.md5Bucket]]: first 8 hex chars of
    * md5 = first 4 bytes as an unsigned 32-bit int, mod buckets. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private def md5BucketOf(buckets: Int, t: String): Long = {
    val h = md5Local.get().digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
      ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
    v % buckets
  }

  /** Train on a labeled sample. `labelCol` must be 0/1 (numeric or
    * boolean). Returns the weight map (bucket → weight, -1 = bias) and
    * the loss trace. The sample is packed+persisted once; each
    * iteration runs two sample-linear jobs against it.
    */
  def train(sample: DataFrame, idCol: String, textCol: String,
            labelCol: String, buckets: Int = 64, iters: Int = 5,
            lr: Double = 2.0, ngrams: Int = 1): Model = {
    val y = sample.select(col(idCol).as("__id"),
      col(labelCol).cast("double").as("__y"))
    val packed = hashedFeatures(sample, idCol, textCol, buckets, ngrams)
      .groupBy("__id")
      .agg(collect_list(struct(col("__b"), col("__x"))).as("__f"))
      .join(y, "__id")
      .persist()
    val n = packed.count().toDouble

    def marginOf(w: Map[Long, Double]): Column =
      if (w.size <= MapLookupKnee) {
        val wm = typedLit(w)
        aggregate(col("__f"), lit(0.0), (acc, f) =>
          acc + f.getField("__x") *
            coalesce(element_at(wm, f.getField("__b")), lit(0.0)))
      } else {
        val jm = javaMap(w)
        // struct arrays aren't UDF-encodable; field extraction over an
        // array of structs is a zero-copy projection to two aligned arrays
        val dot = udf { (bs: scala.collection.Seq[Long], xs: scala.collection.Seq[Double]) =>
          var acc = 0.0
          var i = 0
          while (i < bs.length) {
            val wv = jm.get(bs(i))
            if (wv != null) acc += xs(i) * wv
            i += 1
          }
          acc
        }
        dot(col("__f").getField("__b"), col("__f").getField("__x"))
      }

    var w = Map.empty[Long, Double]
    val losses = Seq.newBuilder[Double]
    try {
      for (_ <- 0 until iters) {
        val scored = packed.withColumn("__p", sigmoid8(marginOf(w)))
        // mean log-loss of the CURRENT weights (before this update);
        // clamp only guards ln at saturated σ, it never feeds training.
        // The loss rides the gradient collect as a sentinel-bucket row —
        // one Spark action per iteration instead of two (the iteration
        // cost is job-floor-bound, not compute-bound).
        val pc = least(greatest(col("__p"), lit(1e-8)), lit(1.0 - 1e-8))
        val gradAgg = scored
          .select(col("__p"), col("__y"), explode(col("__f")).as("__e"))
          .groupBy(col("__e.__b").as("__b"))
          .agg(round(sum((col("__p") - col("__y")) * col("__e.__x")) / n, 6)
            .as("__g"))
        val lossRow = scored
          .agg(avg(-(col("__y") * log(pc) +
            (lit(1.0) - col("__y")) * log(lit(1.0) - pc))).as("__g"))
          .select(lit(Long.MinValue).as("__b"), col("__g"))
        val rows = gradAgg.unionByName(lossRow).collect()
        losses += rows.find(_.getLong(0) == Long.MinValue).get.getDouble(1)
        w = rows.filter(_.getLong(0) != Long.MinValue).map { r =>
          val b = r.getLong(0)
          val g = r.getDouble(1)
          b -> BigDecimal(w.getOrElse(b, 0.0) - lr * g)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }.toMap
      }
    } finally packed.unpersist()
    Model(buckets, w, losses.result(), ngrams)
  }

  /** Score a corpus with trained weights: ONE zero-shuffle projection —
    * the dot product folds over the token array against the broadcast
    * weight map (Σ_b (c_b/n)·w_b = (1/n)Σ_t w[bucket(t)], so no
    * per-doc regrouping is needed), unseen buckets contribute 0, and a
    * zero-token document scores σ(bias). This is the pass the 100 TB
    * corpus takes. Output: (idCol, score) with score rounded to 6
    * decimals.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val bias = lit(model.weights.getOrElse(-1L, 0.0))
    val grams = gramsOf(col(textCol), model.ngrams)
    val tokSum = if (model.weights.size <= MapLookupKnee) {
      val wm = typedLit(model.weights)
      aggregate(grams, lit(0.0), (acc, t) =>
        acc + coalesce(
          element_at(wm, Sampling.md5Bucket(model.buckets, t)), lit(0.0)))
    } else {
      val jm = javaMap(model.weights)
      val nb = model.buckets
      val dot = udf { toks: scala.collection.Seq[String] =>
        if (toks == null) 0.0
        else {
          var acc = 0.0
          var i = 0
          while (i < toks.length) {
            val wv = jm.get(md5BucketOf(nb, toks(i)))
            if (wv != null) acc += wv
            i += 1
          }
          acc
        }
      }
      dot(grams)
    }
    val nToks = size(grams)
    val margin = bias +
      when(nToks > 0, tokSum / nToks).otherwise(lit(0.0))
    docs.select(col(idCol),
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("score"))
  }

  /** Train-and-score in one call (the driver-gate entry): trains on
    * `labelExpr` over the input — bounded to the `sampleN`
    * smallest-hash documents when `sampleN > 0` (the deployment shape:
    * training cost is SF-invariant, the corpus only meets the broadcast
    * weights in the score pass) — and scores every document.
    */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 labelExpr: Column, buckets: Int = 64, iters: Int = 5,
                 lr: Double = 2.0, ngrams: Int = 1, sampleN: Int = 0): DataFrame = {
    val labeled = docs.withColumn("__label", labelExpr.cast("double"))
    val trainSet =
      if (sampleN > 0) Sampling.boundedSample(labeled, idCol, sampleN) else labeled
    val model = train(trainSet, idCol, textCol, "__label", buckets, iters, lr, ngrams)
    score(docs, idCol, textCol, model)
  }

  /** Exact ROC AUC as a one-row relation, by tie-aware rank-sum
    * (Mann-Whitney): AUC = (R⁺ − P(P+1)/2) / (P·N) with average ranks
    * for tied scores. Scale shape: scores are rounded to 6 decimals, so
    * the per-score aggregate has ≤ 10⁶+1 rows — the one sequential
    * window runs over THAT bounded relation, never over the documents.
    */
  def auc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = scored
      .select(col(scoreCol).as("__s"), col(labelCol).cast("double").as("__y"))
      .groupBy("__s")
      .agg(count(lit(1)).cast("double").as("__c"), sum("__y").as("__p"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("__s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("__avgrank",
        coalesce(sum(col("__c")).over(w), lit(0.0)) + (col("__c") + 1) / 2)
      .agg(sum(col("__p") * col("__avgrank")).as("__rs"),
        sum(col("__p")).as("__np"), sum(col("__c") - col("__p")).as("__nn"))
      .select(((col("__rs") - col("__np") * (col("__np") + 1) / 2) /
        (col("__np") * col("__nn"))).as("auc"))
  }
}
