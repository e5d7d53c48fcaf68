package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding pooling — the aggregation step that turns chunk-level
  * embeddings back into document-level ones (mean-pool + L2 normalize
  * is the standard recipe; max-pool is the common alternative).
  * Composes with [[graft.text.TextAnalysis.chunk]]: chunk → embed
  * (external model) → pool.
  */
object Embeddings {

  /** Element-wise pooled vector per group, emitted EXPLODED as
    * (grp, dim, v) — the shape downstream joins, oracles, and sinks
    * consume without array-equality semantics.
    *
    * Plan shape at 100 TB: one posexplode (in-partition; dims are
    * small constants) and ONE hash aggregation keyed (grp, dim) with a
    * map-side partial — shuffled bytes are pooled-output-scale, not
    * input-scale. The L2 norm reuses the same keys reduced to grp (an
    * exchange-compatible second partial) and joins back grp-keyed.
    * collect_list-free by design: per-group vector lists would bound
    * group size by executor memory; the exploded aggregate does not.
    */
  def pool(df: DataFrame, groupCol: String, vecCol: String,
           method: String = "mean", normalize: Boolean = true): DataFrame = {
    val agg: Column => Column = method match {
      case "mean" => avg(_)
      case "max"  => max(_)
      case other  => throw new IllegalArgumentException(
        s"unknown pooling method: $other (mean | max)")
    }
    val pooled = df
      .select(col(groupCol).as("grp"), posexplode(col(vecCol)))
      .toDF("grp", "dim", "__x")
      .groupBy("grp", "dim")
      .agg(agg(col("__x")).cast("double").as("v"))
    if (!normalize) pooled
    else {
      val norms = pooled.groupBy("grp")
        .agg(sqrt(sum(col("v") * col("v"))).as("__n"))
      pooled.join(norms, Seq("grp"))
        // an all-zero pooled vector stays all-zero instead of NaN
        .select(col("grp"), col("dim"),
          when(col("__n") === 0.0, 0.0).otherwise(col("v") / col("__n")).as("v"))
    }
  }
}
