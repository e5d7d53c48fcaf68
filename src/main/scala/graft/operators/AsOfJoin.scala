package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Per-row as-of join: for each left row `(key, t)`, the single right
  * row with the same key and the greatest `rightTs <= t` (backward; the
  * pandas `merge_asof` / kdb `aj` semantics a feature-joining training
  * pipeline needs — "latest purchase before this view", "most recent
  * model score before this label").
  *
  * The reference's validity scan is the 1-relation special case of this
  * (newest version ≤ t per key; cozo-core/src/runtime/relation.rs:370
  * `skip_scan_all`); [[TimeTravel.asOf]] covers that. This operator is
  * the 2-relation generalisation where `t` varies per LEFT ROW.
  *
  * Plan (Spark-first, ONE shuffle): instead of `left ⋈ right ON key AND
  * rightTs <= leftTs` + windowed rank-1 — which materialises every
  * (left, earlier-right) pair before pruning, quadratic per hot key —
  * tag both inputs, UNION them, and run one running `last(right
  * payload, ignoreNulls)` window per key over `(ts, tag, tieBreak)`
  * order. Each input row is touched once; the shuffle moves
  * |left| + |right| rows, never the pair blow-up. Ties at equal
  * timestamps are inclusive (a right row AT `t` matches, tag orders it
  * before the left row) and broken deterministically by `tieBreak`
  * (greatest wins).
  *
  * At 100 TB the one window per key is the right plan unless a single
  * key carries a large fraction of all rows; for that regime
  * `bucketWidthMicros` switches to a salted two-level plan — in-bucket
  * windows over `(key, ts div W)` plus a per-bucket carry relation
  * (#distinct buckets rows, ~W× smaller) stitched back with one
  * equi-join — the same boundary-stitch pattern as
  * `Queries.eventEdges`. Output is identical; verified in
  * AsOfRangeJoinSpec.
  */
object AsOfJoin {

  /** Left rows joined to their latest same-key right row at or before
    * `leftTs` (direction "backward"), or the earliest at or after it
    * ("forward" — implemented as backward over NEGATED timestamps,
    * which preserves the inclusive-tie and greatest-tieBreak rules and
    * reuses both plans unchanged: `div` truncation keeps the bucket
    * function monotone non-decreasing in ts, which is all the stitch
    * needs). Output: all left columns ++ right payload columns (the
    * right's non-key, non-ts columns — names must not collide with
    * left's). `joinType` "inner" drops unmatched left rows, "left"
    * keeps them with null payload.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               tieBreak: Seq[String] = Nil, joinType: String = "inner",
               direction: String = "backward",
               bucketWidthMicros: Option[Long] = None): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOfJoin: joinType must be inner|left, got $joinType")
    require(direction == "backward" || direction == "forward",
      s"asOfJoin: direction must be backward|forward, got $direction")
    val sign = if (direction == "forward") lit(-1L) else lit(1L)
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val collide = payload.toSet intersect left.columns.toSet
    require(collide.isEmpty, s"asOfJoin: right payload collides with left columns: $collide")

    val lCols = left.columns.toSeq
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct).schema.head.dataType
    // tie order must use the tieBreak columns' OWN types: a stringified
    // key would rank "8" above "29" (caught by OperatorFuzzSpec)
    val tbStruct =
      if (tieBreak.isEmpty) lit(0) else struct(tieBreak.map(col): _*)
    val tbType = right.select(tbStruct.as("__tb")).schema.head.dataType
    val taggedL = left
      .withColumn("__ts", micros(left, leftTs) * sign).withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(pType))
      .withColumn("__tb", lit(null).cast(tbType))
      .select((keys.map(col) :+ col("__ts") :+ col("__tag") :+ col("__p") :+ col("__tb") :+
        struct(lCols.map(col): _*).as("__l")): _*)
    val lType = taggedL.schema("__l").dataType
    // tie order among equal-ts right rows: greatest tieBreak wins =
    // last in ascending scan order
    val taggedR = right
      .withColumn("__ts", micros(right, rightTs) * sign).withColumn("__tag", lit(0))
      .withColumn("__p", pStruct)
      .withColumn("__tb", tbStruct)
      .select((keys.map(col) :+ col("__ts") :+ col("__tag") :+ col("__p") :+ col("__tb") :+
        lit(null).cast(lType).as("__l")): _*)
    val unioned = taggedL.unionByName(taggedR)

    val matched = bucketWidthMicros match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__ts"), col("__tag"), col("__tb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        unioned.withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
          .filter(col("__tag") === 1)
      case Some(widthMicros) =>
        require(widthMicros > 0, "asOfJoin: bucketWidthMicros must be positive")
        stitched(unioned, keys, widthMicros)
    }
    val kept = if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    kept.select(lCols.map(c => col(s"__l.$c").as(c)) ++
      payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  private def micros(df: DataFrame, c: String) = df.schema(c).dataType match {
    case TimestampType => unix_micros(col(c))
    // NTZ→TZ is value-identity under the pinned-UTC sessions this
    // library runs with, and µs ordering is TZ-independent regardless
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case _ => col(c).cast("long")
  }

  /** Salted two-level plan for hot keys: in-bucket windows over
    * `(key, __ts div W)` + a small per-(key, bucket) carry relation,
    * exact same `__m` assignment as the single window.
    */
  private def stitched(unioned: DataFrame, keys: Seq[String], widthMicros: Long): DataFrame = {
    val bucketed = unioned.withColumn("__b", expr(s"__ts div ${widthMicros}L"))
    // level 1: running last within (key, bucket) — the salted window
    val wIn = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
      .orderBy(col("__ts"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = bucketed.withColumn("__m", last(col("__p"), ignoreNulls = true).over(wIn))
    // level 2: best right row per populated (key, bucket) — ~W× fewer
    // rows — then a running last across STRICTLY EARLIER buckets per
    // key gives the value carried into each bucket
    val wDesc = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
      .orderBy(col("__ts").desc, col("__tb").desc)
    val bucketBest = bucketed.filter(col("__tag") === 0)
      .withColumn("__rn", row_number().over(wDesc)).filter(col("__rn") === 1)
      .select((keys.map(col) :+ col("__b") :+ col("__p").as("__bp")): _*)
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = bucketed.select((keys.map(col) :+ col("__b")): _*).distinct()
      .join(bucketBest, (keys :+ "__b").toSeq, "left")
      .withColumn("__carry", last(col("__bp"), ignoreNulls = true).over(wCarry))
      .select((keys.map(col) :+ col("__b") :+ col("__carry")): _*)
    inBucket.filter(col("__tag") === 1)
      .join(carried, (keys :+ "__b").toSeq, "left")
      .withColumn("__m", coalesce(col("__m"), col("__carry")))
  }
}
