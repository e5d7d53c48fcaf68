package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Interval (band) join: each point row matched to every interval row
  * whose half-open range `[start, end)` contains it, with optional
  * extra equi-keys. The training-pipeline shape is "attach every
  * observation to the session/order/campaign window it fell in"; the
  * reference reaches the same results through its range-scan bounds on
  * sorted keys (cozo-core/src/runtime/relation.rs scan_bounded), which
  * is inherently single-node — this is the distributed re-expression.
  *
  * Plan (Spark-first): a raw `θ`-join on `start <= p AND p < end` has
  * no equi-key, so Spark would pick BroadcastNestedLoop (or worse,
  * cartesian) — quadratic and undistributable. Instead both sides are
  * bucketed by `value div W`: a point lands in exactly ONE bucket, an
  * interval is exploded to the `(end - start) / W + 1` buckets it
  * overlaps (a `sequence()` explode, no shuffle), and the bucket
  * becomes the missing equi-key of a plain shuffle hash join, followed
  * by the exact range filter. Each qualifying pair meets in exactly one
  * bucket (the point's), so no dedup pass is needed. Choosing `W` ≈ the
  * typical interval length keeps the explode factor ≈ 2 while keeping
  * buckets selective; `maxBucketsPerInterval` guards against a
  * degenerate giant interval exploding the build side.
  */
object RangeJoin {

  /** Points joined into containing intervals. Output: all point columns
    * ++ all interval columns (names must not collide). Timestamp
    * columns are compared at µs precision; numeric columns as longs.
    */
  def intervalJoin(points: DataFrame, pointCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   keys: Seq[(String, String)] = Nil,
                   bucketWidthMicros: Long,
                   maxBucketsPerInterval: Int = 64): DataFrame = {
    require(bucketWidthMicros > 0, "intervalJoin: bucketWidthMicros must be positive")
    val collide = points.columns.toSet intersect intervals.columns.toSet
    require(collide.isEmpty, s"intervalJoin: column names collide: $collide")

    def micros(df: DataFrame, c: String) = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
      case _ => col(c).cast("long")
    }

    val p = points.withColumn("__v", micros(points, pointCol))
      .withColumn("__bkt", expr(s"__v div ${bucketWidthMicros}L"))
    // half-open [start, end): the last overlapped bucket is the one
    // holding end - 1; empty/inverted intervals explode to no buckets
    val iv = intervals
      .withColumn("__s", micros(intervals, startCol))
      .withColumn("__e", micros(intervals, endCol))
      .withColumn("__b0", expr(s"__s div ${bucketWidthMicros}L"))
      .withColumn("__b1", expr(s"(__e - 1L) div ${bucketWidthMicros}L"))
      .filter(col("__e") > col("__s"))
    val spanGuard = col("__b1") - col("__b0") < lit(maxBucketsPerInterval.toLong)
    val exploded = iv.filter(spanGuard)
      .withColumn("__bkt", explode(expr("sequence(__b0, __b1)")))
    // degenerate giants (> maxBuckets × W long) skip bucketing and are
    // broadcast as a tiny nested-loop side instead of exploding
    val giants = iv.filter(!spanGuard)

    val joinKeys = keys.map { case (pk, ik) => p(pk) === exploded(ik) }
    val bucketCond = ((p("__bkt") === exploded("__bkt")) +: joinKeys)
      .reduce(_ && _) && p("__v") >= exploded("__s") && p("__v") < exploded("__e")
    val bucketJoined = p.join(exploded, bucketCond)

    val outCols = points.columns.map(p(_)) ++ intervals.columns.map(exploded(_))
    val main = bucketJoined.select(outCols: _*)
    val giantKeys = keys.map { case (pk, ik) => p(pk) === giants(ik) }
    val giantCond = (giantKeys :+ (p("__v") >= giants("__s")) :+ (p("__v") < giants("__e")))
      .reduce(_ && _)
    val giantJoined = p.join(broadcast(giants), giantCond)
      .select(points.columns.map(p(_)) ++ intervals.columns.map(giants(_)): _*)
    main.unionByName(giantJoined)
  }
}
