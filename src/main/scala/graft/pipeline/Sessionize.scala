package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Batch sessionization: group each key's events into sessions split
  * wherever the gap to the previous event exceeds `gapMicros` — the
  * batch twin of Streaming.sessionize (which does the same with
  * `session_window` state), and the standard first step of turning raw
  * interaction logs into training examples ("one session = one
  * document/trajectory").
  *
  * Plan (Spark-first): ONE shuffle and one sort per key serve both
  * marks — `lag(ts)` for the gap test and a running `sum(isBreak)`
  * for the session ordinal ride the identical partition/order spec,
  * so the second (dependent) Window operator chains onto the first
  * with no re-exchange and no re-sort (asserted in SessionizeSpec). Session ids are (key, ordinal), deterministic under the
  * `tieBreak` order. Skew note: the shuffle partitions by key, so a
  * single key carrying a large share of all rows is the hot-partition
  * regime; unlike as-of matching, sessionization's running state can
  * chain across ANY time bucket (a merge can cascade), so an exact
  * eventEdges-style salt does not exist without an iterative
  * boundary-merge. The `epochMicros` salt is therefore APPROXIMATE and
  * opt-in: it partitions by (key, ts div epoch), and a session that
  * straddles an epoch boundary splits at the boundary. Use it only
  * when epochs can be aligned to known quiet periods (daily logs with
  * idle nights) or when boundary splits are acceptable noise.
  */
object Sessionize {

  private def micros(df: DataFrame, c: String) = df.schema(c).dataType match {
    case TimestampType => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case _ => col(c).cast("long")
  }

  /** Input rows + `session` (ordinal within key, in time order): a
    * new session starts where ts − previous ts > gapMicros.
    * `epochMicros` opts into the approximate hot-key salt (see object
    * doc): partition by (key, ts div epoch), sessions straddling an
    * epoch boundary split, ids become "epoch_ordinal" to stay unique
    * per key.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapMicros: Long, tieBreak: Seq[String] = Nil,
                 epochMicros: Option[Long] = None): DataFrame = {
    require(gapMicros > 0, "sessionize: gapMicros must be positive")
    val withTs = df.withColumn("__ts", micros(df, tsCol))
    val (parted, partCols) = epochMicros match {
      case Some(e) =>
        require(e > gapMicros, "sessionize: epochMicros must exceed gapMicros")
        (withTs.withColumn("__epoch", expr(s"__ts div ${e}L")),
          keys.map(col) :+ col("__epoch"))
      case None => (withTs, keys.map(col))
    }
    val w = Window.partitionBy(partCols: _*)
      .orderBy((col("__ts") +: tieBreak.map(col)): _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = parted.withColumn("__brk",
      when(col("__ts") - lag(col("__ts"), 1).over(w) > gapMicros ||
        lag(col("__ts"), 1).over(w).isNull, 1L).otherwise(0L))
    val numbered = marked.withColumn("__sess", sum(col("__brk")).over(wRun))
    val sess = epochMicros match {
      // re-base: epoch ordinals become globally unique per key via the
      // epoch index (sessions bounded by e ⇒ ≤ 1 per gap window, but
      // ordinals within an epoch are ≤ #events; pack as (epoch, ordinal))
      case Some(_) => concat_ws("_", col("__epoch"), col("__sess"))
      case None => col("__sess").cast("string")
    }
    numbered.withColumn("session", sess)
      .drop("__ts", "__brk", "__sess", "__epoch")
  }

  /** Per-session aggregates: key columns, session ordinal, event
    * count, start/end in epoch µs, duration µs. */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: String,
                   gapMicros: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val s = sessionize(df, keys, tsCol, gapMicros, tieBreak)
      .withColumn("__ts", micros(df, tsCol))
    s.groupBy((keys.map(col) :+ col("session")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col("__ts")).as("start_us"),
        max(col("__ts")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
