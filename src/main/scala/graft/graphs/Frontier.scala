package graft.graphs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BitsetAgg
import graft.operators.GlobalRank
import graft.plan._

/** Dense-frontier multi-hop expansion over a dictionary-encoded node
  * space (the engine behind the pokec expansion/neighbourhood query
  * class, reference pokec.rs:430-560).
  *
  * The row-relational shape — per-hop equi-join + DISTINCT on
  * (seed, node) — is the open-world-correct plan, but its cost is per
  * PATH: the hop join emits one row per (seed, node, edge) and every
  * row pays a hash-aggregate probe in the distinct. Measured at sf1
  * (978 K edges, 15 K nodes): the hop-2→3 join of graph_expand3_filter
  * emits ~1.1 G rows that the distinct crushes to 22.5 M.
  *
  * When the graph's NODE set fits a small dictionary — true for the
  * reference's own bench graph (pokec: 1.6 M nodes) and for most
  * entity/user graphs even when the EDGE set is 100 TB-huge — the same
  * set semantics cost one bit per element:
  *
  *   1. dictionary-encode node ids to dense ints ([[GlobalRank]] — the
  *      range-partitioned rank, no single-partition window);
  *   2. pre-group edges into (node → successor array) adjacency;
  *   3. per hop: join the DISTINCT frontier (one row per member, not
  *      per path) to the adjacency, then OR the successor arrays into
  *      a per-seed bitmap ([[graft.functions.BitsetUnion]]). Partial
  *      aggregation ships one compact bitmap per (seed, mapper) —
  *      map-side combine the row-distinct shape can't match — and the
  *      bitmap's member array IS the next distinct frontier.
  *
  * The bitmap buffer is size/8 bytes per open aggregation group, so
  * the path gates on [[Frontier.maxNodes]] (default 4 M → ≤512 KiB per
  * seed) and callers keep the row shape as the open-world fallback —
  * `enabled` decides. The dictionary count is one aggregate over the
  * (caller-checkpointed) edge relation; at any scale it is bounded by
  * a scan + hash-distinct, and it buys the hop joins' path-explosion
  * away.
  */
class Frontier(edges: DataFrame, maxNodes: Long = Frontier.maxNodes) {

  /** (node, idx) — idx dense ints in [0, size), order-irrelevant.
    *
    * Built with `zipWithIndex` over the persisted distinct node set, NOT
    * a ranked total order: the bitmap only needs dense ids, and the
    * range-partitioned GlobalRank paid a sampling pass, a range
    * exchange, an offsets window and a broadcast join for an ordering
    * nothing consumes (~4 extra jobs per Frontier-using query). The
    * distinct set is materialized first, so its count gates `enabled`
    * BEFORE any dict work, and zipWithIndex's internal count job reads
    * the persisted blocks.
    */
  private val nodesAndCount: (DataFrame, Long) =
    graft.plan.CkptOps(edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()).ckptCount()

  val size: Long = nodesAndCount._2
  val enabled: Boolean = size <= maxNodes

  lazy val dict: DataFrame = {
    val ns = nodesAndCount._1
    val spark = ns.sparkSession
    val schema = org.apache.spark.sql.types.StructType(ns.schema.fields :+
      org.apache.spark.sql.types.StructField("__fidx",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    val rows = ns.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i.toInt)
    }
    spark.createDataFrame(rows, schema).ckpt()
  }

  /** Bitmap width for inline [[BitsetAgg]] calls over this dictionary. */
  def numBits: Int = size.toInt

  // ObjectHashAggregate falls back to sort-based aggregation after 128
  // in-memory groups by default — sized for arbitrary typed buffers,
  // far too conservative for fixed-width bitmaps (the fallback stays
  // CORRECT, it just sorts the hop join's output first). Cap in-memory
  // groups so open buffers stay under ~256 MiB per task. The raised cap
  // is QUERY-scoped, not session-scoped (r11 verdict #4): `scoped`
  // saves the session's prior value and restores it after the body, so
  // a later unrelated ObjectHashAggregate — collect_list with fat
  // buffers in some other query — sees the 128-group default again.
  private val fallbackCap: Long = {
    val perGroup = math.max(1L, size / 8)
    math.min(1L << 20, math.max(128L, (256L << 20) / perGroup))
  }

  /** Run `body` with the ObjectHashAggregate in-memory-group cap raised
    * for this dictionary's bitmap width; the session's prior value is
    * restored on exit (exceptions included). The threshold is read at
    * ACTION time, so `body` must MATERIALIZE (ckpt) every frame whose
    * plan carries a bitmap/collect aggregation — a frame returned lazily
    * executes after the restore and falls back to the 128-group default
    * (still correct, just sort-first). No-op when the bitmap path is
    * disabled. */
  def scoped[T](body: => T): T = {
    if (!enabled || size == 0) body
    else {
      val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
      val conf = edges.sparkSession.conf
      val prior = conf.getOption(key)
      conf.set(key, fallbackCap.toString)
      try body
      finally prior match {
        case Some(v) => conf.set(key, v)
        case None => conf.unset(key)
      }
    }
  }

  /** Replace `nodeCol`'s values with their dictionary ints (inner join:
    * frontier nodes always originate from `edges`, so no loss). */
  def encode(df: DataFrame, nodeCol: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("node", nodeCol)), Seq(nodeCol))
      .drop(nodeCol).withColumnRenamed("__fidx", nodeCol)

  /** Inverse of [[encode]]: dictionary ints back to original ids. */
  def decode(df: DataFrame, nodeCol: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("__fidx", nodeCol)), Seq(nodeCol))
      .drop(nodeCol).withColumnRenamed("node", nodeCol)

  /** (n, __adj) adjacency of an edge SUBSET of `edges`, both endpoints
    * dictionary-encoded; `reverse` keys by dst (predecessor lists). */
  def adjacency(sub: DataFrame, reverse: Boolean = false): DataFrame = {
    val enc = encode(encode(sub.select(col("src"), col("dst")), "src"), "dst")
    val (k, v) = if (reverse) ("dst", "src") else ("src", "dst")
    enc.select(col(k).as("n"), col(v).as("__s"))
      .groupBy("n").agg(collect_list(col("__s")).as("__adj"))
  }

  /** Next DISTINCT frontier: one row per (seed, successor-of-any-member).
    * `fr` is (seedCol, n) with n dictionary-encoded. */
  def hop(fr: DataFrame, adj: DataFrame, seedCol: String = "seed"): DataFrame =
    fr.join(adj, Seq("n"))
      .groupBy(seedCol).agg(BitsetAgg.unionMembers(col("__adj"), numBits).as("__m"))
      .select(col(seedCol), explode(col("__m")).as("n"))

  /** Distinct successor COUNT per seed (skips materializing the final
    * frontier). Seeds whose members have no successors are absent —
    * same inner-join semantics as the row shape. */
  def hopCount(fr: DataFrame, adj: DataFrame, outName: String,
               seedCol: String = "seed"): DataFrame =
    fr.join(adj, Seq("n"))
      .groupBy(seedCol).agg(BitsetAgg.unionCount(col("__adj"), numBits).as(outName))

  /** Distinct-member count per seed of a (seedCol, n) row set that may
    * carry duplicates (e.g. h1 ∪ h2 unions). */
  def distinctCount(fr: DataFrame, outName: String,
                    seedCol: String = "seed"): DataFrame =
    fr.groupBy(seedCol).agg(BitsetAgg.unionCount(col("n"), numBits).as(outName))

  /** Distinct members per seed of a possibly-duplicated (seedCol, n)
    * row set, back as rows. */
  def distinctMembers(fr: DataFrame, seedCol: String = "seed"): DataFrame =
    fr.groupBy(seedCol).agg(BitsetAgg.unionMembers(col("n"), numBits).as("__m"))
      .select(col(seedCol), explode(col("__m")).as("n"))
}

object Frontier {
  /** Dictionary-size gate: 4 M nodes → ≤512 KiB bitmap per open group.
    * Above this the row-distinct shape stays the right plan. */
  val maxNodes: Long = 4L * 1024 * 1024
}
