package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver's synthetic star-schema tables (TESTDATA.md).
  *
  * In the reference every relation is a sorted KV range
  * (cozo-core/src/data/tuple.rs:22-39); here a relation is a Parquet
  * path read through the DataFrame API so Catalyst gets pushdown,
  * pruning and partition statistics for free.
  *
  * `events.ts` has shipped as both INT64 TIMESTAMP(NANOS) — which
  * Spark 4 rejects at analysis time (PARQUET_TYPE_ILLEGAL) unless read
  * as a raw nanosecond Long (legacy.parquet.nanosAsLong) and truncated
  * to µs, matching the oracle's `date_trunc('microseconds')` — and as
  * plain TIMESTAMP(MICROS) (NTZ), depending on the testdata
  * generation. The loader dispatches on the type it actually finds;
  * either way downstream sees a µs-precision TimestampType column
  * (session TZ is pinned UTC everywhere, so NTZ→TZ is value-identity).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // runtime-settable SQLConf; must be on before the scan is analyzed
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // ns-as-long footer
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => // µs footer (TZ or NTZ)
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
