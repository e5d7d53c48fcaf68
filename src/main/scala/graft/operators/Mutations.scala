package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plan._

/** Keyed mutation semantics of the reference's relation sinks
  * (`RelationOp`, cozo-core/src/data/program.rs:195-205; execution
  * query/stored.rs:44-207): `put`=upsert, `insert`=error on existing
  * key, `update`=partial non-key update, `rm`=delete by key (missing
  * ok), `delete`=error on missing key, `ensure`/`ensure_not`=assertions.
  *
  * Spark-first shape: each mutation is a read-join-write producing the
  * new table state (Delta-style MERGE composed from anti/semi joins).
  * All joins are key-equi joins, so at scale they broadcast when the
  * delta is small and shuffle-hash otherwise; the write is a full or
  * partition-overwrite commit.
  */
object Mutations {

  /** Upsert: rows of `delta` replace current rows with the same key
    * (stored.rs:208 put_into_relation). */
  def put(current: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val kept = current.join(delta.select(keys.map(col): _*).dropDuplicates(), keys, "left_anti")
    kept.unionByName(delta.select(current.columns.map(col): _*))
  }

  /** Insert: like put, but raises if any key already exists (stored.rs:199). */
  def insert(current: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val clash = current.join(delta, keys, "left_semi")
    if (!clash.isEmpty)
      throw new IllegalStateException(s"insert: ${clash.count()} key(s) already exist")
    current.unionByName(delta.select(current.columns.map(col): _*))
  }

  /** Partial update of non-key columns for matching keys; other rows and
    * columns untouched. Updating a key that does not exist raises like
    * the reference ("key to update does not exist",
    * stored.rs:590-597 update_in_relation). `delta` carries keys + the
    * subset of non-key columns to overwrite. */
  def update(current: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val updCols = delta.columns.filterNot(keys.contains)
    // a __hit marker (not coalesce) distinguishes "row not updated"
    // from "column explicitly updated to NULL" — the reference writes
    // the extracted value verbatim, nulls included
    val renamed = updCols.foldLeft(delta)((d, c) => d.withColumnRenamed(c, s"__new_$c"))
      .withColumn("__hit", lit(true))
    // ONE broadcastable left join carries the merge, materialized once
    // (LAZY checkpoint: the existence-check action below computes it,
    // the final select reuses the persisted blocks — an eager ckpt here
    // paid a third traversal). The existence check derives from the
    // SAME frame (matched delta keys vs delta keys — a missing key is
    // one the join never hit), and BOTH distinct-key counts ride ONE
    // Spark action as a two-row union (the sentinel-row trick
    // Classifier.train uses) — the r8 shape paid an eager ckpt plus two
    // separate count actions and regressed 0.60→1.02 s at bench scale.
    val joined = current.join(renamed, keys, "left").ckptLazy()
    val keyCols = keys.map(col)
    val counts = joined.filter(col("__hit")).select(keyCols: _*).distinct()
      .agg(count(lit(1)).as("__c")).select(lit("matched").as("__k"), col("__c"))
      .unionByName(renamed.select(keyCols: _*).distinct()
        .agg(count(lit(1)).as("__c")).select(lit("delta").as("__k"), col("__c")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts("matched") < counts("delta"))
      throw new IllegalStateException("update: key to update does not exist")
    joined.select(current.columns.map { c =>
      if (updCols.contains(c))
        when(col("__hit"), col(s"__new_$c")).otherwise(col(c)).as(c)
      else col(c)
    }: _*)
  }

  /** Delete by key; missing keys are ignored (stored.rs `rm`). */
  def rm(current: DataFrame, keysDf: DataFrame, keys: Seq[String]): DataFrame =
    current.join(keysDf.select(keys.map(col): _*).dropDuplicates(), keys, "left_anti")

  /** Delete by key; raises if any key is missing (stored.rs:148). */
  def delete(current: DataFrame, keysDf: DataFrame, keys: Seq[String]): DataFrame = {
    val missing = keysDf.join(current, keys, "left_anti")
    if (!missing.isEmpty)
      throw new IllegalStateException(s"delete: ${missing.count()} key(s) not present")
    rm(current, keysDf, keys)
  }

  /** Assert rows exist exactly as given (stored.rs:152-169 `ensure`). */
  def ensure(current: DataFrame, rows: DataFrame): Unit = {
    val missing = rows.except(current.select(rows.columns.map(col): _*))
    if (!missing.isEmpty)
      throw new IllegalStateException(s"ensure: ${missing.count()} row(s) absent")
  }

  /** Assert no such rows exist (stored.rs `ensure_not`). */
  def ensureNot(current: DataFrame, rows: DataFrame): Unit = {
    val present = rows.intersect(current.select(rows.columns.map(col): _*))
    if (!present.isEmpty)
      throw new IllegalStateException(s"ensure_not: ${present.count()} row(s) present")
  }
}
