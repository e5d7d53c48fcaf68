package graft.similarity

import graft.dedup.Dedup
import graft.functions.{VectorFunctions => VF}
import graft.operators.TopK
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns.
  *
  * The reference's vector search is a per-probe HNSW walk
  * (cozo-core/src/runtime/hnsw.rs:869-1019, surfaced as `HnswSearchRA`
  * query/ra.rs:1068-1122). HNSW is a single-node pointer structure and
  * does not survive a 1000-executor cluster; the Spark-native shapes
  * are:
  *   - brute-force: broadcast the (small) query set against the corpus
  *     scan, codegen'd cosine kernel, per-query top-k via window — exact,
  *     one pass over the corpus, no shuffle of the corpus itself;
  *   - LSH-bucketed: hyperplane sign buckets prefilter candidates, then
  *     exact re-rank — approximate, corpus-side work drops to the
  *     collision set (the 100 TB path).
  */
object Ann {

  /** Exact top-k cosine neighbors for each query row.
    * queries: (query_id, vec); corpus: (id, vec).
    * Returns (query_id, id, cosine, rank), self-match excluded when ids
    * coincide.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = queries.select(col("query_id"), col("vec").as("qvec"))
      .hint("broadcast")
      .crossJoin(corpus.select(col("id"), col("vec")))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", VF.cosineSimilarity(col("qvec"), col("vec")))
      .select("query_id", "id", "cosine")
    TopK.perGroup(joined, Seq("query_id"),
      Seq(col("cosine").desc, col("id").asc), k, rankCol = Some("rank"))
  }

  /** Approximate top-k: candidates from a multi-table hyperplane-LSH
    * bucket join — `tables` independent `planes`-bit sign families
    * computed in ONE pass over each side (Dedup.hyperplaneBuckets), one
    * equi-join on (table, bucket), then exact cosine re-rank of the
    * candidate set only. Each table is seeded independently, so recall
    * compounds as 1-(1-p^planes)^tables.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 12, tables: Int = 4): DataFrame = {
    val bkC = Dedup.hyperplaneBuckets(corpus, "id", "vec", planes, tables)
      .join(corpus.select(col("id"), col("vec")), Seq("id"))
    val bkQ = Dedup.hyperplaneBuckets(queries, "query_id", "vec", planes, tables)
      .withColumnRenamed("id", "query_id")
      .join(queries.select(col("query_id"), col("vec").as("qvec")), Seq("query_id"))
    val cand = bkQ.join(bkC, Seq("table", "bucket"))
      .select("query_id", "qvec", "id", "vec")
      .dropDuplicates("query_id", "id")
      .filter(col("query_id") =!= col("id"))
    val scored = cand.withColumn("cosine", VF.cosineSimilarity(col("qvec"), col("vec")))
      .select("query_id", "id", "cosine")
    TopK.perGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("id").asc), k, rankCol = Some("rank"))
  }

  // ———————————————————————— IVF-Flat ————————————————————————

  /** Deterministic spherical-k-means centroids: seeds are the `nCells`
    * corpus vectors minimizing xxhash64(id, seed) (reproducible across
    * runs/partitionings), refined by `iters` Lloyd rounds. Each round is
    * one broadcast assign pass + one posexplode/groupBy mean — linear
    * scans, no shuffle of the vectors beyond the dim-explode.
    * Returns (cell 0..nCells-1, cvec).
    */
  def ivfCentroids(corpus: DataFrame, nCells: Int, iters: Int = 2,
                   seed: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.plan._
    val base = corpus.select(col("id"), col("vec"))
    var cents = base
      .withColumn("__h", xxhash64(col("id"), lit(seed)))
      .orderBy("__h").limit(nCells)
      .select((row_number().over(Window.orderBy("__h")) - 1).as("cell"),
        col("vec").as("cvec"))
      .ckpt()
    for (_ <- 0 until iters) {
      cents = assignCells(base, cents)
        .select(col("cell"), posexplode(col("vec"))).toDF("cell", "i", "v")
        .groupBy("cell", "i").agg(avg("v").as("m"))
        .groupBy("cell")
        // struct sorts by its first field, so array_sort orders by dim i
        .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
          x => x.getField("m").cast("float")).as("cvec"))
        .ckpt()
    }
    cents
  }

  /** Nearest-centroid assignment: broadcast the (≤ a few K) centroids,
    * one codegen'd cosine per (vector, centroid), argmax per vector.
    * Returns the input plus a `cell` column — the inverted file, with
    * `cell` as its partition key at scale.
    */
  def assignCells(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val scored = vecs.crossJoin(broadcast(cents))
      .withColumn("__sim", VF.cosineSimilarity(col("vec"), col("cvec")))
    TopK.perGroup(scored, Seq("id"), Seq(col("__sim").desc, col("cell").asc), 1)
      .drop("cvec", "__sim")
  }

  /** IVF-Flat approximate top-k: corpus vectors are bucketed by nearest
    * centroid (the inverted file); each query probes its `nProbe`
    * nearest cells and exact cosine re-ranks only those candidates.
    * Expected corpus work per query ≈ nProbe/nCells of brute force;
    * nProbe = nCells degrades to exact brute force (tested). At 100 TB
    * the inverted file is written partitioned BY cell so a probe reads
    * only its cells' files — the same pruning story as the reference's
    * HNSW index but in a disk/partition layout that shards.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, iters: Int = 2,
              seed: Int = 0): DataFrame = {
    import graft.plan._
    val cents = ivfCentroids(corpus.select(col("id"), col("vec")), nCells, iters, seed)
    val inverted = assignCells(corpus.select(col("id"), col("vec")), cents).ckpt()
    val probes = queries.select(col("query_id"), col("vec").as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("__sim", VF.cosineSimilarity(col("qvec"), col("cvec")))
    val probeCells = TopK.perGroup(probes, Seq("query_id"),
      Seq(col("__sim").desc, col("cell").asc), nProbe)
      .select("query_id", "qvec", "cell")
    val scored = probeCells.join(inverted, Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cosine", VF.cosineSimilarity(col("qvec"), col("vec")))
      .select("query_id", "id", "cosine")
    TopK.perGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("id").asc), k, rankCol = Some("rank"))
  }
}
