package graft.graphs

import graft.SparkFixture
import graft.functions.BitsetAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Mirror-equality of the bitmap-frontier expansion (Frontier +
  * BitsetUnion) against the row-relational distinct shape — the two
  * plans the expansion queries switch between on the dictionary gate.
  */
class FrontierSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def randomEdges(seed: Int, nodes: Int, m: Int): DataFrame = {
    val rnd = new Random(seed)
    // sparse ids (NOT dense): the dictionary must earn its keep
    val ids = Array.fill(nodes)(rnd.nextLong().abs % 1000000L + 7L).distinct
    (1 to m).map { _ =>
      (ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
    }.distinct.filter(e => e._1 != e._2).toDF("src", "dst")
  }

  private def rowHop(fr: DataFrame, e: DataFrame): DataFrame =
    fr.join(e.withColumnRenamed("src", "n"), Seq("n"))
      .select(col("seed"), col("dst").as("n")).distinct()

  test("hop ≡ row-shape distinct hop (10 random graphs)") {
    for (s <- 1 to 10) {
      val e = randomEdges(s, nodes = 60, m = 300)
      val fr = new Frontier(e)
      assert(fr.enabled)
      val h1 = e.select(col("src").as("seed"), col("dst").as("n")).distinct()
      val rows = rowHop(h1, e).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bmp = fr.decode(fr.hop(fr.encode(h1, "n"), fr.adjacency(e)), "n")
        .select("seed", "n")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(bmp == rows, s"graph seed $s")
    }
  }

  test("hopCount / distinctCount ≡ row-shape counts, incl. seed absence (10 graphs)") {
    for (s <- 11 to 20) {
      val e = randomEdges(s, nodes = 50, m = 160)
      val fr = new Frontier(e)
      val h1 = e.select(col("src").as("seed"), col("dst").as("n")).distinct()
      val h2row = rowHop(h1, e)
      val exp = h2row.groupBy("seed").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = fr.hopCount(fr.encode(h1, "n"), fr.adjacency(e), "c")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp, s"hopCount seed $s") // absent seeds absent on both sides
      // distinctCount over a duplicated union ≡ distinct().count
      val dup = h1.union(h1).union(h2row)
      val expU = dup.distinct().groupBy("seed").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotU = fr.distinctCount(fr.encode(dup, "n"), "c")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotU == expU, s"distinctCount seed $s")
    }
  }

  test("reverse adjacency hopCount ≡ row-shape witness count") {
    val e = randomEdges(31, nodes = 40, m = 120)
    val fr = new Frontier(e)
    val h1 = e.select(col("src").as("seed"), col("dst").as("n")).distinct()
    val exp = h1.join(e.select(col("dst").as("n"), col("src").as("w")), Seq("n"))
      .select("seed", "w").distinct()
      .groupBy("seed").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = fr.hopCount(fr.encode(h1, "n"), fr.adjacency(e, reverse = true), "c")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("encode/decode round-trips and the dictionary is dense in [0, size)") {
    val e = randomEdges(42, nodes = 30, m = 80)
    val fr = new Frontier(e)
    val idx = fr.dict.select("__fidx").as[Int].collect().sorted
    assert(idx.head == 0 && idx.last == fr.size - 1 && idx.distinct.length == idx.length)
    val nodes = e.select(col("src").as("n")).union(e.select(col("dst").as("n"))).distinct()
    val round = fr.decode(fr.encode(nodes, "n"), "n")
      .as[Long].collect().sorted
    assert(round.toSeq == nodes.as[Long].collect().sorted.toSeq)
  }

  test("BitsetUnion: int and array inputs, nulls skipped, count ≡ members.length") {
    val df = Seq(
      (1L, Some(3), Seq(1, 5, 7)),
      (1L, Some(5), Seq(3)),
      (1L, None, Seq.empty[Int]),
      (2L, Some(0), Seq(0, 63, 64, 127)) // word boundaries
    ).toDF("g", "i", "arr")
    val viaInt = df.filter(col("i").isNotNull)
      .groupBy("g").agg(BitsetAgg.unionMembers(col("i"), 128).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    assert(viaInt(1L) == Set(3, 5) && viaInt(2L) == Set(0))
    val viaArr = df.groupBy("g")
      .agg(BitsetAgg.unionMembers(col("arr"), 128).as("m"),
        BitsetAgg.unionCount(col("arr"), 128).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1).toSet, r.getLong(2)))).toMap
    assert(viaArr(1L)._1 == Set(1, 3, 5, 7) && viaArr(1L)._2 == 4L)
    assert(viaArr(2L)._1 == Set(0, 63, 64, 127) && viaArr(2L)._2 == 4L)
  }

  test("BitsetUnion survives sort-based fallback (threshold 128 default regime)") {
    // many groups forces ObjectHashAggregate past any in-memory cap;
    // equality with distinct-count proves serialize/merge correctness
    val prev = spark.conf.getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      val rnd = new Random(7)
      val rows = (1 to 5000).map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(1000)))
      val df = rows.toDF("g", "i")
      val exp = rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet.size.toLong }
      val got = df.groupBy("g").agg(BitsetAgg.unionCount(col("i"), 1000).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None => spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
  }

  test("scoped raises the fallback cap only inside the body and restores after (r11 verdict #4)") {
    import graft.plan._
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "321") // a sentinel no code path would pick
    try {
      val e = randomEdges(21, nodes = 40, m = 120)
      val fr = new Frontier(e)
      assert(fr.enabled)
      val out = fr.scoped {
        assert(spark.conf.get(key).toLong > 321L, "cap raised inside the scope")
        val h1 = e.select(col("src").as("seed"), col("dst").as("n")).distinct()
        fr.hopCount(fr.encode(h1, "n"), fr.adjacency(e), "c").ckpt()
      }
      assert(out.count() > 0)
      assert(spark.conf.get(key) == "321", "session value restored after the query")
      intercept[RuntimeException](fr.scoped { throw new RuntimeException("boom") }: Unit)
      assert(spark.conf.get(key) == "321", "restored on exception too")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
