package graft.pipeline

import graft.SparkFixture
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operators: deterministic sampling/splitting,
  * decontamination, cluster resolution, PII redaction.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("sample is deterministic and near the requested fraction") {
    val a = Sampling.sample(docs, "doc_id", 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(docs, "doc_id", 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same rows on every run")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.1, s"fraction ~0.3, got ${a.size / n}")
    // monotone: a smaller fraction is a subset of a larger one
    val small = Sampling.sample(docs, "doc_id", 0.1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a), "nested samples (bucket < t is monotone in t)")
  }

  test("piiSignals counts each pattern non-overlapping; has_pii is their union") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "mail a@b.co and c.d+e@f-g.org, host 10.0.0.1 ref 123456789"),
      (2L, "no pii here, short num 12345"),
      (3L, "999.999.999.999 still matches the IPv4 shape; 1.2.3.4.5 overlaps once")).toDF("doc_id", "text")
    val r = TextAnalysis.piiSignals(tiny, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getBoolean(4)))).toMap
    assert(r(1L) == ((2L, 1L, 1L, true)))
    assert(r(2L) == ((0L, 0L, 0L, false)))
    // the 1-3-octet pattern matches 999.999.999.999 (shape, not range),
    // and 1.2.3.4.5 yields ONE non-overlapping match
    assert(r(3L) == ((0L, 2L, 0L, true)))
  }

  test("chunk: HF overflowing-tokens convention — starts advance by stride until a chunk reaches the end") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b c d e f g h i j"), // 10 toks, size 4 stride 3 → starts 0,3,6 (6+4=10 reaches end)
      (2L, "x y"),                 // short doc → one short chunk
      (3L, ""),                    // zero tokens → no chunks
      (4L, "p q r s")).toDF("doc_id", "text") // exactly size → one chunk
    val r = TextAnalysis.chunk(tiny, "doc_id", "text", size = 4, stride = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getString(3)))).toMap
    assert(r.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (4L, 0L)))
    assert(r((1L, 0L)) == ((4L, "a b c d")))
    assert(r((1L, 1L)) == ((4L, "d e f g")))
    assert(r((1L, 2L)) == ((4L, "g h i j")))
    assert(r((2L, 0L)) == ((2L, "x y")))
    assert(r((4L, 0L)) == ((4L, "p q r s")))
    // a stride that overshoots: 11 tokens, size 4, stride 3 → starts
    // 0,3,6,9; the last chunk is the 2-token remainder
    val odd = Seq((9L, "a b c d e f g h i j k")).toDF("doc_id", "text")
    val ro = TextAnalysis.chunk(odd, "doc_id", "text", size = 4, stride = 3)
      .collect().map(x => x.getLong(1) -> x.getString(3)).toMap
    assert(ro == Map(0L -> "a b c d", 1L -> "d e f g", 2L -> "g h i j", 3L -> "j k"))
    // every token of every doc appears in ≥1 chunk; overlap = size − stride
    val full = TextAnalysis.chunk(docs, "doc_id", "text", size = 16, stride = 12)
    val reassembled = full.filter(col("chunk_idx") === 0)
      .select(col("id"), col("chunk_text"))
    assert(reassembled.count() == docs.filter(length(trim(col("text"))) > 0).count())
  }

  test("keywords: tf-idf top-k hand-checked; rare terms beat common ones") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple apple banana common common common"),
      (2L, "banana cherry common common"),
      (3L, "common cherry durian")).toDF("doc_id", "text")
    val r = TextAnalysis.keywords(tiny, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getString(2)).toMap
    // doc 1: apple tf=2 df=1 (idf ln(4/2)+1), common tf=3 df=3 (idf ln(4/4)+1=1)
    // apple 2*(ln2+1)=3.386 > common 3*1=3.0 > banana 1*(ln(4/3)+1)=1.288
    assert(r((1L, 1L)) == "apple" && r((1L, 2L)) == "common")
    // doc 3: durian tf=1 df=1 beats cherry tf=1 df=2; common last
    assert(r((3L, 1L)) == "durian" && r((3L, 2L)) == "cherry")
    // rank never exceeds k and is dense per doc
    val ranks = TextAnalysis.keywords(tiny, "doc_id", "text", k = 2)
      .groupBy("id").agg(collect_list("rank").as("rs"))
      .collect().map(_.getSeq[Long](1).sorted)
    assert(ranks.forall(_ == Seq(1L, 2L)))
  }

  test("Embeddings.pool: element-wise mean then L2 normalize, hand-computed; max-pool and zero-vector guard") {
    import spark.implicits._
    val chunks = Seq(
      (1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)), // mean (0.5, 0.5) → (√½, √½)
      (2L, Seq(3.0f, 4.0f)),                        // single member → (0.6, 0.8)
      (3L, Seq(0.0f, 0.0f))                         // all-zero stays zero, not NaN
    ).toDF("grp", "vec")
    val r = Embeddings.pool(chunks, "grp", "vec")
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getDouble(2)).toMap
    val s2 = math.sqrt(0.5)
    assert(math.abs(r((1L, 0)) - s2) < 1e-12 && math.abs(r((1L, 1)) - s2) < 1e-12)
    assert(math.abs(r((2L, 0)) - 0.6) < 1e-12 && math.abs(r((2L, 1)) - 0.8) < 1e-12)
    assert(r((3L, 0)) == 0.0 && r((3L, 1)) == 0.0)
    val mx = Embeddings.pool(chunks, "grp", "vec", method = "max", normalize = false)
      .collect().map(x => (x.getLong(0), x.getInt(1)) -> x.getDouble(2)).toMap
    assert(mx((1L, 0)) == 1.0 && mx((1L, 1)) == 1.0)
    intercept[IllegalArgumentException](
      Embeddings.pool(chunks, "grp", "vec", method = "median"))
  }

  test("gopherRules: every rule column hand-computed; keep is their conjunction") {
    import spark.implicits._
    // "ab cd\n- x\ny...": words [ab cd - x y...]; line 2 bulleted,
    // line 3 ellipsis-terminated; '-' carries no letter
    val good = (Seq.fill(6)("the quick brown fox jumps over that lazy dog with")).mkString(" ")
    val tiny = Seq((1L, "ab cd\n- x\ny..."), (2L, good)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(tiny, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val a = r(1L)
    assert(a.getLong(1) == 5L)                       // word_count
    assert(a.getDouble(2) == 2.0)                    // mean_word_len (2+2+1+1+4)/5
    assert(a.getDouble(3) == 0.2)                    // symbol_ratio: one '...' / 5 words
    assert(math.abs(a.getDouble(4) - 0.333333) < 1e-9) // bullet_frac 1/3
    assert(math.abs(a.getDouble(5) - 0.333333) < 1e-9) // ellipsis_frac 1/3
    assert(a.getDouble(6) == 0.8)                    // alpha_word_frac 4/5
    assert(a.getLong(7) == 0L)                       // req_stopwords
    assert(!a.getBoolean(8))                         // keep: fails several rules
    val b = r(2L)
    assert(b.getLong(1) == 60L && b.getDouble(2) == 4.0 && b.getLong(7) == 3L)
    assert(b.getBoolean(8), "60 in-band words, 3 required stopwords -> keep")
  }

  test("repetitionSignals: hand-computed fractions and explode-groupBy agreement") {
    import spark.implicits._
    // "a b a b a": bigrams [ab, ba, ab, ba] → top 2/4; trigrams
    // [aba, bab, aba] → 3 occurrences, 2 distinct → dup 1/3
    val tiny = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "w")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(tiny, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r(1L) == ((5L, 0.5, 1.0 / 3)))
    assert(r(2L) == ((3L, 0.5, 0.0))) // xy, yz both unique → top 1/2
    assert(r(3L) == ((1L, 0.0, 0.0))) // no bigrams at all
    // the zero-shuffle sorted-run plan equals the relational recount
    val hof = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        math.rint(x.getDouble(2) * 1e9), math.rint(x.getDouble(3) * 1e9))).toSet
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    def gramRel(n: Int) = docs.select(col("doc_id"), posexplode(
        when(size(toks) >= n, transform(sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array().cast("array<string>"))))
      .toDF("doc_id", "p", "g")
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("total"), max("c").as("top"),
        count(lit(1)).as("nd"))
    val bi = gramRel(2).select(col("doc_id"),
      (col("top").cast("double") / col("total")).as("tbf"))
    val tri = gramRel(3).select(col("doc_id"),
      ((col("total") - col("nd")).cast("double") / col("total")).as("dtf"))
    val expected = docs.select(col("doc_id"), size(toks).cast("long").as("n"))
      .join(bi, Seq("doc_id"), "left").join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n"), coalesce(col("tbf"), lit(0.0)),
        coalesce(col("dtf"), lit(0.0)))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        math.rint(x.getDouble(2) * 1e9), math.rint(x.getDouble(3) * 1e9))).toSet
    assert(hof == expected)
  }

  test("split is disjoint, exhaustive and stable under corpus growth") {
    val full = Sampling.split(docs, "doc_id").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.values.toSet == Set("train", "val", "test"))
    val frac = full.values.groupBy(identity).view.mapValues(_.size / full.size.toDouble).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1, s"train ~80%: $frac")
    // growth-stability: the split of a subset matches the full corpus
    val sub = Sampling.split(docs.filter(col("doc_id") < 100), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, sp) => assert(full(id) == sp, s"doc $id split changed") }
  }

  test("stratifiedSample applies per-stratum fractions") {
    val kept = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), default = 0.0)
    val langs = kept.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), s"default 0.0 drops non-en strata, got $langs")
    assert(kept.count() == docs.filter(col("lang") === "en").count(), "en fraction 1.0 keeps all")
  }

  test("reservoirPerGroup returns at most n per group, deterministically") {
    val r = Sampling.reservoirPerGroup(docs, "doc_id", Seq("lang"), n = 3)
    val sizes = r.groupBy("lang").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 3))
    val again = Sampling.reservoirPerGroup(docs, "doc_id", Seq("lang"), n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == r.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("boundedSample: exactly n rows, the n smallest md5-keys, growth-stable") {
    val n = 25
    val smp = Sampling.boundedSample(docs, "doc_id", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smp.size == n)
    // independently recompute the md5 order the operator promises —
    // the same portable key any other engine (the DuckDB oracle) uses
    val byKey = docs.select(col("doc_id"),
        Sampling.md5Key(col("doc_id")).as("__k"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.map(_._2)
    assert(smp == byKey.take(n).toSet, "sample must be the n smallest-hash ids")
    // membership is hash-determined, so a superset corpus keeps every
    // sampled id that stays in the hash-order prefix — verify against a
    // filtered subset that preserves the first n ids
    val keepIds = byKey.take(n).toSet
    val sub = Sampling.boundedSample(
      docs.filter(col("doc_id").isin(byKey.take(n + 10).toSeq: _*)), "doc_id", n)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub == keepIds, "prefix-preserving subset yields the same sample")
  }

  test("resolveClusters folds transitive pairs into min-id clusters") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // 1~2, 2~3 (one cluster), 5~6 (another); 4 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.resolveClusters(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true) && out(2L) == (1L, false) && out(3L) == (1L, false))
    assert(out(4L) == (4L, true))
    assert(out(5L) == (5L, true) && out(6L) == (5L, false))
  }

  test("decontamination flags the planted overlap and clean() removes it") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated sentence with no overlap at all here"),
      (3L, "another benign training document about spark joins")).toDF("id", "text")
    val eval_ = Seq(
      (100L, "we ask whether the quick brown fox jumps over anything")).toDF("id", "text")
    val bad = Decontaminate.ngramOverlap(train, "id", "text", eval_, "id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bad.map(_._1).toSet == Set(1L), s"only doc 1 shares a 5-gram: ${bad.mkString(",")}")
    val cleaned = Decontaminate.clean(train, "id", "text", eval_, "id", "text", n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(cleaned == Set(2L, 3L))
  }

  test("redact replaces emails, IPs and long digit runs, in order") {
    import spark.implicits._
    val out = Seq(
      "contact alice.smith+x@example-corp.io or 10.0.255.7 ref 1234567890",
      "short 12345 stays; 192.168.1.1 goes").toDF("text")
      .select(TextAnalysis.redact(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) == "contact <EMAIL> or <IP> ref <NUM>")
    assert(out(1) == "short 12345 stays; <IP> goes")
  }
}
