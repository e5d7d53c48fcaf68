package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode/feature/resize/
  * frame-sample stages as `mapPartitions` stages over batched rows.
  *
  * The decode step is a STUB — image/audio codecs are not available in
  * this environment — but everything Spark-side is real: the schema
  * convention, the partition-preserving batch shape, and the
  * deterministic fake features (hash-derived) that let downstream
  * operators (ANN, dedup) be tested end-to-end. Swap `decodeStub` for a
  * real codec (JNI/JavaCV) without touching callers.
  *
  * Schema convention: (id long, media binary, meta struct<format string,
  * width int, height int, n_frames int>).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Wrap a (id, payload) relation as a media relation with fake
    * metadata derived deterministically from the payload bytes. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, format: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("media"),
      struct(
        lit(format).as("format"),
        (pmod(xxhash64(col(payloadCol)), lit(1024L)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col(payloadCol), lit(1)), lit(768L)) + 64).cast("int").as("height"),
        (pmod(xxhash64(col(payloadCol), lit(2)), lit(240L)) + 1).cast("int").as("n_frames")).as("meta"))

  /** ??? in spirit: a codec would produce pixel/sample buffers; the stub
    * derives a deterministic pseudo-decode from the bytes so the
    * pipeline shape (per-partition batching, feature schema) is real and
    * testable. One pass, no driver collection, partition-preserving. */
  private def fakeFeature(media: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < media.length) { h = h ^ ((h << 5) + (h >>> 2) + media(i)); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 33).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Decode + feature-extract: (id, embedding array<float>, n_bytes).
    * mapPartitions so a real decoder amortizes codec init per partition
    * (the standard batch shape for expensive per-row native calls). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("n_bytes", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select("id", "media").mapPartitions { rows =>
      // per-partition init of the (stub) codec happens here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        Row(r.getLong(0), fakeFeature(bytes, dim).toSeq, bytes.length.toLong)
      }
    }(enc).toDF()
  }

  /** Resize stage stub: metadata-only transform (a real implementation
    * rewrites `media`; the plumbing — column pass-through, struct
    * rewrite — is what scales). */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.format"), lit(w).as("width"), lit(h).as("height"), col("meta.n_frames")))

  /** Frame sampling for video-ish media: emit every `stride`-th frame
    * index up to n_frames as (id, frame_idx) — the explode shape that a
    * real frame decoder feeds. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("id"),
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))).as("frame_idx"))
}
