package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY §2.4): image/audio/video as opaque BINARY
  * columns with typed metadata, processed batch-wise on executors.
  *
  * The Spark-side plumbing is real — schema, partition-local batch
  * processing, deterministic outputs, linear scaling — while the media
  * decoding itself is STUBBED (this environment ships no image/audio
  * codecs): `decodeImageStub` parses a tiny deterministic fake header
  * instead of real JPEG bytes. Swapping in a real codec changes ONE
  * function body and nothing about the distributed shape.
  */
object MultiModal {

  /** Typed metadata carried beside every media blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("content", BinaryType, nullable = false),   // opaque bytes
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("source_uri", StringType, nullable = true),
      StructField("bytes", LongType, nullable = true))), nullable = true)))

  /** Deterministic fake media: 16-byte header [kindTag, w, h, channels]
    * as big-endian ints, then payload bytes. Lets tests exercise the full
    * pipeline with verifiable decode output. */
  def fakeImageBytes(w: Int, h: Int, channels: Int, payloadLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + payloadLen)
    bb.putInt(1).putInt(w).putInt(h).putInt(channels)
    bb.put(Array.fill(payloadLen)(((w + h) % 127).toByte))
    bb.array()
  }

  case class ImageInfo(width: Int, height: Int, channels: Int)

  /** STUB decoder — ??? replaced by a deterministic fake-header parse; a
    * real build plugs a codec (e.g. TwelveMonkeys/ImageIO) in here. */
  def decodeImageStub(bytes: Array[Byte]): ImageInfo = {
    require(bytes.length >= 16, "not a fake image")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.getInt() == 1, "unknown media tag")
    ImageInfo(bb.getInt(), bb.getInt(), bb.getInt())
  }

  /** Decode + feature-extract, batch-wise per partition. Output schema is
    * fixed and columnar-friendly; the decode loop touches each blob once.
    * On a cluster this is the `mapInPandas`/`mapPartitions` shape: one
    * iterator pass, no driver involvement, memory bounded per batch. */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("aspect", DoubleType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val info = decodeImageStub(r.getAs[Array[Byte]](1))
        // stub feature: deterministic 8-dim projection of the header
        val feat = Array.tabulate(8)(i =>
          ((info.width * (i + 1) + info.height * (i + 3) + info.channels) % 97).toFloat / 97f)
        Row(id, info.width, info.height, info.channels,
          info.width.toDouble / info.height.toDouble, feat.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Resize plan (no codec in this environment): computes target dims
    * per blob as a narrow expression over decoded metadata. */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame =
    features.withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("target_w", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", ceil(col("height") * col("scale")).cast("int"))

  /** Frame sampling for "video" blobs: every k-th fixed-size chunk of the
    * payload as its own binary — partition-local, bounded memory. */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = media.select("media_id", "content").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1).drop(16) // skip fake header
        bytes.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % everyK == 0 }
          .map { case (chunk, i) => Row(id, i, chunk) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a media table from the documents fixture (deterministic),
    * for tests and bench: text length drives fake dimensions. */
  def synthesizeFromDocs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val rdd = docs.select("doc_id", "n_chars").rdd.map { r =>
      val id = r.getLong(0); val n = r.getLong(1)
      val w = (64 + n % 512).toInt; val h = (64 + (n * 7) % 512).toInt
      val content = fakeImageBytes(w, h, 3, 64)
      Row(id, "image", content, Row("image/fake", s"mem://doc/$id", content.length.toLong))
    }
    spark.createDataFrame(rdd, mediaSchema)
  }
}
