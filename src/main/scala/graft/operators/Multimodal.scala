package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: image/audio/video as opaque `binary` + typed
 * metadata. The Spark-side plumbing (schema, batched per-partition
 * processing, deterministic partitioning) is real; the codec itself is a
 * STUB — this container has no image/audio libraries, so `decodeStub`
 * parses only the deterministic fake header the fixture writes and emits
 * byte-level features. Swapping in a real decoder changes one function.
 *
 * The Scala analog of a Pandas-UDF-over-mapInPandas pipeline: a
 * mapPartitions pass that processes rows in batches, so a real decoder
 * could amortize model/codec setup per batch exactly like a Python
 * worker would.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_byte_milli", LongType, nullable = false),
    StructField("histogram", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("thumb_w", IntegerType, nullable = false),
    StructField("thumb_h", IntegerType, nullable = false)))

  /** Deterministic fake media payload: 8-byte magic header "GRAFTIMG" +
   *  2×2-byte dims + body derived from the seed (what a fixture "image"
   *  looks like — stands in for real JPEG bytes). */
  def fakeMedia(seed: Long, w: Int, h: Int): Array[Byte] = {
    val body = new Array[Byte](w * h)
    var s = seed
    var i = 0
    while (i < body.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      body(i) = (s >>> 56).toByte
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(12 + body.length)
    bb.put("GRAFTIMG".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(body)
    bb.array()
  }

  /** Synthetic media table over the documents ids (deterministic). */
  def mediaTable(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0L, n).map { id =>
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
      (id, fakeMedia(id, w, h), if (id % 3 == 0) "png" else "jpg", w, h)
    }.toDF("doc_id", "media", "format", "width", "height")
  }

  /** STUB decode: parses the fake header; a real build would call the
    * codec here. Returns (w, h, body) or None for undecodable bytes. */
  private def decodeStub(media: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (media == null || media.length < 12) return None
    if (!new String(media, 0, 8, "US-ASCII").equals("GRAFTIMG")) return None
    val bb = java.nio.ByteBuffer.wrap(media, 8, 4)
    val w = bb.getShort.toInt; val h = bb.getShort.toInt
    Some((w, h, java.util.Arrays.copyOfRange(media, 12, media.length)))
  }

  /**
   * Batched feature extraction: per-partition iteration (decoder state
   * would be initialized once per partition), emitting byte histogram
   * (16 buckets), mean byte value (per-mille of 255), and the 2×-downsample
   * "thumbnail" dims. Rows that fail to decode are dropped (dead-letter
   * style), like a real corrupt-image filter.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select(col("doc_id"), col("media"), col("format")).rdd
      .mapPartitions { rows =>
        // per-partition "codec init" happens here in a real pipeline
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.get(1).asInstanceOf[Array[Byte]]
          val fmt = r.getString(2)
          decodeStub(bytes).map { case (w, h, body) =>
            val hist = new Array[Long](16)
            var sum = 0L
            var i = 0
            while (i < body.length) {
              val v = body(i) & 0xFF
              hist(v >>> 4) += 1
              sum += v
              i += 1
            }
            val mean = if (body.length > 0) sum * 1000L / (body.length * 255L) else 0L
            Row(id, fmt, bytes.length, mean, hist.toSeq, math.max(w / 2, 1), math.max(h / 2, 1))
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
