package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in distributed batch UDFs.
  *
  * The decode step is a STUB — this container has no image/audio codec
  * libraries — implemented as a deterministic fake keyed off the blob
  * bytes, clearly marked below. Everything around it (schema, batched
  * partition-wise execution, output encoding, partitioning behavior) is
  * the real 100 TB-scale plumbing: `mapPartitions` processes whole
  * partitions without per-row UDF overhead and without shuffling, and
  * the metadata struct is a first-class Catalyst column usable in
  * pushed-down filters downstream.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a binary media column (here: the utf-8 text bytes stand in
    * for an image payload; on a real corpus this is the stored blob). */
  def withBlob(df: DataFrame, payloadCol: String, blobCol: String = "blob")
      : DataFrame =
    df.withColumn(blobCol, col(payloadCol).cast(BinaryType))

  /** STUB DECODER: a real deployment would decode image headers here
    * (JPEG/PNG dimensions etc.). Deterministic fake derived from the
    * byte content so tests are stable. */
  private def fakeDecode(bytes: Array[Byte]): (String, Int, Int, Int) = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    val fmt = if ((h & 1L) == 0L) "png" else "jpeg"
    val w = 64 + ((h >>> 8) % 1857).toInt  // 64..1920
    val ht = 64 + ((h >>> 24) % 1017).toInt // 64..1080
    (fmt, w, ht, 3)
  }

  /** Batched partition-wise metadata extraction over the blob column:
    * one pass per partition, no shuffle, output schema = input + meta. */
  def decodeMeta(df: DataFrame, blobCol: String = "blob"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", mediaMetaSchema, nullable = true))
    val blobIdx = df.schema.fieldIndex(blobCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val meta = if (bytes == null) null else {
          val (fmt, w, h, c) = fakeDecode(bytes)
          Row(fmt, w, h, c, bytes.length.toLong)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** Deterministic frame-sampling stub for a video-like blob: selects
    * `n` offsets spread over the payload and fingerprints each "frame";
    * real impl would emit decoded frames. Shape (explode → one row per
    * frame) is the real pipeline shape. */
  def sampleFrames(df: DataFrame, blobCol: String, n: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_fp",
        xxhash64(col(blobCol), col("frame_idx")))
}
