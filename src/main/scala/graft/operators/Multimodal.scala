package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata structs, processed per-partition in batches (the Scala analog of
  * pandas-batched UDFs: one iterator pass per partition, no per-row JVM
  * boundary crossing).
  *
  * The image/audio DECODE STEP IS A STUB — this container has no codec
  * libraries, so `decodeImageMeta` derives a deterministic fake
  * (width/height/channels) from the payload bytes. The Spark-side contract —
  * binary column schema, metadata struct shape, partition-iterator batch
  * processing, column pruning around the blob — is real and tested; swap
  * `fakeDecode` for a javacv/ImageIO call to productionize.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Attach an opaque binary payload column (here: utf-8 bytes of a text
    * column, standing in for image/audio bytes read from object storage). */
  def withPayload(df: DataFrame, sourceCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(sourceCol).cast("binary"))

  /** STUB decode: deterministic pseudo-metadata from the payload length.
    * Mirrored exactly by the SQL oracle (octet_length arithmetic). */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val n = bytes.length
    (n % 640 + 1, (n * 7) % 480 + 1, 3, "fake")
  }

  /** Per-partition batched "decode": binary payload -> metadata struct.
    * Uses mapPartitions so a real decoder would amortize codec init once per
    * partition (the mapInPandas-shaped contract). */
  def decodeImageMeta(df: DataFrame, payloadCol: String = "payload",
      metaCol: String = "media_meta"): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField(metaCol, mediaMetaType, nullable = true))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition init would go here (codec contexts, model handles, ...)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val meta = if (bytes == null) null else {
          val (w, h, c, f) = fakeDecode(bytes)
          Row(w, h, c, f)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** STUB frame sampling: one row per sampled "frame" index (every
    * `stride`-th byte position stands in for a decoded video frame).
    * Demonstrates the explode/generator shape of frame extraction. */
  def sampleFrames(df: DataFrame, payloadCol: String = "payload",
      stride: Int = 100): DataFrame =
    df.withColumn("frame_no",
        explode(sequence(lit(0),
          floor((length(col(payloadCol)) - 1) / lit(stride)).cast("int"))))
      .withColumn("frame_offset", col("frame_no") * stride)
}
