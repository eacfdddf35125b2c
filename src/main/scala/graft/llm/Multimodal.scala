package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct; heavy
  * per-item work (decode, feature-extract, resize, frame-sample) runs as a
  * batched `mapPartitions` over the binary column — the Scala analog of a
  * Pandas-UDF-over-`mapInPandas` stage: per-partition setup cost amortized
  * across rows, no driver involvement, scales with partition count.
  *
  * The actual media decode is STUBBED (`StubDecoder`): the container has no
  * image/audio codecs, so the decoder is an injected function and the
  * default produces deterministic fake features. The Spark-side plumbing —
  * schema, batching, partitioning, output shape — is real and tested.
  */
object Multimodal {

  /** Metadata carried alongside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("source_id", LongType, nullable = false)))

  /** Wrap a string column as a binary payload + metadata struct — the shape
    * a real ingest (image bytes from object storage) would produce. */
  def withPayload(df: DataFrame, textCol: String, idCol: String,
                  mime: String = "text/plain"): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        length(col("payload")).cast("long").as("n_bytes"),
        col(idCol).cast("long").as("source_id")))

  /** A decoder turns raw bytes into a fixed-width feature vector.
    * Swap in a real image/audio decoder at deployment; the pipeline shape
    * (binary in, float vector out, batch-amortized setup) is unchanged. */
  type Decoder = Array[Byte] => Array[Float]

  /** Deterministic stand-in for the absent media codecs: length, head/tail
    * bytes, and a simple additive checksum. NOT a real decode — marked stub. */
  val StubDecoder: Decoder = { bytes =>
    if (bytes == null || bytes.isEmpty) Array(0f, 0f, 0f, 0f)
    else {
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { checksum += bytes(i) & 0xff; i += 1 }
      Array(bytes.length.toFloat, (bytes(0) & 0xff).toFloat,
        (bytes(bytes.length - 1) & 0xff).toFloat, (checksum % 997L).toFloat)
    }
  }

  /** Batched feature extraction over a binary column via `mapPartitions`:
    * the decoder is constructed once per partition (where a real codec
    * would load its native state), then streamed over the partition's rows.
    * Output: (id, feature array<float>).
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      decoder: Decoder = StubDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      // per-partition decoder setup happens here in a real deployment
      rows.map { r => Row(r.getLong(0), decoder(r.getAs[Array[Byte]](1)).toSeq) }
    }(RowEncoder.encoderFor(outSchema)).toDF("id", "feature")
  }
}
