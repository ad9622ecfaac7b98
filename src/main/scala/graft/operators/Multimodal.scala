package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with a typed metadata struct, processed by distributed per-partition
  * transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`fakeDecode`) — the
  * Spark-side contract (schema, binary transport, partitioning, batch-shaped
  * per-partition processing) is real and is what matters at 100 TB: binary
  * payloads stay columnar in parquet, flow through narrow transformations,
  * and only metadata takes part in shuffles.
  */
object Multimodal {

  /** Canonical multimodal schema: id + modality tag + raw bytes + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Wrap a text corpus as fake media rows (UTF-8 bytes as payload) so the
    * binary pipeline is exercisable with the driver-provided tables.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      encode(col("text"), "UTF-8").as("data"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit("fake/raw").as("format")).as("meta"))

  /** STUB decode: byte histogram over 4 buckets + byte entropy proxy.
    * ??? -- replace with a real codec (e.g. javax.imageio / ffmpeg bindings)
    * when the runtime has them. Deterministic so tests and oracles hold.
    * Runs per-partition (the `mapInPandas` analog in Scala is a typed
    * mapPartitions over the binary payloads — one JVM pass, no shuffle).
    */
  def fakeDecodeFeatures(media: DataFrame): DataFrame = {
    val keep = media.schema.fields.map(_.name).filterNot(_ == "data")
    val outSchema = StructType(
      media.schema.fields.filterNot(_.name == "data") ++ Seq(
        StructField("byte_len", IntegerType, nullable = false),
        StructField("histogram4", ArrayType(LongType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("data")).getOrElse(Array.emptyByteArray)
        val hist = new Array[Long](4)
        var i = 0
        while (i < bytes.length) {
          hist((bytes(i) & 0xFF) >> 6) += 1L
          i += 1
        }
        Row.fromSeq(keep.map(n => r.getAs[Any](n)).toSeq ++ Seq(bytes.length, hist.toSeq))
      }
    }(enc)
  }

  /** RESIZE stub: downsample the binary payload by taking every `factor`-th
    * byte, scaling the metadata dimensions to match. A real implementation
    * would decode + resample + re-encode (codecs unavailable here — see the
    * `???` note on [[fakeDecodeFeatures]]); the Spark contract is the
    * narrow binary-in/binary-out expression with metadata kept consistent.
    */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    graft.functions.HashExpressions.register(media.sparkSession)
    media
      .withColumn("data", graft.functions.HashExpressions.byteStride(col("data"), factor))
      .withColumn("meta", struct(
        (col("meta.width") / factor).cast(IntegerType).as("width"),
        (col("meta.height") / factor).cast(IntegerType).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.format").as("format")))
  }

  /** Frame-sampling stub for video-like payloads: fixed-stride byte slices
    * standing in for frames — real implementation would demux; the
    * partitioning/explode shape is the part that transfers.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame =
    media
      .withColumn("frame_idx",
        // Integer division: `/` on Column is double division and sequence()
        // rejects fractional bounds.
        explode(sequence(lit(0L),
          greatest(lit(0L),
            ((length(col("data")) - 1).cast("long") / lit(frameBytes.toLong * everyN))
              .cast("long")))))
      .withColumn("frame",
        col("data").substr(
          (col("frame_idx") * frameBytes * everyN + 1).cast("int"), lit(frameBytes)))
      .select(col("media_id"), col("modality"), col("frame_idx"), col("frame"))
}
