package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, plus batch-shaped decode / feature-extraction
 * operators.
 *
 * The actual media codecs are NOT available in this environment, so the decode
 * step is a clearly-marked DETERMINISTIC STUB (`fakeDecodeMeta` /
 * `extractFeatures`) — the Spark-side contract that matters at scale IS real
 * and tested: schema (binary payload + StructType metadata + array<float>
 * features), partition-batch processing via mapPartitions (the Scala analogue
 * of `mapInPandas` batch shape: one reusable buffer per partition, streaming
 * iterator in/out, no per-row allocation of the decoder), and column pruning
 * (payload column only read where needed).
 */
object Multimodal {

  /** Metadata schema attached to every decoded payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Wire a string column into a binary payload column (UTF-8) — demo source for
    * environments without real media files; real pipelines read binary parquet /
    * `binaryFile` sources directly. */
  def withBinaryPayload(df: DataFrame, textCol: String, payloadCol: String): DataFrame =
    df.withColumn(payloadCol, encode(col(textCol), "UTF-8"))

  /**
   * STUB decoder (no media libs in this container): deterministic fake metadata
   * derived from the payload bytes — format from the first byte, dimensions from
   * the byte length. Replace the body with a real codec behind the same
   * signature; the plan shape (scalar expression over binary) is the real thing.
   */
  def fakeDecodeMeta(payload: Column): Column = struct(
    lit("stub/raw").as("format"),
    ((octet_length(payload) * 7919L) % 1024L + 1L).cast("int").as("width"),
    ((octet_length(payload) * 104729L) % 1024L + 1L).cast("int").as("height"),
    octet_length(payload).cast("long").as("n_bytes"))

  /** Payload + decoded metadata + content digest (dedup key for binary columns). */
  def withDecodedMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", fakeDecodeMeta(col(payloadCol)))
      .withColumn("media_sha", sha2(col(payloadCol), 256))

  /**
   * Batch-shaped feature extraction over binary payloads via mapPartitions —
   * the Scala analogue of a Pandas-UDF `mapInPandas` stage: per-partition setup
   * (one decoder/buffer), streaming iterator, fixed-width float output.
   * The per-row "model" here is a DETERMINISTIC STUB (byte-histogram-ish fold);
   * swap `featurize` for a real encoder without touching the plumbing.
   */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    def featurize(bytes: Array[Byte], out: Array[Float]): Unit = {
      java.util.Arrays.fill(out, 0.0f)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) {
          out((bytes(i) & 0xff) % dim) += 1.0f
          i += 1
        }
        var d = 0
        while (d < dim) { out(d) /= math.max(1, bytes.length).toFloat; d += 1 }
      }
    }
    val slim = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = slim.rdd.mapPartitions { rows =>
      val buf = new Array[Float](dim) // per-partition reusable buffer (batch shape)
      rows.map { r =>
        featurize(if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1), buf)
        Row(r.getLong(0), buf.clone().toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
