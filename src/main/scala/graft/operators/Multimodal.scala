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

  /** Decoded metadata record — field names match [[MetaSchema]]. */
  case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)

  /**
   * STUB decoder for unrecognized payloads: deterministic fake metadata derived
   * from the byte length. Kept as the fallback of [[decodeMeta]] for payloads
   * that are not a JDK-decodable image (audio/video codecs are not in the JDK;
   * swap a real codec in behind the same signature).
   */
  def fakeDecodeMeta(payload: Column): Column = struct(
    lit("stub/raw").as("format"),
    ((octet_length(payload) * 7919L) % 1024L + 1L).cast("int").as("width"),
    ((octet_length(payload) * 104729L) % 1024L + 1L).cast("int").as("height"),
    octet_length(payload).cast("long").as("n_bytes"))

  private def stubMeta(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta("stub/raw", ((n * 7919L) % 1024L + 1L).toInt, ((n * 104729L) % 1024L + 1L).toInt, n)
  }

  /**
   * REAL header decode for image payloads via the JDK's `javax.imageio` (zero
   * extra dependencies): PNG/JPEG/GIF/BMP magic bytes are recognized and the
   * true width/height read from the header only (no full pixel decode — the
   * reader returns dimensions from the metadata stream, so cost is O(header)
   * per payload, not O(pixels)). Unrecognized or corrupt payloads fall back to
   * the deterministic stub ([[stubMeta]] — same arithmetic as
   * [[fakeDecodeMeta]]), keeping the operator total and deterministic.
   */
  def decodeMeta(payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    // Magic checks must not fire on plain text: PNG's \x89 and JPEG's \xFF\xD8
    // can never occur in UTF-8 text; GIF's signature is ASCII, so require the
    // full 6-byte "GIF87a"/"GIF89a". (BMP's 2-byte ASCII "BM" is far too weak
    // a signature for a corpus library whose payloads are often text — not
    // recognized; it falls to the deterministic stub.)
    def isGif = payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a'
    val isImage = n > 8 && (
      ((payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') ||
      ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) ||
      isGif)
    if (!isImage) stubMeta(payload)
    else {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) stubMeta(payload)
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              MediaMeta("image/" + r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                r.getWidth(0), r.getHeight(0), n.toLong)
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => stubMeta(payload) }
    }
  }

  val decodeMetaUdf = udf((payload: Array[Byte]) =>
    if (payload == null) None else Some(decodeMeta(payload)))

  /** Payload + decoded metadata + content digest (dedup key for binary columns).
    * Image payloads get true header dimensions ([[decodeMeta]]); other payloads
    * the deterministic stub (mirrored 1:1 in the mm_meta oracle). */
  def withDecodedMeta(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("media_meta", decodeMetaUdf(col(payloadCol)))
      .withColumn("media_sha", sha2(col(payloadCol), 256))

  /**
   * STUB resize (no codecs in this container): deterministic "resized" payload
   * derived by modular byte sampling down to `targetW·targetH` bytes. The real
   * thing swaps the sampler for an image library inside the same signature;
   * schema (binary → binary) and null behavior are the tested contract.
   */
  val resizeStubUdf = udf((payload: Array[Byte], targetW: Int, targetH: Int) => {
    if (payload == null || payload.isEmpty) null
    else {
      val n = math.max(1, targetW * targetH)
      val out = new Array[Byte](math.min(n, 4096))
      var i = 0
      while (i < out.length) { out(i) = payload((i.toLong * payload.length / out.length).toInt % payload.length); i += 1 }
      out
    }
  })

  def resizeStub(payload: Column, w: Int, h: Int): Column =
    resizeStubUdf(payload, lit(w), lit(h))

  /**
   * STUB frame sampling (video analogue): split the payload into `n` evenly
   * spaced "frames" (byte slices). Real impl: keyframe extraction behind the
   * same binary → array<binary> signature.
   */
  val frameSampleUdf = udf((payload: Array[Byte], n: Int) => {
    if (payload == null || payload.isEmpty || n <= 0) Array.empty[Array[Byte]]
    else {
      val frames = math.min(n, payload.length)
      (0 until frames).map { f =>
        val start = (f.toLong * payload.length / frames).toInt
        val end = ((f + 1).toLong * payload.length / frames).toInt
        java.util.Arrays.copyOfRange(payload, start, math.max(end, start + 1))
      }.toArray
    }
  })

  def frameSample(payload: Column, n: Int): Column = frameSampleUdf(payload, lit(n))

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

  /**
   * dHash-style PERCEPTUAL fingerprint over a binary payload — the
   * near-duplicate identity for media columns (the visual analogue of
   * MinHash for text): downsample the payload into 65 equal byte segments
   * (integer index math `seg(j) = j·65 div n`, exact in any engine), take
   * per-segment byte sums, and set bit i iff `sum_i > sum_{i+1}` — the
   * 64-bit gradient hash real image dHash computes over pixel rows, here
   * over raw bytes since codecs are stubbed (swap the segment source for
   * decoded luma rows without touching the plumbing). Near-identical
   * payloads (small local edits) flip few gradient bits, so banding the
   * hash exactly like [[graft.operators.Dedup.simHashPairs]] finds
   * candidates at scale. O(bytes) mapPartitions kernel, one pass, no
   * shuffle; null/empty payloads hash to 0.
   *
   * @return (idCol, phash BIGINT)
   */
  def dHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("phash", LongType)))
    val slim = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = slim.rdd.mapPartitions { rows =>
      val sums = new Array[Long](65) // per-partition reusable buffer
      rows.map { r =>
        java.util.Arrays.fill(sums, 0L)
        var h = 0L
        if (!r.isNullAt(1)) {
          val bytes = r.getAs[Array[Byte]](1)
          val n = bytes.length
          var j = 0
          while (j < n) {
            sums(((j.toLong * 65L) / n).toInt) += (bytes(j) & 0xff).toLong
            j += 1
          }
          var i = 0
          while (i < 64) {
            if (sums(i) > sums(i + 1)) h |= (1L << i)
            i += 1
          }
        }
        Row(r.getLong(0), h)
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .select(col("id").as(idCol), col("phash"))
  }

  /**
   * Media near-dup PAIRS from [[dHash]] — the banding move that makes the
   * perceptual hash usable at corpus scale: the 64-bit hash splits into
   * 4×16-bit bands, candidates are same-(band, value) collisions (an
   * inverted-index equi-join, never all-pairs), and candidates verify by
   * exact Hamming distance. Pigeonhole-EXACT for `maxHamming ≤ 3`: any
   * pair within 3 bit flips must agree on at least one whole band (the
   * [[graft.operators.Dedup.simHashPairs]] 16-bit-band guarantee).
   *
   * @return (id_a, id_b, hamming) with id_a < id_b, distinct
   */
  def dHashPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding is exact only for maxHamming <= 3, got $maxHamming")
    val h = dHash(df, idCol, payloadCol).select(col(idCol).as("__id"), col("phash"))
    val bands = h.select(col("__id"), col("phash"),
      posexplode(expr("transform(sequence(0, 3), b -> shiftright(phash, b * 16) & 65535)"))
        .as(Seq("__b", "__k")))
    bands.as("a").join(bands.as("b"),
        col("a.__b") === col("b.__b") && col("a.__k") === col("b.__k") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.phash").as("__pa"), col("b.phash").as("__pb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(__pa ^ __pb) AS BIGINT)").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
