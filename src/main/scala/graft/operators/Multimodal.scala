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

  /** The byte-segment gradient rule shared by [[dHash]] (raw payloads) and
    * [[imageDHash]]'s non-image fallback. `sums` is the caller's reusable
    * 65-slot buffer (batch shape). */
  private def byteDHash(bytes: Array[Byte], sums: Array[Long]): Long = {
    java.util.Arrays.fill(sums, 0L)
    var h = 0L
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
    h
  }

  /** True-pixel dHash over a DECODED image: integer luma
    * `(299R + 587G + 114B) div 1000` per pixel, block-averaged onto the
    * standard 9×8 dHash grid with exact `div` boundaries
    * (`x0 = X·W div 9`), bit `y·8+x` set iff `grid(y,x) > grid(y,x+1)` —
    * the published dHash rule on real luma rather than raw bytes. All
    * arithmetic is integer, so the hash is formula-mirrorable for lossless
    * (PNG/BMP) payloads whose pixels are known analytically. Degenerate
    * blocks (W < 9 or H < 8) contribute 0. */
  private def lumaDHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val grid = new Array[Long](72) // 8 rows × 9 cols
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var sum = 0L; var cnt = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            val l = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            sum += l; cnt += 1L
            x += 1
          }
          y += 1
        }
        grid(gy * 9 + gx) = if (cnt == 0L) 0L else sum / cnt
        gx += 1
      }
      gy += 1
    }
    var out = 0L
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        if (grid(yy * 9 + xx) > grid(yy * 9 + xx + 1)) out |= (1L << (yy * 8 + xx))
        xx += 1
      }
      yy += 1
    }
    out
  }

  /** Attempt a REAL codec decode via the JDK's `javax.imageio` — strong magic
    * bytes first (PNG / JPEG / GIF as in [[decodeMeta]], plus BMP's "BM"
    * hardened by requiring the header's little-endian file size to equal the
    * payload length) so corpus-scale text payloads never pay an ImageIO
    * attempt. Returns null when not an image or the codec fails.
    *
    * Reproducibility note: JPEG decoding is lossy and decoder/JDK-version
    * dependent, so hashes over real JPEG payloads are stable within one JVM
    * but NOT guaranteed bit-identical across environments; only the lossless
    * paths (PNG/BMP/GIF) are mirror-exact and oracle-gated. For Hamming-band
    * near-dup detection this is immaterial (a decoder's ±1 luma wobble moves
    * ≪ 1 grid-average), but treat JPEG hashes as environment-scoped keys. */
  private def tryDecodeImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val n = payload.length
    if (n <= 8) return null
    def isGif = payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' && (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a'
    def isBmp = payload(0) == 'B' && payload(1) == 'M' && n >= 14 && {
      val sz = (payload(2) & 0xffL) | ((payload(3) & 0xffL) << 8) |
        ((payload(4) & 0xffL) << 16) | ((payload(5) & 0xffL) << 24)
      // sz == 0 is spec-legal (many writers leave the file-size field blank);
      // accept it so real-world BMPs reach the true-luma path, while still
      // screening "BM..."-prefixed text payloads whose bytes 2-5 are printable
      // ASCII (a nonzero, wrong size) off the ImageIO attempt.
      sz == n.toLong || sz == 0L
    }
    val isImage =
      ((payload(0) & 0xff) == 0x89 && payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') ||
      ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8) ||
      isGif || isBmp
    if (!isImage) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
  }

  /**
   * dHash with a REAL image decode in front — the swap-in the [[dHash]]
   * scaladoc promises: payloads the JDK codecs recognize (PNG/JPEG/GIF/BMP)
   * are decoded and hashed over true block-averaged luma ([[lumaDHash]]);
   * everything else falls back to the byte-segment rule, keeping the
   * operator total over mixed-media columns. Same mapPartitions batch shape
   * and output contract as [[dHash]]; banding/verify downstream is shared
   * ([[dHashPairsFromHashes]]), so the pigeonhole-exactness at
   * Hamming ≤ 3 is unchanged.
   *
   * @return (idCol, phash BIGINT)
   */
  def imageDHash(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("phash", LongType)))
    val slim = df.select(col(idCol).cast("long"), col(payloadCol))
    val rdd = slim.rdd.mapPartitions { rows =>
      val sums = new Array[Long](65) // per-partition reusable fallback buffer
      rows.map { r =>
        val h =
          if (r.isNullAt(1)) 0L
          else {
            val bytes = r.getAs[Array[Byte]](1)
            if (bytes.isEmpty) 0L
            else {
              val img = tryDecodeImage(bytes)
              if (img == null) byteDHash(bytes, sums) else lumaDHash(img)
            }
          }
        Row(r.getLong(0), h)
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .select(col("id").as(idCol), col("phash"))
  }

  /** Fixture dimensions of [[fixtureImageBytes]] — divisible by the 9×8 dHash
    * grid so block averages are whole 2×2 sums. */
  val FixtureW = 18
  val FixtureH = 16

  /**
   * Deterministic synthetic image fixture for the decoded-dHash gates:
   * 18×16 RGB pixels from the integer formula (`base = id div 2`)
   * `r = (base·31 + x·7 + y·13 + p) % 256`,
   * `g = (base·17 + x·11 + y·3 + p) % 256`,
   * `b = (base·23 + x·5 + y·19 + p) % 256`, where `p = 60` on the top-left
   * 2×2 pixel block for odd ids (else 0) — so ids `2k`/`2k+1` are
   * near-duplicates differing in exactly one dHash grid cell (Hamming ≤ 1).
   * Encoded through a REAL JDK codec: PNG for even ids, BMP for odd — both
   * lossless, so decode(encode(pixels)) returns the formula's exact pixels
   * and the oracle can compute the hash analytically without parsing bytes.
   */
  def fixtureImageBytes(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      FixtureW, FixtureH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val base = id / 2
    var y = 0
    while (y < FixtureH) {
      var x = 0
      while (x < FixtureW) {
        val p = if (id % 2 == 1 && x < 2 && y < 2) 60L else 0L
        val r = ((base * 31L + x * 7L + y * 13L + p) % 256L).toInt
        val g = ((base * 17L + x * 11L + y * 3L + p) % 256L).toInt
        val b = ((base * 23L + x * 5L + y * 19L + p) % 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (id % 2 == 0) "png" else "bmp", baos)
    baos.toByteArray
  }

  val fixtureImageUdf = udf((id: Long) => fixtureImageBytes(id))

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
        val h =
          if (r.isNullAt(1)) 0L
          else {
            val bytes = r.getAs[Array[Byte]](1)
            if (bytes.isEmpty) 0L else byteDHash(bytes, sums)
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
      maxHamming: Int = 3): DataFrame =
    dHashPairsFromHashes(dHash(df, idCol, payloadCol), idCol, "phash", maxHamming)

  /** The banding/verify core of [[dHashPairs]], reusable over ANY 64-bit
    * perceptual-hash frame ([[dHash]], [[imageDHash]], or a persisted hash
    * table — the signature-frame stance of
    * [[graft.operators.Dedup.nearDupFromSignatures]]): 4×16-bit bands,
    * same-(band, value) inverted-index candidates, exact Hamming verify —
    * pigeonhole-exact for `maxHamming ≤ 3`. */
  def dHashPairsFromHashes(
      hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding is exact only for maxHamming <= 3, got $maxHamming")
    // One hash per id: a persisted hash table with duplicate ids would emit
    // duplicate (id_a, id_b) rows with possibly different hamming values
    // (only candidates are distinct'd, not the hash frame). max() is the
    // deterministic pick; partial-aggregated map-side, so on the normal
    // already-unique frame this costs a no-op combine, not a second scan.
    val h = hashes.select(col(idCol).as("__id"), col(hashCol).as("phash"))
      .groupBy("__id").agg(max("phash").as("phash"))
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

  /** [[dHashPairs]] over the DECODED hash ([[imageDHash]]) — true-luma
    * near-dup pairs for image columns. */
  def imageDHashPairs(
      df: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3): DataFrame =
    dHashPairsFromHashes(imageDHash(df, idCol, payloadCol), idCol, "phash", maxHamming)
}
