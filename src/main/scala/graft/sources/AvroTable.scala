package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * AVRO container-file SINK + SOURCE — the row-oriented interchange beside the
 * columnar ([[OrcTable]], Parquet) and line ([[JsonlTable]]/[[CsvTable]])
 * formats: Kafka-adjacent and schema-registry estates hand corpora around as
 * Avro container files. The sandbox ships avro-core but NOT the spark-avro
 * connector, so this is a hand-rolled distributed reader/writer over the
 * public Avro API (`DataFileWriter`/`DataFileStream` + Hadoop FS) — the
 * round trip is bit-exact for every supported column including empty
 * strings and nulls (every field is written as the Avro union
 * `["null", T]`).
 *
 * Scale shape: the write is one container file PER INPUT PARTITION (each
 * executor streams its rows through a `DataFileWriter` straight to the
 * filesystem — nothing collects, commits are attempt-unique temp + rename);
 * the read is SPLITTABLE (r16): each file is carved into byte-range splits
 * and tasks navigate to their blocks by the format's own sync markers
 * (`DataFileReader.sync`/`pastSync` over a seekable `FsInput`), so read
 * parallelism is governed by `maxSplitBytes`, not by how many files the
 * producer happened to emit — one giant externally-written container no
 * longer becomes one task.
 *
 * Reads take an EXPLICIT caller schema (the [[OrcTable]] stance): each
 * file's embedded writer schema is validated at FILE OPEN — field presence
 * AND types (r16) — so drift fails loudly before any row decodes, with the
 * column, file, and both types in the message. Supported types:
 * long/int/double/float/boolean/string/binary — anything else fails fast at
 * write/read planning.
 */
object AvroTable {

  private def avroSchemaFor(schema: StructType): Schema = {
    val fields = SchemaBuilder.record("graft_row").namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val b = fs.name(f.name).`type`().unionOf().nullType().and()
      val u = f.dataType match {
        case LongType => b.longType()
        case IntegerType => b.intType()
        case DoubleType => b.doubleType()
        case FloatType => b.floatType()
        case BooleanType => b.booleanType()
        case StringType => b.stringType()
        case BinaryType => b.bytesType()
        case dt => throw new IllegalArgumentException(
          s"AvroTable: unsupported type $dt for column ${f.name}")
      }
      u.endUnion().nullDefault()
    }.endRecord()
  }

  /** Write `df` under `path` as Avro container files (overwrite) — one file
    * per non-empty input partition.
    *
    * Commit protocol (r16): each task attempt streams to an ATTEMPT-UNIQUE
    * temp name (`part-NNNNN.avro.tmp-<taskAttemptId>`) and renames it into
    * place only after a successful close — so a speculative or retried
    * attempt of the same partition can never interleave bytes with the
    * winner (two attempts writing one final name directly would corrupt the
    * container). Rename-refused (the other attempt already committed) just
    * drops the loser's temp file; failures best-effort delete their temp. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString // Schema is not serializable pre-1.9 style; ship JSON
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val n = schema.length
    df.rdd.mapPartitionsWithIndex { (pi, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val avroSchema = new Schema.Parser().parse(avroJson)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val finalPath = new Path(path, f"part-$pi%05d.avro")
        val tmpPath = new Path(path, f"part-$pi%05d.avro.tmp-$attempt")
        val pfs = finalPath.getFileSystem(conf.value)
        var written = 0L
        try {
          val out = pfs.create(tmpPath, true)
          val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
          w.create(avroSchema, out)
          rows.foreach { r =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < n) {
              val v = if (r.isNullAt(i)) null else r.get(i) match {
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case x => x
              }
              rec.put(i, v)
              i += 1
            }
            w.append(rec)
            written += 1
          }
          w.close()
          // commit: lose the rename race gracefully — another attempt of this
          // partition already published an identical file
          if (!pfs.rename(tmpPath, finalPath)) pfs.delete(tmpPath, false)
        } catch {
          case t: Throwable =>
            try pfs.delete(tmpPath, false)
            catch { case scala.util.control.NonFatal(_) => () }
            throw t
        }
        Iterator.single(written)
      }
    }.count() // materialize the write
    ()
  }

  /** Read an Avro table with the caller's explicit schema.
    *
    * SPLITTABLE (r16, closing the r15 file-granular note): Avro blocks end
    * with a 16-byte sync marker, so each file is carved into
    * `ceil(len / maxSplitBytes)` byte-range splits and every task reads the
    * blocks whose first sync falls inside its range — `DataFileReader
    * .sync(start)` / `pastSync(end)`, the contract the format was designed
    * for — over a seekable [[org.apache.avro.mapred.FsInput]]. One giant
    * externally-produced container no longer serializes onto one task; a
    * block belongs to exactly one split, so the union of splits is the file,
    * bit-exact. (Split placement carries no HDFS locality hints — that would
    * need the FileFormat integration this sandbox lacks; on the object
    * stores sharded corpora actually live on, locality is moot.)
    */
  def read(
      spark: SparkSession, path: String, schema: StructType,
      maxSplitBytes: Long = 64L << 20): DataFrame = {
    require(maxSplitBytes > 0, s"maxSplitBytes must be positive, got $maxSplitBytes")
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    // an all-empty write leaves a directory with no part files — an empty
    // TABLE short-circuits to an empty frame (the write side skips empty
    // partitions by design)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any = fs.globStatus(new Path(dir, "*.avro"))
    if (any == null || any.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val splits = any.toSeq.flatMap { st =>
      val len = st.getLen
      // (len-1)/m + 1, not (len+m-1)/m: the latter overflows for huge m
      val n = math.max(1L, (len - 1) / maxSplitBytes + 1)
      (0L until n).map { i =>
        (st.getPath.toString, i * maxSplitBytes, math.min((i + 1) * maxSplitBytes, len))
      }
    }
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext.parallelize(splits, splits.size)
      .flatMap { case (file, start, end) =>
        val in = new org.apache.avro.mapred.FsInput(new Path(file), conf.value)
        val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        // a limit/take or a downstream exception can abandon the iterator
        // mid-split — close unconditionally at task end (idempotent with the
        // eager drain-close below, which still matters for many-splits tasks)
        Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          try { reader.close(); in.close() }
          catch { case scala.util.control.NonFatal(_) => () }
        })
        val ws = reader.getSchema
        names.indices.foreach { i =>
          val nm = names(i)
          val f = ws.getField(nm)
          if (f == null)
            throw new IllegalArgumentException(
              s"AvroTable: column $nm absent from writer schema of $file")
          // fail at file-open, not mid-decode: the writer's non-null branch
          // must BE the Avro type the caller's Spark type maps to (same table
          // as the write side — no implicit widening, an int-written column
          // read as LongType is drift, not a cast)
          val written = nonNullBranch(f.schema())
          val expected = expectedAvroType(types(i))
          if (written.getType != expected)
            throw new IllegalArgumentException(
              s"AvroTable: column $nm of $file was written as Avro " +
                s"${written.getType.getName} but the caller schema declares " +
                s"${types(i).simpleString} (expects Avro ${expected.getName})")
        }
        // position at the first sync at-or-after `start` (the header itself
        // ends with the marker, so sync(0) lands on the first block), then
        // consume blocks until one starts past `end` — each block is read by
        // exactly one split
        reader.sync(start)
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) {
              try { reader.close(); in.close() }
              catch { case scala.util.control.NonFatal(_) => () }
            }
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(names.indices.map { i =>
              val v = rec.get(names(i))
              if (v == null) null
              else types(i) match {
                case StringType => v.toString // Avro Utf8 -> String
                case BinaryType =>
                  val bb = v.asInstanceOf[java.nio.ByteBuffer]
                  val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
                case _ => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** The non-null branch of a writer field schema — our own writes emit
    * `["null", T]` unions, but a plain `T` from an external writer is
    * equally valid. A union with several non-null branches has no single
    * Spark type and fails loudly. */
  private def nonNullBranch(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val nn = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (nn.size != 1) throw new IllegalArgumentException(
        s"AvroTable: unsupported union $s (need exactly one non-null branch)")
      nn.head
    }

  /** The Avro type each supported Spark type reads from — the exact inverse
    * of [[avroSchemaFor]]'s write mapping. */
  private def expectedAvroType(dt: DataType): Schema.Type = dt match {
    case LongType => Schema.Type.LONG
    case IntegerType => Schema.Type.INT
    case DoubleType => Schema.Type.DOUBLE
    case FloatType => Schema.Type.FLOAT
    case BooleanType => Schema.Type.BOOLEAN
    case StringType => Schema.Type.STRING
    case BinaryType => Schema.Type.BYTES
    case _ => throw new IllegalArgumentException(
      s"AvroTable: unsupported type $dt")
  }
}
