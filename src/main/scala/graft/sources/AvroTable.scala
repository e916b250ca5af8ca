package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
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
 * filesystem — nothing collects); the read is one task per file
 * (`binaryFiles` + `DataFileStream`). Avro blocks are splittable in
 * principle, but without the connector's FileFormat integration this reader
 * is deliberately FILE-granular: the write side controls file count =
 * parallelism, exactly how sharded corpus interchange is operated anyway
 * (repartition before write to size the shards).
 *
 * Reads take an EXPLICIT caller schema (the [[OrcTable]] stance): the field
 * set is validated against each file's embedded writer schema and drift
 * fails loudly. Supported types: long/int/double/float/boolean/string/
 * binary — anything else fails fast at write/read planning.
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
    * per non-empty input partition. */
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
        val out = new Path(path, f"part-$pi%05d.avro")
          .getFileSystem(conf.value).create(new Path(path, f"part-$pi%05d.avro"), true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
        w.create(avroSchema, out)
        var written = 0L
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
        Iterator.single(written)
      }
    }.count() // materialize the write
    ()
  }

  /** Read an Avro table with the caller's explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    // an all-empty write leaves a directory with no part files; binaryFiles
    // throws on a zero-match glob, so an empty TABLE must short-circuit to
    // an empty frame (the write side skips empty partitions by design)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any = fs.globStatus(new Path(dir, "*.avro"))
    if (any == null || any.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val rdd = spark.sparkContext.binaryFiles(s"$path/*.avro").flatMap { case (file, pds) =>
      val in = pds.open()
      val reader = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val ws = reader.getSchema
      names.foreach { nm =>
        if (ws.getField(nm) == null)
          throw new IllegalArgumentException(
            s"AvroTable: column $nm absent from writer schema of $file")
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val h = reader.hasNext; if (!h) { reader.close(); in.close() }; h }
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
}
