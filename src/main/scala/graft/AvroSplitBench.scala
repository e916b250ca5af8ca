package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Splittable-Avro-read receipt (round 16): ONE container file (the giant
 * externally-produced shard the r15 verdict flagged), scanned with a
 * sync-navigated split per `maxSplitBytes` range vs as a single task —
 * the wall-clock ratio IS the feature. Writes `AVRO_SPLIT_BENCH.json`.
 * Run: `tools/run_main.sh AvroSplitBench [copies]`.
 */
object AvroSplitBench {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(40)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one BIG single container file: documents replicated `copies` times
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val big = spark.range(copies).crossJoin(docs)
      .select((col("doc_id") + col("id") * 10000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val dir = s"${sys.props("java.io.tmpdir")}/graft_avro_split_bench/one"
    graft.sources.AvroTable.write(big.coalesce(1), dir)
    val schema = big.schema
    val fileBytes = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .globStatus(new org.apache.hadoop.fs.Path(dir, "*.avro")).map(_.getLen).sum
    // a corpus-shaped consumer, not a bare count: sum of text lengths
    def scan(split: Long): (Double, Long, Int) = {
      val df = graft.sources.AvroTable.read(spark, dir, schema, maxSplitBytes = split)
      val parts = df.rdd.getNumPartitions
      val t0 = System.nanoTime()
      val n = df.agg(sum(length(col("text")))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, n, parts)
    }
    scan(8L << 20) // JIT/codegen warmup out of the measured path
    val out = new StringBuilder
    Seq(("whole_file", 1L << 40), ("8mb_splits", 8L << 20)).foreach { case (label, split) =>
      val reps = (1 to 3).map(_ => scan(split))
      require(reps.map(_._2).distinct.size == 1, "split reads disagree")
      val line = f"""{"mode":"$label","file_bytes":$fileBytes,"tasks":${reps.head._3},"best_sec":${reps.map(_._1).min}%.3f,"reps":[${reps.map(r => f"${r._1}%.3f").mkString(",")}]}"""
      println(s"[avrosplit] $line")
      out.append(line).append('\n')
    }
    spark.stop()
    val w = new java.io.PrintWriter("AVRO_SPLIT_BENCH.json", "UTF-8")
    try w.print(out) finally w.close()
  }
}
