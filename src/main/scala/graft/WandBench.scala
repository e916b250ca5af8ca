package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MaxScore-vs-exhaustive BM25 at a realistic query batch: times
  * `topKIndexed` against `topKMaxScore` on the sf0.1 corpus with N query
  * docs (best of `reps` warm). Run: `tools/run_main.sh WandBench [nQ] [k]`.
  * Prints one JSON line per engine — the receipt behind the bm25_wand
  * architecture claim. */
object WandBench {
  def main(args: Array[String]): Unit = {
    val nQ = args.headOption.map(_.toInt).getOrElse(200)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val reps = 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val queries = docs.filter(col("doc_id") < nQ)
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      val secs = (1 to reps).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = mk.count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"wand-batch","engine":"$tag","nQ":$nQ,"k":$k,"rows":$n,"sec":$s%.3f}""")
        s
      }
      secs.min
    }
    val idx = graft.operators.Bm25.index(docs, "doc_id", "text")
    val tFull = time("exhaustive")(
      graft.operators.Bm25.topKIndexed(idx, queries, "doc_id", "text", k))
    val tWand = time("maxscore")(
      graft.operators.Bm25.topKMaxScore(idx, queries, "doc_id", "text", k))
    println(f"""{"bench":"wand-batch","nQ":$nQ,"k":$k,"best_exhaustive":$tFull%.3f,"best_maxscore":$tWand%.3f,"speedup":${tFull / tWand}%.2f}""")
    spark.stop()
  }
}
