package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage dissection of the mutual-kNN edge-build floor (round-15
  * judge directive #1): times each sub-pipeline of
  * [[graft.operators.Dedup.knnGraph]] in isolation and prints the formatted
  * physical plan of the full build. Throwaway diagnostics, not a receipt.
  * Run: `tools/run_main.sh FloorProbe [sfDir]`.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    import graft.operators.SimSearch
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count() // warm FS cache

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[floor] $label rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
        spark.sharedState.cacheManager.clearCache()
      }
    }

    val b = emb.select(col("vec_id").as("__id"), col("embedding").as("__v"),
      posexplode(SimSearch.lshBucketsUdf(8, 2)(col("embedding"))).as(Seq("__t", "__b")))
    time("explode")(b.count())
    val joined = b.select(col("__id").as("src"), col("__v").as("__va"), col("__t"), col("__b"))
      .join(b.select(col("__id").as("nbr"), col("__v").as("__vb"), col("__t"), col("__b")),
        Seq("__t", "__b"))
      .filter(col("src") =!= col("nbr"))
    time("bucket_join")(joined.count())
    val scored = joined
      .withColumn("__cos", round(SimSearch.cosineSim(col("__va"), col("__vb")), 4))
      .select(col("src"), col("nbr"), col("__cos"))
    time("scored")(scored.count())
    val deduped = scored.dropDuplicates("src", "nbr")
    time("deduped")(deduped.count())
    time("knnGraph")(Dedup.knnGraph(emb, "vec_id", "embedding", 3).count())
    time("mutualEdges")(Dedup.mutualKnnEdges(emb, "vec_id", "embedding", 3).count())
    val eProbe = Dedup.mutualKnnEdges(emb, "vec_id", "embedding", 3)
    eProbe.count()
    println(s"[floor] edges partitions: ${eProbe.rdd.getNumPartitions}")
    spark.sharedState.cacheManager.clearCache()
    time("mutualClusters")(Dedup.mutualKnnClusters(emb, "vec_id", "embedding", 3).count())
    val eFixed = Dedup.mutualKnnEdges(emb, "vec_id", "embedding", 3).localCheckpoint()
    time("runStarOnly")(graft.operators.ConnectedComponents.runStar(
      emb.select(col("vec_id")), "vec_id", eFixed, "id_a", "id_b").count())
    // round-count receipt: time runStar at increasing maxRounds — the time
    // (and the labels' stability) plateaus at the convergence round
    var prevLabels: Set[(Long, Long)] = null
    (1 to 8).foreach { mr =>
      val t0 = System.nanoTime()
      val labs = graft.operators.ConnectedComponents.runStar(
          emb.select(col("vec_id")), "vec_id", eFixed, "id_a", "id_b", maxRounds = mr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val stable = prevLabels != null && labs == prevLabels
      println(f"[floor] runStar maxRounds=$mr: ${(System.nanoTime() - t0) / 1e9}%.3f s stable=$stable")
      prevLabels = labs
      spark.sharedState.cacheManager.clearCache()
    }
    println("========== knnGraph plan ==========")
    Dedup.knnGraph(emb, "vec_id", "embedding", 3).explain("formatted")
    spark.stop()
  }
}
