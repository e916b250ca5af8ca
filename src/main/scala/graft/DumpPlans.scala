package graft

import org.apache.spark.sql.SparkSession

/**
 * Writes `.explain("formatted")` output for named queries to
 * `<outDir>/<query>_<suffix>.txt` — the before/after plan receipts of the
 * optimization rounds (plans/r17/...). Runs the Bench session shape
 * (local[32], shuffle.partitions=32, AQE on) so the captured plans are the
 * ones the driver's bench actually executes.
 *
 * Usage: tools/run_main.sh DumpPlans <outDir> <suffix> <query> [query...]
 */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <query> [query...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt", "UTF-8")
      try {
        w.println(s"== $name ($suffix) @ $sfDir ==")
        w.println(plan)
      } finally w.close()
      // Clear per-query caches like Bench.hygiene(): some query constructors
      // persist intermediates; leaking them across dumps would change later
      // queries' plans (InMemoryRelation nodes).
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      println(s"[plans] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
