package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Phase-timing receipt for `bm25_prf` (r18, VERDICT r17 item 2): replicates
 * [[graft.operators.Bm25.topKPrf]]'s job structure — postings persist +
 * totals collect, round-1 scores checkpoint, expansion checkpoint, final
 * ranking — with a timer around each action, so the optimization targets
 * the phase that actually costs, not the one the plan dump makes look big.
 * Repeats `reps` times in one JVM (rep 1 is JIT/codegen-cold).
 *
 * Usage: tools/run_main.sh Bm25PrfProbe [reps]
 */
object Bm25PrfProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prfprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"[prfprobe] --- rep $rep ---")
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val idx = graft.operators.Bm25.index(docs, "doc_id", "text")
      val idxP = idx.persist(lvl)
      val tf = idxP.select(col("doc").as("__d"), col("dl").cast("long").as("__dl"),
        col("term").as("__w"), col("tf").cast("long").as("__tf"))
      t("1 cache write (count)") { idxP.count() }
      t("2 totals distinct+agg") {
        tf.select(col("__d"), col("__dl")).distinct()
          .agg(sum(col("__dl")).as("__tw"), count(lit(1)).as("__nd")).head()
      }
      t("3 cached full read (count)") { idxP.count() }
      // The real query, end to end, on the pre-warmed cache: isolates the
      // post-persist cost (checkpoints + final) from the cache write.
      t("4 topKPrf on warm cache") {
        graft.operators.Bm25.topKPrf(idxP, docs.filter(col("doc_id") < 5),
          "doc_id", "text", k = 10, fbDocs = 3, fbTerms = 5).count()
      }
      // Internal phase replica (mirrors topKPrf's body) on the warm cache:
      // which of the three remaining jobs owns the time.
      t("4a-4d internals total") {
        import org.apache.spark.sql.expressions.Window
        val queries = docs.filter(col("doc_id") < 5)
        val (k, fbDocs, fbTerms, k1, b) = (10, 3, 5, 1.2, 0.75)
        val totRow = t("4a totals") {
          tf.select(col("__d"), col("__dl")).distinct()
            .agg(sum(col("__dl")).as("__tw"), count(lit(1)).as("__nd")).head()
        }
        val totTw = if (totRow.isNullAt(0) || totRow.getLong(1) == 0L) 1L else totRow.getLong(0)
        val totNd = if (totRow.getLong(1) == 0L) 1L else totRow.getLong(1)
        val qt0 = queries
          .select(col("doc_id").as("query_id"),
            explode(graft.functions.TextFunctions.wordsCol(col("text"))).as("term"))
          .distinct()
        val vocab0 = qt0.select(col("term").as("__w")).distinct()
        val slice0 = tf.join(broadcast(vocab0), "__w")
        val qt0w = qt0.select(col("query_id").as("__q"), col("term").as("__w"))
        def idfFor(tfq: org.apache.spark.sql.DataFrame) =
          tfq.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
            .select(col("__w"),
              floor(log((lit(totNd).cast("double") - col("__df").cast("double") + lit(0.5)) /
                  (col("__df").cast("double") + lit(0.5)) + lit(1.0)) * lit(1000000.0))
                .cast("long").as("__idf"))
        def contribFor(tfq: org.apache.spark.sql.DataFrame, qtw: org.apache.spark.sql.DataFrame) =
          tfq.join(broadcast(qtw), "__w").join(broadcast(idfFor(tfq)), "__w")
            .select(col("__q"), col("__d"),
              floor(col("__idf").cast("double") *
                (col("__tf").cast("double") * lit(k1 + 1.0) /
                  (col("__tf").cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) *
                    (col("__dl").cast("double") /
                      (lit(totTw).cast("double") / lit(totNd).cast("double"))))))).cast("long").as("__c"))
        val scores0 = t("4b scores0 ckpt") {
          contribFor(slice0, qt0w)
            .groupBy(col("__q"), col("__d")).agg(sum(col("__c")).as("score_micro"))
            .localCheckpoint(true)
        }
        val wfb = Window.partitionBy(col("__q"))
          .orderBy(col("score_micro").desc, col("__d").asc)
        val fb = scores0.withColumn("__rn", row_number().over(wfb))
          .filter(col("__rn") <= fbDocs)
          .select(col("__q").as("query_id"), col("__d").as("doc"))
        val exp = t("4c exp ckpt") {
          broadcast(fb).join(idxP, Seq("doc"))
            .groupBy(col("query_id"), col("term"))
            .agg(sum(col("tf")).as("__s"))
            .join(qt0.withColumn("__orig", lit(1)), Seq("query_id", "term"), "left_anti")
            .withColumn("__rn", row_number().over(
              Window.partitionBy(col("query_id")).orderBy(col("__s").desc, col("term").asc)))
            .filter(col("__rn") <= fbTerms)
            .select(col("query_id"), col("term"))
            .localCheckpoint(true)
        }
        t("4d final") {
          val expVocab = exp.select(col("term").as("__w")).distinct()
          val tfExp = tf.join(broadcast(expVocab), "__w")
          val expw = exp.select(col("query_id").as("__q"), col("term").as("__w"))
          val contribExp = contribFor(tfExp, expw)
          val scores2 = scores0.select(col("__q"), col("__d"), col("score_micro").as("__c"))
            .unionByName(contribExp)
            .groupBy(col("__q"), col("__d")).agg(sum(col("__c")).as("score_micro"))
          val w = Window.partitionBy(col("__q"))
            .orderBy(col("score_micro").desc, col("__d").asc)
          scores2.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= k).count()
        }
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // Unwarmed end-to-end control: the Bench-equivalent number.
      t("5 full query (cold cache)") {
        graft.operators.Bm25.topKPrf(
          graft.operators.Bm25.index(docs, "doc_id", "text"),
          docs.filter(col("doc_id") < 5), "doc_id", "text",
          k = 10, fbDocs = 3, fbTerms = 5).count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
