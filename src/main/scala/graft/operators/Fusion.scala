package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ranked-list fusion for hybrid retrieval — combine a lexical ranking
 * (BM25) and a dense ranking (embedding cosine) without comparing their
 * incommensurable scores: reciprocal-rank fusion (Cormack et al. 2009),
 * `score(d) = Σ_lists 1/(kRrf + rank_list(d))`, the de-facto standard
 * hybrid-search combiner. Rank-only fusion is what makes it robust: no
 * score normalization, no tuning beyond kRrf (60 is the published default).
 */
object Fusion {

  /**
   * Fuse two ranked lists by RRF. Inputs are (queryCol, idCol, rankCol)
   * relations — ranks 1-based, one row per (query, candidate); a candidate
   * absent from a list simply contributes nothing for that list (the
   * standard convention). Output ranks the union by fused score.
   *
   * Plan shape: ONE full-outer join of two k·nQueries-row relations on
   * (query, id) + one window over ≤ 2k rows per query — corpus-independent
   * cost; the expensive parts are the upstream rankings. Deterministic:
   * `1/(kRrf+rank)` is one exact double division, the two-term sum has a
   * fixed order (left list + right list), ties break by id — mirrored 1:1
   * in the `hybrid_rrf` oracle.
   *
   * @param kRrf rank-smoothing constant (60 per the paper)
   * @return (queryCol, idCol, rrf_score rounded to 6, rank 1..k)
   */
  def rrf(
      a: DataFrame, b: DataFrame,
      queryCol: String, idCol: String, rankCol: String,
      k: Int, kRrf: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    val an = a.select(col(queryCol).as("__q"), col(idCol).as("__d"),
      col(rankCol).cast("long").as("__ra"))
    val bn = b.select(col(queryCol).as("__q"), col(idCol).as("__d"),
      col(rankCol).cast("long").as("__rb"))
    val fused = an.join(bn, Seq("__q", "__d"), "full_outer")
      .withColumn("__score",
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__ra").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__rb").cast("double")), lit(0.0)))
    val w = Window.partitionBy(col("__q")).orderBy(col("__score").desc, col("__d").asc)
    fused.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("__q").as(queryCol), col("__d").as(idCol),
        round(col("__score"), 6).as("rrf_score"), col("__rn").cast("long").as("rank"))
  }
}
