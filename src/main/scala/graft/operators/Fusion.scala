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
   * Plan shape (r18, guide §2.4): UNION + one partially-aggregating groupBy
   * over the two k·nQueries-row relations + one window over ≤ 2k rows per
   * query — corpus-independent cost; the expensive parts are the upstream
   * rankings. The former full-outer join shape paid two exchanges + sorts
   * (full-outer cannot broadcast) where the union's sum pays one
   * map-side-combined exchange. Deterministic and bit-identical to the join
   * shape: `1/(kRrf+rank)` is one exact double division, each (query, id)
   * group sums at most TWO doubles (addition of two doubles is commutative
   * in IEEE — non-associativity needs ≥ 3 terms), a candidate absent from
   * one list contributes nothing (the join shape added literal 0.0, and
   * x + 0.0 ≡ x for the strictly-positive RRF terms), ties break by id —
   * mirrored 1:1 in the `hybrid_rrf` oracle.
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
    def leg(df: DataFrame) = df.select(col(queryCol).as("__q"), col(idCol).as("__d"),
      (lit(1.0) / (lit(kRrf.toDouble) + col(rankCol).cast("long").cast("double"))).as("__c"))
    val fused = leg(a).unionByName(leg(b))
      .groupBy(col("__q"), col("__d")).agg(sum(col("__c")).as("__score"))
    val w = Window.partitionBy(col("__q")).orderBy(col("__score").desc, col("__d").asc)
    fused.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("__q").as(queryCol), col("__d").as(idCol),
        round(col("__score"), 6).as("rrf_score"), col("__rn").cast("long").as("rank"))
  }
}
