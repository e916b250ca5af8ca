package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Relational PageRank over an explicit edge list — graph centrality as a
 * curation signal: on the document/embedding kNN graph, high-rank nodes are
 * the corpus' "semantic hubs" (canonical exemplars, boilerplate attractors),
 * low-rank nodes are isolates — both ends of the distribution are curation
 * targets (keep hubs for coverage, inspect isolates for noise).
 *
 * INTEGER-EXACT fixed-iteration variant, so each iteration — and therefore
 * the final ranking — is bit-identical in any engine and under any reduction
 * order: ranks live in micro-units (r₀ = 10⁶), a node's per-edge
 * contribution is `r DIV outdeg` (integer division), and the update is
 * `r' = (1000 − dampingMilli)·1000 + (dampingMilli · Σ contrib) DIV 1000`.
 * The DIV truncation loses < 1 micro-unit per edge — irrelevant to ranking,
 * decisive for oracle-checkability (the [[CorpusStats.unigramLogLoss]]
 * quantization stance applied to iteration).
 *
 * Dangling nodes (no out-edges) contribute no mass — the standard
 * simplification; their own rank still receives the teleport term.
 *
 * Scale shape: the textbook relational PageRank — per iteration ONE join of
 * the edge list against the slim (node, rank) relation and ONE aggregation
 * by destination; nothing driver-side, no vectors on the wire. `nIters` is
 * small and fixed (centrality stabilizes in a handful of rounds; this is a
 * signal, not a numerics exercise).
 *
 * @param edges    directed edge relation
 * @param nIters   fixed iteration count (oracle unrolls the same number)
 * @param dampingMilli damping factor in milli-units (850 = the classic 0.85)
 * @return (node, rank_micro) — one row per distinct endpoint.
 */
object GraphRank {

  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      nIters: Int = 3, dampingMilli: Int = 850): DataFrame = {
    val (e, nodes) = edgeNodes(edges, srcCol, dstCol)
    val teleport = (1000L - dampingMilli) * 1000L
    iterate(e,
      nodes.select(col("node"), lit(teleport).as("__t0"), lit(1000000L).as("__r0")),
      nIters, dampingMilli)
  }

  /**
   * PERSONALIZED PageRank: teleport mass returns only to the `seeds` set, so
   * rank measures graph PROXIMITY TO THE SEEDS — "find more documents like
   * this curated set" as random-walk relevance, the retrieval complement of
   * the global hub score. Same integer-exact iteration: seeds start at 10⁶
   * and receive the full teleport term; non-seeds start at 0 and receive
   * only propagated mass (nodes unreachable from the seeds stay at 0).
   *
   * @param seeds relation whose `seedIdCol` lists the seed node ids (ids
   *              absent from the graph are ignored)
   */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedIdCol: String,
      nIters: Int = 3, dampingMilli: Int = 850): DataFrame = {
    val (e, nodes) = edgeNodes(edges, srcCol, dstCol)
    val teleport = (1000L - dampingMilli) * 1000L
    val flagged = nodes
      .join(seeds.select(col(seedIdCol).as("node")).distinct()
        .withColumn("__seed", lit(1L)), Seq("node"), "left")
      .select(col("node"),
        when(col("__seed").isNotNull, lit(teleport)).otherwise(lit(0L)).as("__t0"),
        when(col("__seed").isNotNull, lit(1000000L)).otherwise(lit(0L)).as("__r0"))
    iterate(e, flagged, nIters, dampingMilli)
  }

  private def edgeNodes(edges: DataFrame, srcCol: String, dstCol: String) = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    (e, nodes)
  }

  /** Shared fixed-point loop over `(node, __t0 = per-node teleport,
    * __r0 = initial rank)` — uniform for [[pageRank]], seed-shaped for
    * [[personalizedPageRank]]. */
  private def iterate(
      e: DataFrame, nodes: DataFrame, nIters: Int, dampingMilli: Int): DataFrame = {
    require(nIters >= 1, s"nIters must be >= 1, got $nIters")
    require(dampingMilli >= 0 && dampingMilli <= 1000,
      s"dampingMilli must be in [0, 1000], got $dampingMilli")
    val outDeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__od"))
    var r = nodes.select(col("node"), col("__r0").as("__r"))
    for (_ <- 1 to nIters) {
      val contrib = e
        .join(r.select(col("node").as("__src"), col("__r")), "__src")
        .join(outDeg, "__src")
        .select(col("__dst"), expr("__r div __od").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__s"))
      r = nodes.join(contrib.select(col("__dst").as("node"), col("__s")), Seq("node"), "left")
        .select(col("node"),
          (col("__t0") + expr(s"($dampingMilli * coalesce(__s, 0L)) div 1000"))
            .as("__r"))
    }
    r.select(col("node"), col("__r").as("rank_micro"))
  }
}
