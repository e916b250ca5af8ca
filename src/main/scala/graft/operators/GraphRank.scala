package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
   * PageRank CONVERGENCE monitor — the one-row read that answers "were
   * nIters enough": L1 and max gap (in rank micro-units) between the last
   * two iterations of [[pageRank]]'s integer-exact chain. A fixed-iteration
   * relational PageRank must justify its iteration count somewhere; this
   * relation IS that receipt, and at 100 TB it is the stopping rule a
   * driver loop checks between rounds. Runs the shared chain to nIters−1
   * and nIters (the edge relation is materialized once and reused; the
   * duplicated prefix is the price of keeping both faces oracle-mirrorable
   * as unrolled CTEs).
   *
   * @return ONE row: (n_nodes, delta_micro = Σ|r_N − r_{N−1}|, max_delta_micro)
   */
  def pageRankDelta(
      edges: DataFrame, srcCol: String, dstCol: String,
      nIters: Int = 3, dampingMilli: Int = 850): DataFrame = {
    require(nIters >= 2, s"need nIters >= 2 to measure a delta, got $nIters")
    val (e, nodes) = edgeNodes(edges, srcCol, dstCol)
    val teleport = (1000L - dampingMilli) * 1000L
    val n0 = nodes.select(col("node"), lit(teleport).as("__t0"), lit(1000000L).as("__r0"))
    val prev = iterate(e, n0, nIters - 1, dampingMilli)
      .select(col("node"), col("rank_micro").as("__p"))
    val last = iterate(e, n0, nIters, dampingMilli)
      .select(col("node"), col("rank_micro").as("__l"))
    prev.join(last, Seq("node"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(abs(col("__l") - col("__p"))).as("delta_micro"),
        max(abs(col("__l") - col("__p"))).as("max_delta_micro"))
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

  /**
   * Per-node TRIANGLE counts over the undirected graph induced by the edge
   * list — the local-density signal (clustering coefficient numerator):
   * triangle-rich neighborhoods in a kNN graph are tight semantic clusters,
   * triangle-free high-degree nodes are hub-like boilerplate attractors.
   *
   * Exact relational form: symmetrize + orient each edge `a < b` (self-loops
   * and duplicates drop), enumerate wedges `a<b<c` with one self-join, close
   * them with a second. The `a<b<c` orientation counts each triangle exactly
   * once and bounds the wedge join by the oriented out-degree. (At extreme
   * degree skew the literature orients by DEGREE, not id — for a kNN graph
   * out-degree is already capped at k by construction, so id orientation
   * keeps the oracle bit-exact with no skew risk.) Nodes in no triangle are
   * absent — left-join the node relation if zeros are needed.
   *
   * @return (node, triangles) — triangles the node participates in.
   */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    trianglesFromUnd(undirected(edges, srcCol, dstCol))

  /**
   * Local CLUSTERING COEFFICIENT per node — triangles normalized by possible
   * wedges: `cc = 2·tri / (d·(d−1))`, reported in exact integer micro-units
   * (`div`, no float). Degree-1 and isolated-in-triangle-terms nodes report
   * 0. The per-node tightness score that separates "dense semantic clique
   * member" from "chain/hub node" where raw triangle counts cannot.
   *
   * @return (node, degree, triangles, cc_micro) — one row per node with ≥1
   *         undirected edge.
   */
  def clusteringCoefficient(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = undirected(edges, srcCol, dstCol)
    val tri = trianglesFromUnd(und)
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          expr("2L * coalesce(triangles, 0L) * 1000000L div (degree * (degree - 1L))"))
          .otherwise(lit(0L)).as("cc_micro"))
  }

  /** Symmetrized, oriented (`a < b`), deduplicated edge relation, cut once —
    * the self-joins downstream would otherwise replay an expensive upstream
    * (typically the whole kNN-graph build) per reference. */
  private def undirected(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") < col("b")).distinct()
      .localCheckpoint()

  private def trianglesFromUnd(und: DataFrame): DataFrame = {
    val wedges = und.as("e1").join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
    val tris = wedges.join(und.as("e3"),
      col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select(col("wa"), col("wb"), col("wc"))
    tris.select(explode(array(col("wa"), col("wb"), col("wc"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /**
   * HITS hubs & authorities on the directed edge list, UNNORMALIZED
   * integer-exact fixed-iteration form: h₀ = 1; aᵢ(v) = Σ_{(u,v)} hᵢ₋₁(u);
   * hᵢ(u) = Σ_{(u,v)} aᵢ(v). Per-iteration normalization only rescales the
   * vectors, so the unnormalized RANKING is identical — and dropping it keeps
   * every score an exact BIGINT sum the oracle can mirror (the same stance as
   * [[pageRank]]'s micro-units). Magnitudes grow ≤ (d_in·d_out)^iters — with
   * a degree-capped kNN graph and the small fixed `nIters` a curation signal
   * needs, far inside BIGINT range; the require below fails loudly rather
   * than letting a pathological graph overflow silently.
   *
   * Two joins + two aggregations per iteration, slim (node, score) relations
   * on the wire — same scale shape as [[pageRank]].
   *
   * @return (node, hub, auth) — one row per distinct endpoint.
   */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String, nIters: Int = 2): DataFrame = {
    require(nIters >= 1 && nIters <= 4,
      s"nIters must be in [1, 4] (unnormalized scores grow geometrically), got $nIters")
    val (e, nodes) = edgeNodes(edges, srcCol, dstCol)
    var h = nodes.select(col("node"), lit(1L).as("__h"))
    var a = nodes.select(col("node"), lit(0L).as("__a"))
    for (_ <- 1 to nIters) {
      a = nodes.join(
        e.join(h.select(col("node").as("__src"), col("__h")), "__src")
          .groupBy(col("__dst").as("node")).agg(sum(col("__h")).as("__s")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0L)).as("__a"))
      h = nodes.join(
        e.join(a.select(col("node").as("__dst"), col("__a")), "__dst")
          .groupBy(col("__src").as("node")).agg(sum(col("__a")).as("__s")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0L)).as("__h"))
    }
    h.join(a, "node").select(col("node"), col("__h").as("hub"), col("__a").as("auth"))
  }

  private def edgeNodes(edges: DataFrame, srcCol: String, dstCol: String) = {
    // materialize the slim edge relation ONCE: every iteration references it
    // (and `nodes` derives from it), so an un-cut upstream — typically the
    // whole LSH kNN-graph build — would otherwise re-execute per iteration
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint()
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

  /**
   * BOUNDED K-CORE PEEL — `rounds` synchronous peeling iterations toward the
   * k-core (Seidman 1983; Matula–Beck peel, batched): each round removes
   * every node whose degree WITHIN the surviving subgraph is < `kcore`.
   * With rounds → ∞ this is exactly the k-core; a FIXED round count keeps
   * the operator oracle-checkable and is how distributed peeling actually
   * runs (each round = one degree aggregation + one semi-join — at 100 TB
   * you bound rounds and read the convergence gap, exactly the
   * [[pageRank]]/[[pageRankDelta]] stance). Deterministic: synchronous
   * removal, no ordering dependence.
   *
   * @param edges undirected edge relation (one row per edge, either
   *              orientation; both orientations are derived internally)
   * @return one row per node: (idCol, in_core 1/0 after `rounds`, deg —
   *         the node's surviving-subgraph degree, 0 when peeled)
   */
  def kCorePeel(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String, bCol: String, kcore: Int, rounds: Int): DataFrame = {
    require(kcore >= 1, s"kcore must be >= 1, got $kcore")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(edges.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      // consumed rounds+1 times (one degree join per round + the final deg
      // column) — without the cut each consumption re-runs the full edge
      // lineage plus this union+distinct (the labelPropagation/modularity
      // stance, applied here in r15)
      .localCheckpoint()
    def degreesIn(surv: DataFrame): DataFrame =
      und.join(surv.select(col("node").as("a")), "a")
        .join(surv.select(col("node").as("b")), "b")
        .groupBy(col("a")).agg(count(lit(1)).as("__deg"))
        .select(col("a").as("node"), col("__deg"))
    var surv = nodes.select(col(idCol).as("node")).distinct()
    (1 to rounds).foreach { _ =>
      surv = surv.join(degreesIn(surv), Seq("node"), "left")
        .filter(coalesce(col("__deg"), lit(0L)) >= kcore.toLong)
        .select(col("node"))
        // cut the doubling join lineage between rounds (the CC stance)
        .localCheckpoint()
    }
    nodes.select(col(idCol).as("node")).distinct()
      .join(surv.withColumn("__in", lit(1L)), Seq("node"), "left")
      .join(degreesIn(surv), Seq("node"), "left")
      .select(col("node").as(idCol),
        coalesce(col("__in"), lit(0L)).as("in_core"),
        when(col("__in").isNotNull, coalesce(col("__deg"), lit(0L)))
          .otherwise(lit(0L)).as("deg"))
  }

  /**
   * BOUNDED-ROUND LABEL PROPAGATION (Raghavan et al. 2007) — community
   * detection by majority vote, the cheap alternative to modularity
   * methods: every node starts as its own label; each synchronous round a
   * node adopts the most frequent label among its neighbors PLUS one
   * self-vote, ties broken by smallest label (the pinned-determinism
   * variant — vanilla LPA breaks ties randomly, which no oracle can hash).
   * Fixed `rounds` like [[kCorePeel]] (the bounded-rounds receipt stance);
   * each round is one edge-keyed join, one (node, label) count, one argmax
   * window — three exchanges, no quadratic anything, label frames stay one
   * Long pair per node.
   *
   * @param nodes (idCol) — isolated nodes keep their own label
   * @param edges undirected pairs (aCol, bCol)
   * @return (idCol, label)
   */
  def labelPropagation(
      nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String, bCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val nodeSet = nodes.select(col(idCol).as("__n")).distinct()
    // Restrict the vote-RECEIVING endpoint to the nodes frame: an edge
    // endpoint absent from `nodes` must not enter the label frame through a
    // neighbor vote (it would appear in the output with no self-vote that
    // round) — the contract is one row per INPUT node, for arbitrary inputs.
    // The vote-CASTING side needs no filter (labels exist only for nodes).
    val und = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .union(edges.select(col(bCol).as("__a"), col(aCol).as("__b")))
      .distinct()
      .join(nodeSet.select(col("__n").as("__a")), Seq("__a"), "leftsemi")
      .localCheckpoint() // consumed once per round
    var lab = nodeSet.withColumn("__l", col("__n"))
    (1 to rounds).foreach { _ =>
      val votes = und
        .join(lab.select(col("__n").as("__b"), col("__l")), Seq("__b"))
        .select(col("__a").as("__n"), col("__l"))
        .unionByName(lab)
        .groupBy(col("__n"), col("__l")).agg(count(lit(1)).as("__c"))
      // Argmax by (count desc, label asc) as ONE hash aggregation — min over
      // the lexicographic (−count, label) pair — instead of a window sort:
      // same winner, one less per-round sort, and partial aggregation runs
      // map-side (a window's rank never does).
      lab = votes
        .groupBy(col("__n"))
        .agg(min(struct((-col("__c")).as("__nc"), col("__l").as("__l"))).as("__m"))
        .select(col("__n"), col("__m").getField("__l").as("__l"))
        // cut the doubling join lineage between rounds (the CC stance)
        .localCheckpoint()
    }
    lab.select(col("__n").as(idCol), col("__l").as("label"))
  }

  /**
   * NEWMAN MODULARITY of a community assignment — the one-number receipt
   * for [[labelPropagation]] (and any other clustering over the same
   * graph): `Q = within/m − Σ_c vol_c²/(4m²)`, reported as `q_micro =
   * ⌊Q·10⁶⌋` with both rational terms integer-divided separately in one
   * canonical order, so the value is reduction-order-proof and
   * oracle-hashable. DECIMAL(38,0) carries the volume-squared sum (vol_c²
   * would pass BIGINT near ~10¹² edges — the overflow-discipline stance).
   *
   * Scale shape: two label joins on the edge relation, one degree count,
   * one per-community volume rollup — every frame is edges- or
   * communities-sized, nothing quadratic.
   *
   * @param edges distinct undirected pairs (aCol, bCol)
   * @param labels (nodeCol, labelCol) covering every endpoint
   * @return single row (m, n_within, q_micro)
   */
  def modularity(
      edges: DataFrame, aCol: String, bCol: String,
      labels: DataFrame, nodeCol: String, labelCol: String): DataFrame = {
    // Checkpointed: the edge relation has two consumers here (the two-sided
    // label join and the degree count) — uncut, both would re-run the edge
    // lineage (e.g. a mutual-kNN build) end to end; the same edges-sized
    // materialization stance as labelPropagation's `und`. NOTE this makes
    // modularity() EAGER at call time (localCheckpoint materializes both
    // inputs immediately, and the blocks are unrecoverable on executor
    // loss) — callers that build but never consume the result pay the full
    // upstream lineage; pass through lazily-built inputs only when the
    // result is actually read (ADVICE r14, documented stance).
    val e = edges.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .localCheckpoint()
    // Same cut for labels, which has THREE consumers (both sides of the
    // within-community join + the volume rollup) — uncut, each re-runs the
    // caller's full labeling lineage (e.g. every LPA round) per consumer.
    val lab = labels.select(col(nodeCol).as("__n"), col(labelCol).as("__l"))
      .localCheckpoint()
    val el = e
      .join(lab.select(col("__n").as("__a"), col("__l").as("__la")), Seq("__a"))
      .join(lab.select(col("__n").as("__b"), col("__l").as("__lb")), Seq("__b"))
    val mw = el.agg(count(lit(1)).as("m"),
      sum(when(col("__la") === col("__lb"), 1L).otherwise(0L)).as("n_within"))
    val deg = e.select(col("__a").as("__v"))
      .union(e.select(col("__b").as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("__d"))
    val vol = deg.join(lab.select(col("__n").as("__v"), col("__l")), Seq("__v"))
      .groupBy(col("__l")).agg(sum(col("__d")).as("__vol"))
    val s2 = vol.agg(sum(expr("CAST(__vol AS DECIMAL(38,0)) * __vol")).as("__s2"))
    mw.crossJoin(broadcast(s2))
      .select(col("m"), col("n_within"),
        (expr("CAST(CAST(n_within AS DECIMAL(38,0)) * 1000000 DIV m AS BIGINT)") -
          expr("CAST(__s2 * 1000000 DIV (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"))
          .as("q_micro"))
  }
}
