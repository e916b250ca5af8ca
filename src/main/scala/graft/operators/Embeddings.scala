package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding-column utilities for large-scale training-data pipelines.
 *
 * Everything is exact double arithmetic in a fixed operation order, so each
 * operator has a 1:1 DuckDB oracle (see SparkEntry):
 *
 *  - [[quantizeInt8]] — symmetric int8 quantization: per-vector
 *    `scale = max|v_i| / 127`, `q_i = floor(v_i/scale + 0.5)` (floor(x+0.5)
 *    instead of a round() builtin so both engines take the identical branch
 *    on .5 boundaries). Shrinks a 100 TB float corpus 4× for ANN candidate
 *    generation while keeping a per-vector dequantization scale.
 *  - [[l2NormalizeCol]] — v / ‖v‖₂ as array<double> (zero vectors → null),
 *    the usual pre-cosine normalization so downstream dot products ARE
 *    cosines.
 */
object Embeddings {

  /** @return (scale: Double, q: Array[Int]); zero/null vectors → scale 0, q all 0. */
  def quantizeInt8Vec(v: Seq[Float]): (Double, Seq[Int]) = {
    if (v == null || v.isEmpty) return (0.0, Seq.empty)
    var maxAbs = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    if (scale == 0.0) (0.0, Seq.fill(v.length)(0))
    else {
      val q = new Array[Int](v.length)
      var j = 0
      while (j < v.length) {
        q(j) = math.floor(v(j).toDouble / scale + 0.5).toInt
        j += 1
      }
      (scale, q.toSeq)
    }
  }

  val quantizeInt8Udf = udf((v: Seq[Float]) => quantizeInt8Vec(v))

  /** (idCol, scale, q) — int8-quantized embedding relation. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), quantizeInt8Udf(col(vecCol)).as("__q"))
      .select(col(idCol), col("__q._1").as("scale"), col("__q._2").as("q"))

  val l2NormalizeUdf = udf { (v: Seq[Float]) =>
    if (v == null || v.isEmpty) None
    else {
      var n = 0.0
      var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      if (n == 0.0) None
      else {
        val nrm = math.sqrt(n)
        Some(v.map(x => x.toDouble / nrm))
      }
    }
  }

  def l2NormalizeCol(vec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    l2NormalizeUdf(vec)

  /**
   * Matryoshka-style truncation (Kusupati et al. 2022 MRL): keep the first
   * `d` dimensions and re-L2-normalize, so downstream dot products over the
   * truncated vectors are again cosines. With MRL-trained embeddings this is
   * the standard storage/recall dial — index the 64-dim prefix, re-rank on
   * the full vector (compose with [[graft.operators.SimSearch.topKPqRerank]]'s
   * refine pattern). Pure per-row arithmetic, zero shuffles; truncated
   * all-zero prefixes (and null / short vectors' missing tail) follow
   * [[l2NormalizeCol]]'s null contract.
   *
   * @return (idCol, vec_trunc: array<double> L2-normalized prefix)
   */
  def truncate(df: DataFrame, idCol: String, vecCol: String, d: Int): DataFrame = {
    require(d > 0, s"d must be positive, got $d")
    df.select(col(idCol),
      l2NormalizeCol(slice(col(vecCol), 1, d)).as("vec_trunc"))
  }

  /**
   * SIGNED-RANDOM-PROJECTION dimensionality reduction (Achlioptas 2003
   * database-friendly Johnson–Lindenstrauss: projection entries ∈ {−1, +1}
   * preserve pairwise distances in expectation) — the cheap front-end for
   * clustering / visualization / coarse ANN over a 100 TB embedding corpus
   * where a float matrix multiply per row is still too much.
   *
   * Integer-exact by construction so it hash-matches a SQL oracle: inputs are
   * first quantized to micro-units `q_i = floor(v_i·10⁶ + 0.5)` (the
   * [[quantizeInt8]] half-up idiom — both engines branch identically on .5),
   * the sign of cell (j, i) is the parity of the same splitmix-style integer
   * mix the LSH planes use (`((j·8191 + i)·2654435761) mod 1000003`), and the
   * output is the exact BIGINT sum Σᵢ sign(j,i)·qᵢ — no float reduction
   * anywhere, so reduction order cannot matter.
   *
   * Scale shape: pure per-row codegen'd higher-order functions (transform /
   * aggregate over the array column) — no UDF boxing, no shuffle, no state;
   * the projection "matrix" is the hash formula, so nothing is broadcast.
   *
   * @param outDims projected dimensionality k (each output row carries k dims)
   * @return (idCol, proj: array<long>) — micro-unit projections; null/empty
   *         vectors → null.
   */
  def projectSrp(df: DataFrame, idCol: String, vecCol: String, outDims: Int): DataFrame = {
    require(outDims > 0, s"outDims must be positive, got $outDims")
    val proj = expr(
      s"""transform(sequence(0, ${outDims - 1}), j ->
         |  aggregate(sequence(0, size($vecCol) - 1), 0L, (acc, i) ->
         |    acc + (CASE WHEN ((CAST(j AS BIGINT) * 8191 + i) * 2654435761L) % 1000003 % 2 = 0
         |                THEN 1L ELSE -1L END)
         |          * CAST(floor(CAST($vecCol[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)))
         |""".stripMargin)
    df.select(col(idCol),
      when(col(vecCol).isNull || size(col(vecCol)) === 0, lit(null))
        .otherwise(proj).as("proj"))
  }

  /**
   * Z-ORDER (Morton) layout key over the first `dims` embedding dimensions:
   * per-dim min–max quantization to `bits` bits, then bit interleave — rows
   * close in embedding space get close keys, so `repartitionByRange(zkey)` +
   * `sortWithinPartitions(zkey)` + parquet write CO-LOCATES similar vectors
   * (the Delta/Iceberg OPTIMIZE ZORDER layout move, here first-class). At
   * 100 TB this is the data-layout lever behind every scan-heavy ANN /
   * near-dup pass: candidate generation over a z-ordered corpus touches a
   * contiguous key range instead of the whole table, and min/max parquet
   * row-group stats on zkey actually prune.
   *
   * Determinism: the per-dim extremes are one global aggregate joined back by
   * broadcast; `(x−mn)/(mx−mn)·(2^bits−1)` is three correctly-rounded IEEE
   * ops in a fixed order, floored then clamped — bit-identical in any IEEE
   * engine (the [[graft.operators.CorpusStats.sourceKlDivergence]] posture);
   * everything after is BIGINT bit algebra. Vectors shorter than `dims` are
   * excluded (mirrored by the oracle); a constant dimension (mx = mn)
   * quantizes to 0.
   *
   * @param dims leading dimensions to interleave (dims·bits ≤ 62)
   * @param bits bits per dimension
   * @return (idCol, zkey: BIGINT)
   */
  /**
   * Dominant principal DIRECTION of the embedding space by integer-exact
   * POWER ITERATION — the one-vector PCA read a pipeline uses for drift
   * detection ("did the embedding space rotate between snapshots"),
   * anisotropy diagnosis, and common-direction debiasing (the
   * all-but-the-top-component trick):
   *
   *  1. the co-moment matrix `C[i][j] = Σ_rows q(x_i)·q(x_j)` is ONE
   *     distributed aggregation over the per-row dimension pairs, with each
   *     product quantized to an exact BIGINT before the sum (`floor(x_i·x_j·
   *     10⁶ + 0.5)`) — reduction-order-proof, d² ≤ 4096 output cells;
   *  2. `nIters` power steps run on that d²-cell relation: `v ← C·v`,
   *     renormalized each step to max|v| = 10⁶ by integer division — every
   *     iterate is a BIGINT vector, so the whole chain is bit-identical in
   *     SQL (unrolled CTEs, the Lloyd-chain stance).
   *
   * The all-ones start vector has positive overlap with the dominant
   * eigenvector of the PSD co-moment matrix for the common
   * nonnegative-mean case, and the fixed start makes the sign convention
   * deterministic either way. Null/short vectors are skipped (the
   * [[zorderKey]] eligibility stance). Convergence: the usual power-method
   * ratio — at these dims more iterations cost one 4096-row join each.
   *
   * @return (dim 0..d-1, v_micro) — the direction scaled to max|v| = 10⁶
   */
  def powerIteration(
      df: DataFrame, vecCol: String, dims: Int, nIters: Int = 3): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(nIters >= 1, s"nIters must be >= 1, got $nIters")
    toDimFrame(df.sparkSession,
      powerLoopLocal(coMomentCells(df, vecCol, dims), dims, nIters), "v_micro")
  }

  /** The quantized mean co-moment matrix (__i, __j, __c) of
    * [[powerIteration]] step 1, COLLECTED to the driver: ONE distributed
    * aggregation over the corpus reduces it to ≤ dims² ≤ 4096 BIGINT cells —
    * a collect bounded by `dims`, never by corpus size (the
    * [[removeTopComponent]] direction-collect posture). The r16 shape
    * localCheckpointed this relation and ran the power loop as `nIters`
    * distributed join+agg rounds over 256 rows — ~84 Exchange nodes and
    * ~0.4 s of pure stage scheduling per round for arithmetic a driver does
    * in microseconds (guide §1.2: fix the distributed algorithm first; §5:
    * the driver should do no DATA work — d² cells is not data work). */
  private def coMomentCells(
      df: DataFrame, vecCol: String, dims: Int): Array[(Int, Int, Long)] =
    df.where(col(vecCol).isNotNull && size(col(vecCol)) >= dims)
      .select(posexplode(expr(s"slice($vecCol, 1, $dims)")).as(Seq("__i", "__xi")),
        col(vecCol).as("__v"))
      .select(col("__i"), posexplode(expr(s"slice(__v, 1, $dims)")).as(Seq("__j", "__xj")),
        col("__xi"))
      .groupBy(col("__i"), col("__j"))
      .agg(sum(floor(col("__xi").cast("double") * col("__xj").cast("double")
        * lit(1000000.0) + lit(0.5)).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      // normalize to the MEAN co-moment (same eigenvectors, and cell
      // magnitudes stay ~10⁶ at ANY corpus size so the per-step products
      // below cannot overflow a Long at 100 TB)
      .select(col("__i"), col("__j"), expr("__s div __n").as("__c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))

  /** The integer power loop of [[powerIteration]] step 2, driver-side over
    * the collected (i, j, c) cells; returns j -> v_j at max|v| = 10⁶.
    * BIT-IDENTICAL to the former distributed loop: `c * v_j / 1e6` and
    * `m * 1e6 / mx` are Long ops truncating toward zero exactly like SQL
    * `div`, and the per-row sums are exact integers, so reduction order
    * cannot matter. Key-set semantics mirror the former inner joins: after
    * one step the live keys are the distinct __i of cm (empty corpus →
    * empty result, as before). */
  private def powerLoopLocal(
      cm: Array[(Int, Int, Long)], dims: Int, nIters: Int): Map[Int, Long] = {
    var v: Map[Int, Long] = (0 until dims).map(j => j -> 1000000L).toMap
    for (_ <- 1 to nIters) {
      val mv = scala.collection.mutable.LinkedHashMap[Int, Long]()
      cm.foreach { case (i, j, c) =>
        v.get(j).foreach { vj => mv(i) = mv.getOrElse(i, 0L) + c * vj / 1000000L }
      }
      var mx = 1L
      mv.valuesIterator.foreach { m => val a = math.abs(m); if (a > mx) mx = a }
      val next = mv.map { case (i, m) => i -> m * 1000000L / mx }
      v = next.toMap
    }
    v
  }

  /** Materialize a driver-computed direction as the (dim, <valueCol>)
    * result frame — dims² is bounded, so the frame is a handful of rows. */
  private def toDimFrame(
      spark: org.apache.spark.sql.SparkSession, v: Map[Int, Long],
      valueCol: String): DataFrame = {
    import spark.implicits._
    v.toSeq.sortBy(_._1).map { case (j, vj) => (j.toLong, vj) }
      .toDF("dim", valueCol)
  }

  /**
   * SECOND PRINCIPAL DIRECTION by HOTELLING DEFLATION — the next PCA read
   * after [[powerIteration]]'s top component (2-D drift maps, the second
   * debias direction of all-but-the-top variants): with the dominant
   * direction `u` and its Rayleigh quotient `λ = uᵀCu/uᵀu`, the deflated
   * matrix `C' = C − λ·uuᵀ/(uᵀu)` has u's eigenvalue removed, and the same
   * integer power loop on C' converges to the runner-up direction.
   *
   * Every deflation quantity stays in the micro-unit BIGINT discipline
   * (per-term `div 10⁶` before each sum, one canonical operation order), so
   * the whole chain — co-moment, first loop, deflation, second loop — is
   * bit-identical in the unrolled-CTE oracle, like every other iterative
   * receipt in the library. Magnitude audit at d ≤ 64: cells ~10⁶, u ~10⁶,
   * `Cu` ~ d·10⁶, λ_micro ~ 10⁷ — every product ≤ ~10¹⁴, far under Long.
   *
   * @return (dim 0..d-1, v2_micro) — second direction, max|v| = 10⁶ scale
   */
  def secondComponent(
      df: DataFrame, vecCol: String, dims: Int, nIters: Int = 3): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(nIters >= 1, s"nIters must be >= 1, got $nIters")
    // Deflation runs driver-side over the same ≤ dims² collected cells as
    // [[powerIteration]] — every quantity below is the exact integer op
    // sequence of the former distributed frames (Long `/` ≡ SQL `div`;
    // inner-join key semantics preserved via Map.get), so the result is
    // bit-identical while the job count drops from ~2·nIters+4 join+agg
    // rounds to the ONE co-moment aggregation.
    val cm = coMomentCells(df, vecCol, dims)
    val u = powerLoopLocal(cm, dims, nIters)
    var uD = 0L
    u.valuesIterator.foreach { vj => uD += vj * vj / 1000000L }
    val cu = scala.collection.mutable.LinkedHashMap[Int, Long]()
    cm.foreach { case (i, j, c) =>
      u.get(j).foreach { vj => cu(i) = cu.getOrElse(i, 0L) + c * vj / 1000000L }
    }
    var uN = 0L
    cu.foreach { case (i, cui) => u.get(i).foreach { ui => uN += ui * cui / 1000000L } }
    val lam = uN * 1000000L / uD
    val cm2 = cm.flatMap { case (i, j, c) =>
      for (ui <- u.get(i); uj <- u.get(j))
        yield (i, j, c - ((lam * ui / 1000000L) * uj / uD))
    }
    toDimFrame(df.sparkSession, powerLoopLocal(cm2, dims, nIters), "v2_micro")
  }

  /**
   * EMBEDDING-SPACE DRIFT RECEIPT — cosine between the dominant directions
   * of two corpus slices (crawl snapshots, sources, halves): one
   * [[powerIteration]] per side, then a single canonical-double cosine of
   * the two micro vectors. "Did the space rotate between snapshots" as one
   * number — cos near ±10⁶ means the principal axis held (sign is a
   * start-vector convention, so |cos| is the signal); a drop means the
   * encoder or the content changed and every downstream ANN/SemDeDup
   * centroid is stale. Complements the scalar [[graft.operators
   * .CorpusStats]] drift family (PSI/KS) with a geometry read.
   *
   * @return single row (cos_micro, dot_micro, na_micro, nb_micro) — all
   *         integer; cos_micro = ⌊cos·10⁶⌋ on one canonical double path
   */
  def directionDrift(
      a: DataFrame, b: DataFrame, vecCol: String,
      dims: Int, nIters: Int = 3): DataFrame = {
    // Both directions are driver-local maps now (see [[powerIteration]]);
    // the cosine is the same ≤ dims-term integer fold + one canonical double
    // chain, so the single-row result frame is built from literals — the two
    // corpus-sized co-moment aggregations are the only jobs left.
    val ua = powerLoopLocal(coMomentCells(a, vecCol, dims), dims, nIters)
    val ub = powerLoopLocal(coMomentCells(b, vecCol, dims), dims, nIters)
    val common = ua.keySet.intersect(ub.keySet).toSeq.sorted
    val spark = a.sparkSession
    import spark.implicits._
    if (common.isEmpty) {
      // former shape: inner join empty -> global agg emits one all-null row
      Seq(Tuple4(Option.empty[Long], Option.empty[Long],
        Option.empty[Long], Option.empty[Long]))
        .toDF("cos_micro", "dot_micro", "na_micro", "nb_micro")
    } else {
      var dot = 0L; var na = 0L; var nb = 0L
      common.foreach { d =>
        val x = ua(d); val y = ub(d)
        dot += x * y / 1000000L; na += x * x / 1000000L; nb += y * y / 1000000L
      }
      val cosD = math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
        * 1000000.0)
      // mirror the former ANSI CAST(double AS BIGINT): NaN / out-of-range is
      // an error, not a silent 0 (degenerate all-zero direction on one side)
      if (cosD.isNaN || cosD < Long.MinValue.toDouble || cosD > Long.MaxValue.toDouble)
        throw new ArithmeticException(s"cos_micro cast overflow: $cosD")
      Seq((cosD.toLong, dot, na, nb)).toDF("cos_micro", "dot_micro", "na_micro", "nb_micro")
    }
  }

  /**
   * Common-direction DEBIAS — the standard all-but-the-top-component move
   * (Mu & Viswanath 2018 / SIF postprocessing): compute the dominant
   * principal direction with [[powerIteration]] and subtract each vector's
   * projection onto it, `x' = x − (x·û/|û|²)·û`. Anisotropic embedding
   * spaces concentrate mass on one direction that encodes frequency, not
   * meaning; removing it measurably improves cosine retrieval.
   *
   * The direction is d numbers — collected driver-side (bounded by dim,
   * never by corpus) and baked into the projection expression as literals,
   * so the debias pass itself is a pure per-row map: zero shuffles over
   * the corpus. Double arithmetic is d-ascending folds of exact micro-unit
   * literals — the same IEEE sequence in Scala, Spark codegen, and the
   * oracle's list folds, so residuals round-trip bit-identically.
   *
   * @return (idCol, dim 0..dims-1, resid rounded to 6) — exploded residual
   *         coordinates of the first `dims` dimensions
   */
  def removeTopComponent(
      df: DataFrame, idCol: String, vecCol: String,
      dims: Int, nIters: Int = 3): DataFrame = {
    val u = powerLoopLocal(coMomentCells(df, vecCol, dims), dims, nIters)
    val uv: Array[Double] = (0 until dims).map(d => u(d) / 1000000.0).toArray
    var nu2 = 0.0
    var d = 0
    while (d < dims) { nu2 += uv(d) * uv(d); d += 1 } // ascending, engine-identical
    require(nu2 > 0.0, "degenerate zero direction")
    val uArr = array(uv.map(x => lit(x)): _*)
    df.where(col(vecCol).isNotNull && size(col(vecCol)) >= dims)
      .select(col(idCol), expr(s"slice($vecCol, 1, $dims)").as("__x"))
      .withColumn("__u", uArr)
      .withColumn("__dot", expr(
        "aggregate(zip_with(__x, __u, (a, b) -> CAST(a AS DOUBLE) * b), 0D, (acc, v) -> acc + v)"))
      .select(col(idCol), posexplode(expr(
        s"zip_with(__x, __u, (a, b) -> round(CAST(a AS DOUBLE) - (__dot / ${nu2}D) * b, 6))"))
        .as(Seq("dim", "resid")))
      .select(col(idCol), col("dim").cast("long").as("dim"), col("resid"))
  }

  def zorderKey(df: DataFrame, idCol: String, vecCol: String,
      dims: Int = 4, bits: Int = 8): DataFrame = {
    require(dims >= 1 && bits >= 1 && dims * bits <= 62,
      s"need 1 <= dims, 1 <= bits, dims*bits <= 62; got dims=$dims bits=$bits")
    val maxQ = (1L << bits) - 1
    val base = df.where(col(vecCol).isNotNull && size(col(vecCol)) >= dims)
      .select(col(idCol) +: (0 until dims).map(d =>
        col(vecCol).getItem(d).cast("double").as(s"__x$d")): _*)
    val extCols = (0 until dims).flatMap(d => Seq(
      min(col(s"__x$d")).as(s"__mn$d"), max(col(s"__x$d")).as(s"__mx$d")))
    val ext = base.agg(extCols.head, extCols.tail: _*)
    val q = base.crossJoin(broadcast(ext)).select(
      col(idCol) +: (0 until dims).map { d =>
        val ratio = (col(s"__x$d") - col(s"__mn$d")) /
          (col(s"__mx$d") - col(s"__mn$d")) * lit(maxQ.toDouble)
        when(col(s"__mx$d") === col(s"__mn$d"), lit(0L))
          .otherwise(least(greatest(floor(ratio).cast("long"), lit(0L)), lit(maxQ)))
          .as(s"__q$d")
      }: _*)
    val zkey = (for { b <- 0 until bits; d <- 0 until dims } yield
        shiftleft(shiftright(col(s"__q$d"), b).bitwiseAND(lit(1L)), b * dims + d))
      .reduce(_ + _)
    q.select(col(idCol), zkey.cast("long").as("zkey"))
  }
}
