package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tHashUdf

/**
 * Deterministic, key-stable sampling and dataset splitting — the reproducible
 * alternative to seeded RNG sampling for training-data pipelines: a row's
 * bucket depends only on its key, so re-running the pipeline (or re-sharding
 * the data) never moves a document between train/val/test, and joining two
 * tables sampled on the same key keeps them aligned.
 *
 * Bucket = `tHash(key as string) mod nBuckets` — the library's deterministic
 * polynomial hash, mirrored 1:1 in oracle SQL. Note: tHash is a parity-focused
 * hash, not an avalanche hash — short sequential keys (single digits) bucket
 * with visible structure; realistic multi-character keys (ids, URLs, digests)
 * spread fine, and determinism is the contract here.
 */
object Sampling {

  /** Bucket column in [0, nBuckets) for the stringified key — floor mod
    * (`pmod`), so the contract holds even if the hash goes negative on
    * Long-overflowing inputs (very long keys). */
  def hashBucket(key: Column, nBuckets: Int = 100): Column =
    pmod(tHashUdf(key.cast("string")), lit(nBuckets.toLong)).cast("long")

  /** Keep the deterministic `keepPct`% of rows by key bucket. */
  def deterministicSample(df: DataFrame, keyCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct must be in [0,100], got $keepPct")
    df.filter(hashBucket(col(keyCol)) < keepPct)
  }

  /**
   * Key-stable train/val/test split: adds `bucket` (0-99) and `split`
   * ("train" for bucket < trainPct, "val" for the next valPct buckets,
   * "test" otherwise).
   */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"need trainPct + valPct <= 100, got $trainPct + $valPct")
    val b = hashBucket(col(keyCol))
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /**
   * LEAKAGE-SAFE train/val/test split — the fix for the classic eval bug
   * where near-identical copies of a document straddle train and test and
   * inflate every metric: the split key is the EXACT-DUPLICATE GROUP's
   * canonical id ([[Dedup.exact]]'s min-id rule), so every copy of the same
   * text deterministically lands in the same split. Compose with a
   * near-dup clustering first (feed `canonical_id` from
   * [[Dedup.canonicalize]] through [[withSplit]] directly) when fuzzy
   * copies must co-assign too — this operator gates the exact-group
   * composition.
   *
   * Plan shape: [[Dedup.exact]]'s digest-only exchange + one id-keyed join
   * back; the split itself is the same pure per-row hash bucket as
   * [[withSplit]] — no extra shuffle.
   *
   * @return df's id column + (canonical_id, bucket 0-99, split)
   */
  def splitByDuplicateGroup(
      df: DataFrame, idCol: String, textCol: String,
      trainPct: Int, valPct: Int): DataFrame = {
    val canon = Dedup.exact(df, idCol, textCol)
      .select(col(idCol), col("canonical_id"))
    withSplit(canon, "canonical_id", trainPct, valPct)
  }

  /**
   * NEAR-DUP-cluster-safe train/val/test split — [[splitByDuplicateGroup]]
   * upgraded from exact copies to fuzzy ones (r16): the split key is the
   * document's NEAR-DUP CLUSTER label (min reachable id from
   * [[graft.operators.ConnectedComponents]] over a MinHash-LSH edge
   * relation), so paraphrased/boilerplate-shifted variants of one document
   * co-assign and can never straddle train and eval. This is the
   * leakage-control bar dedup papers actually require — exact-group
   * splitting still leaks every near-identical pair the exact hash misses.
   *
   * Plan shape: the labeling is whatever clustering the caller already ran
   * (pass its output in — at 100 TB the cluster labels are a persisted
   * table, not recomputed per split); the split itself is the same pure
   * per-row hash bucket as [[withSplit]] on the label column — no extra
   * shuffle beyond the labeling.
   *
   * @param labels `(idCol, componentCol)` rows — e.g.
   *               `ConnectedComponents.run` over
   *               [[graft.operators.Dedup.minHashLshPairs]] edges
   * @return (idCol, componentCol, bucket 0-99, split)
   */
  def splitByCluster(
      labels: DataFrame, idCol: String, componentCol: String,
      trainPct: Int, valPct: Int): DataFrame =
    withSplit(labels.select(col(idCol), col(componentCol)),
      componentCol, trainPct, valPct)

  /**
   * Deterministic STRATIFIED sample: per-stratum keep percentages (e.g.
   * downsample an over-represented language while keeping all of a rare one)
   * with the same key-stable bucket rule as [[deterministicSample]] — a row
   * survives iff `hashBucket(key) < pct(stratum)`. Strata absent from the map
   * fall back to `defaultPct` (default 0 = drop, the curation-allowlist
   * stance). Pure narrow filter: no shuffle, no per-stratum window, perfectly
   * scale-free; null strata raise (a silent drop would corrupt mixture
   * ratios).
   */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      pcts: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    (defaultPct +: pcts.values.toSeq).foreach(p =>
      require(p >= 0 && p <= 100, s"percentages must be in [0,100], got $p"))
    val pctCol = coalesce(
      element_at(typedlit(pcts.map { case (k, v) => k -> v.toLong }),
        coalesce(col(strataCol),
          raise_error(lit(s"null $strataCol in stratifiedSample")))),
      lit(defaultPct.toLong))
    df.filter(hashBucket(col(keyCol)) < pctCol)
  }

  /**
   * Deterministic global shuffle order: `posOut` = the DISTINCT key's dense
   * 0-based position when keys are sorted by `(tHash(key), key)` — a
   * reproducible pseudo-random permutation (shuffle-before-sharding for
   * training order) that never changes across re-runs or re-partitioning,
   * unlike `orderBy(rand())`. The hash breaks key locality; the key itself
   * breaks hash-collision ties so the order is total. Positions are assigned
   * per DISTINCT key: with unique keys (the normal id-column case) the output
   * is a row permutation; duplicate keys share their key's position rather
   * than fanning out the join-back nondeterministically. Computed with the
   * scale-safe [[DenseRank]] (range-partition + zipWithIndex), NOT a
   * partition-less window. Compose with [[Packing.packByBudget]] on `posOut`
   * to shuffle THEN pack shards.
   */
  def withShuffleOrder(df: DataFrame, keyCol: String, posOut: String = "pos"): DataFrame = {
    val hashed = df.select(col(keyCol)).distinct()
      .select(col(keyCol), tHashUdf(col(keyCol).cast("string")).as("__shash"))
    val ids = DenseRank.appendIndex(
        hashed, Seq(col("__shash"), col(keyCol)), posOut, failOnNullCol = Some(keyCol))
      .select(col(keyCol), col(posOut))
    df.join(ids, keyCol)
  }

  /**
   * Per-source quota cap: keep at most `cap` rows of each source, chosen
   * deterministically by the key-hash shuffle order (the [[withShuffleOrder]]
   * order, restricted per source) — the curation step that bounds an
   * over-represented crawl before mixing, reproducibly.
   *
   * Scale shape: NO per-source window (a hot source would funnel its whole
   * partition through one task); per-source rank = one global [[DenseRank]]
   * over (source, hash, key) minus broadcast per-source start offsets — the
   * same technique as [[withMixtureOrder]]. Null sources raise (they would
   * otherwise be dropped silently by the start-offset join). Caller contract:
   * `keyCol` unique and non-null.
   *
   * @return (keyCol, sourceCol, rankOut) — surviving rows only (per-source
   *         0-based rank < cap); join back by key for the full frame.
   */
  def withSourceCap(
      df: DataFrame, keyCol: String, sourceCol: String, cap: Long,
      rankOut: String = "src_rank"): DataFrame = {
    require(cap > 0L, s"cap must be positive, got $cap")
    val slim = df.select(
      coalesce(col(sourceCol),
        raise_error(lit(s"null $sourceCol in withSourceCap"))).as(sourceCol),
      col(keyCol), tHashUdf(col(keyCol).cast("string")).as("__mh"))
    val g = DenseRank.appendIndex(slim,
      Seq(col(sourceCol), col("__mh"), col(keyCol)), "__g", failOnNullCol = Some(keyCol))
    val starts = g.groupBy(col(sourceCol)).agg(min(col("__g")).as("__start"))
    g.join(broadcast(starts), sourceCol)
      .withColumn(rankOut, col("__g") - col("__start"))
      .filter(col(rankOut) < cap)
      .select(col(keyCol), col(sourceCol), col(rankOut))
  }

  /**
   * Deterministic weighted interleave across sources (stride scheduling —
   * how training pipelines mix corpora at fixed ratios): the k-th row of
   * source s (1-based, in that source's [[withShuffleOrder]]-style hash
   * order) is scheduled at virtual time `k / weight(s)`, and `posOut` is the
   * row's dense position in ascending `(vtime, source, key)` order. Any
   * prefix of the order then holds each source in ≈ its weight's proportion
   * (off by at most ~1 row per source — the stride-scheduling bound), and
   * the whole order is reproducible across re-runs and re-partitioning.
   *
   * Scale shape: NO per-source window (a popular source would funnel through
   * one task); instead one global [[DenseRank]] over (source, hash, key)
   * gives per-source ranks via broadcast per-source start offsets, and a
   * second [[DenseRank]] over (vtime, source, key) gives the final position.
   * Rows whose source is null or has no weight raise an error rather than
   * silently dropping (a null source would otherwise vanish in the
   * start-offset equi-join, not just miss its weight). Caller contract:
   * `keyCol` unique and non-null.
   *
   * @return (keyCol, sourceCol, posOut) — join back by key for the full frame.
   */
  def withMixtureOrder(
      df: DataFrame, keyCol: String, sourceCol: String,
      weights: Map[String, Long], posOut: String = "pos"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0L),
      s"weights must be non-empty and positive, got $weights")
    // coalesce short-circuits: raise_error fires only on a null source — which
    // would otherwise be DROPPED by the inner start-offset join below, never
    // reaching the no-weight check
    val slim = df.select(
      coalesce(col(sourceCol),
        raise_error(lit("no weight for source: <null>"))).as(sourceCol),
      col(keyCol), tHashUdf(col(keyCol).cast("string")).as("__mh"))
    // global rank groups sources contiguously (source is the leading sort
    // col), so per-source rank = global rank - the source's min global rank
    val g = DenseRank.appendIndex(slim,
      Seq(col(sourceCol), col("__mh"), col(keyCol)), "__g", failOnNullCol = Some(keyCol))
    val starts = g.groupBy(col(sourceCol)).agg(min(col("__g")).as("__start"))
    val wCol = element_at(typedlit(weights), col(sourceCol))
    val vtimed = g.join(broadcast(starts), sourceCol)
      .select(col(keyCol), col(sourceCol),
        // coalesce: a null source would otherwise null the whole concat and
        // raise_error would fire with a null (empty) message
        when(wCol.isNull, raise_error(concat(lit("no weight for source: "),
            coalesce(col(sourceCol).cast("string"), lit("<null>")))))
          .otherwise((col("__g") - col("__start") + 1).cast("double") / wCol.cast("double"))
          .as("__vt"))
    DenseRank.appendIndex(vtimed, Seq(col("__vt"), col(sourceCol), col(keyCol)), posOut)
      .select(col(keyCol), col(sourceCol), col(posOut))
  }

  /**
   * Deterministic WEIGHTED sample without replacement — priority sampling
   * (Duffield, Lund & Thorup 2007): each row gets priority `w / u` for a
   * key-stable pseudo-uniform `u`, and the k highest-priority rows are kept,
   * so a row's inclusion probability grows with its weight while the whole
   * draw stays reproducible (same keys → same sample, across re-runs and
   * re-sharding). The quality-weighted curation pick ("keep 100k docs,
   * favoring high quality×length") without seeded-RNG drift.
   *
   * EXACT integer arithmetic end to end — no float priority whose
   * last-ulp could order differently across engines: `u` =
   * `pmod(tHash(key), 2^20) + 1`, weight quantized to milli-units, and
   * priority = `(w_milli * 2^20) div u` (BIGINT integer division on both
   * engines). Ties (possible — u has 2^20 values) break by (priority, key)
   * — fully ordered, oracle-stable.
   *
   * Scale shape: narrow projection + global `orderBy(...).limit(k)` —
   * Spark executes TakeOrderedAndProject (per-partition top-k, merge of
   * k-element heaps on the driver), NOT a full sort; nothing shuffles but
   * the per-partition winners.
   *
   * @param weightCol positive numeric; quantized to milli-units and
   *        capped at 2^42 milli (≈ 4.4e9) so the scaled dividend can't
   *        overflow Long — violations raise.
   * @return (keyCol, weightCol, priority) — the k sampled rows.
   */
  def weightedTopK(
      df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    withPriority(df, keyCol, weightCol, Nil)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
  }

  /**
   * Per-GROUP [[weightedTopK]] — the k highest-priority rows of every group
   * (the per-source curation quota: "keep the best 100k docs of each crawl,
   * quality-weighted", where [[withSourceCap]] keeps an unweighted first-k).
   * Same exact-integer priorities; ranking is `row_number` over
   * (priority desc, key) per group, so Spark plans a `WindowGroupLimit`
   * (per-partition top-k BEFORE the group exchange) — skewed giant groups
   * never materialize more than k rows per input partition.
   * @return (keyCol, weightCol, groupCol, priority) — ≤ k rows per group.
   */
  def weightedTopKByGroup(
      df: DataFrame, keyCol: String, weightCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(keyCol))
    withPriority(df, keyCol, weightCol, Seq(groupCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(keyCol), col(weightCol), col(groupCol), col("priority"))
  }

  /**
   * MIXTURE-EPOCHS planner — the repeat-factor calculation behind weighted
   * data mixtures (the Pile / DoReMi-style recipe): given per-source target
   * shares (milli, summing to 1000) and a total training budget in size
   * units, how many EPOCHS of each source does the mixture consume?
   * `epochs_milli` > 1000 means the source is upsampled (repeated), < 1000
   * downsampled — the number a pipeline owner reads before committing a
   * mixture (4-epoch upsampling of a small high-quality source is a
   * memorization risk; 0.05 epochs of a huge crawl wastes curation).
   *
   * Integer-exact end to end: needed = `target_milli * budget div 1000`,
   * `epochs_milli` = `needed * 1000 div available`. One partial-aggregating
   * groupBy over (source, size) + a broadcast join against the tiny weight
   * table — nothing else moves, at any corpus size.
   *
   * @param weightsMilli target share per source, must sum to 1000
   * @param budget       total mixture size in `sizeCol` units
   * @return (sourceCol, available, target_milli, epochs_milli) — one row per
   *         weighted source present in `df` with non-zero available size.
   */
  def mixtureEpochs(
      df: DataFrame, sourceCol: String, sizeCol: String,
      weightsMilli: Map[String, Long], budget: Long): DataFrame = {
    require(budget > 0L, s"budget must be positive, got $budget")
    require(weightsMilli.nonEmpty && weightsMilli.values.sum == 1000L,
      s"target shares must sum to 1000 milli, got ${weightsMilli.values.sum}")
    require(weightsMilli.values.forall(_ > 0L), "every target share must be positive")
    val s = df.sparkSession
    import s.implicits._
    val w = weightsMilli.toSeq.toDF(sourceCol, "target_milli")
    df.groupBy(col(sourceCol)).agg(sum(col(sizeCol)).cast("long").as("available"))
      .filter(col("available") > 0L)
      .join(broadcast(w), Seq(sourceCol))
      .select(col(sourceCol), col("available"), col("target_milli"),
        expr(s"((target_milli * ${budget}L) DIV 1000L) * 1000L DIV available")
          .as("epochs_milli"))
  }

  /**
   * TEMPERATURE-SCALED MIXTURE SHARES — the multilingual/multi-source
   * rebalancing rule (per-source sampling probability ∝ n^τ, τ < 1 upweights
   * small sources; Conneau & Lample 2019, the mBERT/XLM-R recipe). Integer-
   * exact by construction: τ is restricted to {0.25, 0.5, 1.0} (`tauMilli` ∈
   * {250, 500, 1000}), where n^0.5 = floor(sqrt(n)) and n^0.25 =
   * floor(sqrt(floor(sqrt(n)))) — floor(√·) of a BIGINT is bit-identical in
   * any IEEE engine (exact for n < 2^52, and source counts are far smaller),
   * so shares and quotas hash-match a SQL oracle with no float tolerance.
   * A general float τ would hinge on cross-engine `pow` ULPs — rejected for
   * the gated surface, documented here.
   *
   * Scale shape: one groupBy(source) count (map-side combined) over the
   * corpus, then arithmetic on the tiny per-source relation against a
   * broadcast 1-row weight total. Nothing leaves the executors but
   * per-source counts.
   *
   * @param budget total documents wanted in the mixture epoch
   * @return (sourceCol, available, w, share_micro, quota): `w` = n^τ,
   *         share_micro = w·10⁶ DIV Σw, quota = w·budget DIV Σw.
   */
  def temperatureShares(
      df: DataFrame, sourceCol: String, budget: Long, tauMilli: Int = 500): DataFrame = {
    require(budget > 0L, s"budget must be positive, got $budget")
    require(Set(250, 500, 1000).contains(tauMilli),
      s"tauMilli must be one of 250/500/1000 (integer-exact n^tau), got $tauMilli")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("available"))
    val w = tauMilli match {
      case 1000 => col("available")
      case 500  => floor(sqrt(col("available").cast("double"))).cast("long")
      case 250  => floor(sqrt(floor(sqrt(col("available").cast("double"))))).cast("long")
    }
    val weighted = counts.select(col(sourceCol), col("available"), w.as("w"))
    val total = weighted.agg(sum(col("w")).as("__tw"))
    weighted.crossJoin(broadcast(total))
      .select(col(sourceCol), col("available"), col("w"),
        expr("(w * 1000000L) DIV __tw").as("share_micro"),
        expr(s"(w * ${budget}L) DIV __tw").as("quota"))
  }

  /** The shared integer-exact priority stage of [[weightedTopK]] /
    * [[weightedTopKByGroup]]: (keyCol, weightCol, extraCols..., priority). */
  private def withPriority(
      df: DataFrame, keyCol: String, weightCol: String,
      extraCols: Seq[String]): DataFrame = {
    val wMilli = round(col(weightCol).cast("double") * 1000.0).cast("long")
    val guarded = when(col(weightCol).isNull || wMilli <= 0L ||
        wMilli > (1L << 42),
        raise_error(concat(lit(s"weightedTopK: $weightCol must be in (0, 2^42 milli], got "),
          coalesce(col(weightCol).cast("string"), lit("null")))))
      .otherwise(wMilli)
    val u = pmod(tHashUdf(col(keyCol).cast("string")), lit(1048576L)) + lit(1L)
    val keep = Seq(col(keyCol), col(weightCol)) ++ extraCols.map(col)
    df.select(keep ++ Seq(u.as("__u"), guarded.as("__wg")): _*)
      .select(keep :+ expr("(__wg * 1048576) DIV __u").as("priority"): _*)
  }

  /** Poisson(λ=1) CDF thresholds scaled to 2³² — PINNED integer constants
    * (floor(cdf(k)·2³²) for k = 0..5), shared verbatim with the SQL oracle so
    * the draw is pure integer comparison on both engines. */
  val PoissonCdf32: Seq[Long] =
    Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L, 4292415291L)

  /**
   * DETERMINISTIC POISSON BOOTSTRAP replicate summary — the standard
   * error-bar machinery for corpus metrics at scale (Chamandy et al.,
   * "Estimating Uncertainty for Massive Data Streams", the map-reduce
   * bootstrap): each document appears in replicate r a Poisson(1)-distributed
   * number of times, with the draw a PURE FUNCTION of (key, replicate) —
   * `tHash(key:r) mod 2³²` against pinned CDF thresholds (capped at 6) — so
   * replicates are reproducible across runs, shards, and engines, and a
   * metric's spread across replicates estimates its sampling variance
   * without ever materializing resampled corpora.
   *
   * Scale shape: one narrow pass emits nReplicates rows per doc (counts
   * only), one groupBy(replicate) reduces — no shuffle carries text.
   *
   * @return one row per replicate: (replicate, n_docs source rows,
   *         n_drawn Σ multiplicity, n_unique docs with multiplicity ≥ 1)
   */
  /** The Poisson(1) multiplicity of (key, replicate) — tHash is
    * parity-focused (short keys yield small sums that would never cross the
    * first CDF threshold), so the hash is re-mixed through the SimHash
    * spreader (2654435761 · (h mod 65521)) mod 2³², intermediates < 2⁶³ on
    * any engine — then compared against [[PoissonCdf32]]. */
  private def poissonDraw(keyCol: String): org.apache.spark.sql.Column = {
    val t = PoissonCdf32
    val u = pmod(pmod(tHashUdf(concat(col(keyCol).cast("string"), lit(":"),
      col("replicate").cast("string"))), lit(65521L)) * lit(2654435761L),
      lit(4294967296L))
    when(u < t(0), 0L).when(u < t(1), 1L).when(u < t(2), 2L)
      .when(u < t(3), 3L).when(u < t(4), 4L).when(u < t(5), 5L).otherwise(6L)
  }

  /** Row-level face of [[bootstrapCounts]]: the actual resample MANIFEST of
    * one replicate — every doc drawn at least once, with its multiplicity
    * (feed to a generator that repeats rows m times). Same pinned draw.
    * @return (keyCol, multiplicity ≥ 1) */
  def bootstrapDraws(df: DataFrame, keyCol: String, replicate: Int): DataFrame = {
    require(replicate >= 0, s"replicate must be >= 0, got $replicate")
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol), lit(replicate.toLong).as("replicate"))
      .select(col(keyCol), poissonDraw(keyCol).as("multiplicity"))
      .filter(col("multiplicity") > 0L)
  }

  def bootstrapCounts(
      df: DataFrame, keyCol: String, nReplicates: Int = 8): DataFrame = {
    require(nReplicates > 0, s"nReplicates must be positive, got $nReplicates")
    val draw = poissonDraw(keyCol)
    df.filter(col(keyCol).isNotNull)
      .select(col(keyCol),
        explode(sequence(lit(0L), lit(nReplicates - 1L))).as("replicate"))
      .select(col("replicate"), draw.as("__c"))
      .groupBy(col("replicate"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__c")).as("n_drawn"),
        sum(when(col("__c") > 0L, 1L).otherwise(0L)).as("n_unique"))
  }

  /**
   * CAPPED MIXTURE QUOTA with one redistribution round — proportional
   * allocation with a per-source ceiling, the knob that stops one giant
   * crawl from eating the whole token budget: raw_i = w_i·budget DIV Σw
   * (w = the per-source `weightCol` sum, e.g. chars); sources over `cap`
   * are clamped and their overflow is re-shared among the UNCAPPED sources
   * in proportion to their raw quota, then clamped once more. ONE
   * redistribution round by design (exact waterfilling needs a loop whose
   * depth is data-dependent; one round is deterministic, SQL-mirrorable,
   * and in practice within one cap of the fixpoint) — totals can undershoot
   * `budget` by flooring plus any second-round overflow; they never exceed
   * it. All arithmetic BIGINT.
   *
   * Scale shape: one groupBy(source) sum, two 1-row broadcast totals,
   * arithmetic on the per-source relation. Nothing corpus-sized moves.
   *
   * @return (sourceCol, w weight sum, raw_quota, quota)
   */
  def cappedQuota(
      df: DataFrame, sourceCol: String, weightCol: String,
      budget: Long, cap: Long): DataFrame = {
    require(budget > 0L, s"budget must be positive, got $budget")
    require(cap > 0L, s"cap must be positive, got $cap")
    val counts = df.filter(col(sourceCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(sum(col(weightCol).cast("long")).as("w"))
    val tot = counts.agg(sum(col("w")).as("__T"))
    val raw = counts.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("w"),
        // DECIMAL(38,0) intermediate: w is a corpus-wide char sum, so
        // w·budget overflows BIGINT at large scale; IntegralDivide on
        // decimals still returns BIGINT.
        expr(s"CAST(w AS DECIMAL(38,0)) * ${budget}L DIV __T").as("raw_quota"))
    val spill = raw.agg(
      sum(expr(s"CASE WHEN raw_quota > ${cap}L THEN raw_quota - ${cap}L ELSE 0L END"))
        .as("__L"),
      sum(expr(s"CASE WHEN raw_quota <= ${cap}L THEN raw_quota ELSE 0L END"))
        .as("__SR"))
    raw.crossJoin(broadcast(spill))
      .select(col(sourceCol), col("w"), col("raw_quota"),
        expr(s"""least(${cap}L, CASE WHEN raw_quota > ${cap}L THEN ${cap}L
                 ELSE raw_quota + CASE WHEN __SR > 0L
                      THEN CAST(__L AS DECIMAL(38,0)) * raw_quota DIV __SR
                      ELSE 0L END END)""").as("quota"))
  }

  /**
   * QUOTA FILL — the enforcement half of [[cappedQuota]]: per source, docs
   * are taken in (weight desc, id asc) order while the RUNNING weight sum
   * stays within the source's quota — greedy budget filling, the step that
   * turns a mixture plan into an actual document selection. Deterministic
   * (the order is total), one doc-windowed cumulative sum per source + the
   * tiny quota join; nothing corpus-global.
   *
   * @return selected docs only: (idCol, sourceCol, weightCol, cum_w, quota)
   */
  def quotaFill(
      df: DataFrame, idCol: String, sourceCol: String, weightCol: String,
      budget: Long, cap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quotas = cappedQuota(df, sourceCol, weightCol, budget, cap)
      .select(col(sourceCol), col("quota"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col(weightCol).desc, col(idCol).asc)
    df.filter(col(sourceCol).isNotNull && col(weightCol).isNotNull)
      .select(col(idCol), col(sourceCol), col(weightCol).cast("long").as(weightCol))
      .withColumn("cum_w", sum(col(weightCol)).over(w))
      .join(quotas, sourceCol)
      .filter(col("cum_w") <= col("quota"))
      .select(col(idCol), col(sourceCol), col(weightCol), col("cum_w"), col("quota"))
  }
}
