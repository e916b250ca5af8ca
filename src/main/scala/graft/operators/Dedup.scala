package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Document deduplication operators for large-scale training-data pipelines:
 *
 *  - [[exact]]            — exact dedup by content hash (one shuffle on the hash).
 *  - [[jaccardPairs]]     — near-dup pairs by n-gram (3-word shingle) Jaccard,
 *                           token-inverted-index join (NO cross join: only docs
 *                           sharing a shingle are candidates).
 *  - [[minHashLshPairs]]  — the 100 TB path: MinHash signatures + LSH banding to
 *                           generate candidates, then exact Jaccard verification.
 *                           Candidate generation touches each doc once; the
 *                           quadratic step runs only inside LSH buckets.
 *  - [[simHashFingerprints]] / [[simHashPairs]] — 64-bit SimHash (two 32-bit
 *                           halves), near-dup = Hamming distance ≤ maxHamming;
 *                           candidates via banding (pigeonhole-exact for
 *                           maxHamming < nBands; 8- or 16-bit bands).
 *  - [[embeddingPairs]]   — embedding-cosine near-dup pairs (brute force; see
 *                           [[SimSearch]] for the bucketed scale path).
 *
 * All scoring formulas use exact integer arithmetic or fixed-order double
 * arithmetic so every operator has a 1:1 DuckDB oracle (see SparkEntry).
 * The reference library has no dedup surface (its `strategy="dedup"` analogue in
 * [[SimJoin]] is a physical optimization); these extend it per the build brief.
 */
object Dedup {

  /** Distinct (id, shingle) relation over 3-word shingles of `textCol`
    * (single-pass tokenizer — see [[graft.functions.TextFunctions.shingles3Array]]). */
  def shingleRelation(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      explode(shinglesUdf(col(textCol))).as("__sh"))

  /**
   * Per-document novelty score — the fraction of a doc's distinct 3-word
   * shingles that FIRST occur in this doc (first = smallest id over the
   * corpus). The standard duplication diagnostic for ordered corpora
   * (crawl snapshots, date-sorted dumps): novelty 1.0 = all-new content,
   * near 0 = the doc is assembled from already-seen text. The id order is
   * the "seen before" order, matching [[exact]]'s min-id canonical
   * convention.
   *
   * Plan shape: the [[shingleRelation]] inverted index is aggregated to a
   * per-shingle first-occurrence (ONE exchange on the shingle), joined back
   * to the same relation co-partitioned on the shingle (the exchange is
   * reused, not repeated), then reduced per doc (one exchange on the id,
   * partial-aggregated map-side). No pair join anywhere — cost is linear in
   * total shingle count, exactly like the substring-dedup aggregate. Docs
   * with fewer than 3 words (or null text) have no shingles and are absent
   * from the output.
   *
   * @return (idCol, n_shingles, n_novel, novelty rounded to 6)
   */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingleRelation(df, idCol, textCol)
    val first = sh.groupBy(col("__sh")).agg(min(col("__id")).as("__first"))
    sh.join(first, Seq("__sh"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__id") === col("__first"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("__id").as(idCol), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6).as("novelty"))
  }

  /**
   * Per-document boilerplate score — the fraction of a doc's distinct
   * 3-word shingles that occur in at least `minDocs` documents corpus-wide
   * (distinct-doc frequency, so within-doc repeats don't count). High score
   * = the doc is mostly template/navigation text shared across the corpus —
   * the C4/CCNet boilerplate signal, here as a scored diagnostic rather
   * than a hard filter; feed it to [[graft.operators.CorpusStats]]'s
   * percentile filters to pick a data-driven cutoff.
   *
   * Plan shape: identical to [[noveltyScores]] — per-shingle distinct-doc
   * count (ONE exchange on the shingle, map-side partial counts), join back
   * co-partitioned, per-doc reduce. Linear in total shingle count, no pair
   * join. Docs with no shingles are absent.
   *
   * @return (idCol, n_shingles, n_common, boilerplate rounded to 6)
   */
  def boilerplateScores(
      df: DataFrame, idCol: String, textCol: String, minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val sh = shingleRelation(df, idCol, textCol)
    val freq = sh.groupBy(col("__sh")).agg(count(lit(1)).as("__df"))
    sh.join(freq, Seq("__sh"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("n_common"))
      .select(col("__id").as(idCol), col("n_shingles"), col("n_common"),
        round(col("n_common").cast("double") / col("n_shingles"), 6).as("boilerplate"))
  }

  /**
   * Exact dedup: rows grouped by md5 of `textCol`; canonical id = min id within
   * the group. Output: (idCol, content_hash, canonical_id). One shuffle on the
   * 128-bit hash — the groupBy key is the hash, never the full text, so 100 TB of
   * text shuffles only ids + 32-byte digests.
   */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol), md5(col(textCol)).as("content_hash"))
    val canon = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"))
    hashed.join(canon, "content_hash")
      .select(col(idCol), col("content_hash"), col("canonical_id"))
  }

  /**
   * Keep-BEST exact dedup — [[exact]]'s min-id canonical rule replaced by a
   * caller-supplied preference: within each md5 group, the copy with the
   * highest `scoreCol` (ties to the smaller id, nulls last) is kept. The
   * rule production dedup actually wants when duplicates differ in
   * provenance — keep the copy from the cleaner source / later crawl /
   * higher quality score, not just the smallest id.
   *
   * Plan shape: text is digested once and never reshuffled — the single
   * exchange carries (id, 32-hex digest, score) only; the verdict is one
   * rank-1 window over the digest partition (WindowGroupLimit-eligible
   * physical form). Null-text rows are dropped (the engine-wide null-key
   * convention).
   *
   * @return one verdict row per input doc: (idCol, content_hash, scoreCol,
   *         kept 1/0)
   */
  def keepBestBy(
      df: DataFrame, idCol: String, textCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(col(scoreCol).desc_nulls_last, col(idCol).asc)
    df.where(col(textCol).isNotNull)
      .select(col(idCol), md5(col(textCol)).as("content_hash"), col(scoreCol))
      .withColumn("__rn", row_number().over(w))
      .select(col(idCol), col("content_hash"), col(scoreCol),
        when(col("__rn") === 1, 1L).otherwise(0L).as("kept"))
  }

  /**
   * Soft dedup — down-WEIGHT duplicates instead of dropping them (the
   * SoftDeDup framing: exact duplicates share one unit of total sampling
   * mass, so a doc duplicated n times trains with weight 1/n instead of
   * either full weight or deletion). Output one row per input row:
   * (idCol, content_hash, group_size, weight = 1/group_size). Feed `weight`
   * to [[graft.operators.Sampling]]'s weighted samplers or a loss-weighting
   * column downstream.
   *
   * Plan shape: ONE shuffle, and it carries (id, 32-hex digest) only — the
   * text is hashed before the exchange and never moves, the same 100-TB
   * contract as [[exact]]. The per-group count is a window over the digest
   * partition (no join-back, so no second exchange). Null-text rows form
   * their own md5(null)=null group (both engines partition nulls together).
   *
   * @return (idCol, content_hash, group_size, weight rounded to 6)
   */
  def softWeights(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_hash"))
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col(idCol), col("content_hash"), col("group_size"),
        round(lit(1.0) / col("group_size"), 6).as("weight"))
  }

  /**
   * Corpus snapshot diff — the crawl-to-crawl audit: full outer join of two
   * snapshots on the id, comparing content digests. Status per id:
   * `added` (only in new), `removed` (only in old), `changed` (both, digest
   * differs — null text counts as a distinct digest), `unchanged`. The
   * operational complement of [[exactIncrement]]: that one decides what to
   * KEEP, this one reports what MOVED between two kept corpora.
   *
   * Plan shape: both sides reduce to (id, 32-hex digest) BEFORE the join —
   * one exchange per side on the id, text never shuffles; at 100 TB the
   * join ships ~40 bytes/doc. Null-text rows hash to null digests, compared
   * with null-safe equality (two null texts = unchanged).
   *
   * @return (idCol, old_hash, new_hash, status)
   */
  def corpusDiff(
      oldDf: DataFrame, newDf: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explicit presence flags: a null digest means "text is null", never
    // "row absent" — the two must not conflate in the status verdict
    val o = oldDf.select(col(idCol).as("__id"),
      md5(col(textCol)).as("old_hash"), lit(1).as("__op"))
    val n = newDf.select(col(idCol).as("__id"),
      md5(col(textCol)).as("new_hash"), lit(1).as("__np"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol), col("old_hash"), col("new_hash"),
        when(col("__op").isNull, lit("added"))
          .when(col("__np").isNull, lit("removed"))
          .when(col("old_hash") <=> col("new_hash"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /**
   * Snapshot UPSERT by key — the lakehouse MERGE shape (Delta/Iceberg
   * `MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`)
   * as a plain relational operator: the merged snapshot is every `batch` row
   * (the re-crawl wins) plus every `base` row whose key the batch does not
   * carry. The complement of [[corpusDiff]]: diff REPORTS the delta, upsert
   * MATERIALIZES the next snapshot.
   *
   * Scale shape: one left-anti join keyed on `keyCol` — the batch side of
   * the exchange is keys only, the base side ships each surviving row once;
   * no full-outer join, no window. Schemas must match (unionByName).
   *
   * @return base.columns + (from_batch: 1 for batch-origin rows, 0 for
   *         carried-over base rows)
   */
  def upsertByKey(base: DataFrame, batch: DataFrame, keyCol: String): DataFrame = {
    require(base.columns.sorted.sameElements(batch.columns.sorted),
      s"schema mismatch: base ${base.columns.mkString(",")} vs batch ${batch.columns.mkString(",")}")
    batch.withColumn("from_batch", lit(1L))
      .unionByName(
        base.join(batch.select(col(keyCol)), Seq(keyCol), "left_anti")
          .withColumn("from_batch", lit(0L)))
  }

  /** The persisted side of [[exactIncrement]]: the distinct content digests of
    * a corpus — 32 hex bytes per unique document, the only state an
    * incremental exact-dedup pipeline carries between crawls. */
  def exactDigests(df: DataFrame, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash")).distinct()

  /**
   * Incremental EXACT dedup — the crawl-increment shape a production pipeline
   * actually runs: everything kept so far persists as a digest frame
   * ([[exactDigests]]) and each new batch is checked against it (and against
   * itself) with digest-only joins. A batch row is kept iff its content hash
   * is absent from `seenDigests` AND it is the min-id holder of that hash
   * within the batch. Text never shuffles — the batch ships (id, digest), the
   * seen side ships digests, and at 100 TB of history the seen frame is
   * still only 32 bytes per unique doc. Union the kept rows' digests into
   * the seen frame for the next increment.
   *
   * Batch rows with NULL text are EXCLUDED from the output (md5(null) is
   * null and the inner join on content_hash eliminates them): the result has
   * one verdict row per non-null-text batch row, not per batch row — callers
   * auditing counts should filter nulls out (or verdict them) upstream.
   * @param seenDigests frame with `digestCol` = md5 hex of already-kept docs
   * @return (idCol, content_hash, kept) — kept ∈ {0, 1}
   */
  def exactIncrement(
      batch: DataFrame, idCol: String, textCol: String,
      seenDigests: DataFrame, digestCol: String = "content_hash"): DataFrame = {
    val hashed = batch.select(col(idCol), md5(col(textCol)).as("content_hash"))
    val seen = seenDigests.select(col(digestCol).as("content_hash")).distinct()
      .withColumn("__seen", lit(1))
    val canon = hashed.groupBy(col("content_hash")).agg(min(col(idCol)).as("__canon"))
    hashed.join(canon, "content_hash")
      .join(seen, Seq("content_hash"), "left")
      .select(col(idCol), col("content_hash"),
        when(col("__seen").isNotNull || col(idCol) =!= col("__canon"), 0L)
          .otherwise(1L).as("kept"))
  }

  /**
   * [[exactIncrement]] for a seen-set too big to matter in the exchange — the
   * Bloom-prescreened form (the same screen-then-verify design as
   * [[Decontaminate.contaminatedSpansBloom]]): a Bloom filter over the seen
   * digests (driver-built once, ~1.2 bytes/digest at fpp 0.01, broadcast
   * whole) screens the batch BEFORE the seen join, so the rows that shuffle
   * against the (potentially 100-TB-history) digest frame are only the true
   * matches plus the fpp false positives — on a fresh crawl that is a few
   * percent of the batch instead of all of it. The exact left join then
   * removes every false positive, so the output is BIT-IDENTICAL to
   * [[exactIncrement]] (same oracle gates both).
   *
   * The canon (min-id within batch) side never touches the seen frame and is
   * unchanged. Null-text rows are excluded, as in [[exactIncrement]].
   *
   * @param fpp            Bloom false-positive rate (cost knob only — FPs are
   *                       verified away, they just ride the exchange)
   * @param maxFilterBytes guard on the driver-side filter size (0 disables)
   * @return (idCol, content_hash, kept) — kept ∈ {0, 1}, = [[exactIncrement]]
   */
  def exactIncrementBloom(
      batch: DataFrame, idCol: String, textCol: String,
      seenDigests: DataFrame, digestCol: String = "content_hash",
      fpp: Double = 0.01, maxFilterBytes: Long = 256L << 20): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    require(maxFilterBytes >= 0L,
      s"maxFilterBytes must be >= 0 (0 disables the guard), got $maxFilterBytes")
    val spark = batch.sparkSession
    val seen = seenDigests.select(col(digestCol).as("content_hash")).distinct()
      .persist()
    val nSeen = math.max(seen.count(), 1L)
    if (maxFilterBytes > 0L) {
      val estBytes = math.ceil(-nSeen * math.log(fpp) /
        (math.log(2) * math.log(2)) / 8.0).toLong
      require(estBytes <= maxFilterBytes,
        s"Bloom filter for $nSeen seen digests at fpp=$fpp needs ~$estBytes driver-side " +
          s"bytes, over the $maxFilterBytes-byte guard — raise fpp, raise maxFilterBytes " +
          "deliberately (and size the driver), or shard the seen set")
    }
    val bloom = seen.stat.bloomFilter("content_hash", nSeen, fpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((h: String) => bloomBc.value.mightContainString(h))
    val hashed = batch.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .filter(col("content_hash").isNotNull)
    val canon = hashed.groupBy(col("content_hash")).agg(min(col(idCol)).as("__canon"))
    val maybe = hashed.filter(mightContain(col("content_hash")))
      .join(seen.withColumn("__seen", lit(1)), Seq("content_hash"), "left")
      .select(col(idCol), col("content_hash"), col("__seen"))
    val fresh = hashed.filter(!mightContain(col("content_hash")))
      .select(col(idCol), col("content_hash"), lit(null).cast("int").as("__seen"))
    maybe.unionByName(fresh)
      .join(canon, "content_hash")
      .select(col(idCol), col("content_hash"),
        when(col("__seen").isNotNull || col(idCol) =!= col("__canon"), 0L)
          .otherwise(1L).as("kept"))
  }

  /** Internal: Jaccard from per-pair intersection counts (columns __a, __b,
    * __i) and per-doc set sizes `cnt` (__id, __n). Callers derive `cnt` from
    * the materialized per-doc shingle ARRAYS (`size(__shs)` — shingles are
    * distinct per doc) so no count shuffle and no tokenizer re-execution. */
  private def jaccardFromInter(cnt: DataFrame, inter: DataFrame): DataFrame =
    inter
      .join(cnt.select(col("__id").as("__a"), col("__n").as("__na")), "__a")
      .join(cnt.select(col("__id").as("__b"), col("__n").as("__nb")), "__b")
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")).cast("double"))

  /**
   * Brute-force near-dup pairs: 3-word-shingle Jaccard ≥ threshold, candidates
   * from the shingle inverted index (docs sharing ≥ 1 shingle). Output:
   * (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6 decimals.
   *
   * @param maxDocFrequency drop shingles present in more than this many
   *        documents before the inverted-index self-join (the same stop-token
   *        rule as [[winnowPairs]]: a shingle shared by thousands of docs joins
   *        quadratically but carries almost no Jaccard mass at any useful
   *        threshold). 0 (default) disables. RESULT-CHANGING when on: hot
   *        shingles no longer count toward intersections (denominators still
   *        use full set sizes), so reported jaccard is a LOWER BOUND and pairs
   *        held together only by stop-shingles are missed — exactly the pairs a
   *        near-dup threshold shouldn't keep. Without a cap this operator is
   *        correctness-grade only; at corpus scale use the cap or
   *        [[minHashLshPairs]].
   */
  /** Internal: the shared inverted-index core of [[jaccardPairs]] and
    * [[containmentPairs]] — returns (inter, cnt): per-pair intersection
    * counts (__a < __b, __i) and per-doc set sizes (__id, __n). */
  private def shinglePairCore(
      df: DataFrame, idCol: String, textCol: String,
      maxDocFrequency: Long): (DataFrame, DataFrame) = {
    // ONE tokenizer pass, materialized (same trap as minHashLshPairs: the
    // inverted-index self-join reads the shingle relation twice, the capped
    // variant adds the doc-frequency aggregate and its semi-join — an
    // unmaterialized frame re-runs the shingle UDF once per subtree, ~5× on
    // the capped path). Set sizes come from size(__shs) — no count shuffle.
    val shs = df.select(col(idCol).as("__id"), shinglesUdf(col(textCol)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .localCheckpoint(true)
    val t = shs.select(col("__id"), explode(col("__shs")).as("__sh"))
    val cnt = shs.select(col("__id"), size(col("__shs")).cast("long").as("__n"))
    // shingles are distinct per doc, so count-per-shingle = doc frequency.
    // The cap is a count window over hash(__sh) (r17, the winnowPairs
    // shape): the filtered relation stays partitioned and sorted on the
    // join key, so the inverted-index self-join below adds no exchange.
    val tIdx =
      if (maxDocFrequency <= 0L) t
      else {
        import org.apache.spark.sql.expressions.Window
        t.withColumn("__df",
            count(lit(1)).over(Window.partitionBy(col("__sh"))))
          .filter(col("__df") <= maxDocFrequency)
          .select(col("__id"), col("__sh"))
      }
    // ONE pass over the inverted index: intersection counts straight off the
    // shingle equi-join (no candidate materialization + re-expansion).
    val inter = tIdx.select(col("__id").as("__a"), col("__sh"))
      .join(tIdx.select(col("__id").as("__b"), col("__sh")), "__sh")
      .filter(col("__a") < col("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__i"))
    (inter, cnt)
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      maxDocFrequency: Long = 0L): DataFrame = {
    val (inter, cnt) = shinglePairCore(df, idCol, textCol, maxDocFrequency)
    jaccardFromInter(cnt, inter)
      .filter(col("jaccard") >= threshold)
      .select(col("__a").as("id_a"), col("__b").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Containment (overlap-coefficient) near-dup pairs:
   * `|A∩B| / min(|A|, |B|)` ≥ threshold — the metric for SUBSET copies: a
   * short document wholly embedded in a long one scores containment 1.0
   * while its Jaccard (|A∩B|/|A∪B|) stays tiny, so a Jaccard threshold
   * never surfaces it. Same inverted-index plan and cap semantics as
   * [[jaccardPairs]] (capped: intersections shrink, set sizes stay full —
   * containment is then the documented lower bound). Output:
   * (id_a, id_b, containment rounded to 6), id_a < id_b.
   */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      maxDocFrequency: Long = 0L): DataFrame = {
    val (inter, cnt) = shinglePairCore(df, idCol, textCol, maxDocFrequency)
    inter
      .join(cnt.select(col("__id").as("__a"), col("__n").as("__na")), "__a")
      .join(cnt.select(col("__id").as("__b"), col("__n").as("__nb")), "__b")
      .withColumn("containment",
        col("__i").cast("double") / least(col("__na"), col("__nb")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("__a").as("id_a"), col("__b").as("id_b"),
        round(col("containment"), 6).as("containment"))
  }

  /**
   * MinHash + LSH near-dup pairs — identical OUTPUT CONTRACT to [[jaccardPairs]]
   * (verified pairs with exact Jaccard ≥ threshold) but with LSH-banded candidate
   * generation: K=32 hashes in 8 bands of 4; docs colliding on any band are
   * candidates. False-positive bands are removed by the exact verification; the
   * (tunable) false-negative probability at Jaccard j is (1-j^4)^8 — < 1e-7 for
   * j ≥ 0.97. This is the operator that survives 100 TB: no inverted-index
   * blowup on common shingles, candidate count bounded by bucket collisions.
   */
  /**
   * @param bandRows rows per LSH band (must divide K=32; default 4 → 8 bands).
   *        The recall/cost knob: false-negative probability at Jaccard j is
   *        (1-j^bandRows)^(32/bandRows) — raise it with the threshold for
   *        fewer, higher-precision candidates (bandRows=8 at j=0.9: fn ~0.84
   *        vs bandRows=4's ~0.04 — tune to the operating point).
   */
  /**
   * In-engine LSH-banding recall audit — [[graft.operators.SimSearch.recallReport]]'s
   * stance applied to near-dup dedup: how many TRUE near-duplicate pairs
   * (exact Jaccard ≥ threshold, from the exhaustive shingle inverted index)
   * does the MinHash-LSH banding path actually surface? The number that
   * justifies (or indicts) the banding parameters before a 100 TB run —
   * measured, not assumed, and cheap at audit scale (run it on a sample; the
   * truth side is the quadratic-ish path you're avoiding at full scale).
   * Banding recall is a random variable of the FIXED hash family, so the
   * measured value is deterministic and oracle-checkable.
   *
   * The PRECISION leg reads the same pipeline: of the distinct banding
   * candidate pairs, how many survive exact verification at the threshold —
   * the wasted-verify-work measurement (low precision = bands too coarse,
   * you are paying exact-Jaccard for junk candidates).
   *
   * @return one row: (n_true, n_cand, n_found, recall, precision) — recall
   *         (resp. precision) = 1.0 when there are no true pairs (resp. no
   *         candidates).
   */
  def lshAuditReport(
      df: DataFrame, idCol: String, textCol: String, threshold: Double,
      bandRows: Int = graft.functions.TextFunctions.MinHashBandRows): DataFrame = {
    val truth = jaccardPairs(df, idCol, textCol, threshold)
      .select(col("id_a"), col("id_b"))
    val (cand, verified) = lshCandVerified(df, idCol, textCol, bandRows)
    val found = verified.filter(col("jaccard") >= threshold)
      .select(col("__a").as("id_a"), col("__b").as("id_b"), lit(1L).as("__hit"))
    val nCand = cand.agg(count(lit(1)).as("n_cand"))
    truth.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_true"),
        coalesce(sum(coalesce(col("__hit"), lit(0L))), lit(0L)).as("n_found"))
      .crossJoin(broadcast(nCand))
      .select(col("n_true"), col("n_cand"), col("n_found"),
        when(col("n_true") === 0L, lit(1.0))
          .otherwise(round(col("n_found").cast("double") / col("n_true"), 6))
          .as("recall"),
        when(col("n_cand") === 0L, lit(1.0))
          .otherwise(round(col("n_found").cast("double") / col("n_cand"), 6))
          .as("precision"))
  }

  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String, threshold: Double,
      bandRows: Int = graft.functions.TextFunctions.MinHashBandRows): DataFrame = {
    // fail fast at plan time — inside the UDF the same require surfaces only
    // at execution, wrapped in a SparkException
    require(bandRows > 0 && graft.functions.TextFunctions.MinHashK % bandRows == 0,
      s"bandRows must divide MinHashK=${graft.functions.TextFunctions.MinHashK}, got $bandRows")
    // ONE tokenizer pass, materialized. Four subtrees consume the shingles
    // (band keys + both verification sides + the set-size counts); an
    // unmaterialized frame re-runs the shingle UDF lineage once per subtree —
    // at corpus scale that is tokenizing the corpus 4× instead of once. The
    // checkpoint holds the compact per-doc arrays; the explodes below are
    // narrow reads of the materialized blocks, not recomputation.
    val (_, verified) = lshCandVerified(df, idCol, textCol, bandRows)
    verified
      .filter(col("jaccard") >= threshold)
      .select(col("__a").as("id_a"), col("__b").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Shared banding front-end of the LSH family: checkpointed per-doc
    * shingle arrays `(__id, __shs)` (ONE tokenizer pass over text — every
    * downstream consumer reads the materialized compact arrays, never
    * re-runs the shingle UDF) plus the distinct banded candidate pairs
    * `(__a, __b)`. The band-key UDF runs over the checkpointed arrays
    * (8 strings per doc), so the self-join's two band subtrees cost two
    * cheap array passes, not two corpus tokenizations. */
  private def lshBandCandidates(
      df: DataFrame, idCol: String, textCol: String,
      bandRows: Int): (DataFrame, DataFrame) = {
    val shs = df.select(col(idCol).as("__id"), shinglesUdf(col(textCol)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .localCheckpoint(true)
    // Band keys computed inside the signature UDF pass (8 strings per doc) —
    // no 32-rows-per-doc explode + groupBy shuffle just to reassemble bands.
    val bands = shs
      .select(col("__id"),
        posexplode(minHashBandKeysUdfFor(bandRows)(col("__shs"))).as(Seq("__band", "__bkey")))
    val cand = bands.select(col("__id").as("__a"), col("__band"), col("__bkey"))
      .join(bands.select(col("__id").as("__b"), col("__band"), col("__bkey")),
        Seq("__band", "__bkey"))
      .filter(col("__a") < col("__b"))
      .select(col("__a"), col("__b")).distinct()
    (shs, cand)
  }

  /** Shared banding core of [[minHashLshPairs]] / [[lshAuditReport]]:
    * (distinct candidate pairs `(__a, __b)`, exact-Jaccard-verified pairs
    * `(__a, __b, jaccard)` — unthresholded).
    *
    * Verification joins the candidate pairs to the materialized PER-DOC
    * SHINGLE ARRAYS and computes `size(array_intersect(...))` inline —
    * shingles are distinct within a doc ([[graft.functions.TextFunctions
    * .shingles3Array]] builds a LinkedHashSet), so the intersection size is
    * exactly the count the former exploded shape aggregated. The former
    * shape shuffled the EXPLODED shingle relation twice (by __a, then by
    * (__b, __sh) — ~32 rows per doc per candidate on the wire), aggregated
    * per pair, and joined the set sizes back on two more exchanges; this
    * shape moves one compact array per candidate side and needs NO
    * aggregation and NO size join at all (sizes read off the arrays) —
    * guide §2.3/§2.4: shuffle fewer bytes at coarser granularity, remove
    * exchanges outright. Candidates are banding-bounded, so per-pair array
    * shipping is the same cost model the edit-distance verify already uses. */
  private def lshCandVerified(
      df: DataFrame, idCol: String, textCol: String,
      bandRows: Int): (DataFrame, DataFrame) = {
    val (shs, cand) = lshBandCandidates(df, idCol, textCol, bandRows)
    val verified = cand
      .join(shs.select(col("__id").as("__a"), col("__shs").as("__sa")), "__a")
      .join(shs.select(col("__id").as("__b"), col("__shs").as("__sb")), "__b")
      .select(col("__a"), col("__b"),
        size(array_intersect(col("__sa"), col("__sb"))).cast("long").as("__i"),
        size(col("__sa")).cast("long").as("__na"),
        size(col("__sb")).cast("long").as("__nb"))
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")).cast("double"))
    (cand, verified)
  }

  /**
   * EDIT-DISTANCE-verified near-dup pairs — the same LSH-banded candidate
   * generation as [[minHashLshPairs]], but the verify stage is normalized
   * Levenshtein distance instead of exact Jaccard: the classic
   * candidate→verify shape where the (cheap, shingle-level) filter proposes
   * and a (precise, character-level) metric disposes. Catches the near-dups
   * Jaccard mis-ranks — short docs where one edited word moves 3 shingles,
   * transpositions, small in-place edits — and is the standard second stage
   * of template/boilerplate mining.
   *
   * `edit_milli` = `lev(a,b) * 1000 div max(len(a), len(b))` — integer-exact
   * (both engines implement unit-cost Levenshtein; documents are ASCII so
   * char-vs-byte indexing cannot diverge — non-ASCII corpora should
   * normalize first). Scale shape: candidates are banding-bounded exactly as
   * [[minHashLshPairs]] (no inverted-index blowup, quadratic only within
   * buckets); the verify join ships each candidate's two texts once, and the
   * O(len²) DP runs distributed per pair — `bandRows` is the cost knob.
   *
   * @param maxDistMilli keep pairs with normalized distance ≤ this (0-1000);
   *        e.g. 200 = "at most 20% of the longer doc edited".
   * @return (id_a, id_b, edit_milli), id_a < id_b.
   */
  def editVerifiedPairs(
      df: DataFrame, idCol: String, textCol: String, maxDistMilli: Long,
      bandRows: Int = graft.functions.TextFunctions.MinHashBandRows): DataFrame = {
    require(maxDistMilli >= 0L && maxDistMilli <= 1000L,
      s"maxDistMilli must be in [0, 1000], got $maxDistMilli")
    require(bandRows > 0 && graft.functions.TextFunctions.MinHashK % bandRows == 0,
      s"bandRows must divide MinHashK=${graft.functions.TextFunctions.MinHashK}, got $bandRows")
    // Candidates come from the checkpointed banding core — the shingle UDF
    // pass runs ONCE (materialized), not once per side of the band self-join.
    val (_, cand) = lshBandCandidates(df, idCol, textCol, bandRows)
    val txt = df.select(col(idCol).as("__tid"), col(textCol).as("__txt"))
    cand
      .join(txt.select(col("__tid").as("__a"), col("__txt").as("__ta")), "__a")
      .join(txt.select(col("__tid").as("__b"), col("__txt").as("__tb")), "__b")
      .withColumn("__lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_milli",
        expr("(__lev * 1000) DIV greatest(length(__ta), length(__tb))"))
      .filter(col("edit_milli") <= maxDistMilli)
      .select(col("__a").as("id_a"), col("__b").as("id_b"), col("edit_milli"))
  }

  /**
   * PERSISTED MinHash signatures — the encode-once layout for the near-dup
   * family (the [[SimSearch.pqEncode]] analogue): ONE tokenize+hash pass
   * turns each doc into [[graft.functions.TextFunctions.MinHashK]] Long
   * minima; persist `(id, sig)` and every later banding/dedup run reads
   * K Longs per doc instead of re-shingling text — at 100 TB the signature
   * frame is ~256 bytes/doc vs kilobytes of text, and it serves any
   * `bandRows` operating point without another corpus pass. Docs with no
   * shingles are dropped here (they can never pair, and an all-MaxValue
   * sentinel signature would band-collide with every other empty doc).
   * @return (idCol, sig: array<long> of length MinHashK)
   */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), shinglesUdf(col(textCol)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .select(col("__id").as(idCol),
        graft.functions.TextFunctions.minHashSigUdf(col("__shs")).as("sig"))

  /**
   * Near-dup pairs from a persisted signature frame ALONE — no text read at
   * search time: band keys are signature slices
   * (`array_join(slice(sig, …))`) and similarity is the standard MinHash
   * ESTIMATE (matching minima / K, the signature's unbiased Jaccard
   * estimator), both computed with codegen'd collection functions
   * (`zip_with` + `aggregate` — no UDF anywhere in this operator). For
   * verified EXACT Jaccard use [[minHashLshPairs]], which must re-read text;
   * this is the operating point where the text no longer exists in the hot
   * path. The banding and the estimator are deterministic integer
   * arithmetic, so the approximate operator is SQL-mirrored and hash-gated
   * like the rest of the banding family (`Oracles.minHashSigPairsSql`).
   * @return (id_a, id_b, est_jaccard) with id_a < id_b, estimate ≥ threshold
   */
  def nearDupFromSignatures(
      sigs: DataFrame, idCol: String, sigCol: String, threshold: Double,
      bandRows: Int = graft.functions.TextFunctions.MinHashBandRows): DataFrame = {
    val k = graft.functions.TextFunctions.MinHashK
    require(bandRows > 0 && k % bandRows == 0,
      s"bandRows must divide MinHashK=$k, got $bandRows")
    // the signature frame (~K Longs/doc, bounded) feeds the band build AND
    // both estimate joins — checkpointed so a caller handing a LAZY frame
    // (signatures built inline from text) pays the shingle+MinHash pass
    // once, matching the persisted-frame posture this operator documents
    val s0 = sigs.select(col(idCol).as("__id"), col(sigCol).as("__sig"))
      .localCheckpoint()
    val bands = sigBands(s0, bandRows, k / bandRows)
    val cand = bands.select(col("__id").as("__a"), col("__band"), col("__bkey"))
      .join(bands.select(col("__id").as("__b"), col("__band"), col("__bkey")),
        Seq("__band", "__bkey"))
      .filter(col("__a") < col("__b"))
      .select(col("__a"), col("__b")).distinct()
    sigEstimate(cand, s0, s0, threshold, k)
  }

  /**
   * Cross-corpus form of [[nearDupFromSignatures]] — this year's crawl
   * deduped against last year's when BOTH corpora already live as persisted
   * signature frames: band keys from each side's signatures, candidates from
   * a shuffle equi-join on (band, key) (neither side broadcast — the
   * [[minHashLshPairsBetween]] shape), similarity = the signature estimate.
   * NO text from either corpus is read; at crawl scale the entire operator
   * runs over two ~256-byte/doc frames. Ids need not be disjoint (pairs are
   * (A-row, B-row), never id-ordered).
   * @return (id_a from sigsA, id_b from sigsB, est_jaccard ≥ threshold)
   */
  def nearDupFromSignaturesBetween(
      sigsA: DataFrame, idColA: String, sigColA: String,
      sigsB: DataFrame, idColB: String, sigColB: String,
      threshold: Double,
      bandRows: Int = graft.functions.TextFunctions.MinHashBandRows): DataFrame = {
    val k = graft.functions.TextFunctions.MinHashK
    require(bandRows > 0 && k % bandRows == 0,
      s"bandRows must divide MinHashK=$k, got $bandRows")
    val nBands = k / bandRows
    // same lazy-caller guard as [[nearDupFromSignatures]]: each side feeds
    // its band build and its estimate join
    val a = sigsA.select(col(idColA).as("__id"), col(sigColA).as("__sig"))
      .localCheckpoint()
    val b = sigsB.select(col(idColB).as("__id"), col(sigColB).as("__sig"))
      .localCheckpoint()
    val cand = sigBands(a, bandRows, nBands).select(
        col("__id").as("__a"), col("__band"), col("__bkey"))
      .join(sigBands(b, bandRows, nBands).select(
        col("__id").as("__b"), col("__band"), col("__bkey")),
        Seq("__band", "__bkey"))
      .select(col("__a"), col("__b")).distinct()
    sigEstimate(cand, a, b, threshold, k)
  }

  /** Band relation of a (__id, __sig) signature frame: one (__band, __bkey)
    * row per band, key = ':'-joined signature slice — pure codegen'd
    * collection functions, no UDF. */
  private def sigBands(s0: DataFrame, bandRows: Int, nBands: Int): DataFrame =
    s0.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => array_join(slice(col("__sig"), b * bandRows + 1, lit(bandRows)), ":")))
        .as(Seq("__band", "__bkey")))

  /** Matching-minima Jaccard estimate of candidate pairs (__a, __b) against
    * the two signature frames; emits (id_a, id_b, est_jaccard ≥ threshold). */
  private def sigEstimate(
      cand: DataFrame, sigsA: DataFrame, sigsB: DataFrame,
      threshold: Double, k: Int): DataFrame =
    cand
      .join(sigsA.select(col("__id").as("__a"), col("__sig").as("__sa")), Seq("__a"))
      .join(sigsB.select(col("__id").as("__b"), col("__sig").as("__sb")), Seq("__b"))
      .withColumn("__match",
        aggregate(
          zip_with(col("__sa"), col("__sb"), (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("__est", col("__match").cast("double") / lit(k.toDouble))
      .filter(col("__est") >= threshold)
      .select(col("__a").as("id_a"), col("__b").as("id_b"),
        round(col("__est"), 6).as("est_jaccard"))

  /**
   * CROSS-CORPUS MinHash+LSH near-dup pairs — [[minHashLshPairs]] between TWO
   * tables where NEITHER side fits a broadcast (dedup this year's crawl
   * against last year's): one checkpointed shingle pass per side, band keys
   * from the same signature UDF, candidates from a SHUFFLE equi-join on
   * (band, key) — contrast [[Decontaminate.fuzzyFlagged]], which broadcasts
   * its (benchmark-sized) second side — then exact Jaccard verification of
   * candidates only. Same banding false-negative bound; `bandRows` tunes it.
   * Output: (id_a from `dfA`, id_b from `dfB`, jaccard ≥ threshold, rounded
   * to 6). Ids are NOT required disjoint across tables (a pair is (A-row,
   * B-row), never ordered by id).
   */
  def minHashLshPairsBetween(
      dfA: DataFrame, idColA: String, textColA: String,
      dfB: DataFrame, idColB: String, textColB: String,
      threshold: Double,
      bandRows: Int = graft.functions.TextFunctions.MinHashBandRows): DataFrame = {
    require(bandRows > 0 && graft.functions.TextFunctions.MinHashK % bandRows == 0,
      s"bandRows must divide MinHashK=${graft.functions.TextFunctions.MinHashK}, got $bandRows")
    def side(df: DataFrame, id: String, text: String) =
      df.select(col(id).as("__id"), shinglesUdf(col(text)).as("__shs"))
        .filter(size(col("__shs")) > 0)
        .localCheckpoint(true)
    val a = side(dfA, idColA, textColA)
    val b = side(dfB, idColB, textColB)
    def bands(shs: DataFrame, out: String) = shs
      .select(col("__id").as(out),
        posexplode(minHashBandKeysUdfFor(bandRows)(col("__shs"))).as(Seq("__band", "__bkey")))
    val cand = bands(a, "__a").join(bands(b, "__b"), Seq("__band", "__bkey"))
      .select(col("__a"), col("__b")).distinct()
    val ta = a.select(col("__id").as("__a"), explode(col("__shs")).as("__sh"))
    val tb = b.select(col("__id").as("__b"), explode(col("__shs")).as("__sh"))
    val inter = cand.join(ta, "__a").join(tb, Seq("__b", "__sh"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__i"))
    val na = a.select(col("__id").as("__a"), size(col("__shs")).cast("long").as("__na"))
    val nb = b.select(col("__id").as("__b"), size(col("__shs")).cast("long").as("__nb"))
    inter.join(na, "__a").join(nb, "__b")
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("__a").as("id_a"), col("__b").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Near-dup candidate pairs by winnowing-fingerprint overlap (how MOSS
   * surfaces matches): docs sharing ≥ `minShared` selected k-gram window
   * minima ([[graft.functions.TextFunctions.winnowFingerprints]]). Character-
   * level (catches shared PASSAGES regardless of word boundaries — the
   * complement of the word-shingle operators), inverted-index join on the
   * fingerprint value, no cross join. Output: (id_a, id_b, shared) with
   * id_a < id_b.
   *
   * @param maxDocFrequency drop fingerprints present in more than this many
   *        documents before the join (MOSS's own stop-fingerprint rule: an
   *        8-gram shared by thousands of docs carries no match signal but its
   *        posting list joins quadratically — at sf0.1 the unguarded join is
   *        ~50× slower). 0 disables. RESULT-CHANGING like any stopword rule.
   */
  def winnowPairs(
      df: DataFrame, idCol: String, textCol: String,
      minShared: Long, k: Int = 8, w: Int = 4,
      maxDocFrequency: Long = 0L): DataFrame = {
    // ONE fingerprint pass, materialized as compact per-doc arrays: the
    // relation feeds both sides of the pair self-join, and with the cap on
    // also the doc-frequency aggregate + semi-join — unmaterialized, that
    // lineage re-runs the tokenize + rolling-hash + window-min UDF up to 4×
    // over all text (3 wasted corpus scans at 100 TB).
    val fpDocs = df.select(col(idCol).as("__id"),
      winnowUdf(k, w)(col(textCol)).as("__fps")).localCheckpoint(true)
    val fpAll = fpDocs.select(col("__id"), explode(col("__fps")).as("__fp"))
    val fp =
      if (maxDocFrequency <= 0L) fpAll
      else {
        // winnowFingerprints emits distinct values per doc, so count = doc
        // freq. A window over hash(__fp) instead of aggregate + semi-join
        // (r17): the cap filter then leaves the relation ALREADY partitioned
        // (and sorted) on the join key, so the pair self-join below adds no
        // exchange of its own.
        import org.apache.spark.sql.expressions.Window
        fpAll.withColumn("__df",
            count(lit(1)).over(Window.partitionBy(col("__fp"))))
          .filter(col("__df") <= maxDocFrequency)
          .select(col("__id"), col("__fp"))
      }
    fp.select(col("__id").as("__a"), col("__fp"))
      .join(fp.select(col("__id").as("__b"), col("__fp")), "__fp")
      .filter(col("__a") < col("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("__a").as("id_a"), col("__b").as("id_b"), col("shared"))
  }

  /**
   * Winnowing MATCH SPANS — the reporting form of [[winnowPairs]]: one row
   * per shared selected fingerprint with the 1-based char position of the
   * matched k-gram in EACH document
   * ([[graft.functions.TextFunctions.winnowFingerprintsPos]]), i.e. where the
   * shared passage starts on both sides — what a MOSS-style reviewer
   * actually reads. Same inverted-index join and `maxDocFrequency`
   * stop-fingerprint cap as [[winnowPairs]]. Output:
   * (id_a, id_b, fingerprint, pos_a, pos_b) with id_a < id_b.
   */
  def winnowSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4, maxDocFrequency: Long = 0L): DataFrame = {
    // Same materialize-once stance as [[winnowPairs]]: the positioned
    // fingerprint UDF runs ONCE; self-join sides + cap consumers read the
    // checkpointed arrays.
    val fpDocs = df.select(col(idCol).as("__id"),
      winnowPosUdf(k, w)(col(textCol)).as("__fpps")).localCheckpoint(true)
    val fpAll = fpDocs.select(col("__id"), explode(col("__fpps")).as("__fpp"))
      .select(col("__id"), col("__fpp._1").as("__fp"), col("__fpp._2").as("__p"))
    val fp =
      if (maxDocFrequency <= 0L) fpAll
      else {
        // same window-shaped cap as [[winnowPairs]] — the self-join below
        // reuses the hash(__fp) partitioning the window establishes
        import org.apache.spark.sql.expressions.Window
        fpAll.withColumn("__df",
            count(lit(1)).over(Window.partitionBy(col("__fp"))))
          .filter(col("__df") <= maxDocFrequency)
          .select(col("__id"), col("__fp"), col("__p"))
      }
    fp.select(col("__id").as("__a"), col("__fp"), col("__p").as("pos_a"))
      .join(fp.select(col("__id").as("__b"), col("__fp"), col("__p").as("pos_b")), "__fp")
      .filter(col("__a") < col("__b"))
      .select(col("__a").as("id_a"), col("__b").as("id_b"),
        col("__fp").as("fingerprint"), col("pos_a").cast("long").as("pos_a"),
        col("pos_b").cast("long").as("pos_b"))
  }

  /**
   * EXACT-SUBSTRING duplicated-passage detection — the distributed shape of
   * suffix-array training-data dedup (Lee et al. 2021, "Deduplicating
   * Training Data Makes Language Models Better"): a span is duplicated iff
   * every k-code-point gram in it occurs in ≥ `minDocs` distinct documents.
   * Per doc, every gram position is keyed by the gram's (h1, h2) paired
   * splitmix64-weight code-point sums ([[charGrams]] — not tHash's cycled
   * weights, which demonstrably collide; see its scaladoc), identities seen
   * in ≥ minDocs docs are marked, and runs of CONSECUTIVE marked positions
   * merge into maximal spans (gaps-and-islands on position − row_number).
   *
   * Scale shape — the part that matters at 100 TB: duplication is decided by
   * ONE aggregate on the gram-hash key (`count_distinct(doc)`), never a
   * pair join, so a boilerplate gram in 10⁸ documents costs O(occurrences)
   * rows through the shuffle, not O(occurrences²) pairs — the reason this
   * beats running [[winnowPairs]] uncapped for removal (as opposed to
   * match-reporting) workloads. The island merge windows per document, so
   * no partition sees more than one document's positions.
   *
   * vs [[winnowSpans]]: winnowing SAMPLES grams (~1/w kept) to report which
   * doc PAIRS share passages; this keeps every gram to report exactly WHICH
   * BYTES are duplicated corpus-wide — the input to a cut-the-spans-out
   * rewrite step. Suffix-array spans of length ≥ L are recovered exactly by
   * `span_end - span_start + 1 ≥ L` (any duplicated substring of length
   * ≥ k appears as a run of its length − k + 1 grams).
   *
   * @param minDocs a gram is duplicated when present in ≥ minDocs distinct
   *                docs (2 = any cross-doc repeat). Within-doc repeats alone
   *                do not mark a gram (count is per distinct doc).
   * @return (idCol, span_start, span_end, n_grams) — 1-based inclusive
   *         code-point positions; n_grams = duplicated gram count in the run.
   */
  def duplicateSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 2L, s"minDocs must be >= 2, got $minDocs")
    val g = df.select(col(idCol).as("__id"),
        posexplode(charGrams(col(textCol), k)).as(Seq("__i", "__h")))
      .select(col("__id"), (col("__i") + 1).cast("long").as("__p"), col("__h"))
    spansFromMarked(markDuplicatedByDocs(g, minDocs), k)
      .select(col("__id").as(idCol),
        col("span_start"), col("span_end"), col("n_grams"))
  }

  /** Source-compatibility overload for the r15 `materializeGrams` knob that
    * r17 removed with the window rewrite (the knob was a measured dead end:
    * the window shape has ONE gram consumer, so there is nothing left to
    * materialize). The argument is ignored. */
  @deprecated("materializeGrams is a no-op since the r17 window rewrite " +
    "removed the second gram consumer; call the overload without it", "r18")
  def duplicateSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Long, materializeGrams: Boolean): DataFrame =
    duplicateSpans(df, idCol, textCol, k, minDocs)

  /**
   * [[duplicateSpans]] counting TOTAL occurrences instead of distinct docs:
   * a gram is duplicated when it appears ≥ `minOccurrences` times anywhere
   * in the corpus — including repeats WITHIN one document, which the
   * distinct-doc rule deliberately ignores. This is the variant that also
   * flags self-repetition (boilerplate loops, degenerate generation runs):
   * Lee et al. 2021's suffix-array criterion is likewise any-second-
   * occurrence, not cross-doc-only. Same aggregate-only decision, same
   * island merge, same scale shape — only the HAVING clause differs.
   * @return (idCol, span_start, span_end, n_grams) as [[duplicateSpans]]
   */
  def duplicateSpansAll(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minOccurrences: Long = 2L): DataFrame = {
    require(minOccurrences >= 2L, s"minOccurrences must be >= 2, got $minOccurrences")
    val g = df.select(col(idCol).as("__id"),
        posexplode(charGrams(col(textCol), k)).as(Seq("__i", "__h")))
      .select(col("__id"), (col("__i") + 1).cast("long").as("__p"), col("__h"))
    val byH = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
    // occurrence rule as a window over the ONE hash(__h) exchange — see
    // markDuplicatedByDocs for why this beats the aggregate + join-back
    val d = g.withColumn("__n", count(lit(1)).over(byH))
      .filter(col("__n") >= minOccurrences).select(col("__id"), col("__p"))
    spansFromMarked(d, k).select(col("__id").as(idCol),
      col("span_start"), col("span_end"), col("n_grams"))
  }

  /**
   * The REMOVAL form of [[duplicateSpansAll]] — within-corpus ANY-second-
   * occurrence spans (including within-doc self-repeats) spliced out, the
   * full Lee et al. criterion's cut: [[removeDuplicateSpans]] only cuts
   * text duplicated ACROSS documents; this also cuts the looped/boilerplate
   * self-repetition inside a single page. Same [[cutSpans]] interval-merge
   * splice, same scale shape.
   * @return (idCol, clean_text, removed_chars)
   */
  def removeDuplicateSpansAll(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minOccurrences: Long = 2L): DataFrame =
    cutSpans(df, idCol, textCol,
      duplicateSpansAll(df, idCol, textCol, k, minOccurrences))

  /**
   * WORD-unit form of [[duplicateSpans]] — the literal Lee et al. 2021
   * granularity (their suffix-array dedup removes duplicated ≥50-TOKEN
   * spans): a maximal run of n-word grams each occurring in ≥ minDocs
   * distinct documents, reported in 1-based WORD positions. Same
   * aggregate-only duplication decision and island merge; word spans are
   * what a token-budgeted pipeline cuts by (char spans are
   * [[duplicateSpans]]'s job). A duplicated word run of length ≥ L words
   * appears as L − n + 1 consecutive marked grams.
   * @return (idCol, word_start, word_end, n_grams) — word_end inclusive
   */
  def duplicateSpansWords(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2L): DataFrame = {
    require(minDocs >= 2L, s"minDocs must be >= 2, got $minDocs")
    val g = df.select(col(idCol).as("__id"),
        posexplode(wordGrams(wordsCol(col(textCol)), n)).as(Seq("__i", "__h")))
      .select(col("__id"), (col("__i") + 1).cast("long").as("__p"), col("__h"))
    spansFromMarked(markDuplicatedByDocs(g, minDocs), n)
      .select(col("__id").as(idCol),
        col("span_start").as("word_start"), col("span_end").as("word_end"),
        col("n_grams"))
  }

  /** The span-dedup gram identity: per gram position, an (h1, h2) PAIR of
    * independent distinct-weight code-point sums
    * ([[graft.functions.KGramHashPairsExpr]] — its scaladoc has the full
    * rationale: tHash's cycled weights demonstrably collide on word-salad
    * grams, while md5/raw-substring grams cost a per-gram string
    * materialization that benchmarked ~3× the whole query; the codegen'd
    * pair keeps the tight-loop speed with ~2⁻¹²² joint collisions and a
    * 16-byte shuffle key). */
  private[operators] def charGrams(c: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.KGramHashPairsExpr(
        org.apache.spark.sql.GraftBridge.expression(c), k))

  /** [[charGrams]] for n-WORD grams over a word ARRAY column (valued as the
    * char pairs of the words joined by single spaces). */
  private[operators] def wordGrams(ws: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordGramHashPairsExpr(
        org.apache.spark.sql.GraftBridge.expression(ws), n))

  /** Gram positions of the relation `g(__id, __p, __h)` whose hash occurs
    * in ≥ `minDocs` DISTINCT docs, decided by windows over ONE hash(__h)
    * exchange (r17). The former aggregate + join-back shape computed the
    * O(len·k) gram lineage TWICE (once into the aggregate, once as the
    * probe) and built a driver-collected broadcast of the duplicated-hash
    * set — a relation that outgrows the broadcast cap on boilerplate-heavy
    * corpora, where the join degenerates to a SECOND full gram shuffle
    * (r15's materializeGrams localCheckpoint probe was the recorded dead
    * end for de-duplicating that lineage by storage; the window shape
    * removes the second consumer instead). minDocs = 2 (the gate default)
    * is `min(__id) ≠ max(__id)` over the hash partition — no ordering
    * beyond the partition sort; the general rule sums lag-based
    * first-occurrence markers ordered by __id (null ids contribute 0,
    * matching count_distinct). */
  /** Skew hazard (r18, documented per ADVICE r17): the dup verdict is a
    * window over one hash(__h) exchange — a single gram hash shared by a
    * large row fraction (whole-corpus boilerplate) lands in ONE window
    * partition that AQE cannot split (measured shape cost in
    * `HotKeyBench` — plans/r18/HOTKEY_BENCH_*.json: a 10%-of-rows key costs
    * +29% at local[32], and serializes O(hot rows) into one task at cluster
    * scale). The span family keeps the window form because its gram relation
    * is O(len·k) rows of hash+position (no text payload) and the saved
    * second gram lineage dominates (r17 receipts: 6.5 → 2.0 s warm);
    * [[withDistinctIdCount]] documents the aggregate fallback shape to
    * mirror if a corpus with a degenerate hot gram ever needs it. */
  private def markDuplicatedByDocs(g: DataFrame, minDocs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byH = Window.partitionBy(col("__h"))
    val flagged =
      if (minDocs == 2L)
        g.withColumn("__dup",
          min(col("__id")).over(byH) =!= max(col("__id")).over(byH))
      else {
        val byHOrd = Window.partitionBy(col("__h")).orderBy(col("__id"))
        g.withColumn("__dup",
          sum(when(col("__id").isNotNull &&
              !(lag(col("__id"), 1).over(byHOrd) <=> col("__id")), 1L)
            .otherwise(0L)).over(byH) >= minDocs)
      }
    flagged.filter(col("__dup")).select(col("__id"), col("__p"))
  }

  /** Adds `outCol` = COUNT(DISTINCT idCol) among the rows sharing `keyCol`,
    * as stacked windows on ONE hash(keyCol) exchange: ids arrive sorted
    * within a key partition, so a row is its id's first occurrence iff lag
    * differs (null-safe; null ids contribute 0, matching count_distinct),
    * and the running sum over the unordered partition frame is the distinct
    * count. The join-back-free frequency attach shared by the
    * line/paragraph/chunk/CDC dedup family (r17) — the former
    * aggregate + join-back shape computed each explode lineage twice and
    * paid two aggregation exchanges plus the join.
    *
    * Skew hazard + knob (r18, ADVICE r17 / VERDICT item 3, measured in
    * `HotKeyBench` — plans/r18/HOTKEY_BENCH_*.json): the window carries the
    * FULL row through the key exchange and a hot key (boilerplate
    * line/chunk shared by a large row fraction) lands in ONE window
    * partition that AQE cannot split — a 10%-of-rows key costs +29% at
    * local[32] and, on a cluster, serializes O(hot rows) into one task
    * regardless of cluster size. `skewSafe = true` switches to the
    * aggregate + join-back shape: the count_distinct's internal (key, id)
    * exchange spreads a hot key across its id values (inherently salted)
    * and the probe join is AQE-skew-splittable — at the price of running
    * `df`'s lineage twice (why window stays the default: on real text the
    * saved tokenize/explode pass dominates — the r17 wins). Precondition
    * (both shapes, all callers): non-null `keyCol`.
    * EXACTNESS: count_distinct ignores null ids, matching the lag-marker's
    * null handling; parity is test-pinned (Round18OptSpec). */
  private def withDistinctIdCount(
      df: DataFrame, keyCol: String, idCol: String, outCol: String,
      skewSafe: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (skewSafe) {
      val counts = df.select(col(keyCol), col(idCol))
        .groupBy(col(keyCol)).agg(count_distinct(col(idCol)).as(outCol))
      df.join(counts, Seq(keyCol), "left")
    } else {
      val byK = Window.partitionBy(col(keyCol))
      val byKOrd = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
      df.withColumn(outCol,
        sum(when(col(idCol).isNotNull &&
            !(lag(col(idCol), 1).over(byKOrd) <=> col(idCol)), 1L)
          .otherwise(0L)).over(byK))
    }
  }

  /** Gaps-and-islands merge of marked gram positions `(__id, __p)` into
    * maximal spans — shared by [[duplicateSpans]] and
    * [[Decontaminate.contaminatedSpans]]. Doc-partitioned window only.
    * @return (__id, span_start, span_end, n_grams) */
  private[operators] def spansFromMarked(marked: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    marked.withColumn("__isl", col("__p") - row_number().over(w))
      .groupBy(col("__id"), col("__isl"))
      .agg(min(col("__p")).as("span_start"),
        (max(col("__p")) + lit(k.toLong - 1L)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("__id"), col("span_start"), col("span_end"), col("n_grams"))
  }

  /** Union-merge span char intervals per doc and splice them OUT of the text
    * (code-point positions; 1-based inclusive spans) — the shared cut stage
    * of [[removeDuplicateSpans]] / [[Decontaminate.removeContaminatedSpans]].
    * Docs absent from `spans` pass through (removed_chars = 0).
    * @param spans (idCol, span_start, span_end)
    * @return (idCol, clean_text, removed_chars) */
  private[operators] def cutSpans(
      df: DataFrame, idCol: String, textCol: String, spans: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = spans.select(col(idCol).as("__id"),
      col("span_start").as("__s"), col("span_end").as("__e"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__s"), col("__e"))
    // interval union-merge: a span opens a new group iff it starts past the
    // running max end of everything before it (adjacency merges harmlessly)
    val runMax = max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val grouped = sp
      .withColumn("__new",
        when(runMax.isNull || col("__s") > runMax + 1, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(w))
      .groupBy(col("__id"), col("__grp"))
      .agg(min(col("__s")).as("__s"), max(col("__e")).as("__e"))
    val packs = grouped.groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__s"), col("__e")))).as("__ivs"),
        sum(col("__e") - col("__s") + 1).as("__removed"))
    val cutUdf = udf { (s: String, ivs: Seq[org.apache.spark.sql.Row]) =>
      if (s == null) null
      else {
        val cps = s.codePoints().toArray
        val keep = Array.fill(cps.length)(true)
        ivs.foreach { r =>
          var p = math.max(r.getLong(0).toInt - 1, 0) // 1-based inclusive → 0-based
          val e = math.min(r.getLong(1).toInt, cps.length)
          while (p < e) { keep(p) = false; p += 1 }
        }
        val sb = new java.lang.StringBuilder(cps.length)
        var i = 0
        while (i < cps.length) { if (keep(i)) sb.appendCodePoint(cps(i)); i += 1 }
        sb.toString
      }
    }
    df.select(col(idCol), col(textCol))
      .join(packs.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__ivs").isNull, col(textCol))
          .otherwise(cutUdf(col(textCol), col("__ivs"))).as("clean_text"),
        coalesce(col("__removed"), lit(0L)).as("removed_chars"))
  }

  /**
   * Per-document span-duplication STATS — the drop-the-doc decision signal
   * (Lee et al. also evaluate dropping whole documents above a duplication
   * fraction, vs splicing spans out): union-merged duplicated chars per doc
   * and the integer-milli duplicated fraction, for every doc (0 for docs
   * with no span). Same interval merge as the cut stage, but no text
   * rewrite — the output is 3 longs per doc, so a
   * `filter(dup_milli < threshold)` over 100 TB ships no text at all.
   * @return (idCol, total_chars, dup_chars, dup_milli) — dup_milli =
   *         (dup_chars * 1000) div total_chars (0 when the doc is empty)
   */
  def spanDuplicationStats(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minDocs: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sp = duplicateSpans(df, idCol, textCol, k, minDocs)
      .select(col(idCol).as("__id"),
        col("span_start").as("__s"), col("span_end").as("__e"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__s"), col("__e"))
    val runMax = max(col("__e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val merged = sp
      .withColumn("__new",
        when(runMax.isNull || col("__s") > runMax + 1, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(w))
      .groupBy(col("__id"), col("__grp"))
      .agg(min(col("__s")).as("__s"), max(col("__e")).as("__e"))
      .groupBy(col("__id"))
      .agg(sum(col("__e") - col("__s") + 1).as("__dup"))
    df.select(col(idCol), length(col(textCol)).cast("long").as("total_chars"))
      .join(merged.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("total_chars"),
        coalesce(col("__dup"), lit(0L)).as("dup_chars"),
        when(col("total_chars") > 0L,
          expr("(coalesce(__dup, 0L) * 1000) DIV total_chars"))
          .otherwise(lit(0L)).as("dup_milli"))
  }

  /**
   * The REMOVAL form of [[duplicateSpans]] (Lee et al. cut the duplicated
   * spans out of the corpus rather than dropping whole documents): each
   * document is rewritten with every corpus-duplicated passage excised.
   * Span CHAR ranges from adjacent gram runs can overlap (runs separated by
   * one fresh gram still share k−1 chars), so intervals are union-merged
   * per document (running-max interval merge in a doc-partitioned window)
   * before cutting; the cut itself is a code-point splice. Documents with
   * no duplicated span pass through unchanged (removed_chars = 0).
   *
   * Scale shape: [[duplicateSpans]]'s aggregate-only duplication decision,
   * plus one groupBy(doc) to pack merged intervals (≤ spans-per-doc rows),
   * plus a join of the interval packs back to the text — all keyed on the
   * doc id; no pair joins anywhere.
   *
   * @return (idCol, clean_text, removed_chars)
   */
  def removeDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 20, minDocs: Long = 2L): DataFrame =
    cutSpans(df, idCol, textCol, duplicateSpans(df, idCol, textCol, k, minDocs))

  /** 1-based code-point char intervals of each WORD — word i = the i-th
    * maximal `[a-z]` run of `lower(text)`, exactly
    * [[graft.functions.TextFunctions.wordsCol]]'s `regexp_extract_all`
    * definition, so word INDICES from [[duplicateSpansWords]] line up with
    * these intervals 1:1. Fully relational: posexplode of the lowered chars,
    * gaps-and-islands on letter positions (doc-partitioned windows only — the
    * same O(len)-rows-per-doc shape as the gram relation). Positions are
    * computed on `lower(text)` and applied to the original text, so the two
    * must have the SAME code-point length — guaranteed for ASCII, violated by
    * e.g. 'İ' (lowers to "i̇", two code points). A runtime guard fails fast on
    * any such doc instead of silently excising shifted offsets.
    * @return (__id, __wi word index, __cs char start, __ce char end) */
  private[operators] def wordCharIntervals(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lowered = when(col(textCol).isNull ||
        length(lower(col(textCol))) === length(col(textCol)), lower(col(textCol)))
      .otherwise(raise_error(concat(
        lit("wordCharIntervals: lower() changes the code-point length of doc id="),
        col(idCol).cast("string"),
        lit(" — word char intervals would misalign with the original text; " +
          "normalize such documents before word-span removal"))))
    val chars = df.select(col(idCol).as("__id"),
        posexplode(split(lowered, "")).as(Seq("__i", "__ch")))
      .select(col("__id"), (col("__i") + 1).cast("long").as("__p"), col("__ch"))
      .filter(ascii(col("__ch")).between(97, 122))
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    val runs = chars.withColumn("__isl", col("__p") - row_number().over(w))
      .groupBy(col("__id"), col("__isl"))
      .agg(min(col("__p")).as("__cs"), max(col("__p")).as("__ce"))
    runs.select(col("__id"),
      row_number().over(Window.partitionBy(col("__id")).orderBy(col("__cs")))
        .cast("long").as("__wi"),
      col("__cs"), col("__ce"))
  }

  /**
   * The REMOVAL form of [[duplicateSpansWords]] — the Lee et al. granularity
   * a token-budgeted pipeline actually cuts by: word-unit duplicate spans are
   * mapped to char intervals (first char of `word_start`'s word through last
   * char of `word_end`'s word, via [[wordCharIntervals]] — two equi-joins on
   * (doc, word index), no new shuffle shape) and excised by the same
   * union-merge + splice cut stage as [[removeDuplicateSpans]]. Separator
   * runs BETWEEN removed words go with the span; the separators flanking it
   * survive (the cut is letters-inclusive).
   *
   * @return (idCol, clean_text, removed_chars)
   */
  def removeDuplicateSpansWords(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Long = 2L): DataFrame = {
    val wspans = duplicateSpansWords(df, idCol, textCol, n, minDocs)
      .select(col(idCol).as("__sid"), col("word_start"), col("word_end"))
    val iv = wordCharIntervals(df, idCol, textCol)
    val ivS = iv.select(col("__id").as("__ida"), col("__wi").as("__wia"), col("__cs"))
    val ivE = iv.select(col("__id").as("__idb"), col("__wi").as("__wib"), col("__ce"))
    val charSpans = wspans
      .join(ivS, col("__sid") === col("__ida") && col("word_start") === col("__wia"))
      .join(ivE, col("__sid") === col("__idb") && col("word_end") === col("__wib"))
      .select(col("__sid").as(idCol), col("__cs").as("span_start"),
        col("__ce").as("span_end"))
    cutSpans(df, idCol, textCol, charSpans)
  }

  /**
   * SimHash fingerprints: two independent 32-bit halves (h1, h2) per doc — per
   * bit b, the bit is set iff Σ_tokens (2·bit_b(mix(tokenHash)) - 1) > 0.
   * Output: (idCol, simhash1, simhash2), both Long in [0, 2^32).
   */
  def simHashFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), shinglesUdf(col(textCol)).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .select(col("__id").as(idCol),
        simHash1Udf(col("__shs")).as("simhash1"),
        simHash2Udf(col("__shs")).as("simhash2"))

  /**
   * SimHash near-dup pairs: Hamming distance over the 64-bit fingerprint ≤
   * maxHamming. Candidates via banding: any pair with Hamming < nBands shares
   * at least one identical band (pigeonhole), so for maxHamming ≤ nBands-1 the
   * result is EXACT, not approximate, while avoiding the all-pairs cross join.
   * Output: (id_a, id_b, hamming).
   *
   * Band width is the scale knob. 8-bit bands (default, 8 bands — exact up to
   * Hamming 7) give only 256 bucket values per band: at N docs each bucket
   * holds ~N/256 and the self-join emits ~8·(N/256)² candidate rows —
   * fine at sf0.1, quadratic death at 10⁹ docs. 16-bit bands (4 bands —
   * exact up to Hamming 3, the common near-dup setting) have 65 536 values,
   * cutting per-bucket population 256× and candidates ~131 000×.
   *
   * @param bandBits 8 (exact ≤ 7) or 16 (exact ≤ 3).
   * @param maxBandFrequency additionally drop (band, value) buckets holding
   *        more than this many docs before the join — the skew guard for
   *        degenerate corpora where one fingerprint region is hot (near-empty
   *        docs all hash near 0). RESULT-CHANGING like any stop rule: pairs
   *        whose only shared band is a dropped bucket are missed. 0 disables.
   */
  /** Internal: (__id, simhash1, simhash2, __bi, __bv) band rows for a
    * fingerprint frame — one generator pass, nBands rows per doc (a union of
    * per-band projections would re-evaluate the fingerprint lineage once per
    * branch). Shared by [[simHashPairs]] and
    * [[graft.streaming.StreamNearDup]]; works on streaming frames. */
  private[graft] def simHashBands(fp: DataFrame, bandBits: Int): DataFrame = {
    require(bandBits == 8 || bandBits == 16, s"bandBits must be 8 or 16, got $bandBits")
    val nPerHalf = 32 / bandBits
    val modulus = 1L << bandBits
    val bandVals = (0 until nPerHalf).map(i => shiftright(col("simhash1"), bandBits * i) % modulus) ++
      (0 until nPerHalf).map(i => shiftright(col("simhash2"), bandBits * i) % modulus)
    fp.select(col("__id"), col("simhash1"), col("simhash2"),
      posexplode(array(bandVals: _*)).as(Seq("__bi", "__bv")))
  }

  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int,
      bandBits: Int = 8, maxBandFrequency: Long = 0L): DataFrame = {
    require(bandBits == 8 || bandBits == 16, s"bandBits must be 8 or 16, got $bandBits")
    val nBands = 2 * (32 / bandBits)
    require(maxHamming < nBands,
      s"$bandBits-bit banding ($nBands bands) is only exact for maxHamming <= ${nBands - 1}")
    val fp = simHashFingerprints(df, idCol, textCol)
      .select(col(idCol).as("__id"), col("simhash1"), col("simhash2"))
    val bands0 = simHashBands(fp, bandBits)
    val bands =
      if (maxBandFrequency <= 0L) bands0
      else {
        val keep = bands0.groupBy(col("__bi"), col("__bv")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxBandFrequency).select(col("__bi"), col("__bv"))
        bands0.join(keep, Seq("__bi", "__bv"))
      }
    val a = bands.select(col("__id").as("__a"), col("simhash1").as("__a1"),
      col("simhash2").as("__a2"), col("__bi"), col("__bv"))
    val b = bands.select(col("__id").as("__b"), col("simhash1").as("__b1"),
      col("simhash2").as("__b2"), col("__bi"), col("__bv"))
    a.join(b, Seq("__bi", "__bv")).filter(col("__a") < col("__b"))
      .select(col("__a"), col("__b"),
        (bit_count(col("__a1").bitwiseXOR(col("__b1"))) +
         bit_count(col("__a2").bitwiseXOR(col("__b2")))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .select(col("__a").as("id_a"), col("__b").as("id_b"), col("hamming"))
  }

  /**
   * One-representative-per-cluster deduplication: cluster the near-dup pair
   * graph with [[ConnectedComponents]] and keep only the minimum-id document
   * of each component (singletons keep themselves). The composition consumers
   * actually want from `pairs → clusters` — ONE survivor per transitive
   * near-dup group, unlike pairwise higher-id removal (see [[CleanCorpus]]'s
   * independent-set note).
   *
   * @param algorithm "propagation" (default — min-label iteration, cheapest
   *        for the shallow pair/triple components near-dup graphs produce;
   *        exact only for components whose diameter fits in `maxIter` rounds)
   *        or "star" ([[ConnectedComponents.runStar]] — O(log² n) rounds on
   *        ANY component shape, the choice when cluster diameters are unknown
   *        or adversarial; `maxIter` then bounds star rounds).
   * @return the surviving rows of `docs`, original schema.
   */
  def canonicalize(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 20, algorithm: String = "propagation"): DataFrame = {
    require(Set("propagation", "star")(algorithm),
      s"algorithm must be propagation|star, got $algorithm")
    // component = min reachable id (ConnectedComponents contract), so the
    // cluster representative is exactly the row whose id equals its component
    val comp =
      if (algorithm == "star") ConnectedComponents.runStar(docs, idCol, pairs, aCol, bCol, maxIter)
      else ConnectedComponents.run(docs, idCol, pairs, aCol, bCol, maxIter)
    docs.join(comp.filter(col(idCol) === col("component")).select(col(idCol)), idCol)
  }

  /**
   * Embedding-cosine near-dup pairs: all (a, b) with cosine ≥ threshold, a < b.
   * Brute-force all-pairs (broadcast one side) — correctness baseline; for the
   * 100 TB path use [[SimSearch.topKLsh]]-style bucketing first. Output:
   * (id_a, id_b, cosine rounded to 4 decimals).
   */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame =
    SimSearch.broadcastCosine(df, idCol, vecCol, df, idCol, vecCol,
        minCos = threshold, onlyQueryLess = true)
      .select(col("query_id").as("id_a"), col("neighbor_id").as("id_b"),
        round(col("__cos"), 4).as("cosine"))

  /**
   * Embedding-cosine near-dup pairs, LSH-bucketed — the fully-relational 100 TB
   * path: nothing is collected to the driver and neither side is broadcast.
   * Each vector is hashed into `nTables` independent sign-LSH buckets
   * (OR-amplification: a pair is a candidate if it collides in ANY table,
   * recall 1-(1-p^nPlanes)^nTables per pair); candidates come from a bucket
   * equi-join, are deduped across tables, and scored with the codegen'd
   * [[graft.functions.CosineSimExpr]] (no boxed per-pair UDF). Approximate:
   * pairs whose vectors land in different buckets in every table are missed.
   * Output contract matches [[embeddingPairs]] (id_a < id_b, cosine ≥
   * threshold rounded to 4), minus those misses.
   */
  def embeddingPairsLsh(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nPlanes: Int = 8, nTables: Int = 2): DataFrame = {
    val b = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        posexplode(SimSearch.lshBucketsUdf(nPlanes, nTables)(col(vecCol))).as(Seq("__t", "__b")))
    // Score BEFORE the cross-table duplicate-drop: cosine is deterministic, so
    // every colliding copy of a pair scores identically and the dedup exchange
    // shuffles (id_a, id_b, double) — not two embedding arrays per candidate
    // (~6 KB/row avoidable shuffle at 768-dim float).
    b.select(col("__id").as("id_a"), col("__v").as("__va"), col("__t"), col("__b"))
      .join(b.select(col("__id").as("id_b"), col("__v").as("__vb"), col("__t"), col("__b")),
        Seq("__t", "__b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", SimSearch.cosineSim(col("__va"), col("__vb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("__cos"))
      .dropDuplicates("id_a", "id_b") // a pair may collide in several tables
      .select(col("id_a"), col("id_b"), round(col("__cos"), 4).as("cosine"))
  }

  /**
   * k-NEAREST-NEIGHBOR GRAPH over an embedding column — each vector's top-k
   * most-cosine-similar neighbors among its LSH bucket collisions (the
   * candidate generation of [[embeddingPairsLsh]], directed both ways). The
   * substrate for graph-based curation: SemDeDup-style cluster seeds,
   * label propagation, NN-descent initialization, graph-connectivity
   * quality audits.
   *
   * Determinism: neighbors rank by (cosine ROUNDED to 4 decimals desc,
   * neighbor id asc) — the rounding makes the sort key bit-stable across
   * engines, and the id tiebreak totally orders equal scores. Vectors whose
   * buckets collide with fewer than k others return fewer than k rows
   * (approximate-kNN semantics — raise `nTables`/lower `nPlanes` for
   * recall, exactly the [[embeddingPairsLsh]] operating point).
   *
   * Scale shape: per-table bucket join (never all-pairs), score inside the
   * join stage so nothing downstream carries two vectors, then ONE bounded
   * aggregation ([[graft.functions.TopKAgg.perKeyDistinct]]) fuses the
   * cross-table duplicate-drop AND the rank-k cut: partial buffers collapse
   * every partition to ≤ k candidates per src map-side, so the only
   * post-join exchange carries ≤ k·|src|·partitions rows — the former
   * shape's candidate-sized `dropDuplicates` shuffle plus a second window
   * exchange is gone (r15: isolated build 0.73 → 0.61 s, gate median
   * 1.24 → 0.93 s warm at sf0.1 — modest here because 2 000 vectors are
   * stage-floor-bound, but at 100 TB the quadratic candidate relation now
   * never crosses the wire). Exact because a pair colliding in several
   * tables scores identically (deterministic cosine, rounded before
   * aggregation).
   *
   * @return (src, nbr, cosine, rank) — rank 1..k, ≤ k rows per src.
   */
  def knnGraph(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, nTables: Int = 2): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val b = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      posexplode(SimSearch.lshBucketsUdf(nPlanes, nTables)(col(vecCol))).as(Seq("__t", "__b")))
    val scored = b.select(col("__id").as("src"), col("__v").as("__va"), col("__t"), col("__b"))
      .join(b.select(col("__id").as("nbr"), col("__v").as("__vb"), col("__t"), col("__b")),
        Seq("__t", "__b"))
      .filter(col("src") =!= col("nbr"))
      .withColumn("__cos", round(SimSearch.cosineSim(col("__va"), col("__vb")), 4))
      .select(col("src"), col("nbr"), col("__cos"))
    graft.functions.TopKAgg.perKeyDistinct(scored, "src", "nbr", "__cos", k)
      .select(col("src"), col("nbr"), col("__cos").as("cosine"), col("rank"))
  }

  /**
   * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
   * web-scale through semantic deduplication"): k-means-cluster the embedding
   * space, compare pairs ONLY within a cluster, and drop all but one of each
   * semantic-duplicate group. Deterministic variant: centroids are the
   * [[SimSearch.topKIvf]] seed-and-Lloyd quantizer (id-seeded,
   * integer-quantized refinement — exactly SQL-mirrorable); assignment is
   * (cosine desc, centroid-index asc); and a row is DROPPED iff some
   * smaller-id row in its cluster has cosine ≥ threshold to it (the paper
   * keeps the example with lowest centroid-cosine — smallest id is the
   * reproducible stand-in, same dedup rate). Pair-local, not transitive:
   * chains longer than a pairwise link are [[canonicalize]]'s job.
   *
   * Scale shape — the paper's own argument: the quadratic step runs per
   * cluster, so nList is the knob that bounds it (web-scale runs use
   * ~√N clusters; cluster size ≈ N/nList). One corpus scan assigns clusters
   * (centroids broadcast, no corpus shuffle — the [[SimSearch]] kernels'
   * layout), then ONE exchange co-locates each (id, vec) exactly once by
   * cluster and the size-bounded clusters are pair-scored in memory inside
   * `mapPartitions` — no self-join, so no shuffle row ever carries two
   * vectors (the r7 judge's ~6 KB/candidate saving). Null / zero-norm embeddings
   * cannot be assigned and are absent from the output (the [[SimSearch]]
   * eligibility contract).
   *
   * @return (idCol, cluster, kept) — kept = 0 for dropped rows, 1 otherwise;
   *         filter kept = 1 and join back by id for the surviving frame.
   */
  def semDedup(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nList: Int = 16, nIters: Int = 1): DataFrame = {
    require(nList > 0, s"nList must be positive, got $nList")
    require(nIters >= 0, s"nIters must be >= 0, got $nIters")
    SimSearch.requireIntegralId(df, idCol, "input")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    def withNorm(r: Row): Option[(Long, Array[Float], Double)] = {
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else {
        val v = r.getSeq[Float](1).toArray
        var n = 0.0; var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
        if (n == 0.0) None else Some((r.getLong(0), v, math.sqrt(n)))
      }
    }
    val slim = df.select(col(idCol).cast("long"), col(vecCol))
    val seeds: Array[(Array[Double], Double)] = slim
      .orderBy(col(idCol).cast("long")).limit(nList)
      .collect().flatMap(withNorm).map { case (_, v, n) => (v.map(_.toDouble), n) }
    require(seeds.nonEmpty, "input has no non-null non-zero vectors to seed centroids")
    val cents = SimSearch.lloydRefine(slim, seeds, nIters)
    val outSchema = StructType(Seq(
      StructField("__cid", LongType), StructField("__cl", IntegerType),
      StructField("__v", ArrayType(FloatType))))
    val rdd = slim.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        withNorm(r).map { case (id, v, n) =>
          Row(id, SimSearch.ivfNearest(cents, v, n), v.toSeq)
        }
      }
    }
    val assigned = spark.createDataFrame(rdd, outSchema)
    // Within-cluster scoring WITHOUT a self-join: a self-join on __cl ships
    // every vector twice and its output carries two arrays per candidate row
    // (~6 KB/candidate at 768-dim). Instead ONE exchange co-locates each
    // (id, vec) exactly once by cluster, rows stream in (__cl, id) order, and
    // each size-bounded cluster (≈ N/nList) is scored in memory — same
    // arithmetic as the codegen'd CosineSimExpr (independent d-ascending
    // Double folds for dot and both norms), emitting an id at most once
    // (first smaller-id hit wins, so no distinct is needed).
    val droppedSchema = StructType(Seq(StructField("__cid", LongType)))
    val droppedRdd = assigned
      .repartition(col("__cl"))
      .sortWithinPartitions(col("__cl"), col("__cid"))
      .rdd.mapPartitions { rows =>
        val it = rows.buffered
        new scala.collection.AbstractIterator[Row] {
          private var pending: Iterator[Row] = Iterator.empty
          private def scoreCluster(
              buf: scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Double)]): Iterator[Row] = {
            val n = buf.length
            Iterator.range(1, n).flatMap { j =>
              val (idb, vb, nb) = buf(j)
              var hit = false
              var i = 0
              while (i < j && !hit) {
                val (_, va, na) = buf(i)
                if (va.length == vb.length) {
                  var dot = 0.0; var d = 0
                  while (d < va.length) { dot += va(d).toDouble * vb(d).toDouble; d += 1 }
                  if (dot / (na * nb) >= threshold) hit = true
                }
                i += 1
              }
              if (hit) Some(Row(idb)) else None
            }
          }
          def hasNext: Boolean = {
            while (!pending.hasNext && it.hasNext) {
              val cl = it.head.getInt(1)
              val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
              while (it.hasNext && it.head.getInt(1) == cl) {
                val r = it.next()
                val v = r.getSeq[Float](2).toArray
                var nrm = 0.0; var i = 0
                while (i < v.length) { nrm += v(i).toDouble * v(i).toDouble; i += 1 }
                buf += ((r.getLong(0), v, math.sqrt(nrm)))
              }
              pending = scoreCluster(buf)
            }
            pending.hasNext
          }
          def next(): Row = { if (!hasNext) throw new NoSuchElementException; pending.next() }
        }
      }
    val dropped = spark.createDataFrame(droppedRdd, droppedSchema)
      .withColumn("__gone", lit(1))
    assigned.join(dropped, Seq("__cid"), "left")
      .select(col("__cid").as(idCol), col("__cl").cast("long").as("cluster"),
        when(col("__gone").isNotNull, 0L).otherwise(1L).as("kept"))
  }

  /**
   * CHUNK-LEVEL CROSS-DOCUMENT DEDUP — the CCNet/RefinedWeb "paragraph dedup"
   * primitive (Wenzek et al. 2020 dedup web text at paragraph granularity;
   * here the unit is a fixed window of words, the natural analogue for
   * unstructured text without line breaks). Each document is split into
   * NON-overlapping `chunkWords`-word chunks (lowercased `[a-z]+` word runs);
   * a chunk is duplicated iff its exact content occurs in ≥ `minDocs`
   * DISTINCT documents; the cleaned text is the space-join of the surviving
   * chunks in original order.
   *
   * Scale shape: the duplicated-chunk decision is ONE aggregation keyed by
   * the chunk's md5 digest — the exchange carries (16-byte digest, doc id)
   * pairs, never chunk text twice — and reassembly is doc-keyed. No pair
   * join anywhere, so cost is linear in corpus size (the same argument as
   * [[exact]], applied per chunk). At 100 TB both shuffles are slim:
   * digests+ids for the verdict, and each chunk's text exactly once for the
   * doc-side regroup.
   *
   * Determinism: md5 of exact chunk text; counts are integers; reassembly
   * sorts by chunk index. 1:1 DuckDB oracle (`Oracles.chunkDedupSql`).
   *
   * @param keepFirst false (CCNet): every copy of a duplicated chunk is cut;
   *                  true (RefinedWeb-style): the canonical occurrence —
   *                  (min doc id, then min chunk index there) — survives
   * @return one row per input doc: (idCol, clean_text, n_chunks, dup_chunks);
   *         docs with no `[a-z]` word → ('', 0, 0).
   */
  /**
   * PARAGRAPH-level cross-doc dedup — the CCNet move on the document's OWN
   * structure (newline-delimited paragraphs) rather than fixed word windows
   * ([[chunkDedup]]'s grid): any non-empty line whose md5 appears in at
   * least `minDocs` DISTINCT documents is cut from every document, and the
   * survivors are rejoined with the original newlines in original order.
   * Boilerplate headers/footers/nav text — which align on real paragraph
   * boundaries, not word-window boundaries — disappear corpus-wide.
   *
   * Plan shape: the dup verdict is ONE aggregate on the line digest (no
   * pair join — the [[duplicateSpans]] stance); the line relation carries
   * (id, pos, line) once through a digest-keyed left join and one doc-key
   * reassembly exchange. Empty lines are never dup-cut (they are document
   * structure, kept verbatim). Null-text docs are absent; every other doc
   * gets a verdict row — a doc whose EVERY line was cut rejoins to the
   * empty string (clean_md5 = md5('')), mirrored identically in the oracle.
   *
   * @return (idCol, n_lines, n_cut, clean_md5 — md5 of the rejoined text)
   */
  def paragraphDedup(
      df: DataFrame, idCol: String, textCol: String, minDocs: Int = 2,
      skewSafe: Boolean = false): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // One lineage, one hash(__h) exchange ([[withDistinctIdCount]]), one doc
    // regroup. Empty lines can never be dup (the length > 0 guard below
    // ignores their count), so their key is SALTED per doc (r18, ADVICE r17:
    // a NUL-prefixed per-doc key — md5 output is 32 hex chars, so no
    // collision with a real digest is possible): un-salted, every blank line
    // landed in the single md5('') window partition, which AQE cannot split
    // — a serialized one-task sort on blank-heavy corpora. Their __nd is
    // computed against the salted key and never read.
    val lines = df
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("__p", "__ln")))
      .withColumn("__h",
        when(length(col("__ln")) > 0, md5(col("__ln")))
          .otherwise(concat(lit("\u0000"), col("__id").cast("string"))))
    val flagged = withDistinctIdCount(lines, "__h", "__id", "__nd", skewSafe)
      .withColumn("__dup",
        when(length(col("__ln")) > 0 && col("__nd") >= minDocs, 1L))
    flagged
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_cut"),
        md5(expr("array_join(transform(sort_array(collect_list(" +
          "CASE WHEN __dup IS NULL THEN struct(__p, __ln) END)), x -> x.__ln), '\n')"))
          .as("clean_md5"))
      .select(col("__id").as(idCol), col("n_lines"), col("n_cut"), col("clean_md5"))
  }

  def chunkDedup(
      df: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 40, minDocs: Int = 2, keepFirst: Boolean = false,
      skewSafe: Boolean = false): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive, got $chunkWords")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val W = chunkWords
    val chunks = df
      .select(col(idCol).as("__id"),
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)").as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col("__id"),
        posexplode(expr(
          s"transform(sequence(0, CAST((size(__ws) + ${W - 1}) DIV $W AS INT) - 1), " +
          s"i -> array_join(slice(__ws, i * $W + 1, $W), ' '))")).as(Seq("__ci", "__chunk")))
    val keyed = chunks.withColumn("__ck", md5(col("__chunk")))
    // All three per-key facts — distinct-doc count ([[withDistinctIdCount]]),
    // canonical doc __kd = min(__id), canonical index __kc = min __ci among
    // the canonical doc's copies — ride ONE hash(__ck) exchange as windows;
    // the former shape re-ran the chunk explode lineage for the dup-key
    // aggregate and (under keepFirst) a keeper aggregate, plus two join-backs.
    // keepFirst: the canonical occurrence of a duplicated chunk — (min doc,
    // then min chunk index within that doc) — SURVIVES; all other copies cut.
    // (CCNet removes every copy, RefinedWeb-style pipelines keep one; both
    // semantics are one flag apart on the same machinery.)
    val byCk = org.apache.spark.sql.expressions.Window.partitionBy(col("__ck"))
    // skewSafe (r18 — see [[withDistinctIdCount]]): ALL per-key facts come
    // from one aggregate + join-back, including keepFirst's canonical
    // occurrence as min(struct(id, ci)) — the lexicographic struct minimum
    // IS (min doc, then min chunk index within that doc), exactly the two
    // stacked windows' answer, and the aggregate's exchanges are
    // map-side-combined / AQE-splittable where a hot chunk's window
    // partition is one unsplittable task.
    val flagged0 =
      if (skewSafe) {
        val perKey = keyed.select(col("__ck"), col("__id"), col("__ci"))
          .groupBy(col("__ck"))
          .agg(count_distinct(col("__id")).as("__nd"),
            min(struct(col("__id").as("kd"), col("__ci").as("kc"))).as("__k"))
        val joined = keyed.join(perKey, Seq("__ck"), "left")
          .withColumn("__isdup", col("__nd") >= minDocs)
        if (!keepFirst) joined.withColumn("__keep0", lit(null))
        else joined.withColumn("__keep0",
          when(col("__id") === col("__k.kd") && col("__ci") === col("__k.kc"), lit(1L)))
      } else {
        val counted = withDistinctIdCount(keyed, "__ck", "__id", "__nd")
          .withColumn("__isdup", col("__nd") >= minDocs)
        if (!keepFirst) counted.withColumn("__keep0", lit(null))
        else counted
          .withColumn("__kd", min(col("__id")).over(byCk))
          .withColumn("__kc",
            min(when(col("__id") === col("__kd"), col("__ci"))).over(byCk))
          .withColumn("__keep0",
            when(col("__id") === col("__kd") && col("__ci") === col("__kc"), lit(1L)))
      }
    val flagged = flagged0
      .select(col("__id"), col("__ci"), col("__chunk"),
        when(col("__isdup") && col("__keep0").isNull, 1L)
          .otherwise(0L).as("__dup"))
    val perDoc = flagged.groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("__dup")).as("dup_chunks"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN __dup = 0 THEN struct(__ci, __chunk) END)), x -> x.__chunk)"),
          " ").as("clean_text"))
    df.select(col(idCol))
      .join(perDoc, col(idCol) === perDoc("__id"), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("dup_chunks"), lit(0L)).as("dup_chunks"))
  }

  /**
   * Per-source corpus-health rollup: how much of each source is exact-dup.
   * The aggregate every large-scale crawl pipeline dashboards before and
   * after a dedup pass — one groupBy over (source, digest), no text shuffle
   * (the exchange carries 16-byte digests), so it runs casually at 100 TB.
   *
   * @return (sourceCol, docs, docs_with_text, dup_docs, dup_milli) where
   *         dup_docs = docs_with_text − distinct digests and dup_milli is the
   *         integer-milli duplicated fraction of docs_with_text (0 if none).
   */
  def dedupRateBySource(df: DataFrame, textCol: String, sourceCol: String): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("docs"),
        count(col(textCol)).as("docs_with_text"),
        countDistinct(md5(col(textCol))).as("__uniq"))
      .select(col(sourceCol), col("docs"), col("docs_with_text"),
        (col("docs_with_text") - col("__uniq")).as("dup_docs"),
        when(col("docs_with_text") > 0L,
          expr("((docs_with_text - __uniq) * 1000L) DIV docs_with_text"))
          .otherwise(0L).as("dup_milli"))

  /**
   * MUTUAL-kNN NEAR-DUP CLUSTERS over an embedding column: an undirected edge
   * joins a and b iff EACH appears in the other's approximate k-nearest-
   * neighbor list ([[knnGraph]] — LSH-bucketed candidates, rank by rounded
   * cosine); clusters are the connected components of that graph. The mutual
   * constraint is the classic density filter (mutual-kNN graphs drop hub
   * edges that one-directional kNN keeps), giving tighter semantic-dup
   * groups than a raw threshold on cosine.
   *
   * Scale shape: [[knnGraph]] is bucket-joined (never all-pairs) and emits
   * ≤ k rows per vector, so the mutuality self-join runs on an O(N·k) edge
   * relation keyed by (src, nbr) — slim integers — and
   * [[ConnectedComponents.run]] is the O(log² n)-round star contraction.
   * Nothing is collected to the driver.
   *
   * @return (idCol, component) for EVERY input row — vectors with no mutual
   *         neighbor are singletons (component = own id).
   */
  /**
   * Per-cluster diverse exemplar selection — the data-pruning complement of
   * [[semDedup]] (SSL-prototypes / coreset extraction): k-means-cluster the
   * embedding space with the shared deterministic Lloyd quantizer, then in
   * EACH cluster greedily pick k exemplars by MMR with relevance = cosine to
   * the assigned centroid — rank 1 is the most prototypical member, later
   * ranks stay central while avoiding redundancy with already-picked
   * exemplars (`λ·rel − (1−λ)·max sim-to-picked`, ties to smaller id).
   * Keep the exemplars, drop (or down-weight) the rest: cluster-aware
   * pruning that preserves coverage instead of uniform subsampling.
   *
   * Scale shape: one corpus scan assigns clusters (centroids broadcast in
   * the closure, no corpus shuffle), ONE exchange groups each cluster's
   * (id, rel, vec) rows — cluster size is bounded by nList exactly as in
   * [[semDedup]] — and the O(k·|cluster|) greedy kernel runs per cluster.
   * Null / zero-norm embeddings cannot be assigned and are absent.
   *
   * Determinism/oracle contract: the quantizer is the [[SimSearch.topKIvf]]
   * chain (id-seeded, integer-quantized Lloyd — bit-identical in SQL);
   * relevance is the assignment cosine itself; the greedy steps are the
   * shared [[SimSearch.mmrSelect]] kernel, unrolled as CTEs in
   * `Oracles.clusterExemplarsSql`.
   *
   * @return (cluster, idCol, score rounded to 4, rank 1..k) — score at rank
   *         1 is the centroid cosine, later ranks the MMR objective
   */
  def clusterExemplars(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      lambda: Double = 0.5, nList: Int = 16, nIters: Int = 1): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    require(nList > 0, s"nList must be positive, got $nList")
    require(nIters >= 0, s"nIters must be >= 0, got $nIters")
    SimSearch.requireIntegralId(df, idCol, "input")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val slim = df.select(col(idCol).cast("long"), col(vecCol))
    val seeds = slim.orderBy(col(idCol).cast("long")).limit(nList).collect()
      .flatMap(SimSearch.vecWithNorm).map { case (_, v, n) => (v.map(_.toDouble), n) }
    require(seeds.nonEmpty, "input has no non-null non-zero vectors to seed centroids")
    val cents = SimSearch.lloydRefine(slim, seeds, nIters)
    val schema = StructType(Seq(
      StructField("cluster", IntegerType), StructField("__id", LongType),
      StructField("__rel", DoubleType), StructField("__v", ArrayType(FloatType))))
    val rdd = slim.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        SimSearch.vecWithNorm(r).map { case (id, v, n) =>
          val cos = SimSearch.ivfCentroidCos(cents, v, n)
          var bj = 0; var j = 1
          while (j < cos.length) { if (cos(j) > cos(bj)) bj = j; j += 1 }
          Row(bj, id, cos(bj), v.toSeq)
        }
      }
    }
    val sel = udf { (cands: Seq[Row]) =>
      SimSearch.mmrSelect(cands.map { r =>
        (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray)
      }.toArray, k, lambda)
    }
    spark.createDataFrame(rdd, schema)
      .groupBy(col("cluster"))
      .agg(collect_list(struct(col("__id"), col("__rel"), col("__v"))).as("__cands"))
      .select(col("cluster").cast("long").as("cluster"), explode(sel(col("__cands"))).as("__s"))
      .select(col("cluster"), col("__s._1").as(idCol),
        round(col("__s._2"), 4).as("score"), col("__s._3").cast("long").as("rank"))
  }

  /**
   * Per-GROUP diverse exemplar selection — [[clusterExemplars]] generalized
   * to a precomputed partition of the corpus (source, language, topic label,
   * shard): within each `groupCol` value, relevance is the cosine to the
   * group's own mean centroid (the integer-quantized per-dim mean — exact
   * Long sums, so the centroid is bit-identical across engines), and the k
   * exemplars are picked by the shared greedy MMR kernel
   * ([[SimSearch.mmrSelect]]): prototypical-but-diverse representatives per
   * group — the "show me what each source contains" / per-domain coreset
   * read.
   *
   * Scale shape: one posexplode aggregation builds the ≤ |groups|·dim
   * centroid relation (broadcast-joined back — never corpus-sized), one
   * exchange groups each group's (id, rel, vec) candidates, and the
   * O(k·|group|) greedy kernel runs per group, parallel across groups. A
   * pathologically large single group bounds its own kernel only — shard
   * the corpus by exactly this column at 100 TB. Null-group / null-vector
   * rows are dropped; zero-norm vectors and vectors whose length differs
   * from the group centroid cannot be scored and are absent (the
   * [[SimSearch.vecWithNorm]] convention).
   *
   * Determinism/oracle contract: relevance and candidate-candidate cosines
   * are d-ascending Double folds (codegen'd `zip_with`/`aggregate` HOFs),
   * mirrored by the oracle's `list_sum(list_transform(...))`; greedy steps
   * unrolled as CTEs in `Oracles.groupExemplarsSql`.
   *
   * @return (groupCol, idCol, score rounded to 4, rank 1..k)
   */
  def groupExemplars(
      df: DataFrame, idCol: String, vecCol: String, groupCol: String,
      k: Int, lambda: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    SimSearch.requireIntegralId(df, idCol, "input")
    import org.apache.spark.sql.Row
    val slim = df.select(col(groupCol).as("__g"), col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"))
      .where(col("__g").isNotNull && col("__v").isNotNull)
    val cent = slim
      .select(col("__g"), posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy(col("__g"), col("__d"))
      .agg(sum(floor(col("__x").cast("double") * lit(1000000.0) + lit(0.5)).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("__g"), col("__d"),
        (col("__s").cast("double") / (col("__n").cast("double") * lit(1000000.0))).as("__c"))
      .groupBy(col("__g"))
      .agg(expr("transform(sort_array(collect_list(struct(__d, __c))), s -> s.__c)").as("__cent"))
    val rel = slim.join(broadcast(cent), Seq("__g"))
      .withColumn("__dot", expr(
        "aggregate(zip_with(__v, __cent, (a, c) -> CAST(a AS DOUBLE) * c), 0D, (acc, x) -> acc + x)"))
      .withColumn("__nv", expr(
        "aggregate(__v, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      .withColumn("__nc", expr("aggregate(__cent, 0D, (acc, x) -> acc + x * x)"))
      .where(col("__nv") > 0.0 && col("__nc") > 0.0 &&
        size(col("__v")) === size(col("__cent")))
      .select(col("__g"), col("__id"),
        (col("__dot") / (sqrt(col("__nv")) * sqrt(col("__nc")))).as("__rel"), col("__v"))
    val sel = udf { (cands: Seq[Row]) =>
      SimSearch.mmrSelect(cands.map { r =>
        (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray)
      }.toArray, k, lambda)
    }
    rel.groupBy(col("__g"))
      .agg(collect_list(struct(col("__id"), col("__rel"), col("__v"))).as("__cands"))
      .select(col("__g").as(groupCol), explode(sel(col("__cands"))).as("__s"))
      .select(col(groupCol), col("__s._1").as(idCol),
        round(col("__s._2"), 4).as("score"), col("__s._3").cast("long").as("rank"))
  }

  /** UNDIRECTED mutual-kNN edge relation — `(id_a, id_b)` with id_a < id_b
    * iff BOTH directed [[knnGraph]] edges exist. The density-filtered
    * semantic graph [[mutualKnnClusters]] and the k-core peel run on.
    *
    * Mutuality as ONE orientation-count aggregation, not a self-join (r15):
    * each directed edge maps to its canonical (least, greatest) pair; the
    * kNN list has distinct nbr per src, so a canonical pair counts 2 iff
    * both orientations exist. That consumes the kNN list exactly ONCE —
    * map-side partials, no persisted intermediate, no broadcast — and the
    * persist moves to the final edge frame (edges ≤ directed edges / 2),
    * which multi-consumer callers (LPA + modularity in one query; k-core's
    * per-round degree joins) re-read from cache under the established
    * never-unpersist contract (callers/Bench clear the SQL cache between
    * queries). */
  def mutualKnnEdges(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, nTables: Int = 2): DataFrame =
    knnGraph(df, idCol, vecCol, k, nPlanes, nTables)
      .select(least(col("src"), col("nbr")).as("id_a"),
        greatest(col("src"), col("nbr")).as("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__o"))
      .filter(col("__o") === 2L)
      .select(col("id_a"), col("id_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** @param skewSafe passed through to
    *        [[graft.operators.ConnectedComponents.runStar]] — result-identical
    *        join-shaped star rounds whose exchanges AQE skew-join can split;
    *        set it when one semantic cluster may hold a large share of all
    *        mutual-kNN edges (boilerplate megaclusters). */
  def mutualKnnClusters(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, nTables: Int = 2, skewSafe: Boolean = false): DataFrame = {
    // mutualKnnEdges persists the final edge frame — CC's edge
    // materialization would otherwise re-run the bucket-join lineage
    // per branch (measured 7.6 → ~4 s warm at sf0.1, r10)
    val edges = mutualKnnEdges(df, idCol, vecCol, k, nPlanes, nTables)
    // Star contraction, NOT plain label propagation: near-dup clique graphs
    // converge in 2-3 propagation rounds, but mutual-kNN graphs contain long
    // nearest-neighbor CHAINS (diameter ~10+), where O(diameter) propagation
    // pays ~2 shuffles per hop — runStar closes chains in O(log² n) rounds.
    ConnectedComponents.runStar(df.select(col(idCol)), idCol, edges, "id_a", "id_b",
      skewSafe = skewSafe)
  }

  /**
   * WITHIN-document repeated-line dedup — the C4-family in-document rule
   * complementing [[paragraphDedup]]'s cross-doc cut: inside each document,
   * the FIRST occurrence of every distinct non-empty line survives and every
   * later exact copy is cut (navigation menus, repeated headers, scraper
   * stutter). Cross-doc frequency is irrelevant here — a line unique to the
   * corpus but repeated in one doc is still cut.
   *
   * Scale shape: entirely doc-local — one exchange keyed by (doc, line
   * digest) for the occurrence rank and one doc-key reassembly exchange;
   * no corpus-wide digest aggregation at all, so the operator composes with
   * [[paragraphDedup]] without double-shuffling the corpus. Empty lines are
   * document structure and always survive.
   *
   * @return one row per non-null-text doc:
   *         (idCol, n_lines, n_cut, clean_md5 — md5 of the rejoined text)
   */
  def lineDedupWithinDoc(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id"), col("__h")).orderBy(col("__p"))
    val lines = df
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("__p", "__ln")))
    val flagged = lines
      .withColumn("__h",
        when(length(col("__ln")) > 0, md5(col("__ln"))).otherwise(concat(lit("e:"), col("__p"))))
      .withColumn("__cut", when(row_number().over(w) > 1, 1L).otherwise(0L))
    flagged.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("__cut")).as("n_cut"),
        md5(expr("array_join(transform(sort_array(collect_list(" +
          "CASE WHEN __cut = 0 THEN struct(__p, __ln) END)), x -> x.__ln), '\n')"))
          .as("clean_md5"))
      .select(col("__id").as(idCol), col("n_lines"), col("n_cut"), col("clean_md5"))
  }

  /**
   * CONTENT-DEFINED CHUNKING (CDC) dedup relation — the rsync/LBFS move for
   * incremental-crawl dedup: chunk boundaries are a pure function of local
   * content (a w-char Karp–Rabin rolling hash hitting a residue class), so
   * an insertion or deletion only re-chunks its OWN neighborhood — unlike
   * [[chunkDedup]]'s fixed word grid, where one extra word shifts every
   * later chunk and destroys all downstream matches. A re-crawled page with
   * one edited sentence re-deduplicates everywhere else.
   *
   * Boundary rule (deterministic, integer-exact on both engines): for
   * 1-based char position i ∈ [w, len], H(i) = (Σ_{j=0}^{w-1}
   * code(i−j)·b^j) mod p with b=257, p=1e9+7; a chunk ends at i iff
   * H(i) mod m == m−1 (expected chunk ≈ m chars) or i == len. Every term
   * < 1.3e11, the w-term sum < 2⁶³ — exact BIGINT in both engines.
   *
   * Scale shape: boundary detection is a per-row codegen'd HOF pass (zero
   * shuffles); the cross-doc dup verdict is ONE aggregation keyed by the
   * chunk md5 (digests + ids ride the exchange, chunk text ships exactly
   * once on the doc-side regroup) — the [[chunkDedup]] plan shape on
   * content-defined units.
   *
   * @return one row per chunk: (idCol, chunk_idx, chunk_start 1-based,
   *         chunk_len, is_dup — 1 iff the chunk's exact content occurs in
   *         ≥ minDocs distinct docs). Empty-text docs emit no rows.
   * @note BMP-only positions: char codes come from `split(text, '')` +
   *       `ascii`, which Spark evaluates per UTF-16 code unit while the SQL
   *       oracle's mirror works per code POINT — for text with supplementary
   *       -plane characters (emoji etc.) the boundary sets and offsets
   *       silently diverge (same caveat as `Oracles.charCodesSql`).
   *       Normalize such text first (TextFunctions.normalizeTextCol) or
   *       treat chunk offsets as code-unit indices.
   */
  def cdcChunks(
      df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, avgChunk: Int = 64, minDocs: Int = 2,
      skewSafe: Boolean = false): DataFrame = {
    require(window >= 2 && window <= 32, s"window must be in [2,32], got $window")
    require(avgChunk >= 2, s"avgChunk must be >= 2, got $avgChunk")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val P = 1000000007L
    val b = 257L
    // Boundary detection as ONE compiled pass (r18, guide §1.2 "per-task
    // work" / §4): the former expression shape evaluated, per position, an
    // interpreted `filter` lambda with `window` boxed `element_at` probes —
    // HigherOrderFunction lambdas do not whole-stage-codegen, so every doc
    // paid O(len·w) interpreted ops plus O(len) boxed Longs. The closed JVM
    // loop below evaluates the LITERAL same expression — Σ_{j<w}
    // c(i−j)·(b^j mod P), one `% P % m` on the full sum — in primitive
    // longs, so the boundary set is bit-identical for every input
    // (including any exotic `ascii` output; no algebraic re-centering that
    // could shift a negative residue's representative). Codes still come
    // from split+ascii, keeping the documented code-unit semantics exactly.
    val pow = Array.iterate(1L, window)(x => x * b % P)
    val boundaryUdf = udf { (cs: Seq[Long]) =>
      val n = cs.length
      if (n < window) Seq.empty[Long]
      else {
        val a = cs.toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        var i = window // 1-based position of the window's last char
        while (i <= n) {
          var s = 0L
          var j = 0
          while (j < window) { s += a(i - j - 1) * pow(j); j += 1 }
          if (s % P % avgChunk == avgChunk - 1) out += i.toLong
          i += 1
        }
        out.toSeq
      }
    }
    val chunks = df
      .where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("__id"), col(textCol).as("__t"),
        expr(s"transform(split($textCol, ''), ch -> ascii(ch))").as("__cs"))
      .select(col("__id"), col("__t"), boundaryUdf(col("__cs")).as("__bs0"))
      // boundary list + the forced end-of-doc boundary, deduped when the
      // hash already fires on the last position
      .select(col("__id"), col("__t"),
        expr("array_distinct(concat(__bs0, array(length(__t))))").as("__bs"))
      .select(col("__id"), col("__t"),
        posexplode(expr(
          """transform(__bs, (e, ix) ->
               struct(CASE WHEN ix = 0 THEN CAST(1 AS BIGINT) ELSE __bs[ix - 1] + 1 END AS s,
                      e AS e))""")).as(Seq("__ci", "__seg")))
      .select(col("__id"), col("__ci").cast("long").as("__ci"),
        col("__seg.s").as("__s"), (col("__seg.e") - col("__seg.s") + 1).as("__l"),
        md5(expr("substring(__t, CAST(__seg.s AS INT), CAST(__seg.e - __seg.s + 1 AS INT))"))
          .as("__ck"))
    // distinct-doc verdict as windows over ONE hash(__ck) exchange — the
    // former aggregate + join-back ran the (expensive) rolling-hash boundary
    // lineage twice; see [[withDistinctIdCount]]
    withDistinctIdCount(chunks, "__ck", "__id", "__nd", skewSafe)
      .select(col("__id").as(idCol), col("__ci").as("chunk_idx"),
        col("__s").as("chunk_start"), col("__l").as("chunk_len"),
        when(col("__nd") >= minDocs, 1L).otherwise(0L).as("is_dup"))
  }

  /**
   * C4-STYLE LINE-RULE CLEANING (Raffel et al. 2020 §2.2, the line filters
   * every web-corpus recipe starts from, parameterized for a generic
   * corpus): a line survives iff it has ≥ `minWords` words AND its exact
   * content appears in fewer than `maxLineDf` distinct documents (the
   * "three-sentence dedup" generalized — corpus-frequent lines are
   * navigation/boilerplate). Kept lines are re-joined in original order;
   * the gate carries the rebuilt doc as an md5 so no rewritten text rides
   * the compare.
   *
   * Scale shape: one line explode, one digest-keyed exchange on which TWO
   * stacked windows compute the exact distinct-doc frequency (a lag-based
   * first-occurrence marker ordered by doc id, summed over the digest
   * partition — null ids marked 0 so the count matches COUNT(DISTINCT)),
   * one doc-keyed regroup. The former shape computed the explode lineage
   * twice (once into a countDistinct aggregate, once as the join probe) and
   * paid two aggregation exchanges plus a frequency join that degenerates
   * to a second full shuffle of the line relation once the distinct-line
   * table outgrows the broadcast threshold.
   *
   * @return one row per doc with ≥ 1 non-empty line:
   *         (idCol, n_lines non-empty, kept_lines, clean_md5)
   */
  def lineRuleClean(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, maxLineDf: Long = 2L,
      skewSafe: Boolean = false): DataFrame = {
    require(minWords >= 0, s"minWords must be >= 0, got $minWords")
    require(maxLineDf >= 1, s"maxLineDf must be >= 1, got $maxLineDf")
    val lines = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), "\n")).as(Seq("__p", "__ln")))
      .where(length(col("__ln")) > 0)
      .withColumn("__h", md5(col("__ln")))
    // Exact COUNT(DISTINCT __id) per digest — the shared window form (one
    // hash(__h) exchange) with the hot-key skewSafe fallback; see
    // [[withDistinctIdCount]] for the measured trade.
    withDistinctIdCount(lines, "__h", "__id", "__df", skewSafe)
      .withColumn("__keep",
        when(size(wordsCol(col("__ln"))) >= minWords && col("__df") < maxLineDf, 1L)
          .otherwise(0L))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_lines"), sum(col("__keep")).as("kept_lines"),
        md5(expr("array_join(transform(sort_array(collect_list(" +
          "CASE WHEN __keep = 1 THEN struct(__p, __ln) END)), x -> x.__ln), '\n')"))
          .as("clean_md5"))
      .select(col("__id").as(idCol), col("n_lines"), col("kept_lines"), col("clean_md5"))
  }

  /**
   * GROUP-LEVEL MinHash similarity matrix — which corpus slices (sources,
   * crawls, shards) duplicate each other, from signatures alone. The MinHash
   * sketch is MERGEABLE: a group's signature component j is the elementwise
   * MIN of its members' components (min over doc-mins = min over the union
   * of shingle sets), so group signatures come from ONE per-doc signature
   * pass + one tiny (group, j) aggregation — the text is read exactly once
   * no matter how many grouping levels are derived, and at 100 TB the
   * per-doc signature frame is the already-persisted [[minHashSignatures]]
   * output. Pairwise similarity is the standard signature estimate
   * (matching minima / K) over |groups|² ≤ tiny pairs.
   *
   * @return (group_a, group_b, n_docs_a, n_docs_b, matching, est_jaccard)
   *         for group_a < group_b — est_jaccard estimates the Jaccard of
   *         the two groups' UNIONED shingle sets (1.0 = same content mix).
   */
  def groupSignatureSim(
      df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val docSigs = df
      .select(col(groupCol).as("__g"), shinglesUdf(col(textCol)).as("__shs"))
      .filter(col("__g").isNotNull && size(col("__shs")) > 0)
      .select(col("__g"),
        posexplode(graft.functions.TextFunctions.minHashSigUdf(col("__shs")))
          .as(Seq("__j", "__v")))
    // tiny (|groups| × K rows) but consumed by BOTH sides of the pair join —
    // uncut, the whole per-doc shingle+MinHash pass over the corpus runs twice
    val gsig = docSigs.groupBy(col("__g"), col("__j"))
      .agg(min(col("__v")).as("__mh"))
      .localCheckpoint()
    val sizes = df.filter(col(groupCol).isNotNull && col(textCol).isNotNull)
      .groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("__n"))
    val k = graft.functions.TextFunctions.MinHashK
    gsig.as("a").join(gsig.as("b"),
        col("a.__j") === col("b.__j") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("group_a"), col("b.__g").as("group_b"))
      .agg(sum(when(col("a.__mh") === col("b.__mh"), 1L).otherwise(0L)).as("matching"))
      .join(sizes.select(col("__g").as("group_a"), col("__n").as("n_docs_a")), "group_a")
      .join(sizes.select(col("__g").as("group_b"), col("__n").as("n_docs_b")), "group_b")
      .select(col("group_a"), col("group_b"), col("n_docs_a"), col("n_docs_b"),
        col("matching"),
        round(col("matching").cast("double") / lit(k.toDouble), 6).as("est_jaccard"))
  }

  /**
   * EXACT GROUP-LEVEL n-gram overlap matrix — the sketch-free companion of
   * [[groupSignatureSim]]: for every pair of sources, the EXACT count of
   * shared distinct n-word grams and the containment fraction
   * `shared · 1000 DIV min(|A|, |B|)` (containment, not Jaccard — a small
   * source fully copied into a big one must score 1000). Gram-keyed
   * inverted join — a gram shared by k sources yields k·(k−1)/2 pair hits,
   * never an all-pairs product; distinct (source, gram-digest) rows are the
   * only shuffle. Use the sketch for routine monitoring and THIS for the
   * exact audit of flagged pairs.
   *
   * @return (source_a, source_b, n_grams_a, n_grams_b, shared_grams,
   *         containment_milli) for source_a < source_b, shared ≥ 1
   */
  def groupGramOverlap(
      df: DataFrame, groupCol: String, textCol: String, n: Int = 13): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val g = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("__g"), wordsCol(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= n)
      .select(col("__g"), explode(expr(
        s"transform(sequence(0, size(__ws) - $n), i -> array_join(slice(__ws, i + 1, $n), ' '))"))
        .as("__gram"))
      .select(col("__g"), md5(col("__gram")).as("__h")).distinct()
      // consumed THREE times (both pair-join sides + the per-group counts) —
      // uncut, each consumer re-runs the full corpus gram explode + distinct
      .localCheckpoint()
    val counts = g.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    g.as("a").join(g.as("b"),
        col("a.__h") === col("b.__h") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("source_a"), col("b.__g").as("source_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(counts.select(col("__g").as("source_a"), col("__n").as("n_grams_a")), "source_a")
      .join(counts.select(col("__g").as("source_b"), col("__n").as("n_grams_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_grams_a"), col("n_grams_b"),
        col("shared_grams"),
        expr("shared_grams * 1000 DIV least(n_grams_a, n_grams_b)")
          .as("containment_milli"))
  }

  /**
   * DOCUMENT-STITCH pairs — crawl-fragment reassembly: directional pairs
   * (a → b) where the LAST `k` words of doc a equal the FIRST `k` words of
   * doc b, i.e. b plausibly continues a (truncated page + its continuation,
   * or re-crawled overlap). Join is on the md5 of the k-word boundary gram —
   * one token pass per side, one equi-join on 32-hex digests; no text pairs
   * ever shuffle. Self-pairs are excluded; a doc with fewer than k words has
   * no boundary gram and is absent.
   *
   * @return (id_a, id_b, boundary_md5) — id_a's tail gram == id_b's head gram
   */
  def stitchPairs(
      df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Materialize the slim (id, head digest, tail digest) frame ONCE: both
    // join sides would otherwise re-scan the input, and CollapseProject
    // inlines the tokenizer regex into every boundary expression AND the
    // null-filters the join adds — measured ~5 regex evaluations per row
    // per side before the cut (doc_stitch_pairs plan: 4 corpus scans → 1).
    val bounds = df.select(col(idCol).as("__id"), wordsCol(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col("__id"),
        md5(array_join(slice(col("__ws"), 1, k), " ")).as("__head"),
        md5(array_join(slice(col("__ws"), -k, k), " ")).as("__tail"))
      .localCheckpoint()
    bounds.select(col("__id").as("id_a"), col("__tail").as("boundary_md5"))
      .join(bounds.select(col("__id").as("id_b"), col("__head").as("boundary_md5")),
        "boundary_md5")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("boundary_md5"))
  }
}
