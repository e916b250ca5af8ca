package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
import graft.streaming.EventTime

/**
 * Event-log statistics: Markov transition counts and integer-exact burst
 * detection — the "what does normal traffic look like" pair.
 */
object EventStats {

  /**
   * First-order Markov TRANSITION counts: for each user, pair every event
   * with its successor in (ts, tie) order; count (from_type, to_type) pairs
   * corpus-wide. The empirical transition matrix behind next-action priors,
   * bot-loop detection (self-transitions), and sequence-model sanity checks.
   *
   * One shuffle (user-keyed window); `lead` over the unique (ts, tie) order
   * is deterministic under any physical layout. Null event types are dropped
   * BEFORE pairing so both engines agree on adjacency.
   */
  /**
   * Telemetry DEBOUNCE — the duplicate-fire filter every event pipeline runs
   * before counting anything (double-clicks, client retries, at-least-once
   * delivery): an event is a duplicate iff the PREVIOUS identical
   * (entity, type) event sits within `windowUs` microseconds. One window
   * per (entity, type) key — a single exchange, exact integer-µs
   * comparison, (ts, id) tie order so simultaneous events resolve
   * deterministically. Null entity/type rows are dropped (the engine-wide
   * null-key convention). This is the debounce-vs-previous-occurrence rule
   * (each kept event restarts nothing); the suppress-vs-last-KEPT variant
   * is a sequential fold — use the streaming `StreamDedup` face when that
   * semantic is needed.
   *
   * @return one verdict row per event: (idCol, userCol, typeCol, is_dup 1/0)
   */
  def debounce(
      ev: DataFrame, userCol: String, typeCol: String, idCol: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0L, s"windowUs must be positive, got $windowUs")
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col("__us"), col(idCol))
    ev.select(col(idCol), col(userCol), col(typeCol), EventTime.tsMicros(ev).as("__us"))
      .where(col(userCol).isNotNull && col(typeCol).isNotNull)
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .select(col(idCol), col(userCol), col(typeCol),
        when(col("__prev").isNotNull && col("__us") - col("__prev") <= windowUs, 1L)
          .otherwise(0L).as("is_dup"))
  }

  def transitions(
      events: DataFrame, userCol: String, typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("__tsu"), col(tieCol))
    events
      .filter(col(typeCol).isNotNull)
      .withColumn("__tsu", EventTime.tsMicros(events))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * INTEGER-EXACT burst flagging on hourly counts: an (hour, type) cell is
   * anomalous when its count deviates from that type's hourly mean by more
   * than `sigmaK` standard deviations. The two-sigma rule is evaluated with
   * every division multiplied through — `(c·n − S)² > k²·(n·Σc² − S²)` over
   * BIGINT (n hours, S = Σc, per type) — so there is no float mean, no float
   * stddev, and the flag is bit-identical in any engine and any reduction
   * order. Hours with zero events are NOT materialized (count cells only);
   * the baseline is "hours that had traffic", which is the operative
   * question for burst detection on a busy stream.
   *
   * Two aggregations (cell counts, per-type moments) + one broadcast-sized
   * join back — nothing scales with raw event count after the first pass.
   *
   * @return (hour, event_type, n, flagged)
   */
  def hourlyAnomalies(
      events: DataFrame, typeCol: String, sigmaK: Int = 2): DataFrame = {
    require(sigmaK >= 1, s"sigmaK must be >= 1, got $sigmaK")
    val cells = events
      .filter(col(typeCol).isNotNull)
      .withColumn("__h", date_format(date_trunc("hour", EventTime.tsCol(events)),
        "yyyy-MM-dd HH:mm:ss"))
      .groupBy(col("__h").as("hour"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val moments = cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__nh"), sum(col("n")).as("__s"),
        sum(col("n") * col("n")).as("__s2"))
    // the squared terms can exceed Long at cluster-scale hourly counts
    // (c·n_h ~ 1e10·1e3 squares past 2⁶³); decimal(38,0) keeps the algebra
    // exact where a silent Long wraparound would flip flags — the oracle's
    // HUGEINT does the same on its side
    val nD = col("n").cast("decimal(38,0)")
    val nhD = col("__nh").cast("decimal(38,0)")
    val sD = col("__s").cast("decimal(38,0)")
    val s2D = col("__s2").cast("decimal(38,0)")
    val dev = nD * nhD - sD
    cells.join(moments, "event_type")
      .select(col("hour"), col("event_type"), col("n"),
        (dev * dev > lit(sigmaK.toLong * sigmaK) * (nhD * s2D - sD * sD)).as("flagged"))
  }

  /**
   * CUSUM drift detection on daily counts — the sustained-shift detector
   * that [[hourlyAnomalies]]'s single-cell sigma rule cannot be: a level
   * shift too small to flag any one day accumulates in
   * `S_i = max(0, S_{i−1} + (c_i − mean − slack))` until it crosses the
   * decision threshold. Everything is multiplied through by the per-type day
   * count `n_h`, so the recurrence runs on exact integers:
   * `S_i = max(0, S_{i−1} + c_i·n_h − ΣC − slack·n_h)`, flag at
   * `S_i > threshold·n_h` — bit-identical to the oracle's recursive CTE.
   *
   * The fold is sequential per type over the DAY-grain relation (|types| ×
   * |days| rows — thousands forever, never the raw log), parallel across
   * types: the same repartition + in-partition sort + streaming pass shape
   * as [[Packing.packGreedy]].
   *
   * @param slack     per-day allowance in count units (absorbs noise)
   * @param threshold decision level in count units
   * @return (event_type, day, n, cusum, flagged)
   */
  def cusumDaily(
      events: DataFrame, typeCol: String, slack: Long, threshold: Long): DataFrame = {
    require(slack >= 0L && threshold > 0L,
      s"need slack >= 0 and threshold > 0, got $slack/$threshold")
    val spark = events.sparkSession
    val cells = events
      .filter(col(typeCol).isNotNull)
      .withColumn("__day", to_date(EventTime.tsCol(events)))
      .groupBy(col(typeCol).as("event_type"), col("__day").as("day"))
      .agg(count(lit(1)).as("n"))
    val m = cells.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__nh"), sum(col("n")).as("__s"))
    val slim = cells.join(m, "event_type")
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("__nh"), col("__s"))
      .repartition(col("event_type"))
      .sortWithinPartitions(col("event_type"), col("day"))
    val outSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("day", StringType),
      StructField("n", LongType, nullable = false),
      StructField("cusum", LongType, nullable = false),
      StructField("flagged", BooleanType, nullable = false)))
    val outRdd = slim.rdd.mapPartitions { it =>
      var t: String = null
      var s = 0L
      it.map { r =>
        val rt = r.getString(0)
        if (rt != t) { t = rt; s = 0L }
        val n = r.getLong(2); val nh = r.getLong(3); val tot = r.getLong(4)
        s = math.max(0L, s + n * nh - tot - slack * nh)
        Row(rt, r.getString(1), n, s, s > threshold * nh)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /**
   * BOT-REGULARITY flags: a user whose inter-event gaps are implausibly
   * uniform (coefficient of variation < 1/cvDenom) is a scheduler, not a
   * human. The CV test runs with every division multiplied through —
   * `cvDenom²·(n·Σg² − S²) < S²` over exact integer µs gaps (decimal(38,0):
   * µs gaps square to ~10²⁴ at month-long idles, past Long) — so the flag is
   * bit-identical in any engine. Gaps come from the same one-shuffle
   * (ts, tie)-ordered window as [[transitions]]; users with < minEvents
   * events are excluded (too few gaps to judge).
   *
   * @return (userCol, n_gaps, bot) — bot = true when the gap CV < 1/cvDenom.
   */
  def botFlags(
      events: DataFrame, userCol: String, tieCol: String,
      minEvents: Int = 5, cvDenom: Int = 4): DataFrame = {
    require(minEvents >= 3, s"minEvents must be >= 3, got $minEvents")
    require(cvDenom >= 1, s"cvDenom must be >= 1, got $cvDenom")
    val w = Window.partitionBy(col(userCol)).orderBy(col("__tsu"), col(tieCol))
    val gaps = events
      .withColumn("__tsu", EventTime.tsMicros(events))
      .withColumn("__prev", lag(col("__tsu"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col(userCol), (col("__tsu") - col("__prev")).as("__g"))
    val m = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__g")).as("__s"),
        sum(col("__g").cast("decimal(38,0)") * col("__g").cast("decimal(38,0)")).as("__s2"))
      .filter(col("n_gaps") >= minEvents - 1)
    val nD = col("n_gaps").cast("decimal(38,0)")
    val sD = col("__s").cast("decimal(38,0)")
    m.select(col(userCol), col("n_gaps"),
      (lit(cvDenom.toLong * cvDenom) * (nD * col("__s2") - sD * sD) < sD * sD).as("bot"))
  }

  /**
   * WEEKLY CHURN ACCOUNTING — the ops dashboard complement of cohort
   * retention: per Monday-start week, how many users were active, how many
   * were retained from the previous week, how many are incoming (not
   * active last week), and how many of last week's actives churned.
   * Pure set arithmetic on distinct (week, user) — one distinct pass, one
   * user-keyed week-over-week self-join, integer-exact.
   *
   * @return (week yyyy-MM-dd, n_active, n_retained, n_incoming, n_churned)
   */
  def weeklyChurn(events: DataFrame, userCol: String): DataFrame = {
    // (week × user)-bounded distinct relation with FOUR consumers (weekly
    // counts, spine bounds, both self-join sides) — checkpointed so the
    // event log scans once
    val act = events.filter(col(userCol).isNotNull)
      .select(date_trunc("week", EventTime.tsCol(events)).as("__w"),
        col(userCol).as("__u"))
      .distinct()
      .localCheckpoint()
    val wk = act.groupBy(col("__w")).agg(count(lit(1)).as("n_active"))
    // Dense week spine min..max: a week where the WHOLE base churned still
    // gets a row (n_active=0, n_churned=prev) instead of vanishing, and a
    // multi-week gap charges the churn to the first silent week only.
    val spine = act.agg(min(col("__w")).as("__lo"), max(col("__w")).as("__hi"))
      .select(explode(expr("sequence(__lo, __hi, INTERVAL 7 DAYS)")).as("__w"))
    val ret = act.as("a").join(act.as("b"),
        col("a.__u") === col("b.__u") &&
          col("b.__w") === col("a.__w") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("a.__w").as("__w")).agg(count(lit(1)).as("__ret"))
    val prev = wk.select((col("__w") + expr("INTERVAL 7 DAYS")).as("__w"),
      col("n_active").as("__prev"))
    spine.join(wk, Seq("__w"), "left").join(ret, Seq("__w"), "left")
      .join(prev, Seq("__w"), "left")
      .select(date_format(col("__w"), "yyyy-MM-dd").as("week"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("__ret"), lit(0L)).as("n_retained"),
        (coalesce(col("n_active"), lit(0L)) - coalesce(col("__ret"), lit(0L)))
          .as("n_incoming"),
        (coalesce(col("__prev"), lit(0L)) - coalesce(col("__ret"), lit(0L)))
          .as("n_churned"))
  }

  /**
   * ASSOCIATION RULES over event baskets — market-basket co-occurrence on
   * (user, day) baskets: for every ordered pair of event types (a → b),
   * support counts, confidence = P(b | a) and lift = conf / P(b), all in
   * exact integer milli/micro (counts-only arithmetic — the Agrawal-style
   * rule miner reduced to the pair level, which is what event taxonomies
   * actually need; |types|² pairs is tiny however big the corpus).
   *
   * Scale shape: one distinct (basket, type) pass, one basket-keyed
   * self-join (bounded by types-per-basket, never users²), one pair rollup
   * against broadcast per-type totals.
   *
   * @return (type_a, type_b, n_a baskets with a, n_ab baskets with both,
   *         confidence_milli = n_ab·1000 DIV n_a,
   *         lift_micro = n_ab·N·10⁶ DIV (n_a·n_b)) for a ≠ b
   */
  def associationRules(
      events: DataFrame, userCol: String, typeCol: String): DataFrame = {
    // checkpointed: the basket relation (already distinct — bounded by
    // baskets × types, not by raw events) has FOUR consumers below (totals,
    // per-type counts, both self-join sides); uncut, each re-scans the
    // event log and re-pays the distinct exchange
    val b = events.filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(EventTime.tsCol(events)).as("__day"),
        col(typeCol).as("__t"))
      .distinct()
      .localCheckpoint()
    val n = b.select(col("__u"), col("__day")).distinct()
      .agg(count(lit(1)).as("__N"))
    val per = b.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    val pairs = b.as("x").join(b.as("y"),
        col("x.__u") === col("y.__u") && col("x.__day") === col("y.__day") &&
          col("x.__t") =!= col("y.__t"))
      .groupBy(col("x.__t").as("type_a"), col("y.__t").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(per.select(col("__t").as("type_a"), col("__n").as("n_a")), "type_a")
      .join(per.select(col("__t").as("type_b"), col("__n").as("n_b")), "type_b")
      .crossJoin(broadcast(n))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_ab"),
        expr("n_ab * 1000 DIV n_a").as("confidence_milli"),
        // DECIMAL(38,0) intermediates: n_ab·N·1e6 overflows BIGINT once
        // basket count N passes ~3M; IntegralDivide on decimals still
        // returns BIGINT, so the output column type is unchanged.
        expr("""CAST(n_ab AS DECIMAL(38,0)) * __N * 1000000
                DIV (CAST(n_a AS DECIMAL(38,0)) * n_b)""").as("lift_micro"))
  }

  /**
   * LINEAR MULTI-TOUCH ATTRIBUTION — the marketing-analytics staple as one
   * relational pass: every `convType` event is a conversion; its touches
   * are the same user's non-conversion events in the `lookbackDays` window
   * strictly before it; each touch of an n-touch conversion gets
   * `1000 DIV n` milli-credits and the LAST touch (latest ts, event_id
   * desc tie-break) absorbs the integer remainder, so every conversion
   * with ≥ 1 touch distributes EXACTLY 1000 — integer-conservation the
   * oracle can hash. Also reports per-channel first-touch / last-touch
   * counts (the other two classic models come free from the same windows).
   * Touchless conversions attribute nothing (documented).
   *
   * Scale shape: one user-keyed join (touch × conversion, both sides
   * pre-filtered and slim), two windows over the SAME conversion-id
   * partition (one exchange), one channel-keyed rollup.
   *
   * @return one row per touch channel: (typeCol, n_touches, credit_milli,
   *         n_first, n_last)
   */
  def linearAttribution(
      events: DataFrame, userCol: String, typeCol: String,
      convType: String, lookbackDays: Int = 7): DataFrame =
    attributionRollup(events, userCol, typeCol, convType, lookbackDays,
      expr("1000 DIV __n") +
        when(col("__rl") === 1, expr("1000 - __n * (1000 DIV __n)"))
          .otherwise(lit(0L)))

  /**
   * U-SHAPE (position-based) ATTRIBUTION — the other standard model beside
   * [[linearAttribution]], same join/window machinery: the FIRST touch gets
   * `firstMilli`, the LAST gets `lastMilli`, the middles share the rest
   * (`(1000−f−l) DIV (n−2)` each, integer remainder to the last touch).
   * Pinned edge conventions: a single touch takes all 1000; with exactly
   * two, each end takes 500. Conservation: every touched conversion
   * distributes exactly 1000 milli.
   * @return (typeCol, n_touches, credit_milli, n_first, n_last)
   */
  def positionAttribution(
      events: DataFrame, userCol: String, typeCol: String,
      convType: String, lookbackDays: Int = 7,
      firstMilli: Long = 400L, lastMilli: Long = 400L): DataFrame = {
    require(firstMilli >= 0L && lastMilli >= 0L && firstMilli + lastMilli <= 1000L,
      s"need firstMilli + lastMilli <= 1000, got $firstMilli + $lastMilli")
    val mid = s"(1000 - $firstMilli - $lastMilli)"
    attributionRollup(events, userCol, typeCol, convType, lookbackDays,
      expr(s"""CASE WHEN __n = 1 THEN 1000
               WHEN __n = 2 THEN 500
               WHEN __rf = 1 THEN $firstMilli
               WHEN __rl = 1 THEN CAST($lastMilli AS BIGINT) +
                 ($mid - (__n - 2) * ($mid DIV (__n - 2)))
               ELSE $mid DIV (__n - 2) END"""))
  }

  /**
   * TIME-DECAY ATTRIBUTION — the third classic model beside
   * [[linearAttribution]] and [[positionAttribution]], same join/window
   * machinery: each touch is weighted by a power-of-two recency decay
   * `w = 2^30 >> min(days_before_conversion DIV halfLifeDays, 30)` (the
   * [[decayedEngagement]] halving-staircase stance: integer shifts instead
   * of exp(−λt) keep every intermediate BIGINT-exact and oracle-hashable),
   * and credit is the weight-proportional integer split
   * `1000·w DIV Σw` with the remainder absorbed by the LAST touch — every
   * touched conversion distributes EXACTLY 1000 milli, like the other two
   * models (the conservation law the gates hash).
   * @return (typeCol, n_touches, credit_milli, n_first, n_last)
   */
  def decayAttribution(
      events: DataFrame, userCol: String, typeCol: String,
      convType: String, lookbackDays: Int = 7, halfLifeDays: Int = 2): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    attributionRollup(events, userCol, typeCol, convType, lookbackDays,
      col("__base") +
        when(col("__rl") === 1, lit(1000L) - col("__bsum")).otherwise(lit(0L)),
      weightExpr = Some(expr(
        s"shiftright(CAST(1073741824 AS BIGINT), " +
          s"CAST(least((__cus - __us) DIV ${86400L * 1000000L * halfLifeDays}, 30) AS INT))")))
  }

  /** Shared conversion-window core of the attribution models: touches in the
    * lookback window before each conversion, with per-conversion count and
    * first/last ranks exposed as `__n`/`__rf`/`__rl` to `creditExpr`. With
    * `weightExpr` (over `__us`/`__cus`) the weighted-split columns are also
    * exposed: `__base = 1000·w DIV Σw` and its per-conversion sum `__bsum`
    * (so the caller can hand the integer remainder to one touch). */
  private def attributionRollup(
      events: DataFrame, userCol: String, typeCol: String,
      convType: String, lookbackDays: Int,
      creditExpr: org.apache.spark.sql.Column,
      weightExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(lookbackDays >= 1, s"lookbackDays must be >= 1, got $lookbackDays")
    val lookUs = lookbackDays.toLong * 86400L * 1000000L
    val ev = events.filter(col(userCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        col("event_id").as("__e"), EventTime.tsMicros(events).as("__us"))
    val conv = ev.filter(col("__t") === convType)
      .select(col("__u"), col("__e").as("__cid"), col("__us").as("__cus"))
    val touch = ev.filter(col("__t") =!= convType)
    val joined = touch.join(conv,
      touch("__u") === conv("__u") &&
        col("__us") < col("__cus") && col("__us") >= col("__cus") - lit(lookUs))
      .select(touch("__u"), col("__t"), col("__e"), col("__us"),
        col("__cid"), col("__cus"))
    val wn = Window.partitionBy(col("__cid"))
    val wLast = wn.orderBy(col("__us").desc, col("__e").desc)
    val wFirst = wn.orderBy(col("__us").asc, col("__e").asc)
    val ranked = joined
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("__rl", row_number().over(wLast))
      .withColumn("__rf", row_number().over(wFirst))
    // NOTE __wt/__wsum, not __w/__W: Spark's resolver is case-insensitive,
    // so a __W withColumn would silently REPLACE __w.
    val weighted = weightExpr.fold(ranked) { we =>
      ranked.withColumn("__wt", we)
        .withColumn("__wsum", sum(col("__wt")).over(wn))
        .withColumn("__base", expr("(1000 * __wt) DIV __wsum"))
        .withColumn("__bsum", sum(col("__base")).over(wn))
    }
    weighted
      .select(col("__t"), creditExpr.as("__credit"), col("__rl"), col("__rf"))
      .groupBy(col("__t").as(typeCol))
      .agg(count(lit(1)).as("n_touches"), sum(col("__credit")).as("credit_milli"),
        sum(when(col("__rf") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("__rl") === 1, 1L).otherwise(0L)).as("n_last"))
  }

  /**
   * DAY-OF-WEEK SEASONAL BASELINE + RESIDUALS — the "is today unusual FOR A
   * TUESDAY" read that a raw daily count can't give: per event type, the
   * mean daily count for each weekday over a DENSE day spine (min..max —
   * zero-event days count toward the mean, the [[weeklyChurn]] lesson), and
   * each day's residual against its weekday baseline. Complements
   * [[cusum]]-style change detection with an explicitly seasonal model.
   * Integer-exact: baseline = ⌊Σn·10⁶ / days⌋ via DECIMAL(38,0) (daily
   * counts at corpus scale push the ×10⁶ product past BIGINT), residual =
   * n·10⁶ − baseline. Weekday convention: Spark `weekday()` ≡ DuckDB
   * `isodow − 1`, 0 = Monday (the [[activityHeatmap]] convention).
   *
   * Scale shape: one (type, day) count, a days×types spine join (tiny), one
   * (type, weekday) rollup broadcast back — the event table is touched once.
   *
   * @return (typeCol, day, n_events, baseline_micro, resid_micro)
   */
  def seasonalBaseline(events: DataFrame, typeCol: String): DataFrame = {
    // (type × day)-bounded with three consumers (spine bounds, type list,
    // densify join) — checkpointed so the event log scans once; same for the
    // densified frame (baseline rollup + final join)
    val ec = events.filter(col(typeCol).isNotNull)
      .groupBy(col(typeCol).as("__t"), to_date(EventTime.tsCol(events)).as("__d"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    val spine = ec.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(explode(expr("sequence(__lo, __hi, INTERVAL 1 DAY)")).as("__d"))
    val dense = spine.crossJoin(ec.select(col("__t")).distinct())
      .join(ec, Seq("__t", "__d"), "left")
      .select(col("__t"), col("__d"), coalesce(col("__n"), lit(0L)).as("__n"))
      .withColumn("__dw", expr("weekday(__d)"))
      .localCheckpoint()
    val bl = dense.groupBy(col("__t"), col("__dw"))
      .agg(expr("CAST(CAST(sum(__n) AS DECIMAL(38,0)) * 1000000 DIV count(*) AS BIGINT)")
        .as("baseline_micro"))
    dense.join(bl, Seq("__t", "__dw"))
      .select(col("__t").as(typeCol), date_format(col("__d"), "yyyy-MM-dd").as("day"),
        col("__n").as("n_events"), col("baseline_micro"),
        (col("__n") * lit(1000000L) - col("baseline_micro")).as("resid_micro"))
  }

  /**
   * TIME-DECAYED ENGAGEMENT SCORE — recency-weighted per-user value with an
   * INTEGER-EXACT half-life: each event contributes
   * `cents DIV 2^(days_ago DIV halfLifeDays)` (cents = value in exact
   * integer cents, days_ago anchored to the corpus max day so the score is
   * a pure function of the data — reproducible across runs, no wall-clock).
   * Power-of-two decay by integer shift instead of exp(−λt): the halving
   * staircase IS the half-life semantics, and staying in BIGINT keeps the
   * score reduction-order-proof and oracle-checkable (the [[GraphRank]]
   * quantization stance). Shift capped at 40 (decay below 2⁻⁴⁰ is 0 cents
   * for any realistic value).
   *
   * Scale shape: one 1-row anchor broadcast, one map pass, one user-keyed
   * aggregation — nothing else moves.
   *
   * @return (userCol, n_events, decayed_cents)
   */
  def decayedEngagement(
      events: DataFrame, userCol: String, valueCol: String,
      halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    // null users dropped to match StreamDecay.scores (whose typed Long key
    // cannot hold null) — the stream ≡ batch identity holds by construction,
    // not by the data happening to contain no null users
    val d = events.filter(col(valueCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol), to_date(EventTime.tsCol(events)).as("__day"),
        expr(s"CAST(floor($valueCol * 100.0 + 0.5) AS BIGINT)").as("__cents"))
    val anchor = d.agg(max(col("__day")).as("__maxd"))
    d.crossJoin(broadcast(anchor))
      .select(col(userCol),
        expr(s"__cents DIV shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(least(datediff(__maxd, __day) DIV $halfLifeDays, 40) AS INT))")
          .as("__c"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__c")).as("decayed_cents"))
  }
}
