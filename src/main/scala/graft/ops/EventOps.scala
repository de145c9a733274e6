package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Exact
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Event-stream operators over `events(event_id, ts, user_id, event_type,
  * value, props)` — the engine's time-series/streaming capability surface
  * (SURVEY §2.8). The reference's "streaming" is a 6-hour sleep loop
  * (`/root/reference/etl/pipeline.py:379-384`); the real upgrade is
  * event-time windowing, which these functions provide in BATCH form.
  * `graft.streaming.StreamOps` applies the same functions to `readStream`
  * inputs — one definition, two execution modes.
  *
  * All window aggregations are two-phase (partial map-side combine, then one
  * shuffle keyed by (window, key)) — the shape that scales: shuffle volume is
  * O(groups), not O(events).
  */
object EventOps {

  /** Schema of the `props` JSON column — declared, not inferred (SURVEY §1.3:
    * production paths use explicit schemas).
    */
  val PropsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** Typed extraction from the JSON `props` string (SURVEY X5 + P3: nested
    * field access on the parsed struct).
    */
  def withProps(events: DataFrame): DataFrame =
    events.withColumn("p", from_json(col("props"), PropsSchema))
      .withColumn("prop_k", col("p.k"))
      .drop("p")

  /** Tumbling event-time window aggregate: (window_start, event_type) →
    * count + sum(value).
    */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dollars(sum(Exact.cents(col("value")))).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding event-time window aggregate (width > slide ⇒ each event lands in
    * width/slide windows; Spark's `window` generator emits them all).
    */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
                    slide: String = "5 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dollars(sum(Exact.cents(col("value")))).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user: events closer than `gap` merge into one
    * session. Uses the native `session_window` generator (works in batch and
    * streaming). Emits (user_id, session_start, session_end, n_events).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Exact.dollars(sum(Exact.cents(col("value")))).as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("n_events"), col("sum_value"))

  /** Exact per-user TWAP (time-weighted average value) over irregular
    * samples: each observation holds (last-observation-carried-forward)
    * until the user's NEXT event, so its weight is that interval in
    * seconds — `Σ cents·Δsec div Σ Δsec`, the integral of the step
    * function over the user's observed span. The canonical irregular-
    * time-series readout (a plain AVG over-weights bursts). All-long
    * arithmetic on cents × seconds with one truncating division at the
    * end (values are NON-NEGATIVE in this corpus; a signed-value corpus
    * would need the pmod-floor discipline). Users whose events all share
    * one second (zero span) are excluded — the integral is undefined.
    *
    * Scale shape: one user-keyed window for `lead` (keyed shuffle), one
    * user-keyed sum — no global window, no state beyond the group.
    */
  def twapCents(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    events.select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"),
        Exact.cents(col("value")).as("cents"))
      .withColumn("nxt", lead(col("sec"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * (col("nxt") - col("sec"))).as("num"),
        sum(col("nxt") - col("sec")).as("den"))
      .filter(col("den") > 0)
      .select(col("user_id"), expr("num div den").as("twap_cents"),
        col("den").as("span_sec"))
  }

  /** Deterministic stream-style dedup: earliest event per (user_id,
    * event_type) — the batch shape of `dropDuplicates` with a defined
    * survivor (streaming keeps the first arrival; batch must pin order).
    */
  def dedupEarliest(events: DataFrame): DataFrame =
    Relational.firstPerKey(events, Seq("user_id", "event_type"),
      Seq(col("ts").asc, col("event_id").asc))

  /** Pivot event counts to one column per event type (fixed domain ⇒ no
    * pivot-values discovery job; at scale always pass the domain).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  def pivotCounts(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)

  /** Funnel analysis: how many users performed `steps` IN ORDER, each step
    * within `gapSeconds` of the previous step's completion. A user's step-i
    * time is the EARLIEST qualifying occurrence after their step-(i-1)
    * time — the standard product-analytics definition (first touch, strict
    * progression).
    *
    * Plan shape: one keyed min-aggregate anchors the first step, then each
    * later step is an equi-join on user_id + a time-window filter +
    * another keyed min — every shuffle is on user_id, each stage's frame
    * only SHRINKS, and the final per-step counts are map-side partial
    * counts of those shrunken frames. No windows over the event stream, no
    * per-user event sorting — at 100 TB the events table is scanned once
    * per step with the type filter pushed to the parquet reader.
    * Timestamps compare as epoch SECONDS (`unix_timestamp`) so the oracle
    * replays the arithmetic exactly.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             gapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col("user_id"),
      unix_timestamp(col("ts")).as("_t"), col("event_type"))
    val anchor = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("_t")).as("_tp"))
    val reached = steps.tail.scanLeft(anchor) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("_tp")), "user_id")
        .filter(col("_t") > col("_tp") &&
          col("_t") <= col("_tp") + lit(gapSeconds))
        .groupBy(col("user_id")).agg(min(col("_t")).as("_tp"))
    }
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit((i + 1).toLong).as("step_idx"),
          col("n_users"))
    }.reduce(_ unionByName _).orderBy(col("step_idx"))
  }

  /** Cohort retention: users grouped by the UTC week of their first
    * `anchorType` event, counted as retained in week k if they have ANY
    * event in cohort-week + k. Two keyed shuffles (per-user anchor min,
    * then the (cohort_week, week_k) distinct-count); weeks are compared as
    * epoch seconds of week-truncated timestamps, so the arithmetic is
    * exact and engine-portable (differences are exact multiples of 604800
    * in a UTC session — no DST).
    */
  def cohortRetention(events: DataFrame, anchorType: String,
                      maxWeeks: Int): DataFrame = {
    def week(c: Column): Column = unix_timestamp(date_trunc("week", c))
    val cohort = events.filter(col("event_type") === anchorType)
      .groupBy(col("user_id")).agg(min(week(col("ts"))).as("cohort_week"))
    events.select(col("user_id"), week(col("ts")).as("w"))
      .join(cohort, "user_id")
      .withColumn("week_k",
        ((col("w") - col("cohort_week")) / lit(604800L)).cast("long"))
      .filter(col("week_k") >= 0 && col("week_k") <= maxWeeks)
      .groupBy(col("cohort_week"), col("week_k"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_k"))
  }

  /** Deterministic per-user session ids: a new session starts when the gap
    * from the user's previous event exceeds `gapSeconds` — the same
    * mark-run-starts-then-cumsum window trick as `History.scd2FromEvents`,
    * so every shuffle is keyed on user_id and the sort is bounded by one
    * user's history. (Batch twin of the engine's `session_window`; having
    * the id ON each event row is what lets downstream operators group by
    * session.)
    */
  def sessionIds(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("_t", unix_timestamp(col("ts")))
      .withColumn("_brk",
        when(col("_t") - lag(col("_t"), 1).over(w) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("_brk")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .drop("_t", "_brk")
  }

  /** `funnel`, but every step must land in the SAME session (product
    * analytics' default conversion definition): the composite
    * (user, session) key rides through the plain funnel machinery, whose
    * per-step gap is set far beyond any session's span so the session
    * boundary is the only constraint. Counts are per SESSION, not per
    * user.
    */
  def funnelSessions(events: DataFrame, steps: Seq[String],
                     sessionGapSeconds: Long): DataFrame = {
    val sess = sessionIds(events, sessionGapSeconds)
      .select(concat(col("user_id"), lit("#"), col("sid")).as("user_id"),
        col("ts"), col("event_type"))
    funnel(sess, steps, gapSeconds = 4000000000L)
      .withColumnRenamed("n_users", "n_sessions")
  }

  /** Rolling distinct users per trailing `windowHours`-hour window, from
    * MERGEABLE hourly HLL sketches — the incremental-view pattern for the
    * dashboard staple "uniques in the last N hours". One pass builds ONE
    * sketch per hour (map-side partial HLL merge); each sketch then
    * contributes to the `windowHours` windows ending at or after it (an
    * offset explode — the same trick as the sliding-window oracle), and a
    * sketch UNION per window gives the estimate. At scale the hourly
    * sketch table is the stored state: a new hour's events touch one
    * sketch, a trailing window re-unions `windowHours` sketches (KB each),
    * and the raw event history is NEVER re-scanned — contrast recomputing
    * `count(DISTINCT)` over a sliding scan of the stream. The exact
    * distinct count rides along for the tolerance verdict
    * (`agg_approx_distinct` pattern); window ids are epoch seconds of the
    * window's LAST hour.
    */
  def rollingDistinctUsers(events: DataFrame, windowHours: Int,
                           lgK: Int = 12): DataFrame = {
    // tolerance follows the sketch's own error contract: RSE ≈ 1.04/√2^lgK
    val tol = 3.0 * 1.04 / math.sqrt(math.pow(2.0, lgK))
    val offsets = (0 until windowHours)
      .map(k => col("h") + lit(k * 3600L))
    val e = events.select(
      unix_timestamp(date_trunc("hour", col("ts"))).as("h"), col("user_id"))
    val hourly = e.groupBy(col("h"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sk"))
    val approx = hourly
      .select(explode(array(offsets: _*)).as("w"), col("sk"))
      .groupBy(col("w"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
    val exact = e
      .select(explode(array(offsets: _*)).as("w"), col("user_id"))
      .groupBy(col("w"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    approx.join(exact, "w")
      .select(col("w"), col("n_users"),
        (abs(col("approx_users") - col("n_users")) <=
          lit(tol) * col("n_users")).as("approx_ok"))
      .orderBy(col("w"))
  }

  /** Event-type transition counts (the Markov/path-analysis primitive):
    * per user, consecutive event pairs under the total (ts, event_id)
    * order, aggregated to (from_type, to_type, n). One keyed window — the
    * per-user sort is the only non-map work, and it is bounded by a single
    * user's history, never the stream.
    */
  /** Exact A/B experiment readout: arm = deterministic user split
    * (`user_id % 2`), conversion = the user fired `convType` at least
    * once. Per-user collapse (ONE keyed shuffle on user), then a 2-arm
    * contingency aggregate; conversion rates and lift in floor basis
    * points (integer-exact), and the 2×2 χ² statistic formed as an exact
    * Decimal(38,0) numerator N·(ad−bc)² over denominator
    * (a+b)(c+d)(a+c)(b+d) with ONE final double division (rounded 6dp) —
    * bit-deterministic, the same discipline as `groupCorrelation`.
    * Output: one row per arm pair: users/conversions per arm, each arm's
    * conv_bp, lift_bp (arm0 − arm1), chi2.
    */
  def abLift(events: DataFrame, convType: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perUser = events.groupBy(col("user_id"))
      .agg(max(when(col("event_type") === convType, 1L).otherwise(0L))
        .as("conv"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    val wide = arms.agg(
      sum(when(col("arm") === 0, col("n_users"))).as("n0"),
      sum(when(col("arm") === 0, col("n_conv"))).as("c0"),
      sum(when(col("arm") === 1, col("n_users"))).as("n1"),
      sum(when(col("arm") === 1, col("n_conv"))).as("c1"))
    // contingency: a=c0, b=n0−c0, c=c1, d=n1−c1
    val (a, b, c, d) = (col("c0").cast(dec), (col("n0") - col("c0")).cast(dec),
      col("c1").cast(dec), (col("n1") - col("c1")).cast(dec))
    val n = a + b + c + d
    val num = n * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    wide.select(
      col("n0"), col("c0"), col("n1"), col("c1"),
      expr("(c0 * 10000) div n0").as("conv0_bp"),
      expr("(c1 * 10000) div n1").as("conv1_bp"),
      (expr("(c0 * 10000) div n0") - expr("(c1 * 10000) div n1"))
        .as("lift_bp"),
      when(den === lit(0).cast(dec), lit(null))
        .otherwise(Vectors.round6(num.cast("double") / den.cast("double")))
        .as("chi2"))
  }

  /** CUPED-adjusted A/B revenue readout (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments by Utilizing Pre-
    * Experiment Data"): per user, x = `convType` value cents BEFORE
    * `splitTs` (the pre-experiment covariate) and y = value cents on/after
    * it (the experiment metric); θ = cov(x,y)/var(x) pooled over all
    * users; each arm's adjusted mean is ȳ_a − θ·(x̄_a − x̄), so the
    * adjusted lift is (ȳ₀−ȳ₁) − θ·(x̄₀−x̄₁) — same expectation as the raw
    * lift, variance reduced by the covariate's explanatory power.
    *
    * Determinism: per-user sums are exact cents; the arm/global moment
    * sums are exact Decimal(38,0) (`Relational.momentSums` — reduction-
    * order-free); doubles enter only in θ's single division (6dp) and the
    * mean arithmetic on exact integer-valued doubles, so the oracle
    * replays every bit. Scale shape: one keyed user aggregate → a 2-row
    * arm aggregate → one 1-row combine; nothing data-sized past the
    * first groupBy. Zero pre-period variance → NULL θ and adjusted lift
    * (CUPED undefined); means are CENTS.
    */
  def abCuped(events: DataFrame, convType: String,
              splitTs: String): DataFrame =
    cupedCore(cupedPerUser(events, convType, splitTs), Nil)

  /** Segmented CUPED: the same adjustment computed WITHIN each stratum —
    * per-segment θ (each segment's own covariance structure) and
    * per-segment adjusted lift, the heterogeneous-treatment-effect
    * readout. `segment` must be a deterministic function of `user_id`
    * (a user attribute — anything else would straddle arms), evaluated
    * on the per-user frame. One extra grouping key end to end; output is
    * one row per segment, segment-sized.
    */
  def abCupedBy(events: DataFrame, convType: String, splitTs: String,
                segment: Column): DataFrame =
    cupedCore(
      cupedPerUser(events, convType, splitTs).withColumn("seg", segment),
      Seq("seg"))

  /** Per-user conversion cents + arm moments, one row per arm pair:
    * (n0, sy0, syy0, n1, sy1, syy1) as exact Decimal(38,0) — the shared
    * front half of the power / sequential readouts. One user-keyed
    * aggregate → 2-row arm aggregate → 1-row combine; nothing data-sized
    * past the first groupBy (the `abCuped` scale shape).
    */
  private def armMoments(events: DataFrame, convType: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perUser = events.groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === convType,
        Exact.cents(col("value")))), lit(0L)).as("y"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
      .withColumn("_y", col("y").cast(dec))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).cast(dec).as("_n"), sum(col("_y")).as("_sy"),
        sum(col("_y") * col("_y")).as("_syy"))
    def armCol(a: Int, c: String) = sum(when(col("arm") === a, col(c)))
    arms.agg(
      armCol(0, "_n").as("dn0"), armCol(0, "_sy").as("dsy0"),
      armCol(0, "_syy").as("dsyy0"),
      armCol(1, "_n").as("dn1"), armCol(1, "_sy").as("dsy1"),
      armCol(1, "_syy").as("dsyy1"))
  }

  /** Pooled within-arm variance (cents²) from the exact arm moments:
    * s² = ((n₀Σy₀²−(Σy₀)²)/n₀ + (n₁Σy₁²−(Σy₁)²)/n₁) / (n₀+n₁−2)
    * — numerators exact Decimal(38,0),
    * then two divisions and one outer division in double, the identical
    * IEEE sequence the oracles replay. NULL when n₀+n₁ ≤ 2.
    */
  private def pooledVar: Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val nv0 = col("dn0") * col("dsyy0") - col("dsy0") * col("dsy0")
    val nv1 = col("dn1") * col("dsyy1") - col("dsy1") * col("dsy1")
    val dfree = (col("dn0") + col("dn1") - lit(2).cast(dec)).cast("double")
    when(col("dn0") + col("dn1") <= lit(2).cast(dec), lit(null))
      .otherwise(
        (nv0.cast("double") / col("dn0").cast("double")
          + nv1.cast("double") / col("dn1").cast("double")) / dfree)
  }

  private def armDelta: Column =
    col("dsy0").cast("double") / col("dn0").cast("double") -
      col("dsy1").cast("double") / col("dn1").cast("double")

  /** Fixed-horizon power readout for the two-arm cents metric: given the
    * observed per-arm moments, the minimum detectable effect at the
    * CURRENT sample size and the required per-arm n to detect the
    * OBSERVED delta — the "how much longer must this test run" answer,
    * at α = 5% two-sided, power 80% (z constants 1.959964 / 0.841621,
    * their sum as the single literal Z = 2.801585):
    *   mde = Z·√(s²·(1/n₀+1/n₁)),   n_req = ⌈2·s²·Z²/δ̂²⌉.
    * Determinism: exact Decimal moments; doubles enter in divisions, one
    * IEEE sqrt, and literal multiplies — all bit-replayed by the oracle.
    * δ̂ = 0 → NULL n_required (no finite answer); output cents are 6dp.
    */
  def abPower(events: DataFrame, convType: String): DataFrame = {
    val z = lit(2.801585)
    val s2 = pooledVar
    val vDelta = s2 * (lit(1.0) / col("dn0").cast("double")
      + lit(1.0) / col("dn1").cast("double"))
    val delta = armDelta
    armMoments(events, convType).select(
      col("dn0").cast("long").as("n0"), col("dn1").cast("long").as("n1"),
      Vectors.round6(col("dsy0").cast("double") / col("dn0").cast("double"))
        .as("mean0_cents"),
      Vectors.round6(col("dsy1").cast("double") / col("dn1").cast("double"))
        .as("mean1_cents"),
      Vectors.round6(delta).as("delta_cents"),
      Vectors.round6(s2).as("s2_cents2"),
      Vectors.round6(z * sqrt(vDelta)).as("mde_cents"),
      when(delta === 0.0, lit(null)).otherwise(
        ceil(lit(2.0) * s2 * (z * z) / (delta * delta)).cast("long"))
        .as("n_required"))
  }

  /** Always-valid sequential readout (mSPRT, Johari et al. 2017 "Peeking
    * at A/B Tests"): the mixture likelihood ratio of the two-sample mean
    * difference under a N(0, τ²) effect prior,
    *   log Λ = ½·ln(V/(V+τ²)) + δ̂²·τ² / (2·V·(V+τ²)),  V = s²(1/n₀+1/n₁),
    * and the always-valid p-value p = min(1, e^(−log Λ)) — valid at EVERY
    * interim look, the peeking-safe companion to `abPower`'s fixed-horizon
    * test. τ² (cents²) is the caller's prior effect scale.
    *
    * Determinism note: ln/exp are the two steps not guaranteed correctly
    * rounded across engines (unlike ÷ and √), so both are taken on
    * 6dp-PREROUNDED arguments and the results are rounded again — a
    * divergence would need a value within one ulp of a 0.5e-6 boundary.
    * V = 0 (zero variance) → NULL readout.
    */
  def abSequential(events: DataFrame, convType: String,
                   tauSq: Double = 10000.0): DataFrame = {
    require(tauSq > 0, s"tauSq must be > 0, got $tauSq")
    val t2 = lit(tauSq)
    val s2 = pooledVar
    val v = s2 * (lit(1.0) / col("dn0").cast("double")
      + lit(1.0) / col("dn1").cast("double"))
    val delta = armDelta
    val llr = Vectors.round6(
      lit(0.5) * log(Vectors.round6(v / (v + t2)))
        + delta * delta * t2 / (lit(2.0) * v * (v + t2)))
    val guarded = when(s2.isNull || v <= 0.0, lit(null))
    armMoments(events, convType).select(
      col("dn0").cast("long").as("n0"), col("dn1").cast("long").as("n1"),
      Vectors.round6(delta).as("delta_cents"),
      guarded.otherwise(Vectors.round6(v)).as("v_cents2"),
      guarded.otherwise(llr).as("log_lambda"),
      guarded.otherwise(Vectors.round6(least(lit(1.0), exp(-llr))))
        .as("p_always_valid"))
  }

  /** Per-replicate Poisson-bootstrap lift estimates (Chamandy et al.
    * 2012, "Estimating uncertainty for massive data streams" — the
    * standard bootstrap at scale: resampling n-out-of-n is impossible
    * distributed, but giving each unit an independent Poisson(1) weight
    * per replicate is one map-side pass). DETERMINISTIC: the weight is
    * not random but inverse-CDF-looked-up from `Curate.unitHash(user:rep)`
    * — md5-derived, engine-portable, stable across runs AND across `b`
    * (replicate r's weights don't depend on how many replicates exist,
    * so growing b extends the series without rewriting it).
    *
    * Output: `(rep, lift)` — lift = weighted arm-0 mean − arm-1 mean in
    * cents (6dp), NULL when a replicate zeroes out an arm entirely.
    * Scale shape: user aggregate → b-way map-side explode → ONE keyed
    * aggregate with b groups; shuffle volume O(b), corpus-independent.
    */
  def bootstrapLifts(events: DataFrame, convType: String,
                     b: Int): DataFrame = {
    require(b >= 1, s"b must be >= 1, got $b")
    val perUser = events.groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === convType,
        Exact.cents(col("value")))), lit(0L)).as("y"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val rep = perUser.select(col("user_id"), col("y"), col("arm"),
      explode(sequence(lit(0), lit(b - 1))).as("rep"))
    val u = Curate.unitHash(concat_ws(":", col("user_id"), col("rep")))
    // Poisson(1) inverse CDF — cumulative e^{-1}·Σ 1/k! as full-precision
    // double literals, mirrored verbatim (::DOUBLE) in the oracle; mass
    // beyond 6 (8.3e-5) collapses to 7, a bias far below CI resolution.
    val w = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.9999167588507119, 6L)
      .otherwise(7L)
    rep.select(col("rep"), col("arm"), w.as("w"), col("y"))
      .groupBy(col("rep"))
      .agg(sum(when(col("arm") === 0, col("w"))).as("n0"),
        sum(when(col("arm") === 0, col("w") * col("y"))).as("s0"),
        sum(when(col("arm") === 1, col("w"))).as("n1"),
        sum(when(col("arm") === 1, col("w") * col("y"))).as("s1"))
      .select(col("rep"),
        when(col("n0") > 0 && col("n1") > 0, Vectors.round6(
          col("s0").cast("double") / col("n0").cast("double")
            - col("s1").cast("double") / col("n1").cast("double")))
          .as("lift"))
  }

  /** Bootstrap CI readout: nearest-rank 2.5/50/97.5 percentiles of the
    * `b` replicate lifts (the repo's floor(q·(n−1))+1 convention),
    * picked from ONE sorted array aggregate — no global window, no
    * driver loop. A CI excluding 0 is the "significant at 5%" readout
    * with none of the normality assumptions `abPower` leans on.
    */
  def abBootstrapCI(events: DataFrame, convType: String,
                    b: Int = 32): DataFrame = {
    def pick(q: Double) = element_at(col("ls"),
      (floor(lit(q) * (size(col("ls")) - 1)) + 1).cast("int"))
    bootstrapLifts(events, convType, b)
      .filter(col("lift").isNotNull)
      .agg(sort_array(collect_list(col("lift"))).as("ls"))
      .select(size(col("ls")).cast("long").as("n_reps"),
        pick(0.025).as("lift_p025"), pick(0.5).as("lift_p500"),
        pick(0.975).as("lift_p975"))
  }

  /** Sample-ratio-mismatch check (the first experimentation-hygiene gate:
    * a 50/50 split whose realized user counts are detectably off means
    * the assignment or logging is broken and every readout downstream is
    * suspect). For the even split, Pearson's χ² collapses to the exact
    * integer form (n₀−n₁)²/(n₀+n₁) — one double division, 6dp; flagged
    * against the 1-df 95% critical value 3.841459. One distinct + one
    * 2-group aggregate; nothing data-sized past the distinct.
    */
  def abSrm(events: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val users = events.select(col("user_id")).distinct()
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val wide = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
    val diff = (col("n0") - col("n1")).cast(dec)
    val tot = (col("n0") + col("n1")).cast(dec)
    val chi2 = when(tot === lit(0).cast(dec), lit(null))
      .otherwise(Vectors.round6(
        (diff * diff).cast("double") / tot.cast("double")))
    wide.select(col("n0"), col("n1"),
      expr("(n0 * 10000) div (n0 + n1)").as("share0_bp"),
      chi2.as("chi2"), (chi2 > 3.841459).as("srm_flag"))
  }

  /** CUSUM drift alerts over the per-type event-value series (Page 1954):
    * the one-sided CUSUM recurrence S_i = max(0, S_{i−1} + (x_i − k))
    * flags sustained upward drift of size ≥ k long before any fixed-window
    * mean moves — the change-detection complement to the PSI snapshot
    * drift report. The sequential recurrence looks window-inexpressible,
    * but the classic prefix-min identity S_i = P_i − min(0, min_{j≤i} P_j)
    * (P = running sum of x−k) turns it into TWO cumulative windows, both
    * partitioned by event_type — group-sized sorts, exact integer cents
    * end to end, no iteration, no state machine.
    * Output: the alert rows (S_i > `threshCents`) only.
    */
  def cusumAlerts(events: DataFrame, driftCents: Long,
                  threshCents: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshCents > 0, s"threshCents must be > 0, got $threshCents")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(col("event_type"), col("event_id"), col("ts"),
        (Exact.cents(col("value")) - lit(driftCents)).as("d"))
      .withColumn("pc", sum(col("d")).over(w))
      .withColumn("pmin", min(col("pc")).over(w))
      .withColumn("s", col("pc") - least(lit(0L), col("pmin")))
      .filter(col("s") > threshCents)
      .select(col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_epoch"), col("s"))
  }

  /** Per-user (x = pre-period cents, y = post-period cents, arm). */
  private def cupedPerUser(events: DataFrame, convType: String,
                           splitTs: String): DataFrame = {
    val split = lit(splitTs).cast("timestamp")
    val isConv = col("event_type") === convType
    events.groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(isConv && col("ts") < split,
          Exact.cents(col("value")))), lit(0L)).as("x"),
        coalesce(sum(when(isConv && col("ts") >= split,
          Exact.cents(col("value")))), lit(0L)).as("y"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
  }

  /** The moment → θ → adjusted-lift pipeline, per `segCols` stratum
    * (global when empty). See `abCuped` for the determinism argument.
    */
  private def cupedCore(perUser: DataFrame,
                        segCols: Seq[String]): DataFrame = {
    val arms = Relational.momentSums(perUser, segCols :+ "arm",
      col("x"), col("y"))
    def armCol(a: Int, c: String) = sum(when(col("arm") === a, col(c)))
    val wide = arms.groupBy(segCols.map(col): _*).agg(
      armCol(0, "_n").as("dn0"), armCol(0, "_sx").as("dsx0"),
      armCol(0, "_sy").as("dsy0"),
      armCol(1, "_n").as("dn1"), armCol(1, "_sx").as("dsx1"),
      armCol(1, "_sy").as("dsy1"),
      sum(col("_n")).as("tn"), sum(col("_sx")).as("tsx"),
      sum(col("_sy")).as("tsy"), sum(col("_sxy")).as("tsxy"),
      sum(col("_sxx")).as("tsxx"))
    val thetaDen = col("tn") * col("tsxx") - col("tsx") * col("tsx")
    val thetaNum = col("tn") * col("tsxy") - col("tsx") * col("tsy")
    // Vectors.round6, not Catalyst round(x, 6): Round-on-double does a
    // per-row BigDecimal string round-trip AND rounds the shortest-decimal
    // repr where DuckDB rounds the binary value — the floor formula is the
    // identical IEEE sequence on both engines (mirrored in both CUPED
    // oracles), so a tie at the 6th decimal cannot diverge.
    val theta = when(thetaDen === lit(0).cast(
        org.apache.spark.sql.types.DecimalType(38, 0)), lit(null))
      .otherwise(Vectors.round6(
        thetaNum.cast("double") / thetaDen.cast("double")))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    val rawLift =
      mean(col("dsy0"), col("dn0")) - mean(col("dsy1"), col("dn1"))
    val xGap = mean(col("dsx0"), col("dn0")) - mean(col("dsx1"), col("dn1"))
    wide.select(segCols.map(col) ++ Seq(
      col("dn0").cast("long").as("n0"), col("dn1").cast("long").as("n1"),
      col("dsx0").cast("long").as("sum_x0"),
      col("dsx1").cast("long").as("sum_x1"),
      col("dsy0").cast("long").as("sum_y0"),
      col("dsy1").cast("long").as("sum_y1"),
      theta.as("theta"),
      Vectors.round6(rawLift).as("raw_lift_cents"),
      Vectors.round6(rawLift - theta * xGap).as("adj_lift_cents")): _*)
  }

  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** MATCH_RECOGNIZE-lite sequence matcher with a NEGATION guard: for
    * every `firstType` event, find the next `thenType` event by the SAME
    * user within `withinSec` seconds such that NO `guardType` event falls
    * strictly between them in the user's (ts, event_id) order — the
    * "signup followed by purchase within 6 h with no error in between"
    * pattern that funnel counting can't express (funnels ignore
    * intervening events entirely).
    *
    * Join-free plan: guard events split each user's stream into segments
    * (`sid` = running guard count, so "no guard between A and B" ⇔ same
    * segment), then a reverse-frame conditional min (1 FOLLOWING ..
    * UNBOUNDED FOLLOWING) finds each row's next `thenType` second within
    * its segment. Two events-sized window sorts — the first keyed by
    * user, the second by (user, segment), a refinement — no join, no
    * global window, shuffle O(events). Sorts are bounded by one user's
    * history; at 100 TB the pattern scan stays a per-user streaming pass.
    */
  def sequenceMatch(events: DataFrame, firstType: String, thenType: String,
                    guardType: String, withinSec: Long): DataFrame = {
    require(withinSec >= 0, s"withinSec must be >= 0, got $withinSec")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val inSeg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("sid"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"))
      .withColumn("sid",
        count(when(col("event_type") === guardType, 1)).over(byUser))
      .withColumn("then_sec",
        min(when(col("event_type") === thenType, col("sec"))).over(inSeg))
      .filter(col("event_type") === firstType && col("then_sec").isNotNull &&
        col("then_sec") <= col("sec") + withinSec)
      .select(col("user_id"), col("event_id").as("first_event_id"),
        col("sec").as("first_sec"), col("then_sec"),
        (col("then_sec") - col("sec")).as("gap_sec"))
  }

  /** Last-touch marketing attribution: each conversion (`convType`)
    * credited to the MOST RECENT preceding marketing event
    * (`marketingTypes`) by the same user within `windowSec`, else
    * `'direct'` — the standard conversion-credit readout. One row per
    * conversion with its channel and exact value cents; aggregate
    * downstream per channel.
    *
    * The carry is two `last(..., ignoreNulls)` window calls over the SAME
    * (sec, event_id)-ordered frame ending at 1 PRECEDING — both are null
    * exactly on non-marketing rows, so ts and type always come from the
    * same (latest marketing) row, and the frame bound keeps a
    * simultaneous conversion from crediting itself. Same-second marketing
    * vs conversion resolves by event_id order (the sequenceMatch
    * discipline). ONE user-keyed window sort, shuffle O(events), no join.
    */
  def attributionLastTouch(events: DataFrame,
                           marketingTypes: Seq[String] = Seq("click", "view"),
                           convType: String = "purchase",
                           windowSec: Long = 604800L): DataFrame = {
    require(windowSec >= 0, s"windowSec must be >= 0, got $windowSec")
    require(!marketingTypes.contains(convType),
      "conversion type cannot also be a marketing type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val isMk = col("event_type").isin(marketingTypes: _*)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("event_type"),
        Exact.cents(col("value")).as("value_c"))
      .withColumn("mk_sec", last(when(isMk, col("sec")), ignoreNulls = true).over(w))
      .withColumn("mk_type", last(when(isMk, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id"), col("sec"), col("value_c"),
        when(col("mk_sec").isNotNull &&
            col("mk_sec") >= col("sec") - windowSec, col("mk_type"))
          .otherwise(lit("direct")).as("channel"),
        // time-to-convert: seconds from the credited touch; null on direct
        when(col("mk_sec").isNotNull &&
            col("mk_sec") >= col("sec") - windowSec,
          col("sec") - col("mk_sec")).as("gap_sec"))
  }

  /** LINEAR multi-touch attribution: each conversion's value split
    * EQUALLY across every preceding in-window marketing touch (vs
    * `attributionLastTouch`'s winner-takes-all), one credit row per
    * (conversion, touch); conversions with no in-window touch emit one
    * `'direct'` row carrying the full value. The split stays exact in
    * integer cents: each touch gets `value_c div n` and the REMAINDER
    * goes to the latest touch (`value_c mod n`), so per-conversion
    * credits always sum to exactly `value_c` — no 1/n float ever exists.
    *
    * In-window means `conv_sec − windowSec ≤ mk_sec` and the touch
    * strictly precedes the conversion in (sec, event_id) order — the
    * same bound and tie rule as `attributionLastTouch`, so the two
    * models agree on WHICH touches qualify and differ only in credit.
    *
    * Shape: one user-keyed left join (conversions ⋈ touches; per-user
    * fan-out is touches×conversions within the window — the inherent
    * output size) + one (user, conversion)-keyed window for n and the
    * latest-touch rank. No global sort, no driver state.
    */
  def attributionLinear(events: DataFrame,
                        marketingTypes: Seq[String] = Seq("click", "view"),
                        convType: String = "purchase",
                        windowSec: Long = 604800L): DataFrame = {
    require(windowSec >= 0, s"windowSec must be >= 0, got $windowSec")
    require(!marketingTypes.contains(convType),
      "conversion type cannot also be a marketing type")
    val base = events.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("sec"), col("event_type"),
      Exact.cents(col("value")).as("value_c"))
    val conv = base.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("sec").as("conv_sec"), col("value_c"))
    val mk = base.filter(col("event_type").isin(marketingTypes: _*))
      .select(col("user_id").as("mk_user"), col("event_id").as("mk_id"),
        col("sec").as("mk_sec"), col("event_type").as("mk_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("conv_id"))
    conv.join(mk,
        col("user_id") === col("mk_user") &&
          col("mk_sec") >= col("conv_sec") - windowSec &&
          (col("mk_sec") < col("conv_sec") ||
            (col("mk_sec") === col("conv_sec") && col("mk_id") < col("conv_id"))),
        "left_outer")
      .withColumn("n", count(col("mk_id")).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("mk_sec").desc, col("mk_id").desc)))
      .select(col("user_id"), col("conv_id"), col("value_c"),
        when(col("n") === 0, lit("direct")).otherwise(col("mk_type"))
          .as("channel"),
        col("mk_id"),
        when(col("n") === 0, col("value_c"))
          .otherwise(expr("value_c div n") +
            when(col("rk") === 1, expr("value_c % n")).otherwise(lit(0L)))
          .as("credit_c"))
  }

  /** TIME-DECAY multi-touch attribution — the third member of the
    * family (last-touch, linear, decay): each conversion's value splits
    * across its in-window preceding touches proportionally to
    * `w = max(10⁴ div 2^age_halflives, 1)` (recent touches earn more;
    * the floor keeps every in-window touch a positive weight so the
    * split is never 0/0). Exact integer arithmetic throughout: base
    * credit `value_c·w div Σw` per touch, remainder to the LATEST touch
    * (same convention as the linear model), so per-conversion credits
    * sum to value_c EXACTLY — no 2^-age float in sight. Same join bound
    * and (sec, event_id) tie rule as the siblings; shuffle O(conv ×
    * in-window touches), two per-conversion windows, no global state.
    */
  def attributionDecay(events: DataFrame,
                       marketingTypes: Seq[String] = Seq("click", "view"),
                       convType: String = "purchase",
                       windowSec: Long = 604800L,
                       halfLifeSec: Long = 86400L): DataFrame = {
    require(windowSec >= 0, s"windowSec must be >= 0, got $windowSec")
    require(halfLifeSec >= 1, s"halfLifeSec must be >= 1, got $halfLifeSec")
    require(!marketingTypes.contains(convType),
      "conversion type cannot also be a marketing type")
    val base = events.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("sec"), col("event_type"),
      Exact.cents(col("value")).as("value_c"))
    val conv = base.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("sec").as("conv_sec"), col("value_c"))
    val mk = base.filter(col("event_type").isin(marketingTypes: _*))
      .select(col("user_id").as("mk_user"), col("event_id").as("mk_id"),
        col("sec").as("mk_sec"), col("event_type").as("mk_type"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("conv_id"))
    conv.join(mk,
        col("user_id") === col("mk_user") &&
          col("mk_sec") >= col("conv_sec") - windowSec &&
          (col("mk_sec") < col("conv_sec") ||
            (col("mk_sec") === col("conv_sec") && col("mk_id") < col("conv_id"))),
        "left_outer")
      .withColumn("n", count(col("mk_id")).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("mk_sec").desc, col("mk_id").desc)))
      .withColumn("wgt", expr(
        s"""greatest(10000 div shiftleft(cast(1 as bigint),
           |  cast(least((conv_sec - mk_sec) div $halfLifeSec, 50) as int)),
           |  1)""".stripMargin))
      .withColumn("wsum", sum(col("wgt")).over(w))
      .withColumn("base_c", expr("(value_c * wgt) div wsum"))
      .withColumn("bsum", sum(col("base_c")).over(w))
      .select(col("user_id"), col("conv_id"), col("value_c"),
        when(col("n") === 0, lit("direct")).otherwise(col("mk_type"))
          .as("channel"),
        col("mk_id"),
        when(col("n") === 0, col("value_c"))
          .otherwise(col("base_c") +
            when(col("rk") === 1, col("value_c") - col("bsum"))
              .otherwise(lit(0L)))
          .as("credit_c"))
  }

  /** Hourly resample with gap fill: value-cents aggregated per (user,
    * epoch-hour), each user's [first, last] observed hour densified into
    * a complete grid, and the last observed aggregate carried forward
    * across empty hours (`is_gap` marks carried rows) — the time-series
    * regularization every downstream window/join assumes. Integer
    * epoch-hour grid + cents sums → exact and engine-portable.
    *
    * Scale shape: the grid explodes from a 2-column per-user span frame
    * (never from the events), all shuffles are keyed on user, and the
    * carry-forward window sorts only one user's hours. Grid size is
    * bounded by observed span × users — for sparse multi-year keys, cap
    * the span upstream rather than densifying blindly.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val agg = events
      .groupBy(col("user_id"),
        (unix_timestamp(col("ts")) / 3600).cast("long").as("h"))
      .agg(sum(Exact.cents(col("value"))).as("cents"))
    val grid = agg.groupBy(col("user_id"))
      .agg(min(col("h")).as("_mn"), max(col("h")).as("_mx"))
      .select(col("user_id"),
        explode(sequence(col("_mn"), col("_mx"))).as("h"))
    grid.join(agg, Seq("user_id", "h"), "left_outer")
      .withColumn("filled_value",
        Exact.dollars(last(col("cents"), ignoreNulls = true).over(w)))
      .select(col("user_id"), (col("h") * 3600).as("hour_ts"),
        col("filled_value"), col("cents").isNull.as("is_gap"))
  }

  /** `gapFillHourly`'s LINEAR-INTERPOLATION sibling: missing hours take
    * the straight line between the bracketing observed hours instead of
    * carrying the last value forward — the standard time-series repair
    * for continuously-varying measures (LOCF fits step-like state). The
    * grid spans each user's observed [min, max] hour, so every MISSING
    * hour has both neighbors by construction. One edge case remains: an
    * observed hour whose aggregate is NULL (every event value NULL in
    * that hour) counts toward the span but not toward the neighbor scan
    * (`obsH` below), so if such an hour sits at a user's span boundary
    * the rows between it and the nearest truly-observed hour have only
    * one neighbor and yield a NULL `filled_milli` with `is_gap = true`
    * — a silent NULL, mirrored exactly by the DuckDB oracle (same
    * one-sided window semantics), so cross-engine parity holds. Same
    * scale shape as the LOCF variant: per-user keyed windows over the
    * hourly aggregate, never a global window.
    *
    * The interpolated value is EXACT integer millicents:
    * `(pv·(nh−h) + nv·(h−ph)) · 1000 div (nh−ph)` — a float mix hits
    * exact decimal halves (hour fractions like 1/2 of odd cents), where
    * Spark's shortest-decimal HALF_UP round and DuckDB's raw-binary round
    * disagree by one final digit; integer truncating division has no
    * rounding mode at all. Requires non-negative values (then the
    * numerator is non-negative and Spark `div` ≡ DuckDB `//`) — true of
    * the events corpus and asserted row-by-row by the oracle hash.
    */
  def gapFillHourlyInterp(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val back = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val agg = events
      .groupBy(col("user_id"),
        (unix_timestamp(col("ts")) / 3600).cast("long").as("h"))
      .agg(sum(Exact.cents(col("value"))).as("cents"))
    val grid = agg.groupBy(col("user_id"))
      .agg(min(col("h")).as("_mn"), max(col("h")).as("_mx"))
      .select(col("user_id"),
        explode(sequence(col("_mn"), col("_mx"))).as("h"))
    val obsH = when(col("cents").isNotNull, col("h"))
    grid.join(agg, Seq("user_id", "h"), "left_outer")
      .withColumn("_pv", last(col("cents"), ignoreNulls = true).over(back))
      .withColumn("_ph", last(obsH, ignoreNulls = true).over(back))
      .withColumn("_nv", first(col("cents"), ignoreNulls = true).over(fwd))
      .withColumn("_nh", first(obsH, ignoreNulls = true).over(fwd))
      .withColumn("filled_milli",
        when(col("cents").isNotNull, col("cents") * 1000L)
          .otherwise(expr(
            "((_pv * (_nh - h) + _nv * (h - _ph)) * 1000) div (_nh - _ph)")))
      .select(col("user_id"), (col("h") * 3600).as("hour_ts"),
        col("filled_milli"), col("cents").isNull.as("is_gap"))
  }

  /** Exponentially decayed event counts per type with a one-day half
    * life, in EXACT integer arithmetic: an event aged `a` days (vs the
    * newest event) weighs `10000 div 2^a` basis points, so the decayed
    * total is a pure function of the per-day counts — no float powers,
    * no reduction-order sensitivity, bit-identical across engines. The
    * shift is capped (weight 0 beyond 13 days anyway) to keep `2^a` in
    * long range. Per-(type, day) pre-aggregation makes the weighting
    * O(types × days), not O(events); the reference day is a 1-row
    * broadcast.
    */
  def decayedCounts(events: DataFrame): DataFrame = {
    val perDay = events
      .groupBy(col("event_type"),
        (unix_timestamp(col("ts")) / 86400).cast("long").as("_day"))
      .agg(count(lit(1)).as("_n"))
    val ref = perDay.agg(max(col("_day")).as("_ref"))
    perDay.crossJoin(broadcast(ref))
      .withColumn("_w", expr(
        "10000 div shiftleft(cast(1 as bigint), cast(least(_ref - _day, 50) as int))"))
      .groupBy(col("event_type"))
      .agg(sum(col("_n") * col("_w")).as("decayed_bp"),
        sum(col("_n")).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Holt double-exponential smoothing (Holt 1957) per user over the
    * (sec, event_id)-ordered value series, in EXACT basis-point integers —
    * the RECURRENT forecast readout next to `Relational.groupTrend`'s
    * closed-form OLS: level and trend adapt per observation, so a recent
    * drift moves the forecast where a global regression dilutes it.
    *
    *   l₁ = v₁·10⁴, b₁ = 0;
    *   lₜ = (α·vₜ·10⁴ + (10⁴−α)·(lₜ₋₁+bₜ₋₁)) div 10⁴
    *   bₜ = (β·(lₜ−lₜ₋₁) + (10⁴−β)·bₜ₋₁) div 10⁴
    *
    * with α, β in bp and `div` the truncating integer division BOTH
    * engines share on negatives (Spark `div` and DuckDB `//` truncate
    * toward zero — verified, so the signed trend term needs no
    * pmod-floor discipline). Output: n_events, final level/trend and the
    * h-step forecast l + h·b, all exact cent-bp integers.
    *
    * Scale shape: the recurrence is inherently sequential PER KEY, so
    * each user's series folds inside one `aggregate` over its collected
    * values — state is two longs, memory is one user's series (the twap
    * streaming-state caveat: unbounded per-key history needs the
    * flatMapGroupsWithState form instead), shuffle is one keyed
    * collect_list over O(events). No window recursion, no per-step jobs.
    */
  def holtForecastBp(events: DataFrame, alphaBp: Long = 5000L,
                     betaBp: Long = 3000L, horizon: Int = 3): DataFrame = {
    require(alphaBp >= 0 && alphaBp <= 10000, s"alphaBp out of range: $alphaBp")
    require(betaBp >= 0 && betaBp <= 10000, s"betaBp out of range: $betaBp")
    val a = alphaBp; val na = 10000L - alphaBp
    val b = betaBp; val nb = 10000L - betaBp
    // l_t is recomputed inside the b_t leg — lambdas cannot bind locals,
    // and the duplicate evaluation is exact-integer-deterministic
    val lStep = s"(($a * v.v + $na * (s.l + s.b)) div 10000)"
    events
      .select(col("user_id"), struct(unix_timestamp(col("ts")).as("sec"),
        col("event_id").as("tie"),
        (Exact.cents(col("value")) * 10000L).as("v")).as("p"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("p"))).as("seq"))
      .withColumn("st", expr(
        s"""aggregate(seq,
           |  named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
           |               'n', CAST(0 AS BIGINT)),
           |  (s, v) -> IF(s.n = 0,
           |    named_struct('l', v.v, 'b', CAST(0 AS BIGINT),
           |                 'n', CAST(1 AS BIGINT)),
           |    named_struct(
           |      'l', $lStep,
           |      'b', ($b * ($lStep - s.l) + $nb * s.b) div 10000,
           |      'n', s.n + 1)))""".stripMargin))
      .select(col("user_id"), col("st.n").as("n_events"),
        col("st.l").as("level_bp"), col("st.b").as("trend_bp"),
        (col("st.l") + lit(horizon.toLong) * col("st.b")).as("forecast_bp"))
  }

  /** Rolling-origin 1-step backtest of the Holt smoother: at every step
    * t ≥ 2 the PRIOR state's forecast l+b is scored against the value
    * that then arrives, accumulating Σ|vₜ·10⁴ − (l+b)| BEFORE the state
    * absorbs vₜ — the honest walk-forward protocol (each forecast only
    * ever sees the past), so the model's error is measured, not
    * asserted. Output per user: n_events, total absolute error and
    * MAE in cent-bp (null when the series has no scored step). Same
    * fold/state shape as `holtForecastBp`, one extra long of state.
    */
  def holtBacktestBp(events: DataFrame, alphaBp: Long = 5000L,
                     betaBp: Long = 3000L): DataFrame = {
    require(alphaBp >= 0 && alphaBp <= 10000, s"alphaBp out of range: $alphaBp")
    require(betaBp >= 0 && betaBp <= 10000, s"betaBp out of range: $betaBp")
    val a = alphaBp; val na = 10000L - alphaBp
    val b = betaBp; val nb = 10000L - betaBp
    val lStep = s"(($a * v.v + $na * (s.l + s.b)) div 10000)"
    events
      .select(col("user_id"), struct(unix_timestamp(col("ts")).as("sec"),
        col("event_id").as("tie"),
        (Exact.cents(col("value")) * 10000L).as("v")).as("p"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("p"))).as("seq"))
      .withColumn("st", expr(
        s"""aggregate(seq,
           |  named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
           |               'n', CAST(0 AS BIGINT), 'e', CAST(0 AS BIGINT)),
           |  (s, v) -> IF(s.n = 0,
           |    named_struct('l', v.v, 'b', CAST(0 AS BIGINT),
           |                 'n', CAST(1 AS BIGINT), 'e', CAST(0 AS BIGINT)),
           |    named_struct(
           |      'l', $lStep,
           |      'b', ($b * ($lStep - s.l) + $nb * s.b) div 10000,
           |      'n', s.n + 1,
           |      'e', s.e + abs(v.v - (s.l + s.b)))))""".stripMargin))
      .select(col("user_id"), col("st.n").as("n_events"),
        col("st.e").as("err_abs_bp"),
        when(col("st.n") > 1, expr("st.e div (st.n - 1)"))
          .as("mae_bp"))
  }

  /** Union-of-intervals coverage per user: each event opens a
    * `[sec, sec+widthSec)` activity interval; overlapping intervals merge.
    * Output per user: `covered_sec` (length of the union — the quantity a
    * naive n·width overcounts wherever sessions overlap), `n_segments`
    * (maximal merged runs) and `longest_gap_sec`. The classic sweep:
    * ONE (sec, event_id)-ordered user window carrying the running max of
    * interval ends — a row starts a new segment iff its start exceeds
    * every previous end, and contributes `max(0, end − max(start,
    * prev_max_end))` covered seconds. All integer arithmetic; one keyed
    * window + one keyed aggregate, shuffle O(events), no self-join (the
    * quadratic overlap-pair formulation this replaces).
    */
  def intervalCoverage(events: DataFrame, widthSec: Long = 300L): DataFrame = {
    require(widthSec >= 1, s"widthSec must be >= 1, got $widthSec")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("pmax", max(col("sec") + widthSec).over(w))
      .withColumn("newseg",
        col("pmax").isNull || col("sec") > col("pmax"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(greatest(col("sec") + widthSec -
          greatest(col("sec"), coalesce(col("pmax"), col("sec"))),
          lit(0L))).as("covered_sec"),
        sum(when(col("newseg"), 1L).otherwise(0L)).as("n_segments"),
        coalesce(max(when(col("newseg") && col("pmax").isNotNull,
          col("sec") - col("pmax"))), lit(0L)).as("longest_gap_sec"))
  }
}
