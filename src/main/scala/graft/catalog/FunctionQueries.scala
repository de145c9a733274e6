package graft.catalog

import org.apache.spark.sql.functions._
import graft.etl.Layout
import graft.ops.{EventOps, Exact}
import graft.streaming.StreamOps
import graft.tables.Tables.load

/** Scalar-function families (SURVEY §2.7), flatten/explode generators
  * (SURVEY §2.3 F1-F3), JSON extraction (X5/P3) and the event-time window
  * surface (SURVEY §2.8) in oracle-checkable batch form.
  */
object FunctionQueries extends Catalog {

  private def cents(x: String) = s"CAST(round($x * 100) AS BIGINT)"

  val all: Seq[Q] = Seq(

    // P2/P5/P6 + string family of §2.7 (substring=truncate, regexp_replace=
    // prefix strip, concat, case, trim, length).
    Q("fn_string_suite",
      (s, dir) => load(s, dir, "part")
        .select(col("p_partkey"),
          substring(col("p_name"), 1, 10).as("name10"),
          regexp_replace(col("p_type"), "^STANDARD ", "").as("type_stripped"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          upper(col("p_brand")).as("brand_upper"),
          lower(col("p_name")).as("name_lower"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, substring(p_name, 1, 10) AS name10,
             |regexp_replace(p_type, '^STANDARD ', '') AS type_stripped,
             |concat_ws('-', p_brand, p_type) AS brand_type,
             |upper(p_brand) AS brand_upper, lower(p_name) AS name_lower,
             |length(p_name)::BIGINT AS name_len
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // date/time family of §2.7: extraction + formatting (the reference's
    // strftime run-ids, etl/pipeline.py:326 → date_format).
    Q("fn_datetime_suite",
      (s, dir) => load(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).as("n_orders"),
          Exact.dollars(sum(Exact.cents(col("o_totalprice")))).as("sum_price"))
        .orderBy(col("y"), col("m")),
      Some(s"""SELECT year(o_orderdate)::BIGINT AS y, month(o_orderdate)::BIGINT AS m,
             |strftime(o_orderdate, '%Y-%m') AS ym,
             |count(*) AS n_orders,
             |sum(${cents("o_totalprice")})::DOUBLE / 100.0 AS sum_price
             |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin)),

    // conditional family (P4): CASE WHEN buckets + coalesce/nullif defaults.
    Q("fn_conditional_coalesce",
      (s, dir) => load(s, dir, "customer")
        .select(
          when(col("c_acctbal") < 0, "negative")
            .when(col("c_acctbal") < 5000, "mid").otherwise("high").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(default)")).as("segment"))
        .groupBy(col("tier"), col("segment")).agg(count(lit(1)).as("n"))
        .orderBy(col("tier"), col("segment")),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
             |  WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier,
             |coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS segment,
             |count(*) AS n
             |FROM customer GROUP BY 1, 2 ORDER BY tier, segment""".stripMargin)),

    // X5 + P3: declared-schema JSON parse, struct dot access, then exact agg.
    Q("json_props_extract",
      (s, dir) => EventOps.withProps(load(s, dir, "events"))
        .groupBy(col("event_type"))
        .agg(sum(col("prop_k")).as("sum_k"),
          Exact.avgOf(sum(col("prop_k")), count(lit(1))).as("avg_k"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, sum(k)::BIGINT AS sum_k,
             |sum(k)::DOUBLE / count(*) AS avg_k, count(*) AS n FROM (
             |  SELECT event_type, regexp_extract(props, '"k":\s*(\d+)', 1)::BIGINT AS k
             |  FROM events) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // F1: one row per array element, parent columns carried along
    // (reference agent→abilities denormalization, etl/pipeline.py:160-175).
    Q("explode_structs",
      (s, dir) => load(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), col("lang").as("doc_lang"),
          explode(split(col("text"), " ")).as("token"))
        .orderBy(col("doc_id"), col("token")),
      Some("""SELECT doc_id, lang AS doc_lang, unnest(string_split(text, ' ')) AS token
             |FROM documents WHERE doc_id < 20
             |ORDER BY doc_id, token""".stripMargin)),

    // F2: positional explode — the reference's range_index
    // (etl/pipeline.py:201-205) as a declarative generator.
    Q("posexplode_indexed",
      (s, dir) => load(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
        .orderBy(col("doc_id"), col("pos")),
      Some("""SELECT doc_id, i AS pos, l[i + 1] AS token
             |FROM (SELECT doc_id, string_split(text, ' ') AS l
             |      FROM documents WHERE doc_id < 20) t,
             |  (SELECT unnest(range(len(l))) AS i) r
             |ORDER BY doc_id, pos""".stripMargin)),

    // P7/A3: array length as scalar (size(null-safe) — reference
    // num_callouts, etl/pipeline.py:216,221).
    Q("array_len_scalar",
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          size(coalesce(split(col("text"), " "), array())).cast("long").as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens, n_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // §2.8 event-time windows, batch form (streaming variant in
    // graft.streaming.StreamOps over identical functions).
    Q("window_tumbling",
      (s, dir) => EventOps.tumblingCounts(load(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT epoch(time_bucket(INTERVAL '10 minutes', ts))::BIGINT AS window_start,
             |event_type, count(*) AS n_events,
             |sum(CAST(round(value * 100) AS BIGINT))::DOUBLE / 100.0 AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // §2.8 late-data/watermark semantics, batch-checkable: events arrive in
    // day-indexed micro-batches with a synthetic late cohort (event_id%37=0
    // delayed TWO batches — far beyond the 1 h watermark delay, so their
    // hourly windows were already evicted when they arrive); the model
    // (StreamOps.watermarkTumblingModel) drops exactly those and keeps
    // everything else. The streaming twin in StreamOpsSpec proves the model
    // ≡ a real withWatermark append-mode run on a controlled feed.
    Q("stream_late_tumbling",
      (s, dir) => {
        val ev = load(s, dir, "events")
        val arrival = floor(unix_timestamp(col("ts")) / 86400L) +
          when(col("event_id") % 37 === 0, 2L).otherwise(0L)
        StreamOps.watermarkTumblingModel(ev, arrival, delaySec = 3600L)
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT epoch(date_trunc('second', ts))::BIGINT AS sec,
             |    event_type, value,
             |    epoch(date_trunc('second', ts))::BIGINT // 86400
             |      + CASE WHEN event_id % 37 = 0 THEN 2 ELSE 0 END AS b
             |  FROM events),
             |pb AS (SELECT b, max(sec) AS mx FROM e GROUP BY b),
             |wm AS (SELECT b, max(mx) OVER (ORDER BY b
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 3600
             |    AS wm FROM pb),
             |kept AS (SELECT e.sec, e.event_type, e.value
             |  FROM e JOIN wm USING (b)
             |  WHERE wm.wm IS NULL OR (e.sec // 3600 + 1) * 3600 > wm.wm)
             |SELECT (sec // 3600) * 3600 AS window_start, event_type,
             |  count(*) AS n_events,
             |  sum(CAST(round(value * 100) AS BIGINT))::DOUBLE / 100.0
             |    AS sum_value
             |FROM kept GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin)),

    // Funnel analysis (EventOps.funnel): users progressing
    // signup → view → click → purchase, each step within 24 h of the
    // previous step's first completion. Chained keyed min-aggregates +
    // equi-joins on user_id — no windows over the stream, frames only
    // shrink, per-step counts are map-side partials. The 24 h gap gives a
    // real funnel on this data (150 → 39 → 16 → 5 at sf0.01), so every
    // stage's logic is load-bearing in the hash compare.
    Q("funnel_steps",
      (s, dir) => EventOps.funnel(load(s, dir, "events"),
        Seq("signup", "view", "click", "purchase"), gapSeconds = 86400L),
      Some("""WITH s0 AS (SELECT user_id, min(epoch(date_trunc('second', ts))) AS t
             |            FROM events WHERE event_type = 'signup' GROUP BY 1),
             |s1 AS (SELECT e.user_id, min(epoch(date_trunc('second', e.ts))) AS t
             |       FROM events e JOIN s0 USING (user_id)
             |       WHERE event_type = 'view'
             |         AND epoch(date_trunc('second', e.ts)) > s0.t
             |         AND epoch(date_trunc('second', e.ts)) <= s0.t + 86400 GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(epoch(date_trunc('second', e.ts))) AS t
             |       FROM events e JOIN s1 USING (user_id)
             |       WHERE event_type = 'click'
             |         AND epoch(date_trunc('second', e.ts)) > s1.t
             |         AND epoch(date_trunc('second', e.ts)) <= s1.t + 86400 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(epoch(date_trunc('second', e.ts))) AS t
             |       FROM events e JOIN s2 USING (user_id)
             |       WHERE event_type = 'purchase'
             |         AND epoch(date_trunc('second', e.ts)) > s2.t
             |         AND epoch(date_trunc('second', e.ts)) <= s2.t + 86400 GROUP BY 1)
             |SELECT * FROM (
             |  SELECT 'signup' AS step, 1::BIGINT AS step_idx, count(*) AS n_users FROM s0
             |  UNION ALL SELECT 'view', 2::BIGINT, count(*) FROM s1
             |  UNION ALL SELECT 'click', 3::BIGINT, count(*) FROM s2
             |  UNION ALL SELECT 'purchase', 4::BIGINT, count(*) FROM s3) t
             |ORDER BY step_idx""".stripMargin)),

    // Rolling distinct users per trailing 4-hour window from MERGEABLE
    // hourly HLL sketches (EventOps.rollingDistinctUsers): the stored-
    // sketch incremental-view pattern — new events touch one hourly
    // sketch, windows re-union 4 KB-sized sketches, raw history never
    // re-scanned. Exact counts hash-checked; the sketch estimate carries
    // the tolerance verdict.
    Q("agg_rolling_distinct",
      (s, dir) => EventOps.rollingDistinctUsers(load(s, dir, "events"), 4),
      Some("""WITH e AS (
             |  SELECT epoch(date_trunc('second', date_trunc('hour', ts)))::BIGINT AS h,
             |         user_id
             |  FROM events),
             |x AS (SELECT h + k * 3600 AS w, user_id
             |      FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) ks)
             |SELECT w, count(DISTINCT user_id) AS n_users, TRUE AS approx_ok
             |FROM x GROUP BY w ORDER BY w""".stripMargin)),

    // Session-scoped funnel (EventOps.funnelSessions): signup → view →
    // click must all land in ONE 6-hour-gap session — counts are per
    // session. The session id is a keyed run-collapse window (no engine
    // session_window state needed on the batch side); the oracle rebuilds
    // the same ids with lag + running sum and chains the same per-step
    // min-joins. 1774 → 221 → 24 sessions at sf0.01.
    Q("funnel_sessions",
      (s, dir) => EventOps.funnelSessions(load(s, dir, "events"),
        Seq("signup", "view", "click"), sessionGapSeconds = 21600L),
      Some("""WITH m AS (
             |  SELECT user_id, epoch(date_trunc('second', ts))::BIGINT AS t,
             |         event_id, event_type,
             |    CASE WHEN epoch(date_trunc('second', ts))::BIGINT -
             |          lag(epoch(date_trunc('second', ts))::BIGINT) OVER w > 21600
             |        THEN 1 ELSE 0 END AS brk
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
             |        ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
             |s0 AS (SELECT user_id, sid, min(t) AS t FROM s
             |       WHERE event_type = 'signup' GROUP BY 1, 2),
             |s1 AS (SELECT e.user_id, e.sid, min(e.t) AS t FROM s e
             |       JOIN s0 ON e.user_id = s0.user_id AND e.sid = s0.sid
             |       WHERE e.event_type = 'view' AND e.t > s0.t GROUP BY 1, 2),
             |s2 AS (SELECT e.user_id, e.sid, min(e.t) AS t FROM s e
             |       JOIN s1 ON e.user_id = s1.user_id AND e.sid = s1.sid
             |       WHERE e.event_type = 'click' AND e.t > s1.t GROUP BY 1, 2)
             |SELECT * FROM (
             |  SELECT 'signup' AS step, 1::BIGINT AS step_idx,
             |         count(*) AS n_sessions FROM s0
             |  UNION ALL SELECT 'view', 2::BIGINT, count(*) FROM s1
             |  UNION ALL SELECT 'click', 3::BIGINT, count(*) FROM s2) t
             |ORDER BY step_idx""".stripMargin)),

    // Cohort retention (EventOps.cohortRetention): users bucketed by the
    // UTC week of their first signup, counted as retained in week k if
    // any event lands in cohort-week + k. Week arithmetic is exact epoch
    // math on week-truncated timestamps — both engines truncate to Monday.
    Q("cohort_retention",
      (s, dir) => EventOps.cohortRetention(load(s, dir, "events"),
        "signup", maxWeeks = 8),
      Some("""WITH c AS (SELECT user_id,
             |    min(epoch(date_trunc('second', date_trunc('week', ts))))::BIGINT AS cohort_week
             |  FROM events WHERE event_type = 'signup' GROUP BY 1),
             |a AS (SELECT e.user_id,
             |    epoch(date_trunc('second', date_trunc('week', e.ts)))::BIGINT AS w,
             |    c.cohort_week
             |  FROM events e JOIN c USING (user_id))
             |SELECT cohort_week, (w - cohort_week) // 604800 AS week_k,
             |       count(DISTINCT user_id) AS n_users
             |FROM a WHERE w >= cohort_week AND (w - cohort_week) // 604800 <= 8
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Event-type transition counts (EventOps.transitions): the path-
    // analysis primitive — consecutive per-user event pairs under the
    // total (ts, event_id) order. The only non-map work is the per-user
    // window sort, bounded by one user's history.
    Q("event_transitions",
      (s, dir) => EventOps.transitions(load(s, dir, "events")),
      Some("""SELECT from_type, to_type, count(*) AS n FROM (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS from_type,
             |         event_type AS to_type
             |  FROM events) t
             |WHERE from_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Sequence-pattern match with a negation guard (EventOps
    // .sequenceMatch): every signup followed by the user's next purchase
    // within 6 h with NO error event strictly between — the
    // MATCH_RECOGNIZE shape funnels can't express. Join-free: guard
    // events segment each user's stream; a reverse-frame conditional min
    // finds the next purchase in-segment. Both predicates are
    // load-bearing at sf0.01: 2017 signups → 966 survive the error guard
    // → 210 land within the 6 h bound.
    Q("events_sequence_match",
      (s, dir) => EventOps.sequenceMatch(load(s, dir, "events"),
          firstType = "signup", thenType = "purchase",
          guardType = "error", withinSec = 21600L)
        .orderBy(col("user_id"), col("first_sec"), col("first_event_id")),
      Some("""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec, event_type
             |  FROM events),
             |seg AS (SELECT *, count(CASE WHEN event_type = 'error' THEN 1 END)
             |    OVER (PARTITION BY user_id ORDER BY sec, event_id
             |          ROWS UNBOUNDED PRECEDING) AS sid FROM e),
             |nb AS (SELECT *, min(CASE WHEN event_type = 'purchase' THEN sec END)
             |    OVER (PARTITION BY user_id, sid ORDER BY sec, event_id
             |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
             |  FROM seg)
             |SELECT user_id, event_id AS first_event_id, sec AS first_sec,
             |       nxt AS then_sec, nxt - sec AS gap_sec
             |FROM nb
             |WHERE event_type = 'signup' AND nxt IS NOT NULL
             |  AND nxt <= sec + 21600
             |ORDER BY user_id, first_sec, first_event_id""".stripMargin)),

    // Last-touch attribution (EventOps.attributionLastTouch): every
    // purchase credited to the user's latest preceding click/view within
    // 7 days, else 'direct'; per-channel conversions + exact credited
    // cents. Two ignore-nulls carries over ONE (sec, event_id)-ordered
    // user window whose frame ends at 1 PRECEDING — no join, shuffle
    // O(events); the oracle replays both carries and the window-bound
    // CASE verbatim.
    Q("events_attribution",
      (s, dir) => EventOps.attributionLastTouch(load(s, dir, "events"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("conversions"),
          Exact.dollars(sum(col("value_c"))).as("credited_value"))
        .orderBy(col("channel")),
      Some(s"""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec, event_type,
             |    ${cents("value")} AS value_c
             |  FROM events),
             |c AS (SELECT *,
             |    last_value(CASE WHEN event_type IN ('click', 'view')
             |        THEN sec END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY sec, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS mk_sec,
             |    last_value(CASE WHEN event_type IN ('click', 'view')
             |        THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY sec, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS mk_type
             |  FROM e)
             |SELECT CASE WHEN mk_sec IS NOT NULL AND mk_sec >= sec - 604800
             |         THEN mk_type ELSE 'direct' END AS channel,
             |  count(*) AS conversions,
             |  sum(value_c)::DOUBLE / 100.0 AS credited_value
             |FROM c WHERE event_type = 'purchase'
             |GROUP BY 1 ORDER BY channel""".stripMargin)),

    // Time-to-convert distribution: exact nearest-rank p50/p90 of the
    // credited-touch→conversion gap per channel — the funnel-latency
    // readout composed from attributionLastTouch's gap_sec column and
    // the percentileState machinery (weights collapse to distinct
    // (channel, gap) state; no raw-row sort). The oracle replays the
    // attribution carries, then the nearest-rank crossing.
    Q("events_time_to_convert",
      (s, dir) => graft.ops.Relational.nearestRankPercentilesBy(
          EventOps.attributionLastTouch(load(s, dir, "events"))
            .filter(col("gap_sec").isNotNull),
          Seq("channel"), col("gap_sec"), Seq(0.5, 0.9))
        .select(col("channel"), col("quantile"),
          col("value").as("gap_sec")),
      Some("""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec, event_type
             |  FROM events),
             |c AS (SELECT *,
             |    last_value(CASE WHEN event_type IN ('click', 'view')
             |        THEN sec END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY sec, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS mk_sec,
             |    last_value(CASE WHEN event_type IN ('click', 'view')
             |        THEN event_type END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY sec, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS mk_type
             |  FROM e),
             |g AS (SELECT mk_type AS channel, sec - mk_sec AS v
             |  FROM c WHERE event_type = 'purchase'
             |    AND mk_sec IS NOT NULL AND mk_sec >= sec - 604800),
             |f AS (SELECT channel, v, count(*) AS c FROM g GROUP BY 1, 2),
             |cum AS (SELECT channel, v, c,
             |    sum(c) OVER (PARTITION BY channel ORDER BY v
             |      ROWS UNBOUNDED PRECEDING) AS hi,
             |    sum(c) OVER (PARTITION BY channel) AS n
             |  FROM f)
             |SELECT channel, q::DOUBLE AS quantile, v AS gap_sec
             |FROM cum, (SELECT unnest([0.5, 0.9]) AS q) qs
             |WHERE hi >= floor(q * (n - 1))::BIGINT + 1
             |  AND hi - c < floor(q * (n - 1))::BIGINT + 1
             |ORDER BY channel, quantile""".stripMargin)),

    // LINEAR multi-touch attribution (EventOps.attributionLinear): each
    // purchase's value split equally across ALL in-window preceding
    // touches — exact integer split (div + remainder-to-latest, so
    // per-conversion credits sum to value_c exactly; no 1/n float).
    // Same window bound and (sec, event_id) tie rule as the last-touch
    // model. The oracle replays the join, both window calls, and the
    // div/mod split verbatim; Σ credited_value over channels ≡ total
    // purchase value by construction.
    Q("events_attribution_linear",
      (s, dir) => EventOps.attributionLinear(load(s, dir, "events"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("touch_credits"),
          countDistinct(col("conv_id")).as("conversions"),
          Exact.dollars(sum(col("credit_c"))).as("credited_value"))
        .orderBy(col("channel")),
      Some(s"""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec, event_type,
             |    ${cents("value")} AS value_c
             |  FROM events),
             |conv AS (SELECT user_id, event_id AS conv_id, sec AS conv_sec,
             |    value_c FROM e WHERE event_type = 'purchase'),
             |mk AS (SELECT user_id AS mk_user, event_id AS mk_id,
             |    sec AS mk_sec, event_type AS mk_type
             |  FROM e WHERE event_type IN ('click', 'view')),
             |j AS (SELECT c.*, m.mk_id, m.mk_sec, m.mk_type
             |  FROM conv c LEFT JOIN mk m ON c.user_id = m.mk_user
             |    AND m.mk_sec >= c.conv_sec - 604800
             |    AND (m.mk_sec < c.conv_sec
             |      OR (m.mk_sec = c.conv_sec AND m.mk_id < c.conv_id))),
             |x AS (SELECT *,
             |    count(mk_id) OVER (PARTITION BY user_id, conv_id) AS n,
             |    row_number() OVER (PARTITION BY user_id, conv_id
             |      ORDER BY mk_sec DESC, mk_id DESC) AS rk
             |  FROM j)
             |SELECT CASE WHEN n = 0 THEN 'direct' ELSE mk_type END AS channel,
             |  count(*)::BIGINT AS touch_credits,
             |  count(DISTINCT conv_id)::BIGINT AS conversions,
             |  sum(CASE WHEN n = 0 THEN value_c
             |    ELSE value_c // n + CASE WHEN rk = 1 THEN value_c % n
             |      ELSE 0 END END)::DOUBLE / 100.0 AS credited_value
             |FROM x GROUP BY 1 ORDER BY channel""".stripMargin)),

    // Geospatial radius join (ops/Geo.cellRadiusJoin): every user pair
    // within 0.1° (~11 km) of each other — the co-location primitive —
    // over deterministic md5-derived home points clustered around five
    // real city centers (±0.5°, the WAV-fixture discipline: both engines
    // regenerate identical coordinates). NO runtime trig: the longitude
    // shrink comes from the shared 91-entry integer CosBp table, so a
    // cos() ulp can never flip a boundary pair; blocking is the
    // pigeonhole 3×3 grid stamp (one candidate per qualifying pair, no
    // distinct), verify is exact integer µ°² distance. The oracle is the
    // quadratic definition over the same coordinates.
    Q("geo_radius_join",
      (s, dir) => {
        def h(tag: String) = expr("(cast(conv(substring(md5(concat(" +
          s"cast(user_id as string), ':$tag')), 1, 12), 16, 10) as bigint)" +
          " % 1000001) - 500000")
        val pts = load(s, dir, "events").select(col("user_id")).distinct()
          .select(col("user_id").as("id"),
            (expr("element_at(array(37774900L, 40712800L, 51507400L, " +
              "35689500L, -33868800L), cast(user_id % 5 as int) + 1)") +
              h("lat")).as("lat_micro"),
            (expr("element_at(array(-122419400L, -74006000L, -130100L, " +
              "139691700L, 151209300L), cast(user_id % 5 as int) + 1)") +
              h("lon")).as("lon_micro"))
        graft.ops.Geo.cellRadiusJoin(pts, 100000L)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH u AS (SELECT DISTINCT user_id FROM events),
             |pts AS (SELECT user_id AS id,
             |    ([37774900, 40712800, 51507400, 35689500, -33868800])
             |      [(user_id % 5)::INT + 1]
             |      + (('0x' || substr(md5(user_id::VARCHAR || ':lat'), 1, 12))
             |          ::BIGINT % 1000001) - 500000 AS lat,
             |    ([-122419400, -74006000, -130100, 139691700, 151209300])
             |      [(user_id % 5)::INT + 1]
             |      + (('0x' || substr(md5(user_id::VARCHAR || ':lon'), 1, 12))
             |          ::BIGINT % 1000001) - 500000 AS lon
             |  FROM u),
             |pr AS (SELECT a.id AS id_a, b.id AS id_b,
             |    a.lat - b.lat AS dlat,
             |    ((a.lon - b.lon) * (${graft.ops.Geo.cosBpSqlList})
             |      [((abs(a.lat + b.lat) // 2) // 1000000)::INT + 1]) // 10000
             |      AS lt
             |  FROM pts a JOIN pts b ON a.id < b.id)
             |SELECT id_a, id_b, (dlat * dlat + lt * lt)::BIGINT AS d2
             |FROM pr WHERE dlat * dlat + lt * lt <= 10000000000
             |ORDER BY 1, 2""".stripMargin)),

    // TIME-DECAY multi-touch attribution (EventOps.attributionDecay) —
    // completes the trio: credit ∝ max(10⁴ div 2^age_days, 1), exact
    // integer split with remainder-to-latest (per-conversion credits sum
    // to value_c exactly — Σ credited ≡ Σ purchase value across the
    // three models, a cross-model invariant the three oracles jointly
    // pin). The oracle replays join, decay weights, both window sums and
    // the div/remainder arithmetic verbatim.
    Q("events_attribution_decay",
      (s, dir) => EventOps.attributionDecay(load(s, dir, "events"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("touch_credits"),
          countDistinct(col("conv_id")).as("conversions"),
          Exact.dollars(sum(col("credit_c"))).as("credited_value"))
        .orderBy(col("channel")),
      Some(s"""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec, event_type,
             |    ${cents("value")} AS value_c
             |  FROM events),
             |conv AS (SELECT user_id, event_id AS conv_id, sec AS conv_sec,
             |    value_c FROM e WHERE event_type = 'purchase'),
             |mk AS (SELECT user_id AS mk_user, event_id AS mk_id,
             |    sec AS mk_sec, event_type AS mk_type
             |  FROM e WHERE event_type IN ('click', 'view')),
             |j AS (SELECT c.*, m.mk_id, m.mk_sec, m.mk_type
             |  FROM conv c LEFT JOIN mk m ON c.user_id = m.mk_user
             |    AND m.mk_sec >= c.conv_sec - 604800
             |    AND (m.mk_sec < c.conv_sec
             |      OR (m.mk_sec = c.conv_sec AND m.mk_id < c.conv_id))),
             |x AS (SELECT *,
             |    count(mk_id) OVER (PARTITION BY user_id, conv_id) AS n,
             |    row_number() OVER (PARTITION BY user_id, conv_id
             |      ORDER BY mk_sec DESC, mk_id DESC) AS rk,
             |    greatest(10000 // (1::BIGINT <<
             |      least((conv_sec - mk_sec) // 86400, 50)::INT), 1) AS wgt
             |  FROM j),
             |y AS (SELECT *, sum(wgt) OVER (PARTITION BY user_id, conv_id)
             |    AS wsum FROM x),
             |z AS (SELECT *, CASE WHEN n = 0 THEN value_c
             |    ELSE ((value_c * wgt) // wsum)::BIGINT END AS base_c
             |  FROM y),
             |r AS (SELECT *, sum(CASE WHEN n = 0 THEN 0 ELSE base_c END)
             |    OVER (PARTITION BY user_id, conv_id)::BIGINT AS bsum
             |  FROM z)
             |SELECT CASE WHEN n = 0 THEN 'direct' ELSE mk_type END AS channel,
             |  count(*)::BIGINT AS touch_credits,
             |  count(DISTINCT conv_id)::BIGINT AS conversions,
             |  sum(CASE WHEN n = 0 THEN value_c
             |    ELSE base_c + CASE WHEN rk = 1 THEN value_c - bsum
             |      ELSE 0 END END)::DOUBLE / 100.0 AS credited_value
             |FROM r GROUP BY 1 ORDER BY channel""".stripMargin)),

    Q("window_sliding",
      (s, dir) => EventOps.slidingCounts(load(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT epoch(ws)::BIGINT AS window_start, event_type,
             |count(*) AS n_events,
             |sum(CAST(round(value * 100) AS BIGINT))::DOUBLE / 100.0 AS sum_value
             |FROM (SELECT e.*,
             |    time_bucket(INTERVAL '5 minutes', ts) - k * INTERVAL '5 minutes' AS ws
             |  FROM events e, (SELECT unnest([0, 1]) AS k) r) t
             |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    Q("window_session",
      (s, dir) => EventOps.sessionize(load(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start")),
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |grouped AS (
             |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM flagged)
             |SELECT user_id,
             |  epoch(date_trunc('second', min(ts)))::BIGINT AS session_start,
             |  epoch(date_trunc('second', max(ts) + INTERVAL '30 minutes'))::BIGINT AS session_end,
             |  count(*) AS n_events,
             |  sum(CAST(round(value * 100) AS BIGINT))::DOUBLE / 100.0 AS sum_value
             |FROM grouped GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    Q("stream_dedup_earliest",
      (s, dir) => EventOps.dedupEarliest(load(s, dir, "events"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_timestamp(col("ts")).as("ts_epoch"))
        .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT user_id, event_type, event_id,
             |epoch(date_trunc('second', ts))::BIGINT AS ts_epoch
             |FROM events
             |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
             |  ORDER BY ts, event_id) = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    // Z-order (Morton) clustering key for multi-dimensional data skipping
    // (etl/Layout): the 2x16-bit interleave of (user_id, value-cents), both
    // saturation-clamped. Spark side is the codegen'd shift/and/or
    // expression tree; the oracle SQL is GENERATED BY THE SAME LOOP
    // (Layout.zValueSql), so the hash match pins expression and twin
    // bit-for-bit. The layout/skipping behavior itself is spec-proven
    // (LayoutSpec: 2-D box touches fewer files than a 1-D sort).
    Q("layout_zorder_zvalue",
      (s, dir) => load(s, dir, "events")
        .select(col("event_id"),
          Layout.zValue(Seq(
            Layout.clampBits(col("user_id"), 16),
            Layout.clampBits(Exact.cents(col("value")), 16)), 16).as("zval"))
        .orderBy(col("event_id")),
      Some(s"""SELECT event_id, ${Layout.zValueSql(Seq(
               "least(greatest(user_id, 0), 65535)",
               s"least(greatest(${cents("value")}, 0), 65535)"), 16)} AS zval
             |FROM events ORDER BY event_id""".stripMargin)),

    // Hilbert clustering key over the same (user_id, value-cents) plane:
    // strictly better locality than the Morton code above — consecutive
    // h-values are always grid-adjacent cells (LayoutSpec proves the
    // bijection + unit-step adjacency), so contiguous h-ranges are tighter
    // 2-D boxes → tighter parquet footer min/max per file. The 16-level
    // MSB-first fold is one projection per level (multi-referenced, so the
    // optimizer cannot inline it into a 2^16-node tree); the oracle's
    // chained CTEs are GENERATED BY THE SAME per-level arithmetic
    // (Layout.hilbertLevelSql), pinning expression and twin bit-for-bit.
    Q("layout_hilbert_hvalue",
      (s, dir) => Layout.withHValue(
          load(s, dir, "events").select(col("event_id"),
            Layout.clampBits(col("user_id"), 16).as("hx"),
            Layout.clampBits(Exact.cents(col("value")), 16).as("hy")),
          col("hx"), col("hy"), 16)
        .select(col("event_id"), col("hval"))
        .orderBy(col("event_id")),
      Some(s"""WITH ${Layout.hValueSqlCtes(
               "least(greatest(user_id, 0), 65535)",
               s"least(greatest(${cents("value")}, 0), 65535)",
               16, Seq("event_id"), "events")}
             |SELECT event_id, d AS hval FROM h16
             |ORDER BY event_id""".stripMargin)),

    // Exact per-user TWAP (EventOps.twapCents): last-observation-carried-
    // forward integral over each user's observed span — the irregular-
    // time-series readout a plain AVG gets wrong (bursts over-weighted).
    // All-long cents×seconds with one truncating division; one keyed
    // window + one keyed sum, no global window.
    Q("events_twap",
      (s, dir) => graft.ops.EventOps.twapCents(load(s, dir, "events"))
        .orderBy(col("user_id")),
      Some(s"""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec,
             |    ${cents("value")} AS cents FROM events),
             |x AS (SELECT user_id, sec, cents,
             |    lead(sec) OVER (PARTITION BY user_id
             |      ORDER BY sec, event_id) AS nxt FROM e),
             |g AS (SELECT user_id,
             |    sum(cents * (nxt - sec)) AS num, sum(nxt - sec) AS den
             |  FROM x WHERE nxt IS NOT NULL GROUP BY user_id)
             |SELECT user_id, (num // den)::BIGINT AS twap_cents,
             |  den::BIGINT AS span_sec
             |FROM g WHERE den > 0 ORDER BY user_id""".stripMargin)),

    // Exact A/B readout (EventOps.abLift): deterministic user_id%2 arms,
    // purchase conversion, floor-bp rates/lift, and the 2×2 χ² as an
    // exact Decimal/HUGEINT num ÷ den with one double division.
    Q("events_ab_lift",
      (s, dir) => graft.ops.EventOps.abLift(load(s, dir, "events"),
        "purchase"),
      Some("""WITH pu AS (SELECT user_id,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      ::BIGINT AS conv
             |  FROM events GROUP BY user_id),
             |w AS (SELECT
             |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n0,
             |    sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)::BIGINT AS c0,
             |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             |    sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END)::BIGINT AS c1
             |  FROM pu)
             |SELECT n0, c0, n1, c1,
             |  (c0 * 10000) // n0 AS conv0_bp,
             |  (c1 * 10000) // n1 AS conv1_bp,
             |  (c0 * 10000) // n0 - (c1 * 10000) // n1 AS lift_bp,
             |  CASE WHEN (c0 + c1) = 0 OR (n0 - c0 + n1 - c1) = 0
             |         OR n0 = 0 OR n1 = 0 THEN NULL
             |    ELSE floor((((n0 + n1)::HUGEINT
             |        * (c0::HUGEINT * (n1 - c1) - (n0 - c0)::HUGEINT * c1)
             |        * (c0::HUGEINT * (n1 - c1) - (n0 - c0)::HUGEINT * c1))::DOUBLE
             |      / (n0::HUGEINT * n1 * (c0 + c1) * (n0 - c0 + n1 - c1))::DOUBLE)
             |      * 1000000 + 0.5) / 1000000.0 END AS chi2
             |FROM w""".stripMargin)),

    // CUPED-adjusted A/B revenue readout (EventOps.abCuped, Deng et al.
    // 2013): pre-period purchase cents as the covariate, θ from pooled
    // exact Decimal/HUGEINT moments with ONE double division (6dp), the
    // adjusted lift from exact integer-valued means and the rounded θ —
    // every float step bit-replayable. Split mid-month so both periods
    // carry real revenue.
    Q("events_ab_cuped",
      (s, dir) => graft.ops.EventOps.abCuped(load(s, dir, "events"),
        "purchase", "2024-01-16 00:00:00"),
      Some("""WITH pu AS (SELECT user_id, user_id % 2 AS arm,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |        AND ts < TIMESTAMP '2024-01-16'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS x,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |        AND ts >= TIMESTAMP '2024-01-16'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT arm, count(*)::HUGEINT AS n,
             |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
             |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
             |  FROM pu GROUP BY arm),
             |w AS (SELECT
             |    sum(CASE WHEN arm = 0 THEN n END) AS dn0,
             |    sum(CASE WHEN arm = 0 THEN sx END) AS dsx0,
             |    sum(CASE WHEN arm = 0 THEN sy END) AS dsy0,
             |    sum(CASE WHEN arm = 1 THEN n END) AS dn1,
             |    sum(CASE WHEN arm = 1 THEN sx END) AS dsx1,
             |    sum(CASE WHEN arm = 1 THEN sy END) AS dsy1,
             |    sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
             |    sum(sxy) AS tsxy, sum(sxx) AS tsxx
             |  FROM a),
             |t AS (SELECT *,
             |    CASE WHEN tn * tsxx - tsx * tsx = 0 THEN NULL
             |      ELSE floor(((tn * tsxy - tsx * tsy)::DOUBLE
             |        / (tn * tsxx - tsx * tsx)::DOUBLE)
             |        * 1000000 + 0.5) / 1000000.0 END AS theta
             |  FROM w)
             |SELECT dn0::BIGINT AS n0, dn1::BIGINT AS n1,
             |  dsx0::BIGINT AS sum_x0, dsx1::BIGINT AS sum_x1,
             |  dsy0::BIGINT AS sum_y0, dsy1::BIGINT AS sum_y1, theta,
             |  floor((dsy0::DOUBLE / dn0::DOUBLE
             |    - dsy1::DOUBLE / dn1::DOUBLE) * 1000000 + 0.5) / 1000000.0
             |    AS raw_lift_cents,
             |  floor(((dsy0::DOUBLE / dn0::DOUBLE - dsy1::DOUBLE / dn1::DOUBLE)
             |    - theta * (dsx0::DOUBLE / dn0::DOUBLE
             |               - dsx1::DOUBLE / dn1::DOUBLE))
             |    * 1000000 + 0.5) / 1000000.0 AS adj_lift_cents
             |FROM t""".stripMargin)),

    // Segmented CUPED (EventOps.abCupedBy): the same adjustment WITHIN
    // each user stratum — per-segment θ and adjusted lift, the
    // heterogeneous-treatment-effect readout. Segment = (user_id div 2)
    // % 3: deterministic, arm-independent (user_id % 2 is the arm, so
    // div-2 strata contain both arms).
    Q("events_ab_cuped_by",
      (s, dir) => graft.ops.EventOps.abCupedBy(load(s, dir, "events"),
          "purchase", "2024-01-16 00:00:00",
          expr("(user_id div 2) % 3").cast("long"))
        .orderBy(col("seg")),
      Some("""WITH pu AS (SELECT user_id, user_id % 2 AS arm,
             |    (user_id // 2) % 3 AS seg,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |        AND ts < TIMESTAMP '2024-01-16'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS x,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |        AND ts >= TIMESTAMP '2024-01-16'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
             |  FROM events GROUP BY 1, 2, 3),
             |a AS (SELECT seg, arm, count(*)::HUGEINT AS n,
             |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
             |    sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx
             |  FROM pu GROUP BY seg, arm),
             |w AS (SELECT seg,
             |    sum(CASE WHEN arm = 0 THEN n END) AS dn0,
             |    sum(CASE WHEN arm = 0 THEN sx END) AS dsx0,
             |    sum(CASE WHEN arm = 0 THEN sy END) AS dsy0,
             |    sum(CASE WHEN arm = 1 THEN n END) AS dn1,
             |    sum(CASE WHEN arm = 1 THEN sx END) AS dsx1,
             |    sum(CASE WHEN arm = 1 THEN sy END) AS dsy1,
             |    sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
             |    sum(sxy) AS tsxy, sum(sxx) AS tsxx
             |  FROM a GROUP BY seg),
             |t AS (SELECT *,
             |    CASE WHEN tn * tsxx - tsx * tsx = 0 THEN NULL
             |      ELSE floor(((tn * tsxy - tsx * tsy)::DOUBLE
             |        / (tn * tsxx - tsx * tsx)::DOUBLE)
             |        * 1000000 + 0.5) / 1000000.0 END AS theta
             |  FROM w)
             |SELECT seg, dn0::BIGINT AS n0, dn1::BIGINT AS n1,
             |  dsx0::BIGINT AS sum_x0, dsx1::BIGINT AS sum_x1,
             |  dsy0::BIGINT AS sum_y0, dsy1::BIGINT AS sum_y1, theta,
             |  floor((dsy0::DOUBLE / dn0::DOUBLE
             |    - dsy1::DOUBLE / dn1::DOUBLE) * 1000000 + 0.5) / 1000000.0
             |    AS raw_lift_cents,
             |  floor(((dsy0::DOUBLE / dn0::DOUBLE - dsy1::DOUBLE / dn1::DOUBLE)
             |    - theta * (dsx0::DOUBLE / dn0::DOUBLE
             |               - dsx1::DOUBLE / dn1::DOUBLE))
             |    * 1000000 + 0.5) / 1000000.0 AS adj_lift_cents
             |FROM t ORDER BY seg""".stripMargin)),

    // Fixed-horizon power readout (EventOps.abPower): from the observed
    // per-arm cents moments, the minimum detectable effect at the current
    // sample size and the required per-arm n to detect the observed delta
    // (α=5% two-sided, power 80%; Z = z_{.975}+z_{.80} = 2.801585 as ONE
    // literal). Exact Decimal/HUGEINT moments; doubles only in mirrored
    // divisions, one IEEE sqrt, and literal multiplies.
    Q("events_ab_power",
      (s, dir) => graft.ops.EventOps.abPower(load(s, dir, "events"),
        "purchase"),
      Some("""WITH pu AS (SELECT user_id, user_id % 2 AS arm,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT arm, count(*)::HUGEINT AS n,
             |    sum(y)::HUGEINT AS sy, sum(y::HUGEINT * y) AS syy
             |  FROM pu GROUP BY arm),
             |w AS (SELECT
             |    sum(CASE WHEN arm = 0 THEN n END) AS dn0,
             |    sum(CASE WHEN arm = 0 THEN sy END) AS dsy0,
             |    sum(CASE WHEN arm = 0 THEN syy END) AS dsyy0,
             |    sum(CASE WHEN arm = 1 THEN n END) AS dn1,
             |    sum(CASE WHEN arm = 1 THEN sy END) AS dsy1,
             |    sum(CASE WHEN arm = 1 THEN syy END) AS dsyy1
             |  FROM a),
             |t AS (SELECT *,
             |    CASE WHEN dn0 + dn1 <= 2 THEN NULL
             |      ELSE ((dn0 * dsyy0 - dsy0 * dsy0)::DOUBLE / dn0::DOUBLE
             |          + (dn1 * dsyy1 - dsy1 * dsy1)::DOUBLE / dn1::DOUBLE)
             |        / (dn0 + dn1 - 2)::DOUBLE END AS s2,
             |    dsy0::DOUBLE / dn0::DOUBLE - dsy1::DOUBLE / dn1::DOUBLE
             |      AS delta
             |  FROM w)
             |SELECT dn0::BIGINT AS n0, dn1::BIGINT AS n1,
             |  floor((dsy0::DOUBLE / dn0::DOUBLE) * 1000000 + 0.5)
             |    / 1000000.0 AS mean0_cents,
             |  floor((dsy1::DOUBLE / dn1::DOUBLE) * 1000000 + 0.5)
             |    / 1000000.0 AS mean1_cents,
             |  floor(delta * 1000000 + 0.5) / 1000000.0 AS delta_cents,
             |  floor(s2 * 1000000 + 0.5) / 1000000.0 AS s2_cents2,
             |  floor((2.801585::DOUBLE * sqrt(s2 * (1::DOUBLE / dn0::DOUBLE
             |      + 1::DOUBLE / dn1::DOUBLE))) * 1000000 + 0.5)
             |    / 1000000.0 AS mde_cents,
             |  CASE WHEN delta = 0 THEN NULL
             |    ELSE ceil((2::DOUBLE * s2
             |        * (2.801585::DOUBLE * 2.801585::DOUBLE))
             |      / (delta * delta))::BIGINT END AS n_required
             |FROM t""".stripMargin)),

    // Always-valid sequential readout (EventOps.abSequential — mSPRT,
    // Johari et al. 2017): mixture log-likelihood ratio under a N(0, τ²)
    // effect prior and the peeking-safe p-value min(1, e^(−logΛ)).
    // ln/exp (the two not-correctly-rounded steps) are taken on
    // 6dp-prerounded arguments, mirrored here verbatim.
    Q("events_ab_sequential",
      (s, dir) => graft.ops.EventOps.abSequential(load(s, dir, "events"),
        "purchase", 10000.0),
      Some("""WITH pu AS (SELECT user_id, user_id % 2 AS arm,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT arm, count(*)::HUGEINT AS n,
             |    sum(y)::HUGEINT AS sy, sum(y::HUGEINT * y) AS syy
             |  FROM pu GROUP BY arm),
             |w AS (SELECT
             |    sum(CASE WHEN arm = 0 THEN n END) AS dn0,
             |    sum(CASE WHEN arm = 0 THEN sy END) AS dsy0,
             |    sum(CASE WHEN arm = 0 THEN syy END) AS dsyy0,
             |    sum(CASE WHEN arm = 1 THEN n END) AS dn1,
             |    sum(CASE WHEN arm = 1 THEN sy END) AS dsy1,
             |    sum(CASE WHEN arm = 1 THEN syy END) AS dsyy1
             |  FROM a),
             |t AS (SELECT *,
             |    CASE WHEN dn0 + dn1 <= 2 THEN NULL
             |      ELSE ((dn0 * dsyy0 - dsy0 * dsy0)::DOUBLE / dn0::DOUBLE
             |          + (dn1 * dsyy1 - dsy1 * dsy1)::DOUBLE / dn1::DOUBLE)
             |        / (dn0 + dn1 - 2)::DOUBLE END AS s2,
             |    dsy0::DOUBLE / dn0::DOUBLE - dsy1::DOUBLE / dn1::DOUBLE
             |      AS delta
             |  FROM w),
             |u AS (SELECT *,
             |    s2 * (1::DOUBLE / dn0::DOUBLE + 1::DOUBLE / dn1::DOUBLE)
             |      AS v
             |  FROM t),
             |q AS (SELECT *,
             |    floor((0.5::DOUBLE * ln(floor((v / (v + 10000::DOUBLE))
             |          * 1000000 + 0.5) / 1000000.0)
             |        + (delta * delta * 10000::DOUBLE)
             |          / (2::DOUBLE * v * (v + 10000::DOUBLE)))
             |      * 1000000 + 0.5) / 1000000.0 AS llr
             |  FROM u)
             |SELECT dn0::BIGINT AS n0, dn1::BIGINT AS n1,
             |  floor(delta * 1000000 + 0.5) / 1000000.0 AS delta_cents,
             |  CASE WHEN s2 IS NULL OR v <= 0 THEN NULL
             |    ELSE floor(v * 1000000 + 0.5) / 1000000.0 END AS v_cents2,
             |  CASE WHEN s2 IS NULL OR v <= 0 THEN NULL ELSE llr END
             |    AS log_lambda,
             |  CASE WHEN s2 IS NULL OR v <= 0 THEN NULL
             |    ELSE floor(least(1::DOUBLE, exp(-llr)) * 1000000 + 0.5)
             |      / 1000000.0 END AS p_always_valid
             |FROM q""".stripMargin)),

    // Deterministic Poisson-bootstrap CI on the A/B lift (EventOps
    // .abBootstrapCI, Chamandy et al. 2012): 32 replicates, each user's
    // per-replicate weight inverse-CDF-looked-up from the md5 unit hash
    // of user:rep — reproducible, engine-portable "randomness", so the
    // whole resampling distribution hash-matches. Nearest-rank
    // 2.5/50/97.5 percentiles from one sorted array aggregate.
    Q("events_ab_bootstrap",
      (s, dir) => graft.ops.EventOps.abBootstrapCI(load(s, dir, "events"),
        "purchase", 32),
      Some("""WITH pu AS (SELECT user_id, user_id % 2 AS arm,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) END), 0) AS y
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT user_id, y, arm, unnest(range(0, 32)) AS rep
             |  FROM pu),
             |h AS (SELECT rep, arm, y,
             |    ('0x' || substr(md5(user_id::VARCHAR || ':'
             |      || rep::VARCHAR), 1, 7))::BIGINT / 268435456.0 AS u
             |  FROM r),
             |wt AS (SELECT rep, arm, y,
             |    CASE WHEN u < 0.36787944117144233::DOUBLE THEN 0
             |      WHEN u < 0.7357588823428847::DOUBLE THEN 1
             |      WHEN u < 0.9196986029286058::DOUBLE THEN 2
             |      WHEN u < 0.9810118431238462::DOUBLE THEN 3
             |      WHEN u < 0.9963401531726563::DOUBLE THEN 4
             |      WHEN u < 0.9994058151824183::DOUBLE THEN 5
             |      WHEN u < 0.9999167588507119::DOUBLE THEN 6
             |      ELSE 7 END AS w
             |  FROM h),
             |g AS (SELECT rep,
             |    sum(CASE WHEN arm = 0 THEN w END) AS n0,
             |    sum(CASE WHEN arm = 0 THEN w * y END) AS s0,
             |    sum(CASE WHEN arm = 1 THEN w END) AS n1,
             |    sum(CASE WHEN arm = 1 THEN w * y END) AS s1
             |  FROM wt GROUP BY rep),
             |l AS (SELECT rep,
             |    CASE WHEN n0 > 0 AND n1 > 0 THEN
             |      floor((s0::DOUBLE / n0::DOUBLE - s1::DOUBLE / n1::DOUBLE)
             |        * 1000000 + 0.5) / 1000000.0 END AS lift
             |  FROM g),
             |a AS (SELECT list_sort(list(lift)) AS ls FROM l
             |  WHERE lift IS NOT NULL)
             |SELECT len(ls)::BIGINT AS n_reps,
             |  ls[(floor(0.025::DOUBLE * (len(ls) - 1)) + 1)::BIGINT]
             |    AS lift_p025,
             |  ls[(floor(0.5::DOUBLE * (len(ls) - 1)) + 1)::BIGINT]
             |    AS lift_p500,
             |  ls[(floor(0.975::DOUBLE * (len(ls) - 1)) + 1)::BIGINT]
             |    AS lift_p975
             |FROM a""".stripMargin)),

    // Sample-ratio-mismatch gate (EventOps.abSrm): exact integer χ² on
    // the realized arm counts vs the designed 50/50 — the hygiene check
    // that invalidates every other readout when it fires.
    Q("events_ab_srm",
      (s, dir) => graft.ops.EventOps.abSrm(load(s, dir, "events")),
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |w AS (SELECT
             |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
             |      AS n0,
             |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
             |      AS n1
             |  FROM u),
             |c AS (SELECT *, CASE WHEN n0 + n1 = 0 THEN NULL
             |    ELSE floor((((n0 - n1)::HUGEINT * (n0 - n1))::DOUBLE
             |      / (n0 + n1)::DOUBLE) * 1000000 + 0.5) / 1000000.0 END
             |    AS chi2
             |  FROM w)
             |SELECT n0, n1, (n0 * 10000) // (n0 + n1) AS share0_bp, chi2,
             |  chi2 > 3.841459::DOUBLE AS srm_flag
             |FROM c""".stripMargin)),

    // CUSUM drift alerts (EventOps.cusumAlerts, Page 1954): the
    // sequential recurrence S = max(0, S + (x − k)) expressed as TWO
    // cumulative windows via the prefix-min identity — exact integer
    // cents, group-sized sorts. k = 5400 cents (above the value mean),
    // h = 100000: 237 real alert rows at sf0.01, counts load-bearing.
    Q("events_cusum_alerts",
      (s, dir) => graft.ops.EventOps.cusumAlerts(load(s, dir, "events"),
          driftCents = 5400L, threshCents = 100000L)
        .orderBy(col("event_type"), col("event_id")),
      Some("""WITH c AS (SELECT event_type, event_id, ts,
             |    CAST(round(value * 100) AS BIGINT) - 5400 AS d
             |  FROM events),
             |p AS (SELECT *, sum(d) OVER (PARTITION BY event_type
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS pc
             |  FROM c),
             |q AS (SELECT *, min(pc) OVER (PARTITION BY event_type
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS pmin
             |  FROM p)
             |SELECT event_type, event_id,
             |  epoch(date_trunc('second', ts))::BIGINT AS ts_epoch,
             |  (pc - least(0, pmin))::BIGINT AS s
             |FROM q WHERE pc - least(0, pmin) > 100000
             |ORDER BY event_type, event_id""".stripMargin)),

    // Stream-stream interval join, driver-checked through its BATCH twin:
    // StreamOps.clicksAfterSignup is ONE definition run in two modes —
    // the streaming spec proves the watermarked stream-stream join
    // matches this batch run; here the batch run is pinned to the naive
    // SQL interval join. Each click pairs with every same-user signup at
    // most 1 hour earlier (equi-key + bounded event-time distance — the
    // canonical streaming-enrichment shape whose state the watermark
    // bounds).
    Q("stream_join_interval",
      (s, dir) => graft.streaming.StreamOps.clicksAfterSignup(
          load(s, dir, "events"))
        .orderBy(col("user_id"), col("click_id"), col("signup_epoch")),
      Some("""SELECT c.user_id AS user_id, c.event_id AS click_id,
             |  epoch(date_trunc('second', s.ts))::BIGINT AS signup_epoch,
             |  epoch(date_trunc('second', c.ts))::BIGINT AS click_epoch
             |FROM events c JOIN events s ON c.user_id = s.user_id
             |  AND c.event_type = 'click' AND s.event_type = 'signup'
             |  AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL '1 hour'
             |ORDER BY user_id, click_id, signup_epoch""".stripMargin)),

    Q("pivot_event_counts",
      (s, dir) => EventOps.pivotCounts(load(s, dir, "events"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |count(*) FILTER (WHERE event_type = 'click') AS click,
             |count(*) FILTER (WHERE event_type = 'error') AS error,
             |count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |count(*) FILTER (WHERE event_type = 'signup') AS signup,
             |count(*) FILTER (WHERE event_type = 'view') AS "view"
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Traffic-rate anomaly flags — tumbling counts composed with the
    // ZERO-float z-score machinery (Relational.outlierFlags): a window is
    // anomalous when 100·(n·x−S)² > k10²·(n·Q−S²) on exact integer event
    // counts (k10=15 → 1.5σ), per event type. Spark accumulates in
    // Decimal(38), DuckDB in HUGEINT — the flag boundary is bit-identical.
    // The per-type stats frames broadcast back onto the window counts.
    Q("window_rate_anomaly",
      (s, dir) => graft.ops.Relational.outlierFlags(
          EventOps.tumblingCounts(load(s, dir, "events")),
          Seq("event_type"), col("n_events"), k10 = 15)
        .select(col("event_type"), col("window_start"), col("n_events"),
          col("is_outlier"))
        .orderBy(col("event_type"), col("window_start")),
      Some("""WITH w AS (
             |  SELECT event_type,
             |    epoch(time_bucket(INTERVAL '10 minutes', ts))::BIGINT AS window_start,
             |    count(*) AS n_events
             |  FROM events GROUP BY 1, 2),
             |st AS (SELECT event_type, count(*) AS n, sum(n_events) AS s,
             |        sum(n_events * n_events) AS q
             |      FROM w GROUP BY 1)
             |SELECT w.event_type, window_start, n_events,
             |  (100 * (n * n_events - s) * (n * n_events - s)
             |    > 225 * (n * q - s * s)) AS is_outlier
             |FROM w JOIN st USING (event_type)
             |ORDER BY event_type, window_start""".stripMargin)),

    // Hourly resample + gap fill with carry-forward (EventOps
    // .gapFillHourly): integer epoch-hour grid densified per user, cents
    // sums carried across gaps — the time-series regularization step.
    // Restricted to user_id % 5 = 0 to keep the dump proportionate; the
    // grid explodes from a 2-column span frame, never the events.
    Q("events_gapfill",
      (s, dir) => EventOps.gapFillHourly(
          load(s, dir, "events").filter(col("user_id") % 5 === 0))
        .orderBy(col("user_id"), col("hour_ts")),
      Some("""WITH agg AS (
             |  SELECT user_id, epoch(date_trunc('second', ts))::BIGINT // 3600 AS h,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS cents
             |  FROM events WHERE user_id % 5 = 0 GROUP BY 1, 2),
             |span AS (SELECT user_id, min(h) AS mn, max(h) AS mx
             |         FROM agg GROUP BY 1),
             |grid AS (SELECT user_id, unnest(range(mn, mx + 1)) AS h FROM span),
             |j AS (SELECT g.user_id, g.h, a.cents
             |      FROM grid g LEFT JOIN agg a
             |        ON g.user_id = a.user_id AND g.h = a.h)
             |SELECT user_id, h * 3600 AS hour_ts,
             |  (last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id
             |     ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             |   ))::DOUBLE / 100.0 AS filled_value,
             |  cents IS NULL AS is_gap
             |FROM j ORDER BY user_id, hour_ts""".stripMargin)),

    // Linear-interpolation gap repair (EventOps.gapFillHourlyInterp) —
    // events_gapfill's sibling for continuously-varying measures: missing
    // hours take the straight line between bracketing observed hours
    // (every gap has both neighbors — the grid spans observed min..max).
    // EXACT integer millicents via floor division — no float mix, no
    // rounding-mode sensitivity (a float version hit an exact decimal
    // half where the two engines' round() disagree).
    Q("events_interpolate",
      (s, dir) => EventOps.gapFillHourlyInterp(
          load(s, dir, "events").filter(col("user_id") % 5 === 0))
        .orderBy(col("user_id"), col("hour_ts")),
      Some("""WITH agg AS (
             |  SELECT user_id, epoch(date_trunc('second', ts))::BIGINT // 3600 AS h,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS cents
             |  FROM events WHERE user_id % 5 = 0 GROUP BY 1, 2),
             |span AS (SELECT user_id, min(h) AS mn, max(h) AS mx
             |         FROM agg GROUP BY 1),
             |grid AS (SELECT user_id, unnest(range(mn, mx + 1)) AS h FROM span),
             |j AS (SELECT g.user_id, g.h, a.cents
             |      FROM grid g LEFT JOIN agg a
             |        ON g.user_id = a.user_id AND g.h = a.h),
             |w AS (SELECT user_id, h, cents,
             |  last_value(cents IGNORE NULLS) OVER
             |    (PARTITION BY user_id ORDER BY h
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |  last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY h
             |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
             |  first_value(cents IGNORE NULLS) OVER
             |    (PARTITION BY user_id ORDER BY h
             |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |  first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY h
             |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
             |  FROM j)
             |SELECT user_id, h * 3600 AS hour_ts,
             |  (CASE WHEN cents IS NOT NULL THEN cents * 1000
             |    ELSE ((pv * (nh - h) + nv * (h - ph)) * 1000) // (nh - ph)
             |   END)::BIGINT AS filled_milli,
             |  cents IS NULL AS is_gap
             |FROM w ORDER BY user_id, hour_ts""".stripMargin)),

    // Exponentially decayed counts with a 1-day half life in EXACT
    // integer arithmetic (EventOps.decayedCounts): weight = 10000 div
    // 2^age_days — recency weighting with zero float-order sensitivity.
    Q("agg_decayed_counts",
      (s, dir) => EventOps.decayedCounts(load(s, dir, "events")),
      Some("""WITH pd AS (
             |  SELECT event_type,
             |         epoch(date_trunc('second', ts))::BIGINT // 86400 AS day,
             |         count(*)::BIGINT AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT max(day) AS mx FROM pd)
             |SELECT event_type,
             |  sum(n * (10000 // (1::BIGINT << least(mx - day, 50))))::BIGINT
             |    AS decayed_bp,
             |  sum(n)::BIGINT AS n_events
             |FROM pd, r GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Holt double-exponential forecast (EventOps.holtForecastBp) — the
    // RECURRENT per-user level+trend next to agg_group_trend's closed-form
    // OLS, in exact cent-bp integers (α=0.5, β=0.3 in bp; truncating
    // integer division, identical on negatives in both engines). Spark
    // folds each user's (sec, event_id)-ordered series inside ONE
    // `aggregate` over its collected values (state = two longs); the
    // oracle replays the recurrence as a data-driven recursive CTE over
    // the row-numbered series — every step's truncation must land
    // identically or the final state diverges.
    Q("events_holt_forecast",
      (s, dir) => EventOps.holtForecastBp(load(s, dir, "events"))
        .orderBy(col("user_id")),
      Some("""WITH RECURSIVE e AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch(date_trunc('second', ts)), event_id) AS rn,
             |    CAST(round(value * 100) AS BIGINT) * 10000 AS v
             |  FROM events),
             |mx AS (SELECT user_id, max(rn) AS n FROM e GROUP BY 1),
             |st AS (
             |  SELECT user_id, rn, v AS l, CAST(0 AS BIGINT) AS b
             |  FROM e WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.rn,
             |    (5000 * e.v + 5000 * (st.l + st.b)) // 10000,
             |    (3000 * (((5000 * e.v + 5000 * (st.l + st.b)) // 10000)
             |       - st.l) + 7000 * st.b) // 10000
             |  FROM st JOIN e ON e.user_id = st.user_id
             |    AND e.rn = st.rn + 1)
             |SELECT st.user_id, mx.n AS n_events, st.l AS level_bp,
             |  st.b AS trend_bp, (st.l + 3 * st.b) AS forecast_bp
             |FROM st JOIN mx ON mx.user_id = st.user_id AND st.rn = mx.n
             |ORDER BY 1""".stripMargin)),

    // Rolling-origin backtest of the Holt smoother
    // (EventOps.holtBacktestBp): every step's PRIOR-state forecast l+b is
    // scored against the arriving value before the state absorbs it —
    // walk-forward, no peeking — accumulating exact absolute error in
    // cent-bp. Forecast QUALITY measured, not asserted; the oracle's
    // recursive CTE carries the same error accumulator through every
    // truncating step.
    Q("events_holt_backtest",
      (s, dir) => EventOps.holtBacktestBp(load(s, dir, "events"))
        .orderBy(col("user_id")),
      Some("""WITH RECURSIVE e AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch(date_trunc('second', ts)), event_id) AS rn,
             |    CAST(round(value * 100) AS BIGINT) * 10000 AS v
             |  FROM events),
             |mx AS (SELECT user_id, max(rn) AS n FROM e GROUP BY 1),
             |st AS (
             |  SELECT user_id, rn, v AS l, CAST(0 AS BIGINT) AS b,
             |    CAST(0 AS BIGINT) AS err
             |  FROM e WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.rn,
             |    (5000 * e.v + 5000 * (st.l + st.b)) // 10000,
             |    (3000 * (((5000 * e.v + 5000 * (st.l + st.b)) // 10000)
             |       - st.l) + 7000 * st.b) // 10000,
             |    st.err + abs(e.v - (st.l + st.b))
             |  FROM st JOIN e ON e.user_id = st.user_id
             |    AND e.rn = st.rn + 1)
             |SELECT st.user_id, mx.n AS n_events, st.err AS err_abs_bp,
             |  CASE WHEN mx.n > 1 THEN st.err // (mx.n - 1) END AS mae_bp
             |FROM st JOIN mx ON mx.user_id = st.user_id AND st.rn = mx.n
             |ORDER BY 1""".stripMargin)),

    // Union-of-intervals activity coverage (EventOps.intervalCoverage):
    // each event opens a 300 s interval, overlaps merge — covered
    // seconds, merged-segment count and the longest gap per user, via one
    // ordered window carrying the running max interval end (the sweep
    // that replaces the quadratic overlap self-join). All integer; both
    // engines run the identical window formula.
    Q("events_interval_coverage",
      (s, dir) => EventOps.intervalCoverage(load(s, dir, "events"))
        .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id, event_id,
             |    epoch(date_trunc('second', ts))::BIGINT AS sec FROM events),
             |x AS (SELECT user_id, sec,
             |    max(sec + 300) OVER (PARTITION BY user_id
             |      ORDER BY sec, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM e)
             |SELECT user_id, count(*)::BIGINT AS n_events,
             |  sum(greatest(sec + 300 - greatest(sec, coalesce(pmax, sec)),
             |    0))::BIGINT AS covered_sec,
             |  sum(CASE WHEN pmax IS NULL OR sec > pmax THEN 1 ELSE 0
             |    END)::BIGINT AS n_segments,
             |  coalesce(max(CASE WHEN pmax IS NOT NULL AND sec > pmax
             |    THEN sec - pmax END), 0)::BIGINT AS longest_gap_sec
             |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin)),
  )
}
