package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import H._

/** SURVEY.md §2.10 — batch-declared forms of the streaming operators.
  *
  * Structured Streaming guarantees stream-result == batch-result for these
  * plans; the true streaming versions live in [[graft.streaming.Streams]]
  * (same transformations over readStream inputs) and the equivalence is
  * asserted in StreamingSpec. Window starts are surfaced as epoch seconds
  * (hour/15-min aligned → precision-exact in both engines).
  */
object StreamingBatch {

  /** Tumbling 1-hour window per event_type — uses the same `window()` expr
    * the streaming query uses; DuckDB equivalent is date_trunc.
    */
  private val streamTumbling = Q(
    "stream_tumbling",
    (s, d) => graft.api.Fts.timeBucket(T.events(s, d), "ts", "1 hour",
        Seq("event_type"), col("value"))
      .withColumnRenamed("bucket_start", "hour_start")
      .orderBy("hour_start", "event_type"),
    Some(s"""SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_start, event_type,
count(*) AS n, ${dsumSql("value")} AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type"""))

  /** Sliding 1-hour window every 15 min: each event lands in 4 windows.
    * DuckDB side enumerates the same 4 epoch-aligned slide starts.
    */
  private val streamSliding = Q(
    "stream_sliding",
    (s, d) => T.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("avg_value"))
      .orderBy("win_start", "event_type"),
    Some("""SELECT (epoch_us(ts) // 900000000) * 900 - j * 900 AS win_start,
event_type, count(*) AS n, (CAST(sum(CAST((value) AS DECIMAL(18,4))) AS DOUBLE) / count(*)) AS avg_value
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
GROUP BY 1, 2 ORDER BY win_start, event_type"""))

  /** Session windows (30-min inactivity gap) in batch form: lag-gap →
    * prefix-sum session ids — the exact construction `session_window`
    * performs with state in streaming.
    */
  private val streamSession = Q(
    "stream_session",
    (s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("em", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), em(col("ts")).as("em"), col("value"))
        .withColumn("new_sess",
          when(col("em") - lag(col("em"), 1).over(wOrd) > 1800000000L, 1)
            .otherwise(lit(0)))
        .withColumn("sess_id", sum(col("new_sess")).over(wRun))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("em")).as("sess_start_us"),
          (max(col("em")) - min(col("em"))).as("duration_us"),
          dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "sess_id")
    },
    Some(s"""SELECT user_id, sess_id, count(*) AS n_events,
min(em) AS sess_start_us, max(em) - min(em) AS duration_us,
${dsumSql("value")} AS sum_value
FROM (
  SELECT user_id, event_id, em, value,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY em, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
  FROM (
    SELECT user_id, event_id, em, value,
      CASE WHEN em - lag(em, 1) OVER (PARTITION BY user_id ORDER BY em, event_id)
                > 1800000000 THEN 1 ELSE 0 END AS new_sess
    FROM (SELECT user_id, event_id, epoch_us(ts) AS em, value FROM events)))
GROUP BY user_id, sess_id ORDER BY user_id, sess_id"""))

  /** Stateful dedup batch form: re-delivered event_ids (the input unioned
    * with itself) collapse back to one row each.
    */
  private val streamDedup = Q(
    "stream_dedup",
    (s, d) => {
      val ev = T.events(s, d).select("event_id", "event_type")
      ev.unionByName(ev) // simulate redelivery
        .dropDuplicates("event_id")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n
FROM (SELECT DISTINCT event_id, event_type
      FROM (SELECT event_id, event_type FROM events
            UNION ALL SELECT event_id, event_type FROM events))
GROUP BY event_type ORDER BY event_type"""))

  /** Watermark/late-data batch proxy: per event_type, how many events arrive
    * more than 24h before the stream's max timestamp (what a 24h watermark
    * would admit vs drop is exercised for real in StreamingSpec).
    */
  private val streamLateData = Q(
    "stream_late_data",
    (s, d) => {
      val ev = T.events(s, d).select(col("event_type"), em(col("ts")).as("em"))
      val mx = ev.agg(max(col("em")).as("max_em"))
      ev.crossJoin(broadcast(mx))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(when(col("em") < col("max_em") - 86400000000L, 1)).as("n_older_24h"))
        .orderBy("event_type")
    },
    // integer epoch-µs arithmetic → exactly oracle-able (the true watermark
    // drop behavior is exercised in StreamingSpec)
    Some("""SELECT event_type, count(*) AS n,
count(*) FILTER (WHERE em < mx - 86400000000) AS n_older_24h
FROM (SELECT event_type, epoch_us(ts) AS em,
        max(epoch_us(ts)) OVER () AS mx FROM events)
GROUP BY event_type ORDER BY event_type"""))

  /** Stream-static enrichment: events joined to a static user dimension
    * derived from customer (user_id ranges align with c_custkey).
    */
  private val streamStaticJoin = Q(
    "stream_static_join",
    (s, d) => T.events(s, d)
      .join(broadcast(T.customer(s, d)), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
      .orderBy("c_mktsegment"),
    Some(s"""SELECT c_mktsegment, count(*) AS n_events,
count(DISTINCT user_id) AS n_users, ${dsumSql("value")} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Batch-declared twin of the STREAM-STREAM interval join
    * ([[graft.streaming.Streams.clickErrorJoin]] — the same builder, since
    * watermarks are no-ops on batch frames): per user, (click, error) pairs
    * with the error within 30 minutes after the click, aggregated to
    * per-user funnel counts. Timestamp bounds are integer-µs comparisons →
    * exactly oracle-able; stream==batch equivalence is exercised for real
    * in StreamingSpec.
    */
  private val streamStreamJoin = Q(
    "stream_stream_join",
    (s, d) => graft.streaming.Streams.clickErrorJoin(T.events(s, d))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks_with_error"),
        countDistinct(col("error_id")).as("n_errors_after_click"))
      .orderBy("user_id"),
    Some("""SELECT c.user_id AS user_id, count(*) AS n_pairs,
count(DISTINCT c.event_id) AS n_clicks_with_error,
count(DISTINCT e.event_id) AS n_errors_after_click
FROM (SELECT user_id, event_id, epoch_us(ts) AS em FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, event_id, epoch_us(ts) AS em FROM events WHERE event_type = 'error') e
ON c.user_id = e.user_id AND e.em >= c.em AND e.em <= c.em + 1800000000
GROUP BY 1 ORDER BY user_id"""))

  /** Time resample with gap filling — the reference's "time-resample" stage:
    * a generated hourly spine (min..max hour) left-joined to the hourly
    * aggregates, empty buckets filled with zeros. The spine is a sequence
    * explode, not a driver loop, so it scales with the time range only.
    */
  private val streamResampleFill = Q(
    "stream_resample_fill",
    (s, d) => graft.api.Fts.resampleFill(
        T.events(s, d)
          .select(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_s"),
            col("value")),
        col("hour_s"), 3600L, col("value"))
      .withColumnRenamed("bucket", "hour_s")
      .orderBy("hour_s"),
    Some(s"""SELECT s.hour_s AS hour_s, coalesce(h.n, 0) AS n,
coalesce(h.sum_value, 0) AS sum_value
FROM (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_s
      FROM (SELECT min(epoch_us(date_trunc('hour', ts)) // 1000000) AS lo,
                   max(epoch_us(date_trunc('hour', ts)) // 1000000) AS hi FROM events)) s
LEFT JOIN (SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_s, count(*) AS n,
             ${dsumSql("value")} AS sum_value
           FROM events GROUP BY 1) h
ON s.hour_s = h.hour_s
ORDER BY hour_s"""))

  /** CDC APPLY — collapse a change log to its latest-wins snapshot with
    * tombstones: the event stream is read as an op log keyed on user_id
    * ('error' = DELETE tombstone, anything else = UPSERT of that user's
    * state), and the snapshot keeps, per user, the LATEST op by
    * (ts, event_id) — dropped entirely when that op is a tombstone. The
    * table-maintenance primitive a streaming ingest runs on every
    * micro-batch (the stateful sibling of set_upsert's two-frame merge);
    * per surviving user the snapshot also carries the op history counts a
    * compaction audit wants (`n_ops`, `n_deletes` — deletes SEEN, i.e.
    * tombstones the key outlived).
    *
    * All columns are exact (longs, strings, the 2-decimal value double
    * passes through unchanged) — no rounding anywhere.
    *
    * Scale shape: ONE window pass partitioned on high-cardinality
    * user_id computes rank + both counts over the same partition spec
    * (one shuffle, one sort); the tombstone filter is applied AFTER
    * rank-1 selection so deleted keys never leave the map side as
    * output. No self-join, no driver state.
    */
  private val streamCdcApply = Q(
    "stream_cdc_apply",
    (s, d) => {
      val byKey = Window.partitionBy("user_id")
      val latest = Window.partitionBy("user_id")
        .orderBy(col("em").desc, col("event_id").desc)
      T.events(s, d)
        .select(col("user_id"), col("event_id"), em(col("ts")).as("em"),
          col("event_type"), col("value"))
        // one select, not chained withColumns: the two unbounded
        // per-key counts share a window spec and merge into one Window
        // node only when planned together (3 nodes → 2, same exchange)
        .select(col("user_id"), col("event_id"), col("em"),
          col("event_type"), col("value"),
          row_number().over(latest).as("rn"),
          count(lit(1)).over(byKey).as("n_ops"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .over(byKey).as("n_deletes"))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("em").as("last_em"),
          col("event_type").as("last_type"), col("value").as("last_value"),
          col("n_ops"), col("n_deletes"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, em AS last_em, event_type AS last_type,
value AS last_value, n_ops, n_deletes
FROM (SELECT user_id, event_id, em, event_type, value,
    row_number() OVER (PARTITION BY user_id ORDER BY em DESC, event_id DESC) AS rn,
    count(*) OVER (PARTITION BY user_id) AS n_ops,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id) AS BIGINT) AS n_deletes
  FROM (SELECT user_id, event_id, epoch_us(ts) AS em, event_type, value
        FROM events))
WHERE rn = 1 AND event_type <> 'error'
ORDER BY user_id"""))

  /** Windowed TOP-K (§2.10 ext) — per tumbling 1-day window, the top-3
    * event types by summed value with their rank: the "trending now"
    * leaderboard every streaming dashboard runs. Batch-declared like the
    * rest of the family; in a live stream the per-window aggregate is the
    * same `window()` groupBy, and the rank finalizes when the watermark
    * closes the window (rank is not incrementally appendable, so a
    * streaming deployment emits it from the closed-window state — pinned
    * in code by [[graft.streaming.Streams.topkWindowed]], whose chained
    * append-mode aggregation StreamingSpec replays in chunks and asserts
    * equal to this key's final ranks).
    *
    * TIMEZONE CONTRACT: Spark's `window(ts, "1 day")` aligns tumbling
    * windows to the epoch in the SESSION timezone while the oracle's
    * `date_trunc('day', ts)` truncates the naive timestamp — the two
    * agree because every harness session pins
    * `spark.sql.session.timeZone = UTC` (Verify/Bench/QRun/tests). A
    * non-UTC session would shift Spark's day boundaries but not
    * DuckDB's; keep the pin.
    *
    * Float discipline: sum_value via [[H.dsum]] (exact decimal, cast back
    * once) → ranking compares bit-identical doubles, ties broken on
    * event_type — no tie-split hazard across engines.
    *
    * Scale shape: one (window, type) hash aggregate with map-side partial
    * combine, then the rank window partitions per-day over TYPE grain —
    * bounded rows per partition regardless of event volume.
    */
  private val streamTopkWindowed = Q(
    "stream_topk_windowed",
    (s, d) => {
      val wR = Window.partitionBy("day_start")
        .orderBy(col("sum_value").desc, col("event_type").asc)
      T.events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("day_start"),
          col("event_type"), col("n"), col("sum_value"))
        .withColumn("rk", row_number().over(wR))
        .filter(col("rk") <= 3)
        .orderBy("day_start", "rk")
    },
    Some(s"""WITH b AS (SELECT epoch_us(date_trunc('day', ts)) // 1000000 AS day_start,
    event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
  FROM events GROUP BY 1, 2),
r AS (SELECT day_start, event_type, n, sum_value,
    row_number() OVER (PARTITION BY day_start
      ORDER BY sum_value DESC, event_type ASC) AS rk FROM b)
SELECT day_start, event_type, n, sum_value, rk FROM r
WHERE rk <= 3 ORDER BY day_start, rk"""))

  /** Gap-filling LINEAR interpolation (§2.10 ext) — stream_resample_fill's
    * zero-fill sibling for a SPARSE signal: the hourly mean of high-value
    * events (value ≥ 200 — ~22 % of hours observed at sf0.01) on the full
    * hourly spine, with every gap hour linearly interpolated between its
    * nearest observed neighbors, the head back-filled and the tail
    * held — the standard sensor/metric resampling semantics
    * (pandas `interpolate(limit_direction='both')`).
    *
    * Float discipline: observed means are [[H.davg]] (DECIMAL-exact sums
    * → identical doubles); the interpolation weight `(t−tp)/(tn−tp)` is
    * an exact integer ratio and the blend `vp + (vn−vp)·w` one identical
    * spelled-order IEEE chain → ALL RAW.
    *
    * Scale shape: the fact table collapses to HOUR grain before
    * anything else; the spine is calendar-bounded; the neighbor lookups
    * are the asof window pair (last/first non-null over one ordering) on
    * the spine — unpartitioned but CALENDAR-grain (the
    * join_interval_overlap precedent: constant-size at any corpus
    * scale), not fact-grain.
    */
  private val streamInterpolate = Q(
    "stream_interpolate",
    (s, d) => {
      val ev = T.events(s, d)
        .select(unix_timestamp(date_trunc("hour", col("ts"))).as("hs"),
          col("value"))
      val obs = ev.filter(col("value") >= 200.0)
        .groupBy("hs").agg(davg(col("value")).as("v"))
      // in-plan span assert on the 1-row bounds frame (the calendarBounded
      // contract, free here — the bounds aggregate already exists; budget
      // in HOURS)
      val spine = ev.agg(min("hs").as("lo"), max("hs").as("hi"))
        .filter(assert_true(
          coalesce((col("hi") - col("lo")) / 3600L, lit(0L)).cast("long")
            <= lit(200000L),
          lit("stream_interpolate: the hour spine would span more than " +
            "200000 hours — the time domain is not calendar-bounded"))
          .isNull)
        .select(explode(sequence(col("lo"), col("hi"), lit(3600L)))
          .as("hour_s"))
      val g = spine.join(obs, col("hour_s") === col("hs"), "left")
      val wPrev = Window.orderBy("hour_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.orderBy("hour_s")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val filled = g.select(col("hour_s"), col("v"),
        last(col("hs"), ignoreNulls = true).over(wPrev).as("tp"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("vp"),
        first(col("hs"), ignoreNulls = true).over(wNext).as("tn"),
        first(col("v"), ignoreNulls = true).over(wNext).as("vn"))
      filled.select(col("hour_s"),
        (!col("v").isNull).as("observed"),
        when(col("v").isNotNull, col("v"))
          .when(col("vp").isNull, col("vn"))
          .when(col("vn").isNull, col("vp"))
          .otherwise(col("vp") + (col("vn") - col("vp")) *
            ((col("hour_s") - col("tp")).cast("double")
              / (col("tn") - col("tp")))).as("v_interp"))
        .orderBy("hour_s")
    },
    Some(s"""WITH ev AS (SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hs, value
  FROM events),
obs AS (SELECT hs, ${davgSql("value")} AS v FROM ev WHERE value >= 200.0 GROUP BY 1),
spine AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_s
  FROM (SELECT min(hs) AS lo, max(hs) AS hi FROM ev)),
g AS (SELECT hour_s, obs.hs AS ohs, v FROM spine LEFT JOIN obs ON hour_s = obs.hs),
f AS (SELECT hour_s, v,
    last_value(ohs IGNORE NULLS) OVER (ORDER BY hour_s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
    last_value(v IGNORE NULLS) OVER (ORDER BY hour_s
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
    first_value(ohs IGNORE NULLS) OVER (ORDER BY hour_s
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn,
    first_value(v IGNORE NULLS) OVER (ORDER BY hour_s
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn
  FROM g)
SELECT hour_s, (v IS NOT NULL) AS observed,
  CASE WHEN v IS NOT NULL THEN v
       WHEN vp IS NULL THEN vn
       WHEN vn IS NULL THEN vp
       ELSE vp + (vn - vp) *
         (CAST(hour_s - tp AS DOUBLE) / (tn - tp)) END AS v_interp
FROM f ORDER BY hour_s"""))

  /** Streaming corpus exact-dedup, batch-declared (§2.10 ext) — the same
    * [[graft.streaming.Streams.corpusDedup]] builder the true stream runs
    * (`window()` and `withWatermark` are batch-compatible), over the
    * documents corpus plus a DETERMINISTIC redelivery set (every 7th doc
    * re-ingested 30 minutes later under a shifted ingest id — the ingest
    * replay shape a continuous pipeline actually sees; the fixture corpus
    * itself carries no exact duplicates). Per (1-day window, content) the
    * survivor is min(doc_id) — the llm_exact_dedup rule, arrival-order
    * independent — and redeliveries collapse onto their original unless
    * the 30-minute shift crosses midnight, in which case the copy
    * survives in the NEXT day's window: the horizon IS the dedup scope
    * (documented in the builder's scaladoc; the golden pins both cases).
    *
    * Scale shape: one map-side hash of the text, payload dropped before
    * the shuffle (the aggregate carries only window+hash+min+count), one
    * stateful aggregation. The Spark side groups on the 8-byte content
    * hash, the oracle on the normalized text — identical partitions
    * barring an xxhash64 collision inside one day-window of the fixture
    * (none; and at scale a collision only merges two dup-groups, the
    * standard content-hash dedup contract).
    */
  private val streamCorpusDedup = Q(
    "stream_corpus_dedup",
    (s, d) => {
      val epoch0 = 1704067200000000L // 2024-01-01T00:00:00Z
      val base = T.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("ingest_ts",
          timestamp_micros(lit(epoch0) + col("doc_id") * lit(600000000L)))
      val redelivered = base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000).as("doc_id"), col("text"),
          (col("ingest_ts") + expr("INTERVAL 30 MINUTES")).as("ingest_ts"))
      graft.streaming.Streams.corpusDedup(base.union(redelivered))
        .orderBy("day_start", "survivor_id")
    },
    Some("""WITH base AS (SELECT doc_id, text,
    make_timestamp(1704067200000000 + doc_id * 600000000) AS ingest_ts
  FROM documents),
redel AS (SELECT doc_id + 1000 AS doc_id, text,
    ingest_ts + INTERVAL 30 MINUTE AS ingest_ts
  FROM base WHERE doc_id % 7 = 0),
a AS (SELECT * FROM base UNION ALL SELECT * FROM redel)
SELECT epoch_us(date_trunc('day', ingest_ts)) // 1000000 AS day_start,
  min(doc_id) AS survivor_id, count(*) AS n_copies
FROM a GROUP BY date_trunc('day', ingest_ts), lower(trim(text))
ORDER BY day_start, survivor_id"""))

  val all: Seq[Q] = Seq(streamTumbling, streamSliding, streamSession,
    streamDedup, streamLateData, streamStaticJoin, streamStreamJoin,
    streamResampleFill, streamCdcApply, streamTopkWindowed,
    streamInterpolate, streamCorpusDedup)
}
