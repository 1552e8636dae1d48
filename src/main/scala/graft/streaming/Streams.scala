package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.DecimalType

/** Typed rows for the stateful operators (top-level for encoder derivation). */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
case class RunStats(n: Long, sum: Double, sumSq: Double)
case class Anomaly(user_id: Long, event_id: Long, value: Double, zscore: Double)
case class CdcState(em: Long, event_id: Long, event_type: String,
    value: Double, n_ops: Long, n_deletes: Long)
case class CdcRow(user_id: Long, last_em: Long, last_type: String,
    last_value: Double, n_ops: Long, n_deletes: Long, deleted: Boolean)

/** SURVEY.md §2.10 — the true Structured Streaming forms of the
  * batch-declared `stream_*` queries in [[graft.ops.StreamingBatch]].
  *
  * Each builder takes the (streaming or batch) events DataFrame — schema
  * `event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string` — and returns the transformed frame.
  * Structured Streaming's batch-equivalence guarantee is asserted in
  * StreamingSpec by running the same builder over a MemoryStream replay and
  * over the static frame.
  *
  * Watermarks: `withWatermark` is a no-op on batch frames, so the builders
  * are directly reusable in both modes.
  */
object Streams {

  /** Exact, order-independent floating sum: incremental state accumulation
    * (stream) and partial/final aggregation (batch) add doubles in different
    * orders, so raw double sums would make the stream==batch equivalence
    * bitwise-flaky; DECIMAL sums are associative-exact (mirrors graft.ops.H).
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Tumbling 1h windows per event_type; 10 min watermark bounds state. */
  def tumbling(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    .select(unix_timestamp(col("w.start")).as("hour_start"),
      col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1h windows every 15 min. */
  def sliding(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"), (dsum(col("value")) / count(lit(1))).as("avg_value"))
    .select(unix_timestamp(col("w.start")).as("win_start"),
      col("event_type"), col("n"), col("avg_value"))

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessions(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
    .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    .select(col("user_id"), unix_timestamp(col("w.start")).as("sess_start"),
      col("n_events"), col("sum_value"))

  /** The true-streaming twin of `stream_topk_windowed`: per tumbling 1-day
    * window, the top-k event types by exact-decimal summed value, with
    * rank. Rank is NOT incrementally appendable, so it finalizes at
    * WATERMARK CLOSE — and this builder makes that seam executable code
    * instead of a scaladoc note: the (window, type) aggregate runs in
    * append mode (bounded state per open (window, type) pair), and a
    * SECOND chained stateful aggregate — Spark's multiple-stateful-
    * operators support, re-windowing on `window_time` so the watermark
    * propagates — collects each CLOSED window's type totals and reads the
    * top-k off one sorted array. A window's leaderboard emits exactly
    * once, when the watermark passes its end; StreamingSpec replays the
    * fixture in ts-ordered chunks plus a watermark-advancing sentinel and
    * pins the emitted ranks against the batch computation.
    *
    * Ordering: the struct array sorts by (−sum_value, event_type) —
    * sum_value is the exact-decimal-derived double (negation is exact),
    * so the sort is the same total order as the batch key's
    * `row_number() OVER (ORDER BY sum_value DESC, event_type)`.
    *
    * On a batch frame the same plan degenerates to two plain aggregates
    * (`withWatermark` is a no-op), so one builder serves both modes.
    */
  def topkWindowed(events: DataFrame, k: Int = 3): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    .groupBy(window(window_time(col("w")), "1 day").as("w2"))
    .agg(collect_list(struct((-col("sum_value")).as("ns"),
      col("event_type"), col("n"), col("sum_value"))).as("xs"))
    .select(unix_timestamp(col("w2.start")).as("day_start"),
      posexplode(slice(array_sort(col("xs")), 1, k)))
    .select(col("day_start"), col("col.event_type").as("event_type"),
      col("col.n").as("n"), col("col.sum_value").as("sum_value"),
      (col("pos") + 1).cast("int").as("rk"))

  /** Windowed approx-distinct as a live stream: per tumbling day ×
    * event_type, `approx_count_distinct(user_id)` — the streaming face of
    * the sketch family (agg_hll_merge's daily-sketch table, maintained
    * incrementally instead of batch-rebuilt). HLL register updates are
    * per-register MAX — insertion- and merge-order independent — so the
    * streamed final state equals the batch computation EXACTLY, not just
    * approximately; StreamingSpec pins that equality over an out-of-order
    * chunk replay. State per open (window, type) is one bounded register
    * array, the same 100 TB contract as the batch sketch table.
    */
  def approxDistinctWindowed(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
    .agg(approx_count_distinct(col("user_id")).as("approx_users"),
      count(lit(1)).as("n"))
    .select(unix_timestamp(col("w.start")).as("day_start"),
      col("event_type"), col("approx_users"), col("n"))

  /** Online PSI feature-drift monitor — the streaming face of
    * `agg_drift_psi`: the live stream's `value` distribution per
    * event_type, binned against a STORED baseline profile (the production
    * shape: the baseline is a frozen training-period artifact, passed in
    * as literals, never recomputed online), with drift scored
    * incrementally as events arrive.
    *
    * The whole query is ONE stateful aggregation — each of the 10 bins is
    * a conditional count column in a single `groupBy(event_type)`, and
    * PSI closes as fixed-width row arithmetic over those columns plus the
    * baseline literals (add-one smoothing, 10-term left-to-right sum —
    * deterministic, so the streamed final state equals the batch builder
    * bit-for-bit; StreamingSpec pins that over an out-of-order replay).
    * Structured Streaming allows one aggregation per query; folding bins
    * into columns instead of rows is what keeps the PSI close INSIDE that
    * single aggregation. State per event_type is 10 longs — bounded by
    * features × bins at any stream volume.
    *
    * @param mn,mx   frozen bin range from the baseline profile
    * @param baseline per-feature 10 smoothed baseline shares (same
    *                 add-one convention), in bin order
    */
  def driftPsi(events: DataFrame, mn: Double, mx: Double,
      baseline: Map[String, Seq[Double]]): DataFrame = {
    val width = (mx - mn) / 10.0
    val bin = least(floor((col("value") - lit(mn)) / lit(width)), lit(9L))
    val binAggs = (0 until 10).map(i =>
      sum(when(bin === i, 1L).otherwise(0L)).as(s"b$i"))
    val counts = events.groupBy(col("event_type"))
      .agg(binAggs.head, binAggs.tail: _*)
    val tot = (0 until 10).map(i => col(s"b$i")).reduce(_ + _)
    val pb = map(baseline.toSeq.sortBy(_._1).flatMap { case (k, ps) =>
      Seq(lit(k), array(ps.map(lit): _*))
    }: _*)
    val terms = (0 until 10).map { i =>
      val pc = (col(s"b$i") + lit(1L)).cast("double") / (col("n_cur") + lit(10L))
      val pbi = element_at(col("pb"), col("event_type"))(i)
      floor((pc - pbi) * log(pc / pbi) * 1e6 + 0.5) / 1e6
    }
    counts.withColumn("n_cur", tot).withColumn("pb", pb)
      .select(col("event_type"), col("n_cur"),
        terms.reduce(_ + _).as("psi"))
      // an event_type ABSENT from the frozen baseline nulls every pbi and
      // hence psi — and a drift monitor silently blind to exactly the
      // new-feature case would be worthless. Surface it: known_baseline
      // flags the miss, and a missing baseline IS drift (a feature the
      // training period never saw), so drifted forces true rather than
      // inheriting psi's null.
      .withColumn("known_baseline", col("psi").isNotNull)
      .withColumn("drifted",
        when(col("known_baseline"), col("psi") >= 0.2).otherwise(lit(true)))
  }

  /** Streaming freshness / SLA monitor — the online twin of the batch
    * `src_freshness_sla` key: per event_type, the last-seen event time,
    * its lag behind a FIXED reference instant (`asOfUs` — the deployment
    * shape: the scheduler passes the run timestamp, so the result is
    * deterministic and stream == batch is exact; a moving wall-clock
    * reference would make the twin untestable), and the SLA breach flag.
    * One bounded aggregation (2 longs per event_type); complete mode.
    */
  def freshness(events: DataFrame, asOfUs: Long,
      slaHours: Long = 48L): DataFrame =
    events.groupBy(col("event_type"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("last_us"),
        (lit(asOfUs) - col("last_us")).as("lag_us"),
        (lit(asOfUs) - col("last_us") > lit(slaHours * 3600000000L))
          .as("sla_breach"))

  /** Streaming corpus exact-dedup — the INGEST face of the batch
    * `llm_exact_dedup` key (a production LLM pipeline ingests documents
    * continuously; this is the first streaming operator its operator asks
    * for). One stateful aggregation keyed by (1-day event-time window,
    * `xxhash64(lower(trim(text)))`): per content within the horizon, the
    * surviving doc (min doc_id — the SAME survivor rule as the batch key,
    * NOT first-arriving, so the result is arrival-order independent and
    * stream == batch holds EXACTLY over any out-of-order replay;
    * StreamingSpec pins it) and the copy count.
    *
    * State bound: one (window, hash, min, count) row — ~40 bytes — per
    * DISTINCT document in an open window; the TEXT never enters state
    * (the hash is computed map-side and the payload is dropped before the
    * shuffle). Closed windows evict at the watermark, so state is
    * horizon-bounded at any stream length. The window IS the dedup scope:
    * a document re-ingested in a later window survives again there —
    * cross-horizon dedup is the batch `llm_exact_dedup` /
    * `llm_decontaminate_bloom` job's role, not the online gate's.
    *
    * Input contract: `docs(doc_id long, text string, ingest_ts timestamp)`
    * — the ingest id and arrival event-time; extra columns are ignored.
    */
  def corpusDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), "1 day").as("w"),
        xxhash64(lower(trim(col("text")))).as("content_hash"))
      .agg(min("doc_id").as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(unix_timestamp(col("w.start")).as("day_start"),
        col("survivor_id"), col("n_copies"))

  /** Stateful dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame = events
    .withWatermark("ts", "10 minutes")
    .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment against a customer-derived user dimension. */
  def staticJoin(events: DataFrame, userDim: DataFrame): DataFrame = events
    .join(broadcast(userDim), col("user_id") === col("c_custkey"))
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
      col("c_mktsegment"))

  /** STREAM-STREAM interval join: per user, every (click, error) pair where
    * the error lands within 30 minutes after the click — the funnel /
    * root-cause primitive. Both sides carry watermarks and the join
    * condition bounds event time on BOTH ends, which is what lets Structured
    * Streaming evict state: clicks are held ~30min + watermark behind the
    * max seen event time, errors just the watermark — bounded state at any
    * stream length. An unbounded-condition stream-stream join would grow
    * state forever; this is the canonical bounded shape.
    *
    * `withWatermark` is a no-op on batch frames, so the same builder serves
    * the batch-declared twin (`stream_stream_join`) and the true stream.
    */
  def clickErrorJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", "10 minutes")
    clicks.join(errors,
        col("c_user") === col("e_user") &&
          col("e_ts") >= col("c_ts") &&
          col("e_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("error_id"),
        col("c_ts"), col("e_ts"))
  }

  /** The core FTS metric as a live stream: running per-key success/error
    * rates (complete-mode aggregation; state is one row per key — bounded
    * by key cardinality, the per-link monitoring shape). Delegates to the
    * SAME builder as the batch query ([[graft.api.Fts.successRate]] is a
    * plain groupBy/agg, streaming-compatible), so the stream and batch
    * definitions cannot drift apart.
    */
  def successRate(events: DataFrame): DataFrame =
    graft.api.Fts.successRate(events, Seq("user_id"),
      col("event_type") === "error")

  /** Arbitrary stateful processing (§2.10 advanced): per-user running
    * mean/variance state via flatMapGroupsWithState; emits events whose
    * value is > 3 sigma from that user's running stats (after a 10-event
    * warm-up). State is one small struct per user — bounded, partitioned by
    * the grouping key, the canonical custom-state shape.
    */
  def anomalies(events: Dataset[EventRow]): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[RunStats]) =>
          var st = state.getOption.getOrElse(RunStats(0L, 0.0, 0.0))
          val out = scala.collection.mutable.ListBuffer.empty[Anomaly]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (st.n >= 10) {
              val mean = st.sum / st.n
              val sd = math.sqrt(math.max(st.sumSq / st.n - mean * mean, 1e-9))
              val z = (e.value - mean) / sd
              if (math.abs(z) > 3.0) out += Anomaly(uid, e.event_id, e.value, z)
            }
            st = RunStats(st.n + 1, st.sum + e.value, st.sumSq + e.value * e.value)
          }
          state.update(st)
          out.iterator
      }
  }

  /** The true-streaming twin of `stream_cdc_apply`: per-key latest-wins
    * CDC state with tombstones, maintained incrementally. Each micro-batch
    * folds its ops into the key's [[CdcState]] (latest op by (µs, id) wins
    * the snapshot fields; every op bumps `n_ops`, tombstones bump
    * `n_deletes`) and emits the key's refreshed snapshot row — Update-mode
    * semantics, so a downstream sink upserts on user_id and arrives at
    * exactly the batch key's table (`deleted` marks keys whose LATEST op
    * is a tombstone; the batch form drops them, a streaming sink needs the
    * explicit delete marker instead — it cannot retract by omission).
    * State is one flat struct per key, partitioned by the grouping key —
    * bounded by the keyspace, the same contract as the batch window's
    * partitioning. StreamingSpec replays the fixture in chunks and pins
    * final-state equality with `stream_cdc_apply`.
    */
  def cdcSnapshot(events: Dataset[EventRow]): Dataset[CdcRow] = {
    import events.sparkSession.implicits._
    def micros(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[EventRow], state: GroupState[CdcState]) =>
          var st = state.getOption
            .getOrElse(CdcState(Long.MinValue, Long.MinValue, "", 0.0, 0L, 0L))
          it.foreach { e =>
            val em = micros(e.ts)
            if (em > st.em || (em == st.em && e.event_id > st.event_id))
              st = st.copy(em = em, event_id = e.event_id,
                event_type = e.event_type, value = e.value)
            st = st.copy(n_ops = st.n_ops + 1,
              n_deletes = st.n_deletes + (if (e.event_type == "error") 1L else 0L))
          }
          state.update(st)
          Iterator(CdcRow(uid, st.em, st.event_type, st.value,
            st.n_ops, st.n_deletes, st.event_type == "error"))
      }
  }

  /** The same per-user anomaly detector on Spark 4's `transformWithState`
    * (the successor to flatMapGroupsWithState): running stats live in a
    * typed [[ValueState]] obtained from the [[StatefulProcessorHandle]].
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); state is one small
    * struct per user key — bounded, partitioned by the grouping key.
    */
  class AnomalyProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, EventRow, Anomaly] {
    @transient private var stats: ValueState[RunStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[RunStats]("runstats",
        Encoders.product[RunStats], ttl)

    override def handleInputRows(uid: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[Anomaly] = {
      var st = if (stats.exists()) stats.get() else RunStats(0L, 0.0, 0.0)
      val out = scala.collection.mutable.ListBuffer.empty[Anomaly]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (st.n >= 10) {
          val mean = st.sum / st.n
          val sd = math.sqrt(math.max(st.sumSq / st.n - mean * mean, 1e-9))
          val z = (e.value - mean) / sd
          if (math.abs(z) > 3.0) out += Anomaly(uid, e.event_id, e.value, z)
        }
        st = RunStats(st.n + 1, st.sum + e.value, st.sumSq + e.value * e.value)
      }
      stats.update(st)
      out.iterator
    }
  }

  /** `ttl` bounds per-key state lifetime: a key idle past the TTL has its
    * running stats evicted by the store and the detector restarts its
    * warm-up — the abandoned-key hygiene a billion-key stream needs (state
    * for users who stop emitting must not accumulate forever). TTL is
    * processing-time-based, so a non-NONE ttl switches the operator to
    * `TimeMode.ProcessingTime`.
    */
  def anomaliesTws(events: Dataset[EventRow],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor(ttl), mode, OutputMode.Append())
  }
}
