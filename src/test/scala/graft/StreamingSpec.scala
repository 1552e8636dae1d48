package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

import java.sql.Timestamp

/** Top-level so Catalyst can generate its encoder (inner classes can't). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Document-ingest row for the corpus-dedup twin (top-level for encoders). */
case class DocIngest(doc_id: Long, text: String, ingest_ts: Timestamp)

/** §2.10: Structured Streaming == batch equivalence (SURVEY.md §5.2).
  *
  * Each test replays the sf0.001 events through a MemoryStream (complete
  * output mode for windowed aggs — late data is irrelevant since we replay
  * everything then compare final state) and asserts the result equals the
  * same builder applied to the static frame.
  */
class StreamingSpec extends SparkSpec {

  private def eventRows(limit: Int): Seq[Ev] = {
    import spark.implicits._
    graft.ops.T.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Ev].collect().toSeq.sortBy(_.event_id).take(limit)
  }

  private def assertStreamEqualsBatch(
      name: String,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      outputMode: String): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(400)
    val mem = MemoryStream[Ev]
    // replay in two out-of-order chunks to exercise state merging
    val (a, b) = rows.splitAt(rows.length / 2)
    val qy = build(mem.toDF()).writeStream
      .format("memory").queryName(s"out_$name").outputMode(outputMode)
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(b)
    qy.processAllAvailable()
    mem.addData(a)
    qy.processAllAvailable()
    qy.stop()
    val streamed = spark.table(s"out_$name")
    val batch = build(spark.createDataFrame(rows))
    val sCols = streamed.columns.sorted.map(col)
    val diff1 = streamed.select(sCols: _*).exceptAll(batch.select(sCols: _*)).count()
    val diff2 = batch.select(sCols: _*).exceptAll(streamed.select(sCols: _*)).count()
    assert(diff1 == 0 && diff2 == 0,
      s"$name: stream vs batch diverged (missing=$diff2, extra=$diff1)")
  }

  test("tumbling window: stream == batch") {
    assertStreamEqualsBatch("tumbling", Streams.tumbling, "complete")
  }

  test("sliding window: stream == batch") {
    assertStreamEqualsBatch("sliding", Streams.sliding, "complete")
  }

  test("session window: stream == batch") {
    assertStreamEqualsBatch("sessions", Streams.sessions, "complete")
  }

  test("running success-rate: stream == batch") {
    assertStreamEqualsBatch("success", Streams.successRate, "complete")
  }

  test("windowed approx-distinct: stream == batch (HLL order-independence)") {
    assertStreamEqualsBatch("approxd", Streams.approxDistinctWindowed, "complete")
  }

  test("online PSI drift monitor: stream == batch against a frozen baseline") {
    import spark.implicits._
    // the frozen baseline profile a production monitor would load: derive
    // it from the first 200 events batch-side (add-one smoothed shares)
    val base = eventRows(200)
    val (mn, mx) = (base.map(_.value).min, base.map(_.value).max)
    val width = (mx - mn) / 10.0
    val baseline = base.groupBy(_.event_type).map { case (k, evs) =>
      val cnt = Array.fill(10)(0L)
      evs.foreach { e =>
        cnt(math.min(((e.value - mn) / width).toInt, 9)) += 1
      }
      k -> (0 until 10).map(i =>
        (cnt(i) + 1.0) / (evs.size + 10.0)).toSeq
    }
    assertStreamEqualsBatch("psi",
      df => Streams.driftPsi(df, mn, mx, baseline), "complete")
    // an event_type the frozen baseline never saw must FLAG, not null out:
    // missing baseline is itself drift (the new-feature case the monitor
    // exists to catch)
    val novel = base.take(5).map(_.copy(event_type = "brand_new_type"))
    val flagged = Streams.driftPsi(
        spark.createDataFrame(base ++ novel), mn, mx, baseline)
      .filter(col("event_type") === "brand_new_type")
      .select("known_baseline", "drifted")
      .as[(Boolean, Boolean)].collect().toSeq
    assert(flagged == Seq((false, true)),
      s"unknown-baseline feature must force drifted=true: $flagged")
  }

  test("streaming freshness monitor: stream == batch, breach flags exact") {
    import spark.implicits._
    // fixed reference instant = max ts + 72h, so one type's lag depends on
    // its own last event and every lag is deterministic
    val rows = eventRows(400)
    def us(t: Timestamp): Long = // getTime is ms-truncated; keep the micros
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val asOf = rows.map(e => us(e.ts)).max + 72L * 3600000000L
    assertStreamEqualsBatch("freshness",
      df => Streams.freshness(df, asOf, slaHours = 73L), "complete")
    // direct check: per-type lag arithmetic against a driver fold
    val out = Streams.freshness(spark.createDataFrame(rows), asOf, 73L)
      .as[(String, Long, Long, Long, Boolean)].collect()
    out.foreach { case (et, n, last, lag, breach) =>
      val g = rows.filter(_.event_type == et)
      assert(n === g.length.toLong)
      assert(last === g.map(e => us(e.ts)).max)
      assert(lag === asOf - last)
      assert(breach === (lag > 73L * 3600000000L))
    }
  }

  test("quarantine gate on a stream routes rows identically to batch") {
    // the ingest gate running ON the stream: Quality.violations is a
    // stateless one-projection tag, so the same builder serves batch
    // tables and append-mode streams — every event leaves the gate
    // exactly once with its side and audit trail
    import graft.api.Quality
    import graft.api.Quality.Check
    val checks = Seq(
      Check("r05_value_range", "value",
        col("value") < 0 || col("value") > 200),
      Check("r06_props_format", "props",
        !col("props").rlike("^\\{\"k\": -?[0-9]+\\}$")))
    assertStreamEqualsBatch("quar",
      df => Quality.violations(df, checks)
        .select(col("event_id"),
          (size(col("violated_rules")) > 0).as("quarantined"),
          concat_ws(",", col("violated_rules")).as("violated")),
      "append")
  }

  test("streaming corpus dedup: stream == batch over an out-of-order redelivery replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // documents + every 5th doc redelivered 30 min later under a new
    // ingest id — the continuous-ingest shape corpusDedup exists for
    val epoch0 = 1704067200000000L
    val docs = graft.ops.T.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.take(200)
    def ts(id: Long, shiftUs: Long): Timestamp = {
      val us = epoch0 + id * 600000000L + shiftUs
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val rows = docs.map { case (id, tx) => DocIngest(id, tx, ts(id, 0L)) } ++
      docs.filter(_._1 % 5 == 0).map { case (id, tx) =>
        DocIngest(id + 1000L, tx, ts(id, 1800000000L))
      }
    val mem = MemoryStream[DocIngest]
    val qy = Streams.corpusDedup(mem.toDF()).writeStream
      .format("memory").queryName("out_corpus_dedup").outputMode("complete")
      .trigger(Trigger.ProcessingTime(0)).start()
    // out-of-order replay: redeliveries and late originals interleave
    val (a, b) = new scala.util.Random(7).shuffle(rows).splitAt(rows.length / 2)
    mem.addData(b)
    qy.processAllAvailable()
    mem.addData(a)
    qy.processAllAvailable()
    qy.stop()
    val streamed = spark.table("out_corpus_dedup")
    val batch = Streams.corpusDedup(spark.createDataFrame(rows))
    val cols = streamed.columns.sorted.map(col)
    assert(streamed.select(cols: _*).exceptAll(batch.select(cols: _*)).count() == 0)
    assert(batch.select(cols: _*).exceptAll(streamed.select(cols: _*)).count() == 0)
    // survivor rule is the batch llm_exact_dedup rule: min ingest id —
    // every redelivered doc must collapse onto its ORIGINAL id (none of
    // these redeliveries cross midnight: id*10min + 30min < id*10min+10min
    // day boundary only when (id*600+1800) crosses 86400k — ids < 142 stay
    // same-day; cap the assertion to those)
    val survivors = streamed.select("survivor_id").as[Long].collect().toSet
    docs.map(_._1).filter(id => id % 5 == 0 && (id * 600L + 1800L) / 86400L == (id * 600L) / 86400L)
      .foreach { id =>
        assert(survivors.contains(id) && !survivors.contains(id + 1000L),
          s"redelivery of $id must collapse onto the original")
      }
  }

  test("stateful dedup drops redelivered event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(200)
    val mem = MemoryStream[Ev]
    val qy = Streams.dedup(mem.toDF()).writeStream
      .format("memory").queryName("out_dedup").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows ++ rows.take(50)) // redelivery inside the watermark
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("out_dedup")
    assert(got.count() == rows.length)
    assert(got.select("event_id").distinct().count() == rows.length)
  }

  test("late data beyond the watermark is dropped from windowed aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(300).sortBy(_.ts.getTime)
    val mem = MemoryStream[Ev]
    val qy = Streams.tumbling(mem.toDF()).writeStream
      .format("memory").queryName("out_late").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    // first: everything except one early event; advances watermark to max-10min
    val late = rows.head
    mem.addData(rows.tail)
    qy.processAllAvailable()
    // now replay the earliest event — hours behind the watermark → dropped
    mem.addData(Seq(late))
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("out_late")
    val batchAll = Streams.tumbling(spark.createDataFrame(rows))
    val batchNoLate = Streams.tumbling(spark.createDataFrame(rows.tail))
    // append-mode emits only closed windows; the late event's window total
    // must match the no-late batch, not the full batch
    val lateHour = batchNoLate.filter(col("hour_start") ===
      Streams.tumbling(spark.createDataFrame(Seq(late))).select("hour_start").head().getLong(0))
    val gotHour = got.filter(col("hour_start") === lateHour.select("hour_start").head().getLong(0))
    if (gotHour.count() > 0) {
      assert(gotHour.select("n").head().getLong(0) == lateHour.select("n").head().getLong(0),
        "late event must not be counted")
    }
  }

  test("windowed top-k finalizes at watermark close with the batch key's ranks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ts-ordered chunks: append-mode chained aggregation drops data behind
    // the watermark, so the replay must be in-order ACROSS chunks (the
    // within-chunk order is free); the far-future sentinel then pushes the
    // watermark past every real window's end so all leaderboards close
    val rows = eventRows(400).sortBy(e => (e.ts.getTime, e.event_id))
    val (a, b) = rows.splitAt(rows.length / 2)
    val maxTs = rows.map(_.ts.getTime).max
    val sentinel = Ev(-1L, new Timestamp(maxTs + 3 * 86400 * 1000L),
      -1L, "zzz_sentinel", 0.0, "{}")
    val mem = MemoryStream[Ev]
    val qy = Streams.topkWindowed(mem.toDF()).writeStream
      .format("memory").queryName("out_topk").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(a)
    qy.processAllAvailable()
    mem.addData(b)
    qy.processAllAvailable()
    mem.addData(Seq(sentinel))
    qy.processAllAvailable()
    qy.stop()
    val sentinelDay = sentinel.ts.getTime / 1000 / 86400 * 86400
    val streamed = spark.table("out_topk")
      .filter(col("day_start") < sentinelDay)
    // the twin on the static frame AND a direct row_number computation
    // (the batch key's rank shape) must all agree on the closed windows
    val batchTwin = Streams.topkWindowed(spark.createDataFrame(rows))
    val wR = org.apache.spark.sql.expressions.Window.partitionBy("day_start")
      .orderBy(col("sum_value").desc, col("event_type").asc)
    val batchKeyShape = spark.createDataFrame(rows)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("day_start"),
        col("event_type"), col("n"), col("sum_value"))
      .withColumn("rk", row_number().over(wR))
      .filter(col("rk") <= 3)
    for ((name, other) <- Seq("batch twin" -> batchTwin,
        "batch key shape" -> batchKeyShape)) {
      val cols = streamed.columns.sorted.map(col)
      val extra = streamed.select(cols: _*).exceptAll(other.select(cols: _*)).count()
      val missing = other.select(cols: _*).exceptAll(streamed.select(cols: _*)).count()
      assert(extra == 0 && missing == 0,
        s"stream vs $name diverged (missing=$missing, extra=$extra)")
    }
  }

  test("flatMapGroupsWithState anomaly detector matches a direct fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(400).map(e =>
      graft.streaming.EventRow(e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[graft.streaming.EventRow]
    val qy = Streams.anomalies(mem.toDS()).writeStream
      .format("memory").queryName("out_anom").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows)
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("out_anom").select("event_id").as[Long].collect().toSet
    // direct per-user fold with the same semantics
    val expected = rows.groupBy(_.user_id).flatMap { case (_, es) =>
      var n = 0L; var s = 0.0; var s2 = 0.0
      es.sortBy(e => (e.ts.getTime, e.event_id)).flatMap { e =>
        val hit = if (n >= 10) {
          val mean = s / n
          val sd = math.sqrt(math.max(s2 / n - mean * mean, 1e-9))
          math.abs((e.value - mean) / sd) > 3.0
        } else false
        n += 1; s += e.value; s2 += e.value * e.value
        if (hit) Some(e.event_id) else None
      }
    }.toSet
    assert(got == expected)
  }

  test("transformWithState anomaly detector matches flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(400).map(e =>
      graft.streaming.EventRow(e.event_id, e.ts, e.user_id, e.event_type, e.value))
      .sortBy(e => (e.ts.getTime, e.event_id))
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[graft.streaming.EventRow]
      val qy = Streams.anomaliesTws(mem.toDS()).writeStream
        .format("memory").queryName("out_tws").outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      mem.addData(rows)
      qy.processAllAvailable()
      qy.stop()
      val got = spark.table("out_tws").select("event_id").as[Long].collect().toSet
      // reference semantics: the fMGWS detector over the same replay
      val mem2 = MemoryStream[graft.streaming.EventRow]
      val qy2 = Streams.anomalies(mem2.toDS()).writeStream
        .format("memory").queryName("out_tws_ref").outputMode("append")
        .trigger(Trigger.ProcessingTime(0)).start()
      mem2.addData(rows)
      qy2.processAllAvailable()
      qy2.stop()
      val expected = spark.table("out_tws_ref").select("event_id").as[Long].collect().toSet
      assert(got == expected)
      assert(got.nonEmpty || expected.isEmpty)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-stream interval join: stream == batch, late side dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(400).sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[Ev]
    val qy = Streams.clickErrorJoin(mem.toDF()).writeStream
      .format("memory").queryName("out_ssj").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    // inner stream-stream joins emit on match; a single in-order replay
    // compares exactly against batch (an out-of-order replay would
    // legitimately drop watermark-late rows that batch keeps)
    mem.addData(rows)
    qy.processAllAvailable()
    val streamed = spark.table("out_ssj")
    val batch = Streams.clickErrorJoin(spark.createDataFrame(rows))
    val cols = batch.columns.sorted.map(col)
    assert(streamed.select(cols: _*).exceptAll(batch.select(cols: _*)).count() == 0)
    assert(batch.select(cols: _*).exceptAll(streamed.select(cols: _*)).count() == 0)
    assert(batch.count() > 0, "fixture must produce click->error pairs")
    // a click far behind the watermark must be dropped, not matched
    val before = streamed.count()
    val old = rows.head
    mem.addData(Seq(old.copy(event_id = 99999901L, event_type = "click")))
    qy.processAllAvailable()
    qy.stop()
    assert(spark.table("out_ssj").count() == before,
      "watermark-late click must not produce new join output")
  }

  test("stream-stream join state plateaus: watermark actually evicts (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a LONG replay with steadily advancing event time: 30 batches, 10
    // minutes apart, 30 events each (clicks+errors interleaved). The join
    // holds clicks ~30min+watermark and errors ~watermark behind max event
    // time, so state must PLATEAU at a few batches' worth — result
    // equality alone (the test above) cannot distinguish bounded state
    // from a join that never evicts and grows for the stream's lifetime.
    val mem = MemoryStream[Ev]
    val qy = Streams.clickErrorJoin(mem.toDF()).writeStream
      .format("memory").queryName("out_ssj_state").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val stateRows = scala.collection.mutable.ListBuffer.empty[Long]
    var fed = 0L
    (0 until 30).foreach { b =>
      val t0 = base + b * 10L * 60 * 1000
      val evs = (0 until 30).map { i =>
        Ev(b * 1000L + i, new Timestamp(t0 + i * 1000L), i % 5L,
          if (i % 2 == 0) "click" else "error", 1.0, "{}")
      }
      fed += evs.length
      mem.addData(evs)
      qy.processAllAvailable()
      val p = qy.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows += p.stateOperators.map(_.numRowsTotal).sum
    }
    qy.stop()
    assert(stateRows.nonEmpty, "no state-operator progress reported")
    // eviction evidence: the final batch's state is far below everything
    // fed, and no bigger than the early-plateau level — an unbounded join
    // would grow state ~linearly with batch count (3x between batch 10
    // and 30)
    // lastProgress can be null for some batches; fail with the history, not
    // a raw NoSuchElement/IndexOutOfBounds, if too few batches reported
    // state — guarded BEFORE any .last/.apply use
    assert(stateRows.length > 9,
      s"only ${stateRows.length} batches reported state-operator progress " +
        s"(history: ${stateRows.mkString(",")})")
    assert(stateRows.last < fed / 3,
      s"state ${stateRows.last} rows should be a small fraction of $fed fed")
    assert(stateRows.last <= stateRows(9) * 3 / 2,
      s"state must plateau, not grow: batch10=${stateRows(9)} " +
        s"batch30=${stateRows.last} (history: ${stateRows.mkString(",")})")
  }

  test("transformWithState TTL evicts idle per-key state (detector re-warms)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      // 15 constant-value warm-up events then one wild outlier for the same
      // user: with retained state the outlier trips the 3-sigma detector;
      // if the key's state was TTL-evicted between batches, the detector is
      // back in warm-up (n=0 < 10) and must emit nothing
      def warmup = (0 until 15).map(i =>
        graft.streaming.EventRow(i.toLong, new Timestamp(base + i * 1000L), 7L, "m", 10.0))
      def outlier(id: Long) =
        graft.streaming.EventRow(id, new Timestamp(base + 99000L), 7L, "m", 100.0)
      // ONE continuous query per run. processing-time TTL runs no-data
      // maintenance batches between triggers, which starves
      // processAllAvailable (and Trigger.AvailableNow hangs outright with
      // transformWithState+RocksDB), so data delivery is confirmed by
      // polling the cumulative numInputRows instead; a 1s trigger interval
      // keeps the maintenance batches off the hot loop
      def run(name: String, ttl: org.apache.spark.sql.streaming.TTLConfig,
          sleepMs: Long): Long = {
        val mem = MemoryStream[graft.streaming.EventRow]
        val qy = Streams.anomaliesTws(mem.toDS(), ttl).writeStream
          .format("memory").queryName(name).outputMode("append")
          .trigger(Trigger.ProcessingTime(1000)).start()
        def awaitInputRows(n: Long): Unit = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          while (qy.recentProgress.map(_.numInputRows).sum < n &&
            System.nanoTime() < deadline) Thread.sleep(100)
          assert(qy.recentProgress.map(_.numInputRows).sum >= n,
            s"$name: stream did not consume $n rows within 60s")
        }
        mem.addData(warmup)
        awaitInputRows(15) // constant warm-up values → z=0 → emits nothing
        Thread.sleep(sleepMs)
        mem.addData(Seq(outlier(100L)))
        awaitInputRows(16) // proves the outlier batch WAS processed
        qy.stop()
        spark.table(name).count()
      }
      // control: no TTL — state survives the pause, outlier detected
      assert(run("out_ttl_none", org.apache.spark.sql.streaming.TTLConfig.NONE, 3000) == 1L,
        "without TTL the outlier must be flagged from retained state")
      // 1s TTL + 8s idle: state evicted, detector re-warms, nothing emitted.
      // The wide 8x margin keeps a loaded host from flipping the outcome
      // (a late warm-up batch or early outlier batch narrows the idle gap)
      assert(run("out_ttl_1s",
        org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofSeconds(1)), 8000) == 0L,
        "TTL-evicted state must put the detector back into warm-up")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("checkpointed parquet file sink is exactly-once across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(200)
    val (chunk1, chunk2) = rows.splitAt(100)
    val base = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val (out, ckpt) = (s"$base/data", s"$base/ckpt")
    val mem = MemoryStream[Ev]
    def start() = mem.toDF().select("event_id", "event_type", "value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val q1 = start()
    mem.addData(chunk1)
    q1.processAllAvailable()
    q1.stop()
    // restart from the SAME checkpoint: the committed batch must not be
    // rewritten, the new data must land exactly once
    val q2 = start()
    mem.addData(chunk2)
    q2.processAllAvailable()
    q2.stop()
    val sink = spark.read.parquet(out)
    assert(sink.count() == rows.length,
      s"expected ${rows.length} rows exactly once, got ${sink.count()}")
    assert(sink.select("event_id").distinct().count() == rows.length)
  }

  test("AvailableNow file-to-file pipeline: stateful windows survive a checkpoint restart") {
    // the production deployment shape a scheduled 100 TB incremental job
    // actually runs — parquet FILE source, Trigger.AvailableNow, parquet
    // file sink, checkpointed STATEFUL aggregation (Streams.tumbling in
    // append mode) — stopped after the first batch of input files and
    // RESTARTED from the same checkpoint over newly arrived files. The
    // watermark, window state, and file-source offsets all live in the
    // checkpoint: every window must land in the sink exactly once with
    // its full cross-restart total.
    import spark.implicits._
    val rows = eventRows(400)
    val (chunk1, chunk2) = rows.splitAt(200)
    val base = java.nio.file.Files.createTempDirectory("graft_avnow_").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/data", s"$base/ckpt")
    val schema = spark.createDataFrame(rows).schema
    def runOnce(): Unit = {
      val q = Streams.tumbling(
          spark.readStream.schema(schema).parquet(in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000L)
      assert(!q.isActive, "AvailableNow query failed to drain and stop")
    }
    spark.createDataFrame(chunk1).write.mode("append").parquet(in)
    runOnce()
    // new files arrive between scheduled runs: the second half plus a
    // far-future sentinel that drags the watermark past every real window
    // so each one finalizes and emits
    val maxTs = rows.map(_.ts.getTime).max
    val sentinel = Ev(-1L, new Timestamp(maxTs + 3 * 86400 * 1000L),
      -1L, "zzz_sentinel", 0.0, "{}")
    spark.createDataFrame(chunk2 :+ sentinel).write.mode("append").parquet(in)
    runOnce()
    // exactly-once across the restart: the sink equals the batch result
    // over all real events (the sentinel's own window never closes);
    // a rewritten run-1 window or a lost run-2 file both break this
    val sink = spark.read.parquet(out).filter(col("event_type") =!= "zzz_sentinel")
    val batch = Streams.tumbling(spark.createDataFrame(rows))
    val cols = batch.columns.sorted.map(col)
    val extra = sink.select(cols: _*).exceptAll(batch.select(cols: _*)).count()
    val missing = batch.select(cols: _*).exceptAll(sink.select(cols: _*)).count()
    assert(extra == 0 && missing == 0,
      s"restart broke exactly-once: extra=$extra missing=$missing")
    // and every (window, type) appears exactly once — no split emission
    assert(sink.groupBy("hour_start", "event_type").count()
      .filter(col("count") > 1).count() == 0,
      "a window emitted more than once across the restart")
  }

  test("stream-static join enriches with customer segment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = eventRows(200)
    val mem = MemoryStream[Ev]
    val dim = graft.ops.T.customer(spark, sf)
    val qy = Streams.staticJoin(mem.toDF(), dim).writeStream
      .format("memory").queryName("out_sj").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows)
    qy.processAllAvailable()
    qy.stop()
    val got = spark.table("out_sj")
    val batch = Streams.staticJoin(spark.createDataFrame(rows), dim)
    assert(got.count() == batch.count())
    assert(got.select("c_mktsegment").distinct().count() ==
      batch.select("c_mktsegment").distinct().count())
  }

  test("cdcSnapshot stream state converges to the batch cdc snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{CdcRow, EventRow}
    val rows = eventRows(400).map(e =>
      EventRow(e.event_id, e.ts, e.user_id, e.event_type, e.value))
    val mem = MemoryStream[EventRow]
    val qy = Streams.cdcSnapshot(mem.toDS()).writeStream
      .format("memory").queryName("out_cdc").outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    // two chunks: state must carry latest/op-counts across micro-batches
    mem.addData(rows.take(150)); qy.processAllAvailable()
    mem.addData(rows.drop(150)); qy.processAllAvailable()
    qy.stop()
    val fin = spark.table("out_cdc").as[CdcRow].collect()
      .groupBy(_.user_id).map { case (_, snaps) => snaps.maxBy(_.n_ops) }
    // driver-side recompute over the same 400-op log
    def mic(t: java.sql.Timestamp) =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    val byUser = rows.groupBy(_.user_id)
    fin.foreach { snap =>
      val log = byUser(snap.user_id)
      val latest = log.maxBy(e => (mic(e.ts), e.event_id))
      assert(snap.last_em == mic(latest.ts) && snap.last_type == latest.event_type,
        s"user ${snap.user_id}: stream state != latest op")
      assert(snap.n_ops == log.size)
      assert(snap.n_deletes == log.count(_.event_type == "error"))
      assert(snap.deleted == (latest.event_type == "error"))
    }
    assert(fin.size == byUser.size)
  }

  test("stream_cdc_apply: latest-wins snapshot drops tombstoned keys") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val snap = SparkEntry.queries("stream_cdc_apply")(spark, sf)
    assert(snap.filter(col("last_type") === "error").count() == 0,
      "a tombstone op must never survive as a snapshot row")
    // driver-side recompute of the op log's latest state per key
    val log = graft.ops.T.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("em"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val latest = log.groupBy(_._1).map { case (u, ops) =>
      u -> ops.maxBy(e => (e._3, e._2))
    }
    val wantSurvivors = latest.filter(_._2._4 != "error").keySet
    val got = snap.select("user_id").as[Long].collect().toSet
    assert(got == wantSurvivors,
      s"snapshot keys ${got.size} != recomputed survivors ${wantSurvivors.size}")
    // op counts cover the whole log, deletes bounded by ops
    val opCounts = log.groupBy(_._1).view.mapValues(_.length).toMap
    snap.select(col("user_id"), col("n_ops"), col("n_deletes"))
      .as[(Long, Long, Long)].collect().foreach { case (u, n, del) =>
        assert(n == opCounts(u), s"user $u n_ops $n != log ${opCounts(u)}")
        assert(del <= n && del >= 0)
      }
  }

  test("stream_interpolate blends gaps between neighbors and fills the edges") {
    val rows = q("stream_interpolate").collect()
    assert(rows.nonEmpty)
    // the spine is contiguous hourly
    val hs = rows.map(_.getAs[Long]("hour_s"))
    assert(hs.zip(hs.tail).forall { case (a, b) => b - a == 3600L })
    val obsIdx = rows.zipWithIndex.filter(_._1.getAs[Boolean]("observed"))
      .map(_._2)
    assert(obsIdx.nonEmpty && obsIdx.length < rows.length,
      "fixture must exercise both observed and gap hours")
    val v = rows.map(_.getAs[Double]("v_interp"))
    // head back-fill and tail hold
    (0 until obsIdx.head).foreach(i => assert(v(i) === v(obsIdx.head)))
    (obsIdx.last + 1 until rows.length)
      .foreach(i => assert(v(i) === v(obsIdx.last)))
    // every interior gap value lies strictly on the segment between its
    // surrounding observations (monotone between the two endpoints)
    obsIdx.zip(obsIdx.tail).foreach { case (a, b) =>
      (a + 1 until b).foreach { i =>
        val lo = math.min(v(a), v(b)) - 1e-9
        val hi = math.max(v(a), v(b)) + 1e-9
        assert(v(i) >= lo && v(i) <= hi, s"gap $i escapes [$lo,$hi]")
      }
    }
  }

  // ─── Declared-key equivalence (r17, the r16 verdict's ask #3) ───
  // Every `stream_*` key in SparkEntry.queries is pinned against a
  // MemoryStream replay of the SAME input: the streaming computation's
  // final state must equal the DECLARED batch DataFrame's result (the
  // oracle-checked frame, not just the Streams builder re-applied to a
  // static frame — that weaker form is the first test block above).
  // stream_cdc_apply / stream_interpolate / stream_topk_windowed have
  // key-named pins above; these cover the remaining nine.

  private def allEvents: Seq[Ev] = eventRows(Int.MaxValue)

  private def streamSink(name: String, rows: Seq[Ev],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      outputMode: String, inOrder: Boolean = false): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered =
      if (inOrder) rows.sortBy(e => (e.ts.getTime, e.event_id)) else rows
    val mem = MemoryStream[Ev]
    val qy = build(mem.toDF()).writeStream.format("memory")
      .queryName(s"key_$name").outputMode(outputMode)
      .trigger(Trigger.ProcessingTime(0)).start()
    val (a, b) = ordered.splitAt(ordered.length / 2)
    // out-of-order chunks exercise state merging; append-mode keys with
    // watermark eviction replay IN ORDER (a late chunk would be dropped by
    // the watermark — legitimately — while the batch key keeps it)
    if (inOrder) { mem.addData(a); qy.processAllAvailable(); mem.addData(b) }
    else { mem.addData(b); qy.processAllAvailable(); mem.addData(a) }
    qy.processAllAvailable()
    qy.stop()
    spark.table(s"key_$name")
  }

  private def assertSameRows(got: org.apache.spark.sql.DataFrame,
      want: org.apache.spark.sql.DataFrame, label: String): Unit = {
    val cols = want.columns.sorted.map(col)
    val extra = got.select(cols: _*).exceptAll(want.select(cols: _*)).count()
    val missing = want.select(cols: _*).exceptAll(got.select(cols: _*)).count()
    assert(extra == 0 && missing == 0,
      s"$label: stream vs declared key diverged (extra=$extra, missing=$missing)")
  }

  private def assertMatchesKey(got: org.apache.spark.sql.DataFrame,
      key: String): Unit = assertSameRows(got, q(key), key)

  test("stream_tumbling: MemoryStream replay == declared key") {
    assertMatchesKey(
      streamSink("stream_tumbling", allEvents, Streams.tumbling, "complete"),
      "stream_tumbling")
  }

  test("stream_sliding: MemoryStream replay == declared key") {
    assertMatchesKey(
      streamSink("stream_sliding", allEvents, Streams.sliding, "complete"),
      "stream_sliding")
  }

  test("stream_session: session_window replay == declared key's lag+prefix-sum sessions") {
    // the declared key builds sessions via lag-gap → prefix-sum ids; the
    // stream builds them via session_window state. Equivalence: identical
    // per-user session partitions — sess_id regenerates from the streamed
    // session-start order (the key numbers sessions 0.. per user in time
    // order), session starts compare at second grain (unix_timestamp on
    // the stream side truncates µs; floor(us/1e6) on the key side).
    val snk = streamSink("stream_session", allEvents, Streams.sessions, "complete")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_start")
    val got = snk.select(col("user_id"), col("sess_start"),
        col("n_events"), col("sum_value"))
      .withColumn("sess_id", row_number().over(wOrd).cast("long") - 1L)
    val want = q("stream_session").select(col("user_id"),
      floor(col("sess_start_us") / 1000000L).as("sess_start"),
      col("n_events"), col("sum_value"), col("sess_id"))
    assertSameRows(got, want, "stream_session")
  }

  test("stream_dedup: doubled-input replay == declared key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = allEvents
    val mem = MemoryStream[Ev]
    val qy = Streams.dedup(mem.toDF()).writeStream.format("memory")
      .queryName("key_stream_dedup").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows ++ rows) // the key's own redelivery shape: input doubled
    qy.processAllAvailable()
    qy.stop()
    // collected-row compare: exceptAll over this aggregate pair trips a
    // Catalyst internal error (BindReferences can't resolve through the
    // replicate-rewrite of two same-shaped aggregates); both frames are
    // ≤ a handful of rows, so a driver-side ordered compare is exact
    val got = spark.table("key_stream_dedup")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val want = q("stream_dedup").collect().map(_.toSeq).toSeq
    assert(got == want, s"stream_dedup: stream $got != declared key $want")
  }

  test("stream_late_data: frozen-reference streaming audit == declared key") {
    val rows = allEvents
    def us(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val maxEm = rows.map(e => us(e.ts)).max
    // the same frozen-reference pattern as freshness/driftPsi: the 24h
    // horizon anchors at the stream's known max event time (batch-derived
    // constant), so the complete-mode aggregation is deterministic and
    // must equal the declared batch proxy exactly
    val got = streamSink("stream_late_data", rows,
      df => df.select(col("event_type"), unix_micros(col("ts")).as("em"))
        .groupBy("event_type").agg(count(lit(1)).as("n"),
          count(when(col("em") < lit(maxEm - 86400000000L), 1)).as("n_older_24h")),
      "complete")
    assertMatchesKey(got, "stream_late_data")
  }

  test("stream_static_join: enriched stream re-aggregated == declared key") {
    // the STREAMING stage is the broadcast enrichment (stateless, append
    // mode); countDistinct is not an incremental streaming aggregate, so
    // the declared key's per-segment rollup runs batch-side over the
    // enriched sink — every enriched row left the stream exactly once
    val dim = graft.ops.T.customer(spark, sf)
    val snk = streamSink("stream_static_join", allEvents,
      df => Streams.staticJoin(df, dim), "append")
    val got = snk.groupBy("c_mktsegment").agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      graft.ops.H.dsum(col("value")).as("sum_value"))
    assertMatchesKey(got, "stream_static_join")
  }

  test("stream_stream_join: joined pair stream re-aggregated == declared key") {
    // in-order replay: the inner interval join emits each (click, error)
    // pair exactly once; the key's distinct-count rollup runs batch-side
    // over the pair sink (countDistinct is not streamable)
    val snk = streamSink("stream_stream_join", allEvents,
      Streams.clickErrorJoin, "append", inOrder = true)
    val got = snk.groupBy("user_id").agg(count(lit(1)).as("n_pairs"),
      countDistinct(col("click_id")).as("n_clicks_with_error"),
      countDistinct(col("error_id")).as("n_errors_after_click"))
    assertMatchesKey(got, "stream_stream_join")
  }

  test("stream_resample_fill: streamed hourly state == declared key's observed buckets; gaps zero-fill") {
    // the STREAMING stage is the hourly aggregation (bounded state per
    // open hour); the spine fill is a presentation join over the final
    // aggregates (its min/max bounds exist only once the stream is
    // drained). Equivalence: streamed state == every n>0 key row, and the
    // key's remaining rows are exactly the zero-filled gaps of a
    // contiguous hourly spine.
    val got = streamSink("stream_resample_fill", allEvents,
      df => df.groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_s"))
        .agg(count(lit(1)).as("n"), graft.ops.H.dsum(col("value")).as("sum_value")),
      "complete")
    val key = q("stream_resample_fill")
    assertSameRows(got, key.filter(col("n") > 0L), "stream_resample_fill")
    val rows = key.collect()
    val hs = rows.map(_.getAs[Long]("hour_s"))
    assert(hs.zip(hs.tail).forall { case (x, y) => y - x == 3600L },
      "spine must be contiguous hourly")
    rows.filter(_.getAs[Long]("n") == 0L).foreach { r =>
      assert(r.getAs[Double]("sum_value") == 0.0, "gap bucket must zero-fill")
    }
  }

  test("stream_corpus_dedup: full-corpus redelivery replay == declared key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reconstruct the key's exact input — full documents plus every 7th
    // doc redelivered 30 min later under a shifted ingest id — and replay
    // it shuffled
    val epoch0 = 1704067200000000L
    val docs = graft.ops.T.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    def ts(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val rows = docs.map { case (id, tx) =>
        DocIngest(id, tx, ts(epoch0 + id * 600000000L)) } ++
      docs.filter(_._1 % 7 == 0).map { case (id, tx) =>
        DocIngest(id + 1000L, tx, ts(epoch0 + id * 600000000L + 1800000000L)) }
    val mem = MemoryStream[DocIngest]
    val qy = Streams.corpusDedup(mem.toDF()).writeStream.format("memory")
      .queryName("key_stream_corpus_dedup").outputMode("complete")
      .trigger(Trigger.ProcessingTime(0)).start()
    val (a, b) = new scala.util.Random(17).shuffle(rows).splitAt(rows.length / 2)
    mem.addData(b); qy.processAllAvailable()
    mem.addData(a); qy.processAllAvailable()
    qy.stop()
    assertMatchesKey(spark.table("key_stream_corpus_dedup"), "stream_corpus_dedup")
  }

  test("stream_topk_windowed ranks are contiguous and ordered per window") {
    val rows = q("stream_topk_windowed").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("day_start")).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq === (1 to g.length))
      assert(g.length <= 3)
      val sv = byRank.map(_.getAs[Double]("sum_value"))
      assert(sv.zip(sv.tail).forall { case (a, b) => a >= b },
        "sum_value must be non-increasing in rank")
    }
  }
}
