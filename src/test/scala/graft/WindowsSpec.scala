package graft

import org.apache.spark.sql.functions._

/** §2.5–2.6: window semantics on tiny literal frames + fixture invariants. */
class WindowsSpec extends SparkSpec {

  test("win_rank_topk keeps at most 3 rows per customer, rn ascending") {
    val df = q("win_rank_topk")
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
    assert(df.filter(col("rn") > 3).count() == 0)
  }

  test("running sum over a literal frame matches hand-computed prefix sums") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 5.0), (1L, 3L, 2.5), (2L, 4L, 1.0))
      .toDF("user_id", "event_id", "value")
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df.withColumn("run", sum(col("value")).over(w))
      .orderBy("event_id").select("run").as[Double].collect()
    assert(got.toSeq == Seq(10.0, 15.0, 17.5, 1.0))
  }

  test("ntile(4) buckets are 1..4 and balanced within 1") {
    val counts = q("win_ntile").groupBy("quartile").count()
      .orderBy("quartile").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(counts.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(counts.map(_._2).max - counts.map(_._2).min <= 1)
  }

  test("lag gaps are positive except per-user first events (-1)") {
    val df = q("win_lag_lead")
    assert(df.filter(col("gap_us") < -1L).count() == 0)
    val firsts = df.filter(col("gap_us") === -1L).count()
    val users = df.select("user_id").distinct().count()
    assert(firsts == users)
  }

  test("range frame hour_sum >= own value (window includes current row)") {
    val bad = q("win_range_frame")
      .filter(col("hour_sum") < col("value") - lit(1e-9)).count()
    assert(bad == 0)
  }

  test("win_ntile_scalable agrees with exact ntile away from cutoff ties") {
    import spark.implicits._
    val exact = q("win_ntile").select(col("c_custkey"),
      col("quartile").as("q_exact"))
    val scal = q("win_ntile_scalable").select(col("c_custkey"),
      col("c_acctbal"), col("quartile").as("q_scal"))
    val j = scal.join(exact, "c_custkey").persist()
    val n = j.count()
    // only rows at/tied-with a quartile cutoff may bucket differently
    // (ntile splits ties by the custkey tiebreak; the cutoff form keeps
    // them together) — a boundary effect, not a population shift
    val diff = j.filter(col("q_scal") =!= col("q_exact")).count()
    assert(diff <= n / 50 + 1, s"$diff of $n rows diverge from exact ntile")
    // buckets are monotone in value: max of quartile k <= min of k+1
    val bounds = j.groupBy("q_scal")
      .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      .orderBy("q_scal")
      .as[(Int, Double, Double)].collect()
    assert(bounds.map(_._1).toSeq == Seq(1, 2, 3, 4))
    bounds.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"quartile ${a._1} max ${a._3} > ${b._1} min ${b._2}")
    }
    j.unpersist()
  }

  test("win_ntile reproduces Spark's own ntile(4) bit-for-bit (r16 rank-regeneration form)") {
    import org.apache.spark.sql.expressions.Window
    // the r16 form computes ntile WITHOUT the global window — this pin
    // holds it to the real ntile's positional semantics (the oracle does
    // the same cross-engine; this catches a drift without DuckDB)
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val want = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), ntile(4).over(w).as("nt"))
    val got = q("win_ntile").select(col("c_custkey"), col("quartile"))
    assert(got.count() == want.count(), "row count must match ntile's")
    val diff = got.join(want, "c_custkey")
      .filter(col("quartile") =!= col("nt")).count()
    assert(diff == 0, s"$diff rows diverge from the real ntile(4)")
    graft.api.Caches.sweep(spark)
  }

  test("calendarBounded refuses a fact-grain frame and passes a calendar one untouched (r16)") {
    // the day-window family's safety argument is "input is calendar-grain";
    // this pins the EXECUTABLE form of that contract: a leaked fact-grain
    // frame (300k 'days') throws with the span, a real calendar frame
    // passes through values-identical
    val fake = spark.range(0L, 300000L)
      .select(col("id").as("day"), lit(1L).as("x"))
    val ex = intercept[Throwable] {
      graft.ops.Windows.calendarBounded(fake,
        max(col("day")) - min(col("day")) + 1, "spec").count()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("not calendar-grain"),
      s"expected the span-refusal message, got: ${messages(ex)}")
    val ok = graft.ops.Windows.calendarBounded(
      spark.range(0L, 100L).select(col("id").as("day"), lit(2L).as("x")),
      max(col("day")) - min(col("day")) + 1, "spec")
    assert(ok.count() == 100)
    assert(ok.columns.toSeq == Seq("day", "x"), "guard must not add columns")
    graft.api.Caches.sweep(spark)
  }

  test("limit_topk returns exactly 10 descending prices") {
    import spark.implicits._
    val prices = q("limit_topk").select("o_totalprice").as[Double].collect()
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("win_interval_sweep equals a driver-side brute-force day scan") {
    import spark.implicits._
    // independent recompute: materialize every interval as its (lo, hi)
    // day pair and count per-day opens/closes with plain Scala maps —
    // the O(n·len) algorithm the sweep replaces
    val iv = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(to_date(col("o_orderdate")).cast("string"),
        to_date(col("l_shipdate")).cast("string"))
      .as[(String, String)].collect()
      .map { case (a, b) => if (a <= b) (a, b) else (b, a) }
    val opens = iv.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val closes = iv.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val days = (opens.keySet ++ closes.keySet).toSeq.sorted
    var acc = 0L
    val expect = days.map { d =>
      val net = opens.getOrElse(d, 0L) - closes.getOrElse(d, 0L)
      acc += net
      (d, net, acc)
    }
    val got = q("win_interval_sweep")
      .select(col("dt").cast("string"), col("net"), col("open_cnt"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === expect)
    // conservation: every interval closes, so the sweep ends at zero and
    // never goes negative (closes count on their own end day)
    assert(got.last._3 === 0L)
    assert(got.forall(_._3 >= 0L))
  }

  test("win_zscore_anomaly matches a driver-side rolling recompute") {
    import spark.implicits._
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val rows = graft.ops.T.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("em"),
        col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val expect = rows.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(r => (r._3, r._2))
      s.indices.flatMap { i =>
        val w = s.slice(math.max(0, i - 19), i + 1).map(_._4)
        val n = w.length
        if (n < 8) None
        else {
          val m = w.sum / n
          val sd = math.sqrt(w.map(x => (x - m) * (x - m)).sum / (n - 1))
          if (sd < 0.0001) None
          else {
            val z0 = BigDecimal((s(i)._4 - m) / sd)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            val z = if (z0 == 0.0) 0.0 else z0
            if (math.abs(z) >= 2.5) Some((s(i)._2, z)) else None
          }
        }
      }
    }.toMap
    val got = q("win_zscore_anomaly")
      .select(col("event_id"), col("z")).as[(Long, Double)].collect().toMap
    assert(got.keySet === expect.keySet)
    // same frame order on both sides → tiny association drift at most
    got.foreach { case (id, z) => assert(math.abs(z - expect(id)) < 1e-6) }
    assert(got.nonEmpty)
    assert(ev.count() > got.size) // anomalies are a strict subset
  }

  test("join_point_in_interval equals the naive interval-point theta join") {
    import spark.implicits._
    // brute force the DECLARED semantics (lo <= d < hi against every
    // interval) driver-side and compare the per-priority rollup exactly
    val iv = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(to_date(col("o_orderdate")).cast("string"),
        to_date(col("l_shipdate")).cast("string"))
      .as[(String, String)].collect()
      .map { case (a, b) => if (a <= b) (a, b) else (b, a) }
    val pts = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"),
        to_date(col("o_orderdate")).cast("string"))
      .as[(String, String)].collect()
    val perOrder = pts.map { case (pri, d) =>
      (pri, iv.count { case (lo, hi) => lo <= d && d < hi }.toLong)
    }
    val expect = perOrder.groupBy(_._1).view.mapValues { g =>
      val opens = g.map(_._2)
      (g.length.toLong, opens.sum, opens.sum.toDouble / g.length, opens.max)
    }.toMap
    val got = q("join_point_in_interval").collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("total_open"),
          r.getAs[Double]("avg_open"), r.getAs[Long]("max_open"))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("join_interval_overlap equals the naive interval-interval theta join") {
    import spark.implicits._
    // brute force the DECLARED semantics (b.lo <= a.hi AND b.hi >= a.lo
    // against every urgent window) driver-side, per-priority rollup exact
    val iv = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(min(datediff(to_date(col("l_shipdate")),
        lit("1970-01-01").cast("date"))).as("lo"))
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey").as("ok"), col("o_orderpriority")), "ok")
      .select(col("o_orderpriority"), col("lo"))
      .as[(String, Int)].collect()
      .map { case (pri, lo) => (pri, lo, lo + 6) }
    val urgent = iv.filter(_._1 == "1-URGENT")
    val perOrder = iv.map { case (pri, lo, hi) =>
      (pri, urgent.count { case (_, bl, bh) => bl <= hi && bh >= lo }.toLong)
    }
    val expect = perOrder.groupBy(_._1).view.mapValues { g =>
      val ov = g.map(_._2)
      (g.length.toLong, ov.sum, ov.sum.toDouble / g.length, ov.max, ov.min)
    }.toMap
    val got = q("join_interval_overlap").collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("total_overlap"),
          r.getAs[Double]("avg_overlap"), r.getAs[Long]("max_overlap"),
          r.getAs[Long]("min_overlap"))).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("win_rolling_median matches a driver-side trailing-20 recompute") {
    import spark.implicits._
    val rows = q("win_rolling_median")
      .select(col("user_id"), col("em"), col("event_id"), col("value"),
        col("med"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .groupBy(_._1)
    rows.foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 19), i + 1).map(_._4).sorted
        val n = frame.length
        // canonical continuous quantile: h = (n-1)*0.5
        val h = (n - 1) * 0.5
        val lo = frame(h.toInt)
        val hi = frame(math.ceil(h).toInt)
        val med = lo + (hi - lo) * (h - h.toInt)
        assert(math.abs(ordered(i)._5 - med) < 1e-4 + 1e-9,
          s"median drift at row $i: got ${ordered(i)._5}, want $med")
      }
    }
  }

  test("win_ewma matches a driver-side trailing-20 exponential recompute") {
    import spark.implicits._
    val rows = q("win_ewma")
      .select(col("user_id"), col("em"), col("event_id"), col("value"),
        col("ewma"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .groupBy(_._1)
    rows.foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      ordered.indices.foreach { i =>
        var num = 0.0; var den = 0.0
        (0 until 20).foreach { k =>
          val w = 1.0 / (1L << k)
          if (i - k >= 0) { num += ordered(i - k)._4 * w; den += w }
        }
        // same op order as the operator -> should agree to the last bit,
        // but assert at 1e-12 relative so the test doesn't depend on it
        val want = num / den
        assert(math.abs(ordered(i)._5 - want) <= math.abs(want) * 1e-12,
          s"ewma drift at row $i: got ${ordered(i)._5}, want $want")
      }
    }
  }

  test("agg_cohort_retention: day-0 fully retained, cells bounded, cohorts partition users") {
    import spark.implicits._
    val cells = q("agg_cohort_retention")
      .select(col("cohort_dn"), col("day_offset"), col("n_active"),
        col("n_cohort"), col("retention"))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(cells.nonEmpty)
    cells.foreach { case (cdn, off, act, coh, r) =>
      assert(off >= 0, s"negative offset $off for cohort $cdn")
      assert(act <= coh, s"active $act exceeds cohort $coh")
      assert(math.abs(r - act.toDouble / coh) == 0.0)
      if (off == 0) assert(act == coh, s"day-0 cell must be fully retained")
    }
    // cohort sizes partition the user population exactly
    val users = ops.T.events(spark, sf).select("user_id").distinct().count()
    val cohortTotal = cells.filter(_._2 == 0).map(_._4).sum
    assert(cohortTotal == users,
      s"cohort sizes $cohortTotal must sum to the $users distinct users")
  }

  test("win_skyline equals a brute-force dominance scan") {
    import spark.implicits._
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("pc"),
        col("p_size")).as[(Long, Long, Int)].collect()
    val want = parts.filter { case (k, pc, sz) =>
      !parts.exists { case (k2, pc2, sz2) =>
        k2 != k && pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.map(_._1).toSet
    val got = q("win_skyline").collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("agg_seasonal_profile cells partition the event stream") {
    val rows = q("agg_seasonal_profile").collect()
    assert(rows.nonEmpty && rows.length <= 168)
    rows.foreach { r =>
      val (dow, hod) = (r.getAs[Int]("dow"), r.getAs[Int]("hod"))
      assert(dow >= 1 && dow <= 7 && hod >= 0 && hod <= 23)
    }
    val total = graft.ops.T.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
  }

  test("win_attribution equals a brute-force last-touch recount") {
    import spark.implicits._
    val ev = graft.ops.T.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.ops.H.em(col("ts")).as("em"))
      .as[(Long, Long, String, Long)].collect()
    val want = ev.filter(_._3 == "purchase").map { case (u, eid, _, t) =>
      ev.filter(e => e._1 == u && (e._3 == "view" || e._3 == "click") &&
          (e._4 < t || (e._4 == t && e._2 < eid)))
        .sortBy(e => (e._4, e._2)).lastOption.map(_._3).getOrElse("none")
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = q("win_attribution").collect()
    val got = rows.map(r => r.getAs[String]("attributed_type") ->
      r.getAs[Long]("n_purchases")).toMap
    assert(got === want)
    val total = want.values.sum.toDouble
    rows.foreach { r =>
      assert(r.getAs[Double]("share") ===
        r.getAs[Long]("n_purchases") / total)
    }
  }

  test("join_asof_nearest equals a brute-force per-error nearest-click scan") {
    import spark.implicits._
    val ev = graft.ops.T.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        graft.ops.H.em(col("ts")).as("em"))
      .as[(Long, Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val rows = q("join_asof_nearest").collect()
    val errors = ev.filter(_._3 == "error")
    assert(rows.length === errors.length)
    val got = rows.map(r => r.getAs[Long]("event_id") ->
      (Option(r.getAs[java.lang.Long]("delta_us")).map(_.toLong),
        r.getAs[String]("direction"))).toMap
    errors.foreach { case (u, eid, _, t) =>
      // clicks strictly before/after this row in the (em, event_id) order
      val clicks = byUser(u).filter(_._3 == "click")
      val prev = clicks.filter(c => c._4 < t || (c._4 == t && c._2 < eid))
        .map(_._4).maxOption
      val next = clicks.filter(c => c._4 > t || (c._4 == t && c._2 > eid))
        .map(_._4).minOption
      val (wantD, wantDir) = (prev, next) match {
        case (None, None) => (None, "none")
        case (Some(p), None) => (Some(t - p), "prev")
        case (None, Some(nx)) => (Some(nx - t), "next")
        case (Some(p), Some(nx)) =>
          if (t - p <= nx - t) (Some(t - p), "prev") else (Some(nx - t), "next")
      }
      assert(got(eid) === ((wantD, wantDir)), s"error $eid")
    }
  }

  test("agg_survival_km matches a sequential Kaplan-Meier recount") {
    import spark.implicits._
    val rows = q("agg_survival_km").collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getAs[Double]("s_km"))
    assert(s.zip(s.tail).forall { case (x, y) => y <= x + 1e-9 },
      "survival must be non-increasing")
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    // sequential single-threaded recount of the estimator
    val data = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(to_date(col("l_shipdate")),
          to_date(col("o_orderdate"))).as("days"),
        (col("l_returnflag") =!= "R").as("ev"))
      .filter(col("days") >= 0)
      .as[(Int, Boolean)].collect()
    val byT = data.groupBy(_._1 / 7).toSeq.sortBy(_._1)
    var atRisk = data.length.toLong
    var surv = 1.0
    val exp = byT.map { case (t, g) =>
      val dd = g.count(_._2).toLong
      val n = atRisk
      surv *= (n - dd).toDouble / n
      atRisk -= g.length
      (t.toLong, n, dd, g.length - dd, surv)
    }
    assert(rows.length === exp.length)
    exp.zip(rows).foreach { case ((t, n, dd, cc, sv), r) =>
      assert(r.getAs[Long]("t_wk") === t)
      assert(r.getAs[Long]("n_risk") === n)
      assert(r.getAs[Long]("d_ev") === dd)
      assert(r.getAs[Long]("c_cens") === cc.toLong)
      // q6 on each ln term + round(4) on the exp bound the drift
      assert(math.abs(r.getAs[Double]("s_km") - sv) < 5e-4,
        s"t=$t: ${r.getAs[Double]("s_km")} vs $sv")
    }
  }

  test("agg_drift_cusum equals the sequential max(0,.)-reset fold") {
    // the prefix-minus-running-min identity vs the literal recursion,
    // checked on the real fixture output: replay each type's dev series
    // through S_t = max(0, S_{t-1} + dev_t) and compare
    val rows = q("agg_drift_cusum").orderBy("event_type", "dn").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      var sUp = 0.0
      rs.foreach { r =>
        // reconstruct dev from the reported cusum via the identity's own
        // inverse is circular — instead recompute dev from dev_sd - k
        // (dev_sd is round(4)-published; the q6 grain means the
        // sequential fold can drift by at most n * 1e-4 here)
        val dev = r.getAs[Double]("dev_sd") - 0.5
        sUp = math.max(0.0, sUp + dev)
        assert(math.abs(sUp - r.getAs[Double]("cusum_up")) < 0.01,
          s"$et dn=${r.get(1)}: sequential $sUp vs ${r.getAs[Double]("cusum_up")}")
      }
      // the flag matches its published threshold
      rs.foreach { r =>
        assert(r.getAs[Boolean]("changepoint") ===
          (r.getAs[Double]("cusum_up") > 5.0 ||
            r.getAs[Double]("cusum_down") > 5.0))
      }
    }
    // the detector is live on the fixture: the planted second-half shift
    // must trip at least one changepoint somewhere
    assert(rows.exists(_.getAs[Boolean]("changepoint")),
      "no changepoint fired on the drifted fixture")
  }

  test("win_gaps_islands tiles the active-day set with maximal runs") {
    import spark.implicits._
    val isl = q("win_gaps_islands").cache()
    // every island length is consistent with its endpoints
    assert(isl.filter(col("n_days") =!=
      col("end_day") - col("start_day") + 1).count() == 0)
    // islands tile the distinct (user, day) set exactly
    val total = isl.agg(sum("n_days")).as[Long].first()
    val expect = graft.ops.T.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"))
      .distinct().count()
    assert(total == expect, s"islands cover $total of $expect active days")
    // maximality: consecutive islands of a user are separated by a gap >= 2
    val overl = isl.as("a").join(isl.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("b.start_day") > col("a.start_day") &&
        col("b.start_day") <= col("a.end_day") + 1).count()
    assert(overl == 0, s"$overl island pairs touch or overlap")
    isl.unpersist()
  }

  test("agg_autocorr coefficients are bounded and pair counts are n - lag") {
    val df = q("agg_autocorr").cache()
    assert(df.count() == 35, "5 types x 7 lags")
    // full-denominator sample ACF is Cauchy-Schwarz bounded
    assert(df.filter(abs(col("acf")) > 1.0).count() == 0)
    // every type's series has 30 days -> lag l leaves exactly 30 - l pairs
    assert(df.filter(col("n_pairs") =!= lit(30) - col("lag")).count() == 0)
    df.unpersist()
  }

  test("win_rolling_corr equals a driver-side windowed Pearson fold") {
    import spark.implicits._
    val rows = q("win_rolling_corr")
      .select(col("day").cast("string"), col("x"), col("y"),
        col("n_win"), col("corr_7d"))
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(rows.length == 30, "30 fixture days")
    // warm-up rows: window not full -> NULL, n_win = row index + 1
    rows.take(6).zipWithIndex.foreach { case ((_, _, _, nw, c), i) =>
      assert(nw === i + 1L && c.isEmpty)
    }
    val xs = rows.map(_._2.toDouble)
    val ys = rows.map(_._3.toDouble)
    rows.zipWithIndex.drop(6).foreach { case ((_, _, _, nw, c), i) =>
      assert(nw === 7L)
      val (wx, wy) = (xs.slice(i - 6, i + 1), ys.slice(i - 6, i + 1))
      val (sx, sy) = (wx.sum, wy.sum)
      val vx = 7.0 * wx.map(v => v * v).sum - sx * sx
      val vy = 7.0 * wy.map(v => v * v).sum - sy * sy
      if (vx > 0 && vy > 0) {
        val want = (7.0 * wx.zip(wy).map(p => p._1 * p._2).sum - sx * sy) /
          math.sqrt(vx * vy)
        assert(c.isDefined && math.abs(c.get - want) < 1e-9,
          s"day $i: ${c} vs $want")
        assert(math.abs(c.get) <= 1.0 + 1e-12)
      } else assert(c.isEmpty, s"zero-variance window must emit NULL at $i")
    }
  }

  test("win_ohlc bars bound open/close by high/low and conserve totals") {
    import spark.implicits._
    val df = q("win_ohlc").cache()
    assert(df.filter(col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low")).count() == 0)
    val ev = graft.ops.T.events(spark, sf)
    assert(df.count() == ev.select(col("event_type"),
      to_date(date_trunc("day", col("ts")))).distinct().count())
    assert(df.agg(sum("n_events")).as[Long].first() == ev.count())
    df.unpersist()
  }

  test("win_cumulative_distinct counts each returning user exactly once") {
    // fixture invariants on the real events table: the cumulative curve is
    // non-decreasing, its increments are exactly n_new, the final value
    // equals the type's total distinct users, and n_new can never exceed
    // the day's actives
    val df = q("win_cumulative_distinct").cache()
    val rows = df.orderBy("event_type", "dn").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      var cum = 0L
      rs.foreach { r =>
        val (nNew, nAct, c) = (r.getAs[Long]("n_new"),
          r.getAs[Long]("n_active"), r.getAs[Long]("cum_distinct"))
        assert(nNew <= nAct, s"$et dn=${r.get(1)}: n_new $nNew > n_active $nAct")
        cum += nNew
        assert(c === cum, s"$et dn=${r.get(1)}: cum $c != running $cum")
      }
      val exact = graft.ops.T.events(spark, sf)
        .filter(col("event_type") === et)
        .select("user_id").distinct().count()
      assert(cum === exact,
        s"$et: final cumulative $cum != exact distinct users $exact")
    }
    df.unpersist()
  }

  test("win_mann_kendall equals a brute-force pair scan per type") {
    import spark.implicits._
    val daily = graft.ops.T.events(spark, sf)
      .select($"event_type",
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val rows = q("win_mann_kendall").collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet === daily.keySet)
    rows.foreach { r =>
      val cs = daily(r.getAs[String]("event_type"))
      val n = cs.length
      var sStat = 0L
      for (i <- cs.indices; j <- (i + 1) until n)
        sStat += java.lang.Long.signum(cs(j) - cs(i))
      assert(r.getAs[Long]("n_days") === n.toLong)
      assert(r.getAs[Long]("s_stat") === sStat)
      val tieSum = cs.groupBy(identity).values
        .map(t => t.size.toLong * (t.size - 1) * (2L * t.size + 5)).sum
      val varS = (n.toDouble * (n - 1) * (2.0 * n + 5) - tieSum) / 18.0
      assert(math.abs(r.getAs[Double]("var_s") - varS) < 1e-6)
      val z = if (sStat > 0) (sStat - 1.0) / math.sqrt(varS)
        else if (sStat < 0) (sStat + 1.0) / math.sqrt(varS) else 0.0
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
      val trend = if (z > 1.96) "increasing"
        else if (z < -1.96) "decreasing" else "none"
      assert(r.getAs[String]("trend") === trend)
    }
  }

  test("win_stl_decompose components close additively; trend nulls only at edges") {
    val rows = q("win_stl_decompose").collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, g) =>
      val byDay = g.sortBy(_.getAs[Long]("day"))
      byDay.zipWithIndex.foreach { case (r, i) =>
        val trend = Option(r.getAs[java.lang.Double]("trend")).map(_.toDouble)
        // the centered 7-row frame is full exactly away from the 3 edge rows
        val interior = i >= 3 && i < byDay.length - 3
        assert(trend.isDefined === interior,
          s"day idx $i of ${byDay.length}: trend=${trend}")
        trend.foreach { t =>
          val c = r.getAs[Long]("c").toDouble
          val seas = r.getAs[Double]("seasonal")
          val rem = r.getAs[Double]("remainder")
          assert(math.abs(c - (t + seas + rem)) < 1e-9)
          // trend is the exact 7-day mean of the neighborhood
          val win = byDay.slice(i - 3, i + 4).map(_.getAs[Long]("c")).sum
          assert(t === win / 7.0)
        }
      }
    }
  }

  test("win_gap_fill_locf carries the last observation, leading nulls stay") {
    val rows = q("win_gap_fill_locf").collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { case (_, g) =>
      val byDay = g.sortBy(_.getAs[Long]("day"))
      var lastSeen: Option[Double] = None
      byDay.foreach { r =>
        val raw = Option(r.getAs[java.lang.Double]("raw_value")).map(_.toDouble)
        val filled =
          Option(r.getAs[java.lang.Double]("filled_value")).map(_.toDouble)
        assert(raw.isEmpty === (r.getAs[Long]("day") % 5 == 0))
        raw.foreach(v => lastSeen = Some(v))
        assert(filled === lastSeen) // LOCF: exactly the running last value
        assert(r.getAs[Boolean]("was_filled") ===
          (raw.isEmpty && filled.isDefined))
      }
      // the plant guarantees at least one filled row per type
      assert(byDay.exists(_.getAs[Boolean]("was_filled")))
    }
  }

  test("win_pareto_abc classes partition parts and close at the full revenue") {
    val rows = q("win_pareto_abc").collect()
      .map(r => r.getAs[String]("abc") -> r).toMap
    assert(rows.keySet.subsetOf(Set("A", "B", "C")) && rows.contains("A"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val nParts = li.select("l_partkey").distinct().count()
    assert(rows.values.map(_.getAs[Long]("n_parts")).sum === nParts)
    // class revenues close at the exact total (cents-exact recount)
    val totCents = li.select(
      sum((col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")))
      .collect()(0).getLong(0)
    val classCents = rows.values
      .map(r => math.round(r.getAs[Double]("class_rev") * 100)).sum
    assert(classCents === totCents)
    // share bands are ordered and nested: A tops out <= 0.80 < B <= 0.95 < C
    assert(rows("A").getAs[Double]("max_share") <= 0.80)
    rows.get("B").foreach { b =>
      assert(b.getAs[Double]("min_share") > 0.80)
      assert(b.getAs[Double]("max_share") <= 0.95)
    }
    rows.get("C").foreach { c =>
      assert(c.getAs[Double]("min_share") > 0.95)
      assert(math.abs(c.getAs[Double]("max_share") - 1.0) < 1e-12)
    }
  }

  test("win_bollinger bands equal a driver-side recount of the 7-day stats (r12)") {
    val rows = q("win_bollinger").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.length > 10)
    val xs = rows.map(_.getAs[Long]("avg_price_c").toDouble)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_win") === math.min(i + 1, 7).toLong)
      if (i >= 6) {
        val w = xs.slice(i - 6, i + 1)
        val m = w.sum / 7.0
        val sd = math.sqrt(math.max(w.map(v => v * v).sum / 7.0 - m * m, 0.0))
        assert(math.abs(r.getAs[Double]("mid") - m) < 1e-6 * math.abs(m))
        assert(math.abs(r.getAs[Double]("upper") - (m + 2 * sd)) <
          1e-6 * math.abs(m))
        assert(math.abs(r.getAs[Double]("lower") - (m - 2 * sd)) <
          1e-6 * math.abs(m))
        assert(r.getAs[Double]("upper") >= r.getAs[Double]("mid") &&
          r.getAs[Double]("mid") >= r.getAs[Double]("lower"))
      } else assert(r.isNullAt(r.fieldIndex("mid")))
    }
  }

  test("win_rsi equals a driver recount of the 14-day gain/loss sums (r13)") {
    val rows = q("win_rsi").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.length > 14)
    val xs = rows.map(_.getAs[Long]("avg_price_c"))
    val diffs = xs.indices.map(i =>
      if (i == 0) None else Some(xs(i) - xs(i - 1)))
    rows.zipWithIndex.foreach { case (r, i) =>
      val w = diffs.slice(math.max(0, i - 13), i + 1).flatten
      assert(r.getAs[Long]("n_diff") === w.length.toLong)
      val sg = w.filter(_ > 0).sum
      val sl = -w.filter(_ < 0).sum
      assert(r.getAs[Long]("gain_c") === sg)
      assert(r.getAs[Long]("loss_c") === sl)
      if (w.length == 14 && sg + sl > 0) {
        val rsi = r.getAs[Double]("rsi")
        assert(rsi === (100.0 * sg) / (sg + sl))
        assert(rsi >= 0.0 && rsi <= 100.0)
      } else assert(r.isNullAt(r.fieldIndex("rsi")))
    }
  }

  test("win_macd equals a driver recount of the truncated-kernel EMAs (r13)") {
    val rows = q("win_macd").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.length > 20)
    val xs = rows.map(_.getAs[Long]("avg_price_c").toDouble)
    // mirror the key's per-term q6 quantization; plain double sums here
    // (vs the key's exact DECIMAL) differ by ~20 ulp, inside the tolerance
    def q6d(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    def ema(span: Int, i: Int): Double = {
      val a = 2.0 / (span + 1)
      val ks = (0 until 20).filter(_ <= i)
      val num = ks.map(k => q6d(xs(i - k) * (a * math.pow(1 - a, k)))).sum
      val den = ks.map(k => q6d(a * math.pow(1 - a, k))).sum
      num / den
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      val e12 = ema(12, i)
      val e26 = ema(26, i)
      assert(math.abs(r.getAs[Double]("ema12") - e12) < 1e-9 * math.abs(e12))
      assert(math.abs(r.getAs[Double]("ema26") - e26) < 1e-9 * math.abs(e26))
      assert(r.getAs[Double]("macd") ===
        r.getAs[Double]("ema12") - r.getAs[Double]("ema26"))
    }
    // fast minus slow line must actually cross somewhere on a
    // fluctuating series — both signs observed
    val signs = rows.map(r => math.signum(r.getAs[Double]("macd"))).toSet
    assert(signs.contains(1.0) && signs.contains(-1.0))
  }

  test("win_drawdown peak is the running max and the quotient closes (r12)") {
    val rows = q("win_drawdown").collect()
    graft.api.Caches.sweep(spark)
    var peak = Long.MinValue
    var maxDd = 0.0
    rows.foreach { r =>
      val x = r.getAs[Long]("avg_price_c")
      peak = math.max(peak, x)
      assert(r.getAs[Long]("peak") === peak)
      val dd = (peak - x).toDouble / peak.toDouble
      assert(r.getAs[Double]("drawdown") === dd)
      maxDd = math.max(maxDd, dd)
    }
    // the global constant equals the running maximum of the per-day values
    assert(rows.forall(_.getAs[Double]("max_drawdown") === maxDd))
    assert(maxDd > 0.0, "a fluctuating daily average must draw down somewhere")
  }

  test("holtSmooth: exact two-state recurrence on a literal series") {
    import spark.implicits._
    // y = [4, 8, 2] with alpha = beta = 1/2 (dyadic-exact by hand):
    // l1=4 b1=0; l2=.5*8+.5*(4+0)=6, b2=.5*(6-4)+.5*0=1;
    // l3=.5*2+.5*(6+1)=4.5, b3=.5*(4.5-6)+.5*1=-0.25
    val series = Seq(("a", 10L, 4L), ("a", 11L, 8L), ("a", 12L, 2L),
      ("b", 10L, 7L)).toDF("k", "day", "y")
    val got = graft.api.Fts.holtSmooth(series, "k", "day", "y")
      .orderBy("k", "day")
      .select("k", "day", "level", "trend")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 10L, 4.0, 0.0), ("a", 11L, 6.0, 1.0), ("a", 12L, 4.5, -0.25),
      ("b", 10L, 7.0, 0.0)))
  }
}
