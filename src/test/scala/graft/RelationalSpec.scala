package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** §2.1–2.4: semantics + plan-shape assertions (SURVEY.md §5.2). */
class RelationalSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("join_broadcast_inner plans a broadcast hash join") {
    val plan = q("join_broadcast_inner").queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, s"expected BroadcastHashJoinExec in:\n$plan")
  }

  test("join_sortmerge_inner plans a sort-merge join") {
    val plan = q("join_sortmerge_inner").queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case m: SortMergeJoinExec => m
    }.nonEmpty, s"expected SortMergeJoinExec in:\n$plan")
  }

  test("semi and anti joins partition the customers with/without P-orders") {
    import org.apache.spark.sql.functions._
    val customers = graft.ops.T.customer(spark, sf).count()
    val orders = graft.ops.T.orders(spark, sf).filter(col("o_orderstatus") === "P")
    val semi = graft.ops.T.customer(spark, sf)
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = q("join_left_anti").count()
    assert(semi + anti == customers)
  }

  test("full outer covers all nations present on either side") {
    val got = q("join_full_outer").count()
    import org.apache.spark.sql.functions._
    val nations = graft.ops.T.customer(spark, sf).select(col("c_nationkey").as("k"))
      .union(graft.ops.T.supplier(spark, sf).select(col("s_nationkey").as("k")))
      .distinct().count()
    assert(got == nations)
  }

  test("set ops: |A ∪all B| = |A| + |B|; intersect/except partition distinct keys") {
    val c = graft.ops.T.customer(spark, sf).count()
    val s = graft.ops.T.supplier(spark, sf).count()
    assert(q("set_union_all").count() == c + s)
    val inter = q("set_intersect").count()
    val exc = q("set_except").count()
    import org.apache.spark.sql.functions._
    val distinctC = graft.ops.T.customer(spark, sf).select("c_nationkey").distinct().count()
    assert(inter + exc == distinctC)
  }

  test("set_symmetric_diff partitions the union of one-sided keys (r13)") {
    import org.apache.spark.sql.functions._
    val rows = q("set_symmetric_diff").collect()
    // conservation: |A\B| + |B\A| rows, each key exactly once per side
    val exc = q("set_except").count() // customer_only, the same derivation
    assert(rows.count(_.getAs[String]("side") == "customer_only") === exc)
    // a symmetric-diff key can never be in BOTH relations
    val inter = q("set_intersect").collect()
      .map(_.getAs[Int]("nationkey")).toSet
    assert(rows.forall(r => !inter.contains(r.getAs[Int]("nationkey"))))
    // and sides are disjoint key sets by construction
    def keys(side: String) = rows.filter(_.getAs[String]("side") == side)
      .map(_.getAs[Int]("nationkey")).toSet
    assert((keys("customer_only") intersect keys("supplier_only")).isEmpty)
  }

  test("agg_winsorized_mean clamps to the rank-boundary values (r13)") {
    val rows = q("agg_winsorized_mean").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Long]("lo_c")
      val hi = r.getAs[Long]("hi_c")
      assert(lo <= hi)
      val all = r.getAs[Double]("mean_all")
      val wz = r.getAs[Double]("mean_winsor")
      // the clamped mean lies inside the clamp bounds (in dollars), and
      // clamping a skewed price distribution must move the mean
      assert(wz >= lo / 100.0 - 1e-9 && wz <= hi / 100.0 + 1e-9)
      assert(all > 0.0 && wz != all)
    }
  }

  test("agg_quantile_normalize maps group extremes to global extremes (r13)") {
    import org.apache.spark.sql.functions._
    val rows = q("agg_quantile_normalize").collect()
    graft.api.Caches.sweep(spark)
    val n = graft.ops.T.lineitem(spark, sf).count()
    assert(rows.length.toLong === n, "normalization must preserve row count")
    val globalMax = rows.map(_.getAs[Long]("norm_c")).max
    val ycMax = rows.map(_.getAs[Long]("yc_c")).max
    // rn = ng maps to gr = N: every group's largest value normalizes to
    // the global maximum, which is the raw global maximum itself
    assert(globalMax === ycMax)
    rows.groupBy(_.getAs[String]("l_returnflag")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("norm_c")).max === globalMax)
      // the mapping is monotone: sorting by raw value sorts by normalized
      val sorted = g.sortBy(r => (r.getAs[Long]("yc_c"), r.getAs[Long]("norm_c")))
      assert(sorted.map(_.getAs[Long]("norm_c")).toSeq ===
        sorted.map(_.getAs[Long]("norm_c")).sortBy(identity).toSeq)
    }
  }

  test("theta range join pairs are strictly ordered and within 10 min") {
    import org.apache.spark.sql.functions._
    val df = q("join_theta_range")
    assert(df.filter(col("gap_us") <= 0 || col("gap_us") > 600000000L).count() == 0)
  }

  test("as-of join: every error with a preceding click resolves to a click") {
    import org.apache.spark.sql.functions._
    val df = q("join_asof")
    // gap must be non-negative when a click exists
    assert(df.filter(col("click_id") =!= -1L && col("gap_us") < 0).count() == 0)
  }

  test("q1 aggregates are internally consistent") {
    import org.apache.spark.sql.functions._
    val r = q("agg_groupby_hash").agg(sum("count_order")).head().getLong(0)
    assert(r == graft.ops.T.lineitem(spark, sf).count())
  }

  test("success_rate + error_rate = 1") {
    import org.apache.spark.sql.functions._
    val bad = q("agg_success_rate")
      .filter(abs(col("success_rate") + col("error_rate") - 1.0) > 1e-12).count()
    assert(bad == 0)
  }

  test("approx_percentile lands within ±1 percentile rank of exact") {
    import spark.implicits._
    // the sketch's rank error at accuracy=10000 is ~0.01%; asserting the
    // approx p-quantile lies between the exact (p-1)% and (p+1)% quantiles
    // leaves two orders of magnitude of slack while still catching a broken
    // sketch or a mis-wired percentile position
    val r = q("agg_approx_percentiles")
      .join(graft.ops.T.events(spark, sf).groupBy("event_type")
          .agg(expr("percentile(value, array(0.49D,0.51D,0.89D,0.91D,0.98D,1.0D))").as("ex")),
        "event_type")
      .select(col("p50"), col("p90"), col("p99"),
        element_at(col("ex"), 1), element_at(col("ex"), 2),
        element_at(col("ex"), 3), element_at(col("ex"), 4),
        element_at(col("ex"), 5), element_at(col("ex"), 6))
      .as[(Double, Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect()
    assert(r.nonEmpty)
    r.foreach { case (p50, p90, p99, lo50, hi50, lo90, hi90, lo99, hi99) =>
      assert(p50 >= lo50 && p50 <= hi50, s"p50=$p50 outside [$lo50,$hi50]")
      assert(p90 >= lo90 && p90 <= hi90, s"p90=$p90 outside [$lo90,$hi90]")
      assert(p99 >= lo99 && p99 <= hi99, s"p99=$p99 outside [$lo99,$hi99]")
    }
  }

  test("approx_count_distinct is within 5% of exact per day (SURVEY §2.4)") {
    import spark.implicits._
    val both = graft.ops.T.events(spark, sf)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .select("approx", "exact").as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(1L, (0.05 * exact).toLong),
        s"approx=$approx exact=$exact diverges >5%")
    }
  }

  test("agg_entropy matches exact driver-side entropy and Gini per source") {
    import spark.implicits._
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val cnts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source", "lang").count()
      .as[(String, String, Long)].collect()
    val expect = cnts.groupBy(_._1).map { case (src, g) =>
      val tot = g.map(_._3).sum
      val ent = 0.0 - g.map { case (_, _, c) =>
        val p = c.toDouble / tot
        BigDecimal(q6(p * math.log(p)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      val gini = 1.0 - g.map(r => r._3.toDouble * r._3.toDouble).sum / (tot.toDouble * tot)
      src -> (tot, g.length.toLong, ent, gini)
    }
    val got = q("agg_entropy").collect().map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
        r.getAs[Double]("entropy"), r.getAs[Double]("gini"))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (s, (nd, nl, e, gi)) =>
      val (end, enl, ee, eg) = expect(s)
      assert(nd === end && nl === enl)
      assert(math.abs(e - ee) < 1e-9, s"$s entropy $e vs $ee")
      assert(math.abs(gi - eg) < 1e-9, s"$s gini $gi vs $eg")
      assert(e >= 0.0 && gi >= 0.0 && gi < 1.0)
    }
  }

  test("agg_hhi_gini matches an exact driver-side concentration recompute") {
    import spark.implicits._
    def q6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def d6(v: Seq[Double]): Double =
      v.map(x => BigDecimal(q6d(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val revs = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1) - col("l_discount").cast("decimal(3,2)")).cast("decimal(4,2)"))
        .cast("double").as("rev"))
      .as[(Long, Double)].collect()
    val tot = revs.map(r => BigDecimal(r._2).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val n = revs.length
    val shares = revs.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((_, rev), i) => (i + 1, rev / tot) }
    val hhi = d6(shares.map { case (_, s) => s * s }.toSeq)
    val gini = (2.0 * d6(shares.map { case (rk, s) => rk * s }.toSeq) - (n + 1)) / n
    val r = q("agg_hhi_gini").collect()(0)
    assert(r.getAs[Long]("n_suppliers") === n.toLong)
    assert(math.abs(r.getAs[Double]("hhi") - hhi) < 1e-9)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-9)
    // structural bounds: uniform floor 1/n <= hhi <= 1; 0 <= gini < 1
    assert(hhi >= 1.0 / n && hhi <= 1.0)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("agg_rank_movers: exactly top-3 per month, consistent rank arithmetic") {
    import spark.implicits._
    val rows = q("agg_rank_movers")
      .select(col("m"), col("pk"), col("rank_prev"), col("rank_cur"),
        col("improve"), col("rn"))
      .as[(Long, Long, Int, Int, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (m, g) =>
      assert(g.length <= 3 && g.map(_._6).sorted.toSeq == (1 to g.length),
        s"month $m must emit a dense rn 1..<=3")
      // rn order follows (improve desc, pk asc)
      val byRn = g.sortBy(_._6).toSeq
      byRn.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2),
            s"month $m: rn order must follow (improve desc, pk asc)")
        case _ =>
      }
    }
    rows.foreach { case (_, _, rp, rc, imp, _) =>
      assert(imp == rp - rc, "improve must equal rank_prev - rank_cur")
      assert(rp >= 1 && rc >= 1)
    }
  }

  test("agg_ab_test: z matches the pooled two-proportion formula on exact counts") {
    val r = q("agg_ab_test").collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val (xa, xb) = (r.getAs[Long]("x_a"), r.getAs[Long]("x_b"))
    assert(na > 0 && nb > 0, "both variants must receive traffic")
    val total = graft.ops.T.events(spark, sf).count()
    assert(na + nb == total, "variants must partition the event stream")
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("z") == z, "z must be the exact IEEE chain")
    assert(r.getAs[Boolean]("significant") == (math.abs(z) >= 1.96))
  }

  test("agg_chi2 equals a driver-side contingency recount") {
    val rows = q("agg_chi2").collect()
    val obs = rows.map(r => (r.getAs[String]("o_orderpriority"),
      r.getAs[String]("o_orderstatus")) -> r.getAs[Long]("obs")).toMap
    val rt = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum.toDouble
    var chi = 0.0
    obs.foreach { case ((p, st), o) =>
      val e = rt(p) * ct(st) / n
      chi += (o - e) * (o - e) / e
    }
    val r0 = rows.head
    // q6 quantization of each cell contribution bounds the drift
    assert(math.abs(r0.getAs[Double]("chi2") - chi) < 1e-3)
    assert(r0.getAs[Long]("dof") === (rt.size - 1L) * (ct.size - 1L))
    rows.foreach { r =>
      val e = rt(r.getAs[String]("o_orderpriority")) *
        ct(r.getAs[String]("o_orderstatus")) / n
      assert(math.abs(r.getAs[Double]("expected") - e) < 1e-9)
    }
  }

  test("agg_ols_multi equals a driver-side Cramer solve; r2 >= single-feature r2") {
    import spark.implicits._
    val got = q("agg_ols_multi").collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("b0"),
          r.getAs[Double]("b_qty"), r.getAs[Double]("b_disc"),
          r.getAs[Double]("r2"))).toMap
    val rows = graft.ops.T.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"),
        col("l_extendedprice"))
      .as[(String, Double, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val n = g.length.toDouble
      val (x1, x2, y) = (g.map(_._2), g.map(_._3), g.map(_._4))
      val (s1, s2, sy) = (x1.sum, x2.sum, y.sum)
      val s11 = x1.map(v => v * v).sum
      val s22 = x2.map(v => v * v).sum
      val s12 = x1.zip(x2).map(p => p._1 * p._2).sum
      val s1y = x1.zip(y).map(p => p._1 * p._2).sum
      val s2y = x2.zip(y).map(p => p._1 * p._2).sum
      val syy = y.map(v => v * v).sum
      def det(m: Array[Double]) =
        m(0) * (m(4) * m(8) - m(5) * m(7)) -
          m(1) * (m(3) * m(8) - m(5) * m(6)) +
          m(2) * (m(3) * m(7) - m(4) * m(6))
      val dA = det(Array(n, s1, s2, s1, s11, s12, s2, s12, s22))
      val b0 = det(Array(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)) / dA
      val b1 = det(Array(n, sy, s2, s1, s1y, s12, s2, s2y, s22)) / dA
      val b2 = det(Array(n, s1, sy, s1, s11, s1y, s2, s12, s2y)) / dA
      val r2 = 1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y) /
        (syy - sy * sy / n)
      val (gn, gb0, gb1, gb2, gr2) = got(flag)
      assert(gn === g.length.toLong)
      // driver fold runs in original units/double sums — agree to ~1e-6 rel
      assert(math.abs(gb0 - b0) <= 1e-6 * math.max(1.0, math.abs(b0)),
        s"$flag b0: $gb0 vs $b0")
      assert(math.abs(gb1 - b1) <= 1e-6 * math.abs(b1), s"$flag b1")
      assert(math.abs(gb2 - b2) <= 1e-6 * math.abs(b2), s"$flag b2")
      assert(math.abs(gr2 - r2) < 1e-9 && gr2 >= 0.0 && gr2 <= 1.0)
    }
    // adding a regressor can only improve the in-sample fit
    val single = q("agg_ols_fit").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("r2")).toMap
    got.foreach { case (flag, (_, _, _, _, r2m)) =>
      assert(r2m >= single(flag) - 1e-12,
        s"$flag: multi r2 $r2m below single-feature ${single(flag)}")
    }
  }

  test("agg_cramers_v equals a driver-side recount and sits in [0, 1]") {
    import spark.implicits._
    val r0 = q("agg_cramers_v").collect().head
    // recount the enriched contingency table driver-side
    val obs = graft.ops.T.events(spark, sf)
      .join(graft.ops.T.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .groupBy("event_type", "c_mktsegment").count()
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val rt = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = obs.values.sum.toDouble
    var chi = 0.0
    obs.foreach { case ((a, b), o) =>
      val e = rt(a) * ct(b) / n
      chi += (o - e) * (o - e) / e
    }
    val v = math.sqrt(chi / (n * math.min(rt.size - 1, ct.size - 1)))
    assert(r0.getAs[Long]("n") === obs.values.sum)
    assert(r0.getAs[Long]("dof") === (rt.size - 1L) * (ct.size - 1L))
    assert(math.abs(r0.getAs[Double]("chi2") - chi) < 1e-3)
    val got = r0.getAs[Double]("cramers_v")
    assert(got >= 0.0 && got <= 1.0)
    assert(math.abs(got - v) < 1e-4, s"V=$got vs recount $v")
  }

  test("agg_ols_fit r2 is the squared Pearson correlation per group") {
    import spark.implicits._
    val fit = q("agg_ols_fit").select("l_returnflag", "r2")
      .as[(String, Double)].collect().toMap
    val co = graft.ops.T.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .select("l_returnflag", "c").as[(String, Double)].collect().toMap
    co.foreach { case (k, c) =>
      assert(math.abs(fit(k) - c * c) < 1e-6,
        s"$k: closed-form r2=${fit(k)} vs corr²=${c * c}")
    }
  }

  test("agg_corr_matrix is symmetric-consistent with single-pair corr") {
    import spark.implicits._
    val m = q("agg_corr_matrix").collect().head
    val direct = graft.ops.T.lineitem(spark, sf)
      .agg(corr(col("l_discount"), col("l_tax"))).as[Double].first()
    val r4 = math.abs(m.getAs[Double]("corr_disc_tax"))
    assert(math.abs(r4 - math.abs(BigDecimal(direct)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)) < 1e-12)
    // self-correlation sanity: every coefficient is in [-1, 1]
    Seq("corr_qty_price", "corr_qty_disc", "corr_qty_tax", "corr_price_disc",
      "corr_price_tax", "corr_disc_tax").foreach { c =>
      val v = m.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c out of range: $v")
    }
  }

  test("agg_bootstrap_ci resample means match a driver-side hash recount") {
    import spark.implicits._
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice").as[(Long, Double)].collect()
    def digit(key: Long, b: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      "0123456789abcdef".indexOf(hex.charAt(b))
    }
    def w(nib: Int): Long =
      if (nib < 6) 0L else if (nib < 12) 1L else if (nib < 15) 2L else 3L
    val rows = q("agg_bootstrap_ci").collect().sortBy(_.getAs[Int]("b"))
    assert(rows.length === 10)
    val means = rows.map(_.getAs[Double]("mean_b"))
    rows.foreach { r =>
      val b = r.getAs[Int]("b")
      val ws = orders.map { case (k, p) => (w(digit(k, b)), p) }
      val nEff = ws.map(_._1).sum
      assert(r.getAs[Long]("n_eff") === nEff)
      // exact-decimal weighted mean: recompute over scaled longs
      val sv = ws.map { case (wt, p) => wt * math.round(p * 100) }.sum
      assert(math.abs(r.getAs[Double]("mean_b") - sv / 100.0 / nEff) < 1e-9)
      assert(r.getAs[Double]("mean_lo") === means.min)
      assert(r.getAs[Double]("mean_hi") === means.max)
    }
    // the band must bracket the point estimate at fixture scale
    val full = rows.head.getAs[Double]("mean_full")
    assert(means.min <= full && full <= means.max)
  }

  test("agg_ks_test equals a brute-force two-sample ECDF scan") {
    import spark.implicits._
    val vals = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus").isin("F", "O"))
      .select(col("o_totalprice"), col("o_orderstatus"))
      .as[(Double, String)].collect()
    val a = vals.filter(_._2 == "F").map(_._1)
    val b = vals.filter(_._2 == "O").map(_._1)
    def ecdf(xs: Array[Double], v: Double) = xs.count(_ <= v).toDouble / xs.length
    val d = (a ++ b).distinct
      .map(v => math.abs(ecdf(a, v) - ecdf(b, v))).max
    val r = q("agg_ks_test").collect()(0)
    assert(r.getAs[Long]("n1") === a.length.toLong)
    assert(r.getAs[Long]("n2") === b.length.toLong)
    assert(math.abs(r.getAs[Double]("ks_d") - d) < 1e-12)
    assert(math.abs(r.getAs[Double]("ks_stat") -
      d * math.sqrt(a.length.toDouble * b.length / (a.length + b.length))) < 1e-12)
  }

  test("agg_spearman equals a brute-force midrank correlation") {
    import spark.implicits._
    def midranks(vs: Array[Double]): Array[Double] = {
      val idx = vs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](vs.length)
      var i = 0
      while (i < idx.length) {
        var j = i
        while (j < idx.length && idx(j)._1 == idx(i)._1) j += 1
        val r = (i + 1 + j) / 2.0 // average of ranks i+1..j
        (i until j).foreach(k => out(idx(k)._2) = r)
        i = j
      }
      out
    }
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      cov / math.sqrt(va * vb)
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[(String, Double, Double)].collect()
    val rows = q("agg_spearman").collect()
    assert(rows.map(_.getAs[String]("flag")).toSeq ===
      rows.map(_.getAs[String]("flag")).toSeq.sorted)
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getAs[String]("flag"))
      assert(r.getAs[Long]("n") === g.length.toLong)
      val expect =
        pearson(midranks(g.map(_._2)), midranks(g.map(_._3)))
      assert(math.abs(r.getAs[Double]("rho") - expect) < 1e-9)
    }
  }

  test("agg_mann_whitney equals a brute-force tie-corrected rank sum") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select($"o_totalprice", $"o_orderpriority")
      .as[(Double, String)].collect()
    val all = o.map(_._1).sorted
    def avgRank(v: Double): Double = {
      val lo = all.indexWhere(_ == v); val hi = all.lastIndexWhere(_ == v)
      (lo + 1 + hi + 1) / 2.0
    }
    val g1 = o.filter(_._2 == "1-URGENT").map(_._1)
    val n1 = g1.length.toDouble; val n2 = o.length - n1
    val r1 = g1.map(avgRank).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    val ties = all.groupBy(identity).values
      .map(t => t.length.toLong * t.length * t.length - t.length).sum
    val nT = n1 + n2
    val sigma = math.sqrt(n1 * n2 / 12.0 *
      ((nT + 1) - ties / (nT * (nT - 1))))
    val r = q("agg_mann_whitney").collect()(0)
    assert(r.getAs[Long]("n1") === n1.toLong)
    assert(r.getAs[Long]("n2") === n2.toLong)
    assert(math.abs(r.getAs[Double]("r1") - r1) < 1e-6)
    assert(math.abs(r.getAs[Double]("u1") - u1) < 1e-6)
    assert(math.abs(r.getAs[Double]("z") - (u1 - n1 * n2 / 2.0) / sigma) < 1e-9)
  }

  test("agg_welch_ttest equals brute-force per-group moments") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_totalprice", $"o_orderstatus")
      .as[(Double, String)].collect()
    def stats(st: String) = {
      val xs = o.filter(_._2 == st).map(_._1)
      val n = xs.length.toDouble
      val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (nf, mf, vf) = stats("F"); val (no, mo, vo) = stats("O")
    val r = q("agg_welch_ttest").collect()(0)
    assert(r.getAs[Long]("n_f") === nf.toLong)
    assert(r.getAs[Long]("n_o") === no.toLong)
    assert(math.abs(r.getAs[Double]("mean_f") - mf) < 1e-9 * math.abs(mf))
    assert(math.abs(r.getAs[Double]("var_f") - vf) < 1e-9 * vf)
    assert(math.abs(r.getAs[Double]("t_welch") -
      (mf - mo) / math.sqrt(vf / nf + vo / no)) < 1e-6)
    val dof = math.pow(vf / nf + vo / no, 2) /
      (math.pow(vf / nf, 2) / (nf - 1) + math.pow(vo / no, 2) / (no - 1))
    assert(math.abs(r.getAs[Double]("dof") - dof) < 1e-3)
  }

  test("agg_benford covers digits 1-9 with shares summing to one") {
    val rows = q("agg_benford").collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq === (1L to 9L))
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum === total)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    // expectations are the Benford masses; mad recomputes from the rows
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toDouble
      assert(math.abs(r.getAs[Double]("expected") -
        math.rint(math.log10(1 + 1 / d) * 1e4) / 1e4) < 1e-12)
      assert(math.abs(r.getAs[Double]("abs_dev") -
        math.abs(r.getAs[Double]("share") - r.getAs[Double]("expected"))) < 1e-12)
    }
    val mad = rows.map(_.getAs[Double]("abs_dev")).sum / 9.0
    assert(math.abs(rows.head.getAs[Double]("mad") - mad) < 1e-6)
  }

  test("join_lateral_topn equals the window-rank top-3 per nation") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val expect = c.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_name", "c_acctbal")
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
      .collect()
    assert(q("join_lateral_topn").collect() === expect)
  }

  test("src_freshness_sla lags are exact against per-type maxima") {
    import spark.implicits._
    val maxes = graft.ops.T.events(spark, sf)
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .as[(String, Long)].collect().toMap
    val hw = maxes.values.max
    val rows = q("src_freshness_sla").collect()
    assert(rows.map(_.getAs[String]("event_type")).toSet === maxes.keySet)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("last_us") === maxes(et))
      assert(r.getAs[Long]("lag_us") === hw - maxes(et))
      assert(r.getAs[Long]("lag_hours") === (hw - maxes(et)) / 3600000000L)
      assert(r.getAs[Boolean]("sla_breach") ===
        (hw - maxes(et) > 48L * 3600000000L))
    }
    // the high-water type itself always has zero lag and no breach
    assert(rows.exists(r => r.getAs[Long]("lag_us") == 0L))
  }

  test("src_pk_audit matches a brute-force duplicate-key count") {
    import spark.implicits._
    val groups = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey", "l_linenumber").count()
      .as[(Long, Long, Long)].collect()
    val viol = groups.filter(_._3 > 1)
    val rows = q("src_pk_audit").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val head = rows.head
    assert(head.getAs[Long]("n_violating_keys") === viol.length.toLong)
    assert(head.getAs[Long]("surplus_rows") === viol.map(_._3 - 1).sum)
    assert(head.getAs[Long]("max_multiplicity") === viol.map(_._3).max)
    // the sample is the deterministic worst-multiplicity cut
    val expectTop = viol.sortBy(v => (-v._3, v._1, v._2)).take(rows.length)
    assert(rows.map(r => (r.getAs[Long]("l_orderkey"),
      r.getAs[Long]("l_linenumber"), r.getAs[Long]("multiplicity"))).toSeq
      === expectTop.toSeq)
  }

  test("agg_theil_index decomposes: total = share-weighted within + between") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderpriority", $"o_totalprice").as[(String, Double)]
      .collect()
    val rows = q("agg_theil_index").collect()
    val mean = o.map(_._2).sum / o.length
    val theil = o.map { case (_, x) =>
      (x / mean) * math.log(x / mean)
    }.sum / o.length
    val total = rows.head.getAs[Double]("theil_total")
    // q6 quantization bounds the drift far under this tolerance
    assert(math.abs(total - theil) < 1e-4, s"total $total vs direct $theil")
    // decomposition identity from the emitted group rows
    val mix = rows.map(r =>
      r.getAs[Double]("share") * r.getAs[Double]("t_within")).sum
    val between = rows.head.getAs[Double]("between_groups")
    assert(math.abs(total - (mix + between)) < 1e-5)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val g = o.filter(_._1 == r.getAs[String]("prio")).map(_._2)
      assert(r.getAs[Long]("n_g") === g.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_g") - g.sum / g.length)
        < 1e-9 * (g.sum / g.length))
    }
  }

  test("src_incremental_watermark batch equals the direct cut filter") {
    import spark.implicits._
    val ev = graft.ops.T.events(spark, sf)
      .select($"event_type", unix_micros($"ts").as("e"))
      .as[(String, Long)].collect()
    val wm = ev.map(_._2).min + 24L * 86400000000L
    val inc = ev.filter(_._2 > wm)
    val rows = q("src_incremental_watermark").collect()
    assert(rows.map(_.getAs[Long]("n_new")).sum === inc.length.toLong)
    assert(rows.head.getAs[Long]("new_wm") === inc.map(_._2).max)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val g = inc.filter(_._1 == et).map(_._2)
      assert(r.getAs[Long]("n_new") === g.length.toLong)
      assert(r.getAs[Long]("first_us") === g.min)
      assert(r.getAs[Long]("last_us") === g.max)
      assert(g.min > wm) // nothing at or before the bookmark leaks in
    }
  }

  test("src_fk_orphans finds exactly the planted orphan rows") {
    import spark.implicits._
    val planted = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 97 === 0)
      .select(($"o_custkey" + 10000000L).as[Long]).collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    val rows = q("src_fk_orphans").collect()
    val head = rows.head
    assert(head.getAs[Long]("n_orphans") === planted.length.toLong)
    assert(head.getAs[Long]("n_orphan_keys") === planted.distinct.length.toLong)
    assert(head.getAs[Double]("orphan_rate") ===
      planted.length.toDouble / total)
    // the sample is the deterministic worst cut, all from the planted set
    val byKey = planted.groupBy(identity).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val k = r.getAs[Long]("o_custkey")
      assert(byKey.contains(k))
      assert(r.getAs[Long]("n_rows_key") === byKey(k).toLong)
    }
    val expectTop = byKey.toSeq.sortBy { case (k, c) => (-c, k) }
      .take(rows.length)
    assert(rows.map(r => (r.getAs[Long]("o_custkey"),
      r.getAs[Long]("n_rows_key"))).toSeq === expectTop.map { case (k, c) =>
      (k, c.toLong) })
  }

  test("fn_hash digests recompute in the JVM and bucket correctly") {
    import spark.implicits._
    val keys = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_custkey") <= 200)
      .select($"c_custkey", concat($"c_name", lit("|"), $"c_mktsegment"))
      .as[(Long, String)].collect().toMap
    def hex(alg: String, in: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(in.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = q("fn_hash").collect()
    assert(rows.length === keys.size)
    rows.foreach { r =>
      val in = keys(r.getAs[Long]("c_custkey"))
      assert(r.getAs[String]("md5_hex") === hex("MD5", in))
      assert(r.getAs[String]("sha256_hex") === hex("SHA-256", in))
      assert(r.getAs[Int]("md5_len") === 32)
      assert(r.getAs[Int]("sha256_len") === 64)
      val b = r.getAs[Int]("bucket16")
      assert(b >= 0 && b <= 15)
      assert(b === Integer.parseInt(hex("MD5", in).substring(0, 1), 16))
    }
  }

  test("join_relational_division returns exactly the all-priority customers") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_orderpriority").as[(Long, String)].collect()
    val nPrio = o.map(_._2).distinct.length
    val expect = o.groupBy(_._1).filter(_._2.map(_._2).distinct.length == nPrio)
      .keys.toSeq.sorted
    val rows = q("join_relational_division").collect()
    assert(rows.map(_.getAs[Long]("c_custkey")).toSeq === expect)
    assert(rows.nonEmpty) // fixture has full-coverage customers
    rows.foreach { r =>
      val k = r.getAs[Long]("c_custkey")
      assert(r.getAs[Long]("n_orders") === o.count(_._1 == k).toLong)
    }
  }

  test("src_row_hash_diff counts match the planted edit classes") {
    import spark.implicits._
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey").as[Long].collect()
    val rows = q("src_row_hash_diff").collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_keys")).toMap
    assert(rows("added") === keys.count(k => k % 103 == 0).toLong)
    assert(rows("removed") === keys.count(k => k % 101 == 0).toLong)
    // changed = price-bumped keys that survived the delete
    assert(rows("changed") ===
      keys.count(k => k % 101 != 0 && k % 107 == 0).toLong)
    assert(rows.values.sum ===
      (keys.length + keys.count(_ % 103 == 0)).toLong)
  }

  test("join_null_safe keeps the NULL-keyed rows an inner join would drop") {
    val rows = q("join_null_safe").collect()
    val nullRows = rows.filter(_.getAs[Boolean]("via_null_key"))
    assert(nullRows.length === 1, "exactly one nation rides the NULL key")
    val n3 = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_nationkey") === 3).count()
    assert(n3 > 0) // the demonstration is non-vacuous
    assert(nullRows.head.getAs[Long]("n_customers") === n3)
    // every customer still reaches its dimension row: counts partition
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === total)
  }

  test("agg_bool folds match driver-side predicate scans") {
    import spark.implicits._
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderstatus", $"o_totalprice").as[(String, Double)]
      .collect()
    val rows = q("agg_bool").collect()
    assert(rows.map(_.getAs[String]("o_orderstatus")).toSet ===
      o.map(_._1).toSet)
    rows.foreach { r =>
      val g = o.filter(_._1 == r.getAs[String]("o_orderstatus")).map(_._2)
      assert(r.getAs[Long]("n") === g.length.toLong)
      assert(r.getAs[Boolean]("any_over_400k") === g.exists(_ > 400000))
      assert(r.getAs[Boolean]("all_over_1k") === g.forall(_ > 1000))
      assert(r.getAs[Long]("n_mid_band") ===
        g.count(v => v >= 100000 && v <= 200000).toLong)
    }
  }

  test("src_schema_drift classifies every planted drift case") {
    val rows = q("src_schema_drift").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size === 5)
    assert(rows("o_custkey").getAs[String]("status") === "dropped")
    assert(rows("o_channel").getAs[String]("status") === "added")
    // type narrowing bigint -> int is the only type change
    assert(rows("o_orderkey").getAs[Boolean]("type_changed"))
    assert(!rows("o_orderstatus").getAs[Boolean]("type_changed"))
    assert(!rows("o_totalprice").getAs[Boolean]("type_changed"))
    // planted NULLs: exactly the keys = 0 mod 13, only in snapshot B
    val expectNulls = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 13 === 0).count()
    assert(rows("o_totalprice").getAs[Long]("n_null_a") === 0L)
    assert(rows("o_totalprice").getAs[Long]("n_null_b") === expectNulls)
    // x1.1 value drift must widen the numeric range upward
    assert(rows("o_totalprice").getAs[Double]("max_b") >
      rows("o_totalprice").getAs[Double]("max_a"))
  }

  test("agg_trimmed_mean drops exactly 2*floor(n/10) rows and shrinks toward the center (r12)") {
    val rows = q("agg_trimmed_mean").collect()
    graft.api.Caches.sweep(spark)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val kept = r.getAs[Long]("n_kept")
      assert(kept === n - 2 * (n / 10))
      // trimming a right-skewed price distribution must move the mean,
      // and the trimmed mean stays inside the all-rows envelope
      val all = r.getAs[Double]("mean_all")
      val tr = r.getAs[Double]("mean_trimmed")
      assert(tr > 0.0 && all > 0.0 && tr != all)
    }
  }

  test("sql_tvf_params inlines the parameter into the scan's pushed filter (r12)") {
    val df = q("sql_tvf_params")
    graft.api.Caches.sweep(spark)
    // the TVF body's WHERE price >= param must reach the parquet scan as a
    // pushed filter once the call site substitutes the literal
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(o_totalprice,150000.0)"),
      s"parameter must push into the scan:\n$plan")
    // and the rows equal the directly-written query
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .filter(org.apache.spark.sql.functions.col("o_totalprice") >= 150000.0)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaTvf = df.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    assert(viaTvf === direct)
  }

  test("agg_bitmap_distinct equals countDistinct and splits segments at 32768 (r12)") {
    import spark.implicits._
    // fixture ids fit one segment — prove the MULTI-segment path on ids
    // straddling the 32768 bucket boundary, plus duplicates
    val ids = Seq(1L, 5L, 5L, 32767L, 32768L, 32769L, 100000L, 100000L)
    val df = ids.map(("t", _)).toDF("g", "id")
      .withColumn("uid1", org.apache.spark.sql.functions.col("id") + 1)
    val seg = df.groupBy(org.apache.spark.sql.functions.col("g"),
        org.apache.spark.sql.functions.expr("bitmap_bucket_number(uid1)").as("bkt"))
      .agg(org.apache.spark.sql.functions
        .expr("bitmap_construct_agg(bitmap_bit_position(uid1))").as("bm"))
    val out = seg.groupBy("g")
      .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr("bitmap_count(bm)")).as("n"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("segs"))
      .collect()(0)
    assert(out.getAs[Long]("n") === ids.distinct.size.toLong)
    // uid1 domain: 2..100001 -> buckets {1, 2, 4} (32768 ids per bucket)
    assert(out.getAs[Long]("segs") === 3L)
    // and the fixture key agrees with the expand-distinct plan
    val viaBitmap = q("agg_bitmap_distinct").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val viaExpand = q("agg_count_distinct").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    graft.api.Caches.sweep(spark)
    assert(viaBitmap === viaExpand)
  }
}
