package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import H._

/** SURVEY.md §2.1-ext data-quality & table-maintenance operators — the
  * ingest-gate shapes a production training-data pipeline runs on every
  * batch: a declarative expectations suite ([[graft.api.Quality]]), a
  * distribution-drift monitor (PSI), and small-file compaction
  * ([[graft.api.Tables.compactFiles]]).
  */
object QualityOps {

  /** Declarative data-quality expectations report (§2.1 ext) — the
    * Deequ-style constraint suite over four fixture tables: row-grain
    * domain/format checks folded into ONE scan per table
    * ([[graft.api.Quality.report]]), key uniqueness (count-distinct), and
    * lineitem→orders referential integrity (key-grain anti join). One row
    * per rule: counts exact longs, `violation_rate` an exact-long IEEE
    * ratio → RAW, `pass = (n_violations = 0)`.
    *
    * The suite is deliberately NOT all-green on real fixtures: the
    * `events.value ≤ 450` range expectation fails at sf0.01/sf0.1 (planted
    * tail values) — a report that can only say "pass" audits nothing.
    *
    * Scale shape: 8 row-grain rules cost 4 table scans TOTAL (one
    * conditional-sum pass per table, map-side combinable to a 1-row
    * partial per executor); uniqueness is a two-stage count-distinct; the
    * FK check anti-joins at KEY grain (child collapses to distinct keys
    * first). The final union is 11 rows — driver-trivial at any corpus
    * size.
    */
  private val srcQualityRules = Q(
    "src_quality_rules",
    (s, d) => {
      import graft.api.Quality
      import graft.api.Quality.Check
      val orders = T.orders(s, d)
      val li = T.lineitem(s, d)
      val ev = T.events(s, d)
      val docs = T.documents(s, d)
      Quality.suite(Seq(
        Quality.report(orders, "orders", Seq(
          Check("r01_totalprice_pos", "o_totalprice", col("o_totalprice") <= 0),
          Check("r02_status_domain", "o_orderstatus",
            !col("o_orderstatus").isin("O", "F", "P")))),
        Quality.report(li, "lineitem", Seq(
          Check("r03_discount_range", "l_discount",
            col("l_discount") < 0 || col("l_discount") > 0.1),
          Check("r04_qty_integral", "l_quantity",
            col("l_quantity") =!= floor(col("l_quantity"))))),
        Quality.report(ev, "events", Seq(
          Check("r05_value_range", "value",
            col("value") < 0 || col("value") > 450),
          Check("r06_props_format", "props",
            !col("props").rlike("^\\{\"k\": -?[0-9]+\\}$")))),
        Quality.report(docs, "documents", Seq(
          Check("r07_text_nonempty", "text",
            col("text").isNull || length(col("text")) === 0),
          Check("r08_nchars_consistent", "n_chars",
            col("n_chars") =!= length(col("text"))))),
        Quality.uniqueKey(orders, "orders", "o_orderkey", "r09_orderkey_unique"),
        Quality.uniqueKey(docs, "documents", "doc_id", "r10_docid_unique"),
        Quality.fkIntegrity(li, "lineitem", "l_orderkey",
          orders, "o_orderkey", "r11_fk_li_orders")))
    },
    Some("""WITH o AS (SELECT count(*) n,
    count(*) FILTER (WHERE o_totalprice <= 0 OR o_totalprice IS NULL) v1,
    count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')
                       OR o_orderstatus IS NULL) v2,
    count(DISTINCT o_orderkey) dk
  FROM orders),
l AS (SELECT count(*) n,
    count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1
                       OR l_discount IS NULL) v1,
    count(*) FILTER (WHERE l_quantity <> floor(l_quantity)
                       OR l_quantity IS NULL) v2
  FROM lineitem),
e AS (SELECT count(*) n,
    count(*) FILTER (WHERE value < 0 OR value > 450 OR value IS NULL) v1,
    count(*) FILTER (WHERE NOT regexp_matches(props, '^\{"k": -?[0-9]+\}$')
                       OR props IS NULL) v2
  FROM events),
dcs AS (SELECT count(*) n,
    count(*) FILTER (WHERE text IS NULL OR length(text) = 0) v1,
    count(*) FILTER (WHERE n_chars <> length(text)
                       OR n_chars IS NULL OR text IS NULL) v2,
    count(DISTINCT doc_id) dk
  FROM documents),
fk AS (SELECT (SELECT count(*) FROM lineitem) n,
    (SELECT count(*) FROM lineitem li
       WHERE NOT EXISTS (SELECT 1 FROM orders oo
                         WHERE oo.o_orderkey = li.l_orderkey)) v
  ),
rules AS (
  SELECT 'r01_totalprice_pos' rule_id, 'orders' table_name,
    'o_totalprice' column_name, n n_rows, v1 n_violations FROM o
  UNION ALL SELECT 'r02_status_domain', 'orders', 'o_orderstatus', n, v2 FROM o
  UNION ALL SELECT 'r03_discount_range', 'lineitem', 'l_discount', n, v1 FROM l
  UNION ALL SELECT 'r04_qty_integral', 'lineitem', 'l_quantity', n, v2 FROM l
  UNION ALL SELECT 'r05_value_range', 'events', 'value', n, v1 FROM e
  UNION ALL SELECT 'r06_props_format', 'events', 'props', n, v2 FROM e
  UNION ALL SELECT 'r07_text_nonempty', 'documents', 'text', n, v1 FROM dcs
  UNION ALL SELECT 'r08_nchars_consistent', 'documents', 'n_chars', n, v2 FROM dcs
  UNION ALL SELECT 'r09_orderkey_unique', 'orders', 'o_orderkey', n, n - dk FROM o
  UNION ALL SELECT 'r10_docid_unique', 'documents', 'doc_id', n, n - dk FROM dcs
  UNION ALL SELECT 'r11_fk_li_orders', 'lineitem', 'l_orderkey', n, v FROM fk)
SELECT rule_id, table_name, column_name,
  CAST(n_rows AS BIGINT) AS n_rows,
  CAST(n_violations AS BIGINT) AS n_violations,
  CAST(n_violations AS DOUBLE) / n_rows AS violation_rate,
  n_violations = 0 AS pass
FROM rules ORDER BY rule_id"""))

  /** Quarantine routing (§2.1 ext) — [[graft.api.Quality.quarantine]]
    * applied as the events ingest gate: the same r05/r06 expectations the
    * report key COUNTS, here SPLITTING the batch into (pass, quarantine)
    * row sets, every row on exactly one side, quarantined rows carrying
    * their violated-rule audit trail. The checked result audits BOTH
    * sides: per (side, violated-rule-set) the exact row count, the
    * event_id range, and the distinct-user count — so a row routed to the
    * wrong side, a dropped row, or a wrong rule attribution all break the
    * hash.
    *
    * Scale shape: the split is two conditional filters over one
    * projection (no join/shuffle); the audit is one map-side-combinable
    * aggregate per side over rule-set grain (bounded by 2^rules, here 4).
    */
  private val srcQualityQuarantine = Q(
    "src_quality_quarantine",
    (s, d) => {
      import graft.api.Quality
      import graft.api.Quality.Check
      // stricter than the report key's 450 audit bound: the ingest gate
      // quarantines the planted high tail, giving both fixture scales a
      // populated quarantine side (sf0.001: 15 rows, sf0.01: 172)
      val checks = Seq(
        Check("r05_value_range", "value",
          col("value") < 0 || col("value") > 200),
        Check("r06_props_format", "props",
          !col("props").rlike("^\\{\"k\": -?[0-9]+\\}$")))
      val (pass, quar) = Quality.quarantine(T.events(s, d), checks)
      val p = pass.select(lit("pass").as("side"), lit("").as("violated"),
        col("event_id"), col("user_id"))
      val q = quar.select(lit("quarantine").as("side"),
        concat_ws(",", col("violated_rules")).as("violated"),
        col("event_id"), col("user_id"))
      p.unionByName(q)
        .groupBy("side", "violated")
        .agg(count(lit(1)).as("n_rows"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("side", "violated")
    },
    // the violated-set string is built in the same sorted rule order the
    // array_sort'd Spark array produces; IS NULL arms mirror the
    // null-counts-as-violation Check contract
    Some("""WITH v AS (SELECT event_id, user_id,
    concat_ws(',',
      CASE WHEN value < 0 OR value > 200 OR value IS NULL
           THEN 'r05_value_range' END,
      CASE WHEN NOT regexp_matches(props, '^\{"k": -?[0-9]+\}$')
             OR props IS NULL THEN 'r06_props_format' END) AS violated
  FROM events)
SELECT CASE WHEN violated = '' THEN 'pass' ELSE 'quarantine' END AS side,
  violated, count(*) AS n_rows,
  min(event_id) AS min_event, max(event_id) AS max_event,
  count(DISTINCT user_id) AS n_users
FROM v GROUP BY 1, 2 ORDER BY side, violated"""))

  /** CUSUM change-point detection (§2.4 ext) — agg_drift_psi's sequential
    * sibling: PSI says WHETHER the distribution moved between two frozen
    * periods; CUSUM says WHEN the level shifted, day by day.
    * STANDARDIZED two-sided Page CUSUM over per-type daily means against
    * the frozen first-half baseline: deviations are expressed in units of
    * the baseline's own daily-mean sd
    * (`S⁺_t = max(0, S⁺_{t-1} + ((x_t − μ0)/σ_m − k))`, mirrored `S⁻`),
    * so the k = 0.5 slack and h = 5.0 threshold are NOISE-RELATIVE — the
    * same constants stay selective at every fixture scale even though the
    * per-day sample count (and hence daily-mean noise) varies 100×
    * (absolute thresholds flagged 149/150 days at sf0.001 and would need
    * retuning per scale — a detector that needs retuning per volume is
    * mis-parameterized). A zero baseline sd (constant baseline means)
    * would Inf-flag everything — degenerate input, not a detector state.
    *
    * The recursion is NOT computed recursively: `max(0, ·)`-reset CUSUM
    * equals `P_t − min(0, min_{i≤t} P_i)` over the plain prefix sums P —
    * an exact algebraic identity (WindowsSpec pins it against a literal
    * sequential fold) that turns the sequential definition into two
    * stacked WINDOW passes, each a calendar-grain frame per type.
    *
    * Float discipline: daily means are davg-exact IEEE ratios; the
    * baseline moments (μ0, E[m²]) go through q6 + DECIMAL(28,6) sums —
    * NOT direct double→decimal casts, which diverge between engines on
    * full-precision doubles (the H.q6 scaladoc's measured case) — σ_m is
    * one correctly-rounded sqrt, deviations are q6-quantized then
    * prefix-summed as DECIMAL(28,6) (order-exact in any engine), the
    * min/when/subtract close in decimal space, and ONE closing double
    * cast is correctly-rounded in both engines → everything RAW.
    *
    * Scale shape: one (type, day) davg aggregate over the fact stream
    * (map-side combinable) + one baseline-period aggregate; both window
    * passes run at CALENDAR grain (days per type), never row grain.
    */
  private val aggDriftCusum = Q(
    "agg_drift_cusum",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val ev = T.events(s, d).select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("dn"),
        col("value"))
      val daily = ev.groupBy("event_type", "dn").agg(davg(col("value")).as("m"))
      // frozen baseline: first half of the fixture month (dn < 19738 =
      // 2024-01-16, the agg_drift_psi split) — mean AND sd of the DAILY
      // MEANS per type, moments via q6 + dec6Sum (exact in any order)
      val mu = daily.filter(col("dn") < 19738)
        .groupBy("event_type")
        .agg((dec6Sum(q6(col("m"))) / count(lit(1))).as("mu0"),
          (dec6Sum(q6(col("m") * col("m"))) / count(lit(1))).as("em2"))
        .withColumn("sdm", sqrt(col("em2") - col("mu0") * col("mu0")))
        .drop("em2")
      val dev = daily.join(mu, "event_type")
        .withColumn("devp",
          q6((col("m") - col("mu0")) / col("sdm") - lit(0.5)))
        .withColumn("devn",
          q6((col("mu0") - col("m")) / col("sdm") - lit(0.5)))
      val w = Window.partitionBy("event_type").orderBy("dn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val zero = lit(0).cast(DecimalType(38, 6))
      val pre = dev
        .withColumn("pp", sum(col("devp").cast(DecimalType(28, 6))).over(w))
        .withColumn("pn", sum(col("devn").cast(DecimalType(28, 6))).over(w))
      pre
        .withColumn("mpp", min(col("pp")).over(w))
        .withColumn("mpn", min(col("pn")).over(w))
        // min(0, minP) via when, NOT least: DuckDB's least() returns
        // DOUBLE for decimal args (measured), which would reintroduce the
        // accumulated-double noise the decimal path exists to avoid
        .withColumn("cusum_up",
          (col("pp") - when(col("mpp") < 0, col("mpp")).otherwise(zero))
            .cast("double"))
        .withColumn("cusum_down",
          (col("pn") - when(col("mpn") < 0, col("mpn")).otherwise(zero))
            .cast("double"))
        .select(col("event_type"), col("dn"),
          r4z((col("m") - col("mu0")) / col("sdm")).as("dev_sd"),
          col("cusum_up"), col("cusum_down"),
          (col("cusum_up") > 5.0 || col("cusum_down") > 5.0).as("changepoint"))
        .orderBy("event_type", "dn")
    },
    Some(s"""WITH ev AS (SELECT event_type,
    CAST(ts AS DATE) - DATE '1970-01-01' AS dn, value FROM events),
daily AS (SELECT event_type, dn, ${davgSql("value")} AS m FROM ev GROUP BY 1, 2),
mu0s AS (SELECT event_type,
    ${dec6SumSql(q6Sql("m"))} / count(*) AS mu0,
    ${dec6SumSql(q6Sql("m * m"))} / count(*) AS em2
  FROM daily WHERE dn < 19738 GROUP BY 1),
mu AS (SELECT event_type, mu0, sqrt(em2 - mu0 * mu0) AS sdm FROM mu0s),
dev AS (SELECT daily.event_type AS event_type, dn, m, mu0, sdm,
    ${q6Sql("(m - mu0) / sdm - 0.5")} AS devp,
    ${q6Sql("(mu0 - m) / sdm - 0.5")} AS devn
  FROM daily JOIN mu USING (event_type)),
pre AS (SELECT event_type, dn, m, mu0, sdm,
    sum(CAST(devp AS DECIMAL(28,6))) OVER w AS pp,
    sum(CAST(devn AS DECIMAL(28,6))) OVER w AS pn
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY dn
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
cs AS (SELECT event_type, dn, m, mu0, sdm,
    CAST(pp - CASE WHEN min(pp) OVER w2 < 0 THEN min(pp) OVER w2
              ELSE CAST(0 AS DECIMAL(38,6)) END AS DOUBLE) AS cusum_up,
    CAST(pn - CASE WHEN min(pn) OVER w2 < 0 THEN min(pn) OVER w2
              ELSE CAST(0 AS DECIMAL(38,6)) END AS DOUBLE) AS cusum_down
  FROM pre WINDOW w2 AS (PARTITION BY event_type ORDER BY dn
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, dn, ${r4zSql("(m - mu0) / sdm")} AS dev_sd,
  cusum_up, cusum_down,
  (cusum_up > 5.0 OR cusum_down > 5.0) AS changepoint
FROM cs ORDER BY event_type, dn"""))

  /** Population-Stability-Index distribution drift (§2.4 ext) — the ML
    * feature-monitoring gauge: per event_type, `value`'s distribution in
    * the first half of the month (baseline, ts < Jan 16) vs the second
    * (current), over 10 equal-width bins spanning the GLOBAL min/max, with
    * add-one (Laplace) smoothing so empty bins stay finite:
    * `PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base)`. The standard
    * reading: < 0.1 stable, 0.1–0.2 moderate shift, ≥ 0.2 drifted.
    *
    * Float discipline: bin edges derive from exact double min/max with
    * identical-IEEE `(v−mn)/width` + `floor` + `least` both engines;
    * smoothed shares `(cnt+1)/(tot+10)` are exact-long IEEE ratios; each
    * PSI term crosses libm (`ln`) → [[H.q6]]-quantized and summed as exact
    * DECIMAL ([[H.dec6Sum]]) — order-independent, so the emitted `psi` is
    * RAW and the `drifted` threshold compares identical bits. Every term
    * is ≥ 0 ((x−y)·ln(x/y) ≥ 0), so no signed-zero hazard.
    *
    * Scale shape: one hash aggregate at (feature, period, bin) grain —
    * map-side combinable, bounded by features × 20 groups — then a
    * feature-grain rollup; the global min/max is a 1-row broadcast. The
    * period split is a column derivation, not a second scan.
    */
  private val aggDriftPsi = Q(
    "agg_drift_psi",
    (s, d) => {
      val ev = T.events(s, d)
      val mm = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      val split = lit("2024-01-16 00:00:00").cast("timestamp")
      val binned = ev.crossJoin(broadcast(mm))
        .select(col("event_type"),
          when(col("ts") < split, 0).otherwise(1).as("per"),
          least(floor((col("value") - col("mn"))
            / ((col("mx") - col("mn")) / 10.0)), lit(9L)).cast("long").as("bin"))
      // the bin-count frame feeds four consumers (tots, grid, the share
      // join, and the period totals) — cache it or each consumer re-scans
      // events (the r9 graph_modularity lesson); it is features×20 rows
      val cnts = graft.api.Caches.cache(
        binned.groupBy("event_type", "per", "bin")
          .agg(count(lit(1)).as("cnt")))
      val tots = cnts.groupBy("event_type", "per").agg(sum("cnt").as("tot"))
      val grid = tots.select(col("event_type"), col("per"), col("tot"))
        .crossJoin(broadcast(s.range(0, 10).select(col("id").as("bin"))))
      val shares = grid.join(cnts, Seq("event_type", "per", "bin"), "left")
        .select(col("event_type"), col("per"), col("bin"),
          ((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double")
            / (col("tot") + lit(10L))).as("p"))
      val wide = shares.groupBy("event_type", "bin")
        .agg(max(when(col("per") === 0, col("p"))).as("pb"),
          max(when(col("per") === 1, col("p"))).as("pc"))
      val perType = wide.groupBy("event_type")
        .agg(dec6Sum(q6((col("pc") - col("pb"))
          * log(col("pc") / col("pb")))).as("psi"))
      // period totals fall out of the bin counts — no third events scan
      val ns = tots.groupBy("event_type")
        .agg(max(when(col("per") === 0, col("tot"))).as("n_base"),
          max(when(col("per") === 1, col("tot"))).as("n_cur"))
      ns.join(perType, "event_type")
        .select(col("event_type"), col("n_base"), col("n_cur"), col("psi"),
          (col("psi") >= 0.2).as("drifted"))
        .orderBy("event_type")
    },
    Some(s"""WITH mm AS (SELECT min(value) mn, max(value) mx FROM events),
b AS (SELECT event_type,
    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END per,
    CAST(least(floor((value - mn) / ((mx - mn) / 10.0)), 9) AS BIGINT) bin
  FROM events, mm),
c AS (SELECT event_type, per, bin, count(*) cnt FROM b GROUP BY 1, 2, 3),
t AS (SELECT event_type, per, sum(cnt) tot FROM c GROUP BY 1, 2),
grid AS (SELECT t.event_type, t.per, t.tot, g.bin
  FROM t CROSS JOIN (SELECT range AS bin FROM range(0, 10)) g),
sh AS (SELECT grid.event_type, grid.per, grid.bin,
    CAST(coalesce(c.cnt, 0) + 1 AS DOUBLE) / (grid.tot + 10) p
  FROM grid LEFT JOIN c ON grid.event_type = c.event_type
    AND grid.per = c.per AND grid.bin = c.bin),
w AS (SELECT event_type, bin,
    max(CASE WHEN per = 0 THEN p END) pb,
    max(CASE WHEN per = 1 THEN p END) pc
  FROM sh GROUP BY 1, 2),
psi AS (SELECT event_type,
    ${dec6SumSql(q6Sql("(pc - pb) * ln(pc / pb)"))} psi
  FROM w GROUP BY 1),
ns AS (SELECT event_type,
    CAST(max(CASE WHEN per = 0 THEN tot END) AS BIGINT) n_base,
    CAST(max(CASE WHEN per = 1 THEN tot END) AS BIGINT) n_cur
  FROM t GROUP BY 1)
SELECT ns.event_type AS event_type, n_base, n_cur, psi,
  psi >= 0.2 AS drifted
FROM ns JOIN psi ON ns.event_type = psi.event_type
ORDER BY event_type"""))

  /** Small-file compaction round-trip (§2.1 ext) — ingest-shaped damage
    * (documents written at ≤ 50 rows/file) repaired by
    * [[graft.api.Tables.compactFiles]] into ~250-row files, then READ BACK
    * and audited per source: row count, char sum, doc_id sum and min/max —
    * all exact longs proving the rewrite preserved every row. The oracle
    * computes the same audit straight off the fixture: a hash match means
    * compaction changed layout only, never content. File-count
    * expectations (≥ 10 before, ⌈n/250⌉ after) are pinned by ApiSpec —
    * file layout is engine-specific and has no DuckDB mirror.
    *
    * Scale shape: the damage write and the compaction are each one
    * distributed pass; compaction's row count is parquet-footer
    * metadata-only; the round-robin `repartition` balances output files
    * regardless of input skew (the coalesce-inherits-skew trap the
    * builder's scaladoc documents). Audit = one hash aggregate at source
    * grain. Scratch dirs live under the per-JVM reaped [[Llm.shardRoot]]
    * (concurrent JVMs on the same sf dir never collide).
    */
  private val srcCompaction = Q(
    "src_compaction",
    (s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val smallDir = new java.io.File(Llm.shardRoot,
        s"compact_in_$tag").getAbsolutePath
      val outDir = new java.io.File(Llm.shardRoot,
        s"compact_out_$tag").getAbsolutePath
      T.documents(s, d).repartition(10)
        .write.mode("overwrite").option("maxRecordsPerFile", 50L)
        .parquet(smallDir)
      graft.api.Tables.compactFiles(s, smallDir, outDir, 250L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_ids"), min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
  min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents GROUP BY source ORDER BY source"""))

  /** Z-order (Morton) clustered layout (§2.1 ext) — orders keyed on two
    * independent dimensions (customer bucket `x = o_custkey % 16`, day
    * bucket `y = day(o_orderdate) % 16`), bit-interleaved into a z-value
    * ([[graft.api.Layout.zValue]]), WRITTEN z-clustered
    * (range-partitioned + sorted — the real layout job), read back, and
    * audited per z-TILE (`z >> 4`): row count and the (x, y) bounding box
    * each tile occupies. Morton tiles are 4×4 cells, so every tile's
    * `box_area` is ≤ 16 regardless of data volume — the zone-map locality
    * that lets file-level min/max stats prune on EITHER dimension (a
    * single-key sort prunes only its leading column). All columns exact
    * ints; the oracle mirrors the bit arithmetic term by term.
    *
    * Scale shape: z is pure codegen'd bitwise math; the layout write is
    * one range shuffle (`repartitionByRange` on z) — the same cost as any
    * sorted write; the audit is one 16-group hash agg. ApiSpec pins the
    * per-FILE guarantee on a uniform grid (16 files ↔ 16 disjoint
    * z-ranges, each file's box exactly one 4×4 tile).
    */
  private val srcZorderLayout = Q(
    "src_zorder_layout",
    (s, d) => {
      import graft.api.Layout
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val outDir = new java.io.File(Llm.shardRoot,
        s"zorder_$tag").getAbsolutePath
      val keyed = T.orders(s, d).select(
        (col("o_custkey") % 16).cast("int").as("x"),
        (dayofmonth(col("o_orderdate")) % 16).cast("int").as("y"))
      val z = keyed.withColumn("z", Layout.zValue(col("x"), col("y"), 4))
      Layout.zOrderWrite(s, z, "z", 16, outDir)
        .groupBy(shiftright(col("z"), 4).as("tile"))
        .agg(count(lit(1)).as("n_orders"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .withColumn("box_area",
          (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
        .orderBy("tile")
    },
    Some(s"""WITH k AS (SELECT CAST(o_custkey % 16 AS INT) x,
    CAST(day(o_orderdate) % 16 AS INT) y FROM orders),
z AS (SELECT x, y, ${graft.api.Layout.zValueSql("x", "y", 4)} z FROM k)
SELECT z >> 4 AS tile, count(*) AS n_orders,
  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y,
  (max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS box_area
FROM z GROUP BY 1 ORDER BY tile"""))

  /** Per-column profile of an arbitrary frame — one scan, stacked to
    * (col_name, dtype, n_null, n_distinct, min/max-as-double) rows; the
    * [[srcSchemaDrift]] building block (src_profile's stack pattern
    * generalized to a schema read at runtime).
    */
  private def columnProfile(df: DataFrame, suffix: String): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      val numeric = f.dataType.isInstanceOf[NumericType]
      Seq(
        count(col(f.name)).as(s"${f.name}_nn"),
        countDistinct(col(f.name)).as(s"${f.name}_nd"),
        (if (numeric) min(col(f.name)).cast("double")
         else lit(null).cast("double")).as(s"${f.name}_mn"),
        (if (numeric) max(col(f.name)).cast("double")
         else lit(null).cast("double")).as(s"${f.name}_mx"))
    }
    val stacked = fields.map(f =>
      s"'${f.name}', '${f.dataType.simpleString}', " +
        s"${f.name}_nn, ${f.name}_nd, ${f.name}_mn, ${f.name}_mx")
      .mkString(", ")
    df.agg(count(lit(1)).as("n_rows"), aggs.toSeq: _*)
      .select(col("n_rows"), expr(s"stack(${fields.length}, $stacked) as " +
        s"(col_name, dtype_$suffix, nn, nd, min_$suffix, max_$suffix)"))
      .select(col("col_name"), col(s"dtype_$suffix"),
        (col("n_rows") - col("nn")).as(s"n_null_$suffix"),
        col("nd").as(s"n_distinct_$suffix"),
        col(s"min_$suffix"), col(s"max_$suffix"))
  }

  /** Schema + distribution drift between two PHYSICAL snapshots of a table
    * (§2.1 ext) — the contract check a scheduled ingest runs before
    * trusting a new drop: which columns were added / dropped, which changed
    * type, and how the null count, distinct cardinality, and numeric range
    * moved. Snapshot B plants every drift class the report exists to catch:
    * a dropped column (o_custkey), an added column (o_channel), a type
    * narrowing (o_orderkey bigint→int), planted NULLs (o_totalprice,
    * keys ≡ 0 mod 13), a value drift (×1.1 on keys ≡ 0 mod 10), and a new
    * category ('X' on keys ≡ 0 mod 7). Both snapshots are physically
    * written and read back (the llm_shard_write discipline), so the
    * profiled schema is the PARQUET schema, not the derivation's.
    *
    * Scale shape: each side is ONE scan (all per-column aggregates fused
    * into a single map-side-combinable pass — the src_profile pattern);
    * the compare joins at COLUMN grain (rows = schema width). min/max
    * surface as doubles (NULL for non-numerics): exact for the fixture's
    * int/bigint/2-decimal domains, and the ×1.1 drift is identical
    * per-row IEEE arithmetic in both engines.
    */
  private val srcSchemaDrift = Q(
    "src_schema_drift",
    (s, d) => {
      val outBase = new java.io.File(Llm.shardRoot,
        s"graft_sdrift_${new java.io.File(d).getName}").getAbsolutePath
      val o = T.orders(s, d)
      o.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$outBase/a")
      o.select(col("o_orderkey").cast("int").as("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(col("o_orderkey") % 13 === 0, lit(null).cast("double"))
            .when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          (col("o_orderkey") % 3).cast("int").as("o_channel"))
        .write.mode("overwrite").parquet(s"$outBase/b")
      val pa = columnProfile(s.read.parquet(s"$outBase/a"), "a")
      val pb = columnProfile(s.read.parquet(s"$outBase/b"), "b")
      pa.join(pb, Seq("col_name"), "full_outer")
        .select(col("col_name"),
          when(col("dtype_a").isNull, lit("added"))
            .when(col("dtype_b").isNull, lit("dropped"))
            .otherwise(lit("common")).as("status"),
          col("dtype_a"), col("dtype_b"),
          when(col("dtype_a").isNotNull && col("dtype_b").isNotNull,
            col("dtype_a") =!= col("dtype_b")).as("type_changed"),
          col("n_null_a"), col("n_null_b"),
          col("n_distinct_a"), col("n_distinct_b"),
          col("min_a"), col("max_a"), col("min_b"), col("max_b"))
        .orderBy("col_name")
    },
    Some {
      def arm(src: String, cn: String, dt: String, numeric: Boolean) = {
        val mn = if (numeric) s"CAST(min($cn) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (numeric) s"CAST(max($cn) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$cn' AS col_name, '$dt' AS dtype,
  count(*) - count($cn) AS n_null, count(DISTINCT $cn) AS n_distinct,
  $mn AS mn, $mx AS mx FROM $src"""
      }
      val pa = Seq(arm("sa", "o_orderkey", "bigint", numeric = true),
        arm("sa", "o_custkey", "bigint", numeric = true),
        arm("sa", "o_orderstatus", "string", numeric = false),
        arm("sa", "o_totalprice", "double", numeric = true))
        .mkString("\nUNION ALL\n")
      val pb = Seq(arm("sb", "o_orderkey", "int", numeric = true),
        arm("sb", "o_orderstatus", "string", numeric = false),
        arm("sb", "o_totalprice", "double", numeric = true),
        arm("sb", "o_channel", "int", numeric = true))
        .mkString("\nUNION ALL\n")
      s"""WITH sa AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders),
sb AS (SELECT CAST(o_orderkey AS INTEGER) AS o_orderkey,
    CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
    CASE WHEN o_orderkey % 13 = 0 THEN NULL
         WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
         ELSE o_totalprice END AS o_totalprice,
    CAST(o_orderkey % 3 AS INTEGER) AS o_channel
  FROM orders),
pa AS ($pa),
pb AS ($pb)
SELECT COALESCE(pa.col_name, pb.col_name) AS col_name,
CASE WHEN pa.col_name IS NULL THEN 'added'
     WHEN pb.col_name IS NULL THEN 'dropped' ELSE 'common' END AS status,
pa.dtype AS dtype_a, pb.dtype AS dtype_b,
CASE WHEN pa.dtype IS NOT NULL AND pb.dtype IS NOT NULL
     THEN pa.dtype <> pb.dtype END AS type_changed,
pa.n_null AS n_null_a, pb.n_null AS n_null_b,
pa.n_distinct AS n_distinct_a, pb.n_distinct AS n_distinct_b,
pa.mn AS min_a, pa.mx AS max_a, pb.mn AS min_b, pb.mx AS max_b
FROM pa FULL OUTER JOIN pb ON pa.col_name = pb.col_name
ORDER BY col_name"""
    })

  /** Freshness / SLA lag report (§2.1 ext) — the "is the feed still
    * flowing?" check a scheduled ingest runs per stream: for each
    * event_type, the last-seen timestamp, its lag behind the table's
    * global high-water mark, and whether that lag breaches a 48-hour SLA.
    * The reference point is the TABLE's max ts (not wall clock) so the
    * report is deterministic and replayable.
    *
    * Scale shape: ONE corpus scan producing the per-type max (map-side
    * combinable); the global high-water mark derives from the TYPE-grain
    * frame (never a second corpus pass) and broadcasts back onto it.
    * Lags are exact integer µs arithmetic ([[H.em]] ≡ DuckDB epoch_us);
    * lag_hours is an integer `div` — no float anywhere.
    */
  private val srcFreshnessSla = Q(
    "src_freshness_sla",
    (s, d) => {
      val perType = T.events(s, d).groupBy("event_type")
        .agg(max(em(col("ts"))).as("last_us"), count(lit(1)).as("n_events"))
      val hw = perType.agg(max("last_us").as("hw_us"))
      perType.crossJoin(broadcast(hw))
        .select(col("event_type"), col("n_events"), col("last_us"),
          (col("hw_us") - col("last_us")).as("lag_us"),
          expr("(hw_us - last_us) div 3600000000").as("lag_hours"),
          (col("hw_us") - col("last_us") > lit(48L * 3600000000L))
            .as("sla_breach"))
        .orderBy("event_type")
    },
    Some("""WITH p AS (SELECT event_type, max(epoch_us(ts)) AS last_us,
    count(*) AS n_events FROM events GROUP BY 1),
h AS (SELECT max(last_us) AS hw_us FROM p)
SELECT event_type, n_events, last_us,
  hw_us - last_us AS lag_us,
  (hw_us - last_us) // 3600000000 AS lag_hours,
  hw_us - last_us > 48 * 3600000000 AS sla_breach
FROM p, h ORDER BY event_type"""))

  /** Primary-key uniqueness audit (§2.1 ext) — the ingest-gate twin of
    * src_quality_rules for KEY integrity: how many (l_orderkey,
    * l_linenumber) groups violate uniqueness (the synthetic lineitem is
    * KNOWN non-unique — TESTDATA quirk the whole repo's row-grain keys
    * must survive), worst multiplicity, total surplus rows that an upsert
    * would collapse, plus the 5 worst offending keys (multiplicity-desc,
    * key-asc deterministic cut) as an actionable sample.
    *
    * Scale shape: ONE key-grain hash agg over the corpus (map-side
    * combinable counts), then violation filtering and the top-5 cut on
    * the VIOLATION-grain frame; the summary row aggregates that same
    * grain — the corpus is scanned exactly once.
    */
  private val srcPkAudit = Q(
    "src_pk_audit",
    (s, d) => {
      val groups = T.lineitem(s, d)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("multiplicity"))
      val viol = groups.filter(col("multiplicity") > 1)
      val summary = viol.agg(
        coalesce(count(lit(1)), lit(0L)).as("n_violating_keys"),
        coalesce(sum(col("multiplicity") - 1), lit(0L)).as("surplus_rows"),
        coalesce(max("multiplicity"), lit(0L)).as("max_multiplicity"))
      viol.orderBy(col("multiplicity").desc, col("l_orderkey"),
          col("l_linenumber"))
        .limit(5)
        .crossJoin(broadcast(summary))
        .select(col("l_orderkey"), col("l_linenumber"), col("multiplicity"),
          col("n_violating_keys"), col("surplus_rows"),
          col("max_multiplicity"))
        .orderBy(col("multiplicity").desc, col("l_orderkey"),
          col("l_linenumber"))
    },
    Some("""WITH g AS (SELECT l_orderkey, l_linenumber, count(*) AS multiplicity
  FROM lineitem GROUP BY 1, 2),
v AS (SELECT * FROM g WHERE multiplicity > 1),
s AS (SELECT count(*) AS n_violating_keys,
    CAST(coalesce(sum(multiplicity - 1), 0) AS BIGINT) AS surplus_rows,
    CAST(coalesce(max(multiplicity), 0) AS BIGINT) AS max_multiplicity
  FROM v),
t AS (SELECT l_orderkey, l_linenumber, multiplicity FROM v
  ORDER BY multiplicity DESC, l_orderkey, l_linenumber LIMIT 5)
SELECT l_orderkey, l_linenumber, multiplicity,
  n_violating_keys, surplus_rows, max_multiplicity
FROM t, s ORDER BY multiplicity DESC, l_orderkey, l_linenumber"""))

  /** Incremental-ingest watermark consumption (§2.1 ext) — the bookmark
    * pattern every scheduled batch feed runs: a PERSISTED high-water mark
    * (1-row parquet, simulating the previous run's stored state at
    * min_ts + 24 days), an incremental read of only the rows PAST it,
    * and the updated bookmark for the next run. The bookmark is
    * physically written and read back (llm_shard_write discipline), and
    * the oracle recomputes the same batch from the raw table — pinning
    * that the round trip changes nothing.
    *
    * Scale shape: the bookmark read is the repo's documented 1-ROW
    * driver probe (production incremental jobs do exactly this: read the
    * bookmark, build the query with a LITERAL predicate); the literal
    * `e > wm` filter sits before any shuffle, and on a production
    * date-partitioned layout the same literal prunes at file-listing
    * level — the batch cost tracks NEW data, not table size. Per-type
    * stats are one map-side-combinable agg over the incremental rows
    * only; the new high-water mark derives from the TYPE-grain frame.
    */
  private val srcIncrementalWatermark = Q(
    "src_incremental_watermark",
    (s, d) => {
      val wmDir = new java.io.File(Llm.shardRoot,
        s"graft_wm_${new java.io.File(d).getName}").getAbsolutePath
      val ev = T.events(s, d).select(col("event_type"),
        em(col("ts")).as("e"))
      // simulate the PRIOR run's stored bookmark: min_ts + 24 days
      ev.agg((min(col("e")) + lit(24L * 86400000000L)).as("wm"))
        .write.mode("overwrite").parquet(s"$wmDir/bookmark")
      val wmVal = s.read.parquet(s"$wmDir/bookmark").head().getLong(0)
      val batch = ev.filter(col("e") > lit(wmVal))
      val perType = batch.groupBy("event_type")
        .agg(count(lit(1)).as("n_new"), min(col("e")).as("first_us"),
          max(col("e")).as("last_us"))
      val newWm = perType.agg(max("last_us").as("new_wm"))
      perType.crossJoin(broadcast(newWm)).orderBy("event_type")
    },
    Some("""WITH ev AS (SELECT event_type, epoch_us(ts) AS e FROM events),
b AS (SELECT min(e) + 24 * 86400000000 AS wm FROM ev),
inc AS (SELECT event_type, e FROM ev, b WHERE e > wm),
p AS (SELECT event_type, count(*) AS n_new, min(e) AS first_us,
    max(e) AS last_us FROM inc GROUP BY 1),
w AS (SELECT max(last_us) AS new_wm FROM p)
SELECT event_type, n_new, first_us, last_us, new_wm
FROM p, w ORDER BY event_type"""))

  /** Referential-integrity (FK orphan) audit (§2.1 ext) — the third
    * ingest-gate next to [[srcQualityRules]] (value rules) and
    * [[srcPkAudit]] (key uniqueness): child rows whose foreign key
    * resolves to NO parent. The fixture's FKs are clean by construction,
    * so the audited child is a PHYSICAL snapshot with planted corruption
    * (every 97th order's o_custkey shifted past the customer key range —
    * the src_schema_drift planted-defect discipline): the audit must
    * find exactly those. Emits the 5 worst orphan keys (count DESC, key
    * ASC) with the summary (orphan rows, distinct orphan keys, rate)
    * cross-joined; the oracle recomputes the remap from the raw tables,
    * so the physical round trip provably changes nothing.
    *
    * Scale shape: ONE left-anti join child→parent on the FK (key-
    * partitioned; AQE broadcasts the parent when it is dim-sized), one
    * key-grain agg over the ORPHANS only; the corpus is scanned once.
    */
  private val srcFkOrphans = Q(
    "src_fk_orphans",
    (s, d) => {
      val outBase = new java.io.File(Llm.shardRoot,
        s"graft_fk_${new java.io.File(d).getName}").getAbsolutePath
      T.orders(s, d).select(col("o_orderkey"),
          when(col("o_orderkey") % 97 === 0, col("o_custkey") + 10000000L)
            .otherwise(col("o_custkey")).as("o_custkey"))
        .write.mode("overwrite").parquet(s"$outBase/child")
      val child = s.read.parquet(s"$outBase/child")
      val nRows = child.agg(count(lit(1)).as("n_rows"))
      val orphans = child.join(
        T.customer(s, d).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      val byKey = orphans.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_rows_key"))
      val summary = byKey.agg(
        coalesce(sum("n_rows_key"), lit(0L)).as("n_orphans"),
        count(lit(1)).as("n_orphan_keys"))
        .crossJoin(broadcast(nRows))
        .select(col("n_orphans"), col("n_orphan_keys"),
          (col("n_orphans").cast("double") / col("n_rows"))
            .as("orphan_rate"))
      byKey.orderBy(col("n_rows_key").desc, col("o_custkey")).limit(5)
        .crossJoin(broadcast(summary))
        .select(col("o_custkey"), col("n_rows_key"), col("n_orphans"),
          col("n_orphan_keys"), col("orphan_rate"))
        .orderBy(col("n_rows_key").desc, col("o_custkey"))
    },
    Some("""WITH child AS (SELECT o_orderkey,
    CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 10000000
         ELSE o_custkey END AS o_custkey
  FROM orders),
o AS (SELECT o_custkey FROM child
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
bk AS (SELECT o_custkey, count(*) AS n_rows_key FROM o GROUP BY 1),
s AS (SELECT CAST(coalesce(sum(n_rows_key), 0) AS BIGINT) AS n_orphans,
    count(*) AS n_orphan_keys,
    CAST(coalesce(sum(n_rows_key), 0) AS DOUBLE)
      / (SELECT count(*) FROM child) AS orphan_rate
  FROM bk),
t AS (SELECT o_custkey, n_rows_key FROM bk
  ORDER BY n_rows_key DESC, o_custkey LIMIT 5)
SELECT o_custkey, n_rows_key, n_orphans, n_orphan_keys, orphan_rate
FROM t, s ORDER BY n_rows_key DESC, o_custkey"""))

  /** Row-hash table diff (§2.1 ext) — the DATA twin of [[srcSchemaDrift]]
    * (which compares column profiles): two PHYSICAL snapshots diffed at
    * ROW grain by key, each row reduced to one md5 over its canonical
    * string form, classified added / removed / changed / unchanged — the
    * snapshot-reconciliation report a nightly replication check runs.
    * Snapshot B plants all three change classes (every 101st key deleted,
    * a shifted copy of every 103rd key inserted, every 107th price bumped
    * by an EXACT 2-decimal constant — additive, because a multiplicative
    * bump needs a scale-reducing decimal cast whose tie-rounding mode
    * differs between engines); the oracle recomputes the same edits from
    * the raw table, pinning the physical round trip.
    *
    * Engine portability: the row hash feeds md5 a '|'-joined CANONICAL
    * string — money through DECIMAL(12,2) (identical decimal rendering
    * in both engines; raw double→string formatting is NOT portable),
    * keys as integers, status strings verbatim. md5 is the same RFC
    * digest everywhere (the fn_hash contract), so hashes match byte-wise.
    *
    * Scale shape: each side is one scan producing (key, hash) — map
    * work; the diff is ONE key-partitioned full-outer join; the report
    * aggregates the join at status grain (4 rows).
    */
  private val srcRowHashDiff = Q(
    "src_row_hash_diff",
    (s, d) => {
      val outBase = new java.io.File(Llm.shardRoot,
        s"graft_rdiff_${new java.io.File(d).getName}").getAbsolutePath
      val o = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), m2(col("o_totalprice")).as("price"))
      o.write.mode("overwrite").parquet(s"$outBase/a")
      val deleted = o.filter(col("o_orderkey") % 101 =!= 0)
      val updated = deleted.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"),
        when(col("o_orderkey") % 107 === 0,
          (col("price") + lit(11.11).cast(
            org.apache.spark.sql.types.DecimalType(4, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(12, 2))
        ).otherwise(col("price")).as("price"))
      val inserted = o.filter(col("o_orderkey") % 103 === 0)
        .select((col("o_orderkey") + 5000000L).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("price"))
      updated.union(inserted)
        .write.mode("overwrite").parquet(s"$outBase/b")
      def hashed(df: DataFrame, tag: String) = df.select(
        col("o_orderkey"),
        md5(concat_ws("|", col("o_custkey"), col("o_orderstatus"),
          col("price"))).as(s"h_$tag"))
      val a = hashed(s.read.parquet(s"$outBase/a"), "a")
      val b = hashed(s.read.parquet(s"$outBase/b"), "b")
      a.join(b, Seq("o_orderkey"), "full_outer")
        .select(when(col("h_a").isNull, "added")
          .when(col("h_b").isNull, "removed")
          .when(col("h_a") === col("h_b"), "unchanged")
          .otherwise("changed").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n_keys"))
        .orderBy("status")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
    CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders),
b0 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
    CASE WHEN o_orderkey % 107 = 0
      THEN CAST(price + CAST(11.11 AS DECIMAL(4,2)) AS DECIMAL(12,2))
      ELSE price END AS price
  FROM o WHERE o_orderkey % 101 != 0
  UNION ALL
  SELECT o_orderkey + 5000000, o_custkey, o_orderstatus, price
  FROM o WHERE o_orderkey % 103 = 0),
ha AS (SELECT o_orderkey,
    md5(concat_ws('|', o_custkey, o_orderstatus, price)) AS h_a FROM o),
hb AS (SELECT o_orderkey,
    md5(concat_ws('|', o_custkey, o_orderstatus, price)) AS h_b FROM b0),
j AS (SELECT CASE WHEN h_a IS NULL THEN 'added'
    WHEN h_b IS NULL THEN 'removed'
    WHEN h_a = h_b THEN 'unchanged' ELSE 'changed' END AS status
  FROM ha FULL OUTER JOIN hb USING (o_orderkey))
SELECT status, count(*) AS n_keys FROM j GROUP BY 1 ORDER BY status"""))

  val all: Seq[Q] = Seq(srcQualityRules, srcQualityQuarantine, aggDriftPsi,
    aggDriftCusum, srcCompaction, srcZorderLayout, srcSchemaDrift,
    srcFreshnessSla, srcPkAudit, srcIncrementalWatermark, srcFkOrphans,
    srcRowHashDiff)
}
