package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface — the 100 TB production aggregation shape the
  * one-shot approx keys (agg_approx_distinct / agg_approx_percentiles)
  * don't exercise: sketch PER SHARD (a day, a file, an ingest partition)
  * once, store the tiny sketch, and answer any later cross-shard question
  * by MERGING sketches instead of rescanning the corpus. Two families:
  *
  *  - HLL distinct ([[hllMergeEstimate]]): Spark 4's DataSketches-backed
  *    `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate` built-ins.
  *    HLL registers combine by per-register MAX, so union-of-sketches ==
  *    sketch-of-union EXACTLY (same registers, not merely a close
  *    estimate) and the result is independent of shard boundaries and
  *    merge order — ApiSpec pins that associativity plus the ±5% accuracy
  *    envelope vs exact countDistinct. Sketch bytes are engine-specific,
  *    so the gated key (`agg_hll_merge`) is declared-only with the exact
  *    re-aggregation (`agg_hll_merge_exact`) as its oracled companion.
  *  - quantiles ([[histQuantiles]]): a fixed-grid histogram sketch built
  *    in plain relational ops — bin counts are integers, merging = summing
  *    counts per bin (associative by construction), and the quantile read
  *    is one deterministic interpolation. Unlike KLL/GK partials the
  *    merged estimate has NO merge-order sensitivity, so it is
  *    engine-portable and DuckDB-oracle-able; rank error is bounded by
  *    the largest bin's row share.
  *
  * Scale shape: per-shard sketching is one hash aggregate with map-side
  * partial combine; the merge stage aggregates SKETCH-grain rows (shards ×
  * groups for HLL, shards × bins for the histogram), never corpus-grain.
  * At 1000 executors the corpus is read once, ever; each day's sketches
  * are a few KB and every later report is a sketch-only query.
  */
object Sketches {

  /** Per-shard HLL sketches of `valueCol`, unioned back up to `groupCols`
    * grain. Output: groupCols + (n_shards, approx_distinct). `lgK` = 12 →
    * 4 KB registers, ~1.6% relative standard error — the storage/accuracy
    * trade a daily-sketch table ships with.
    */
  def hllMergeEstimate(df: DataFrame, shardCol: Column, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame = {
    val shards = df
      .groupBy(groupCols.map(col) :+ shardCol.as("__shard"): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"))
    shards.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
          .as("approx_distinct"))
  }

  /** One-shot sketch at the same grain — the associativity reference:
    * estimates from [[hllMergeEstimate]] must EQUAL this (same registers
    * either way). Output: groupCols + approx_distinct.
    */
  def hllDirectEstimate(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
        .as("approx_distinct"))

  /** Pairwise distinct-INTERSECTION estimates by inclusion–exclusion over
    * per-set HLL sketches: `|A∩B| ≈ est(A) + est(B) − est(A∪B)`, every
    * term read from the SAME stored per-set sketches (`hll_union` merges
    * two sketch columns pairwise) — the audience-overlap question ("how
    * many users did BOTH A and B") answered sketch-only, no re-scan, no
    * user-grain pair join. Output: one row per unordered set pair
    * (set_a < set_b): est_a, est_b, est_union, est_intersect.
    *
    * Error bar: inclusion–exclusion compounds the three estimates'
    * errors, so the ABSOLUTE error scales with |A∪B| (~1.6% relative
    * standard error per term at lgK = 12) — small intersections of large
    * sets drown in it, which is why `est_union` ships on every row: the
    * caller judges `est_intersect` against it. ApiSpec pins a 5%-of-union
    * envelope vs the exact pair intersections on the fixture.
    *
    * Scale shape: one sketch per set (map-side-combinable agg over the
    * corpus), then everything is SET-grain: C(n_sets, 2) pair rows each
    * carrying two 4 KB sketches.
    */
  def hllIntersectEstimate(df: DataFrame, setCol: String, valueCol: String,
      lgK: Int = 12): DataFrame = {
    val sk = df.groupBy(col(setCol).as("s"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))
    val a = sk.select(col("s").as("set_a"), col("sk").as("sk_a"))
    val b = sk.select(col("s").as("set_b"), col("sk").as("sk_b"))
    a.join(b, col("set_a") < col("set_b"))
      .select(col("set_a"), col("set_b"),
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("est_union"))
      .withColumn("est_intersect",
        col("est_a") + col("est_b") - col("est_union"))
  }

  /** PHYSICALLY persisted sketch table — the storage half of the
    * [[hllMergeEstimate]] discipline a production pipeline actually runs:
    * one HLL sketch row per (group, shard), written as parquet
    * PARTITIONED BY the shard column, so later reads prune to the shards
    * a report asks about (a month of dailies out of years) at the file
    * listing level. The corpus is scanned exactly once, at write time;
    * the stored table is KB-per-shard forever after.
    *
    * The sketch bytes are Spark-DataSketches-specific (the same
    * declared-only boundary as `agg_hll_merge`), but the LAYOUT contract
    * is engine-free: `readMergeSketchTable` over the full table must
    * equal the in-memory [[hllMergeEstimate]] EXACTLY (identical
    * registers through the parquet round trip — ApiSpec pins it), and a
    * shard-filtered read must equal the in-memory estimate of the
    * same-filtered frame.
    */
  def writeSketchTable(df: DataFrame, shardCol: Column,
      groupCols: Seq[String], valueCol: String, dir: String,
      lgK: Int = 12): Unit =
    df.groupBy(groupCols.map(col) :+ shardCol.as("shard"): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sk"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  /** Merge-on-read over a [[writeSketchTable]] layout: union the stored
    * per-shard sketches back up to `groupCols` grain, optionally pruning
    * shards first (`shardFilter` references the partition column `shard`
    * — Catalyst resolves it to a partition filter, so unwanted shards are
    * never read). Output matches [[hllMergeEstimate]]:
    * groupCols + (n_shards, approx_distinct).
    */
  def readMergeSketchTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, groupCols: Seq[String],
      shardFilter: Column = lit(true)): DataFrame =
    spark.read.parquet(dir)
      .filter(shardFilter)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("approx_distinct"))

  /** Mergeable fixed-grid histogram quantiles: global [lo, hi] bounds (one
    * 1-row broadcast — at scale the bounds come from the same shard-stats
    * table the sketches live in), `bins` equal-width bin counts per shard,
    * counts SUMMED across shards (the merge), then each requested quantile
    * linearly interpolated inside its crossing bin. Every step is integer
    * counting or identical-IEEE double arithmetic spelled the same in the
    * DuckDB oracle → emitted RAW.
    *
    * Output: one row per requested quantile: (q, est, n_rows). The
    * cumulative window runs over BIN grain (`bins` rows total,
    * corpus-size-free), not row grain.
    */
  def histQuantiles(df: DataFrame, valueCol: String, shardCol: Column,
      bins: Int, qs: Seq[Double]): DataFrame = {
    require(bins > 0 && qs.nonEmpty, "histQuantiles needs bins > 0 and >= 1 q")
    // NULL values are excluded BEFORE binning: min/max already skip them,
    // so an unfiltered count would inflate n_rows with rows no bin holds —
    // and the null bin would sort first in Spark (asc_nulls_first) but
    // last in DuckDB, silently skewing every quantile on null-bearing data
    val v = df.select(col(valueCol).as("v"), shardCol.as("__shard"))
      .filter(col("v").isNotNull)
    val bounds = v.agg(min("v").as("lo"), max("v").as("hi"),
      count(lit(1)).as("n"))
    val binned = v.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins),
            lit(bins - 1L))))
    val perShard = binned.groupBy("__shard", "bin").agg(count(lit(1)).as("c"))
    val merged = perShard.groupBy("bin").agg(sum(col("c")).as("c"))
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("cb", col("cum") - col("c"))
      .crossJoin(broadcast(bounds))
    val qrows = cum.select(col("bin"), col("c"), col("cum"), col("cb"),
        col("lo"), col("hi"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .filter(col("cum") >= col("q") * col("n"))
    val wFirst = Window.partitionBy("q").orderBy("bin")
    qrows.withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .select(col("q"),
        (col("lo") + (col("hi") - col("lo")) / bins *
          (col("bin").cast("double") +
            (col("q") * col("n") - col("cb")) / col("c"))).as("est"),
        col("n").as("n_rows"))
      .orderBy("q")
  }
}
