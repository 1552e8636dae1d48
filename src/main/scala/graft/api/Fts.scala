package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parameterized FTS-core analytics — the reference's transfer-monitoring
  * metrics as functions a user points at any conforming frame (the fixture
  * registry entries in `graft.ops.*` are thin wrappers over these).
  *
  * Floating sums route through DECIMAL(18,4) so results are order-independent
  * across partitionings (see graft.ops.H); count ratios are emitted raw —
  * identical IEEE division in any engine.
  *
  * Column-name contract: builders install fixed OUTPUT column names (listed
  * per method — e.g. `n_events`/`error_rate`, `bucket_start`, `rn`/`rk`/
  * `drk`, `asof_<col>`); a caller column with the same name is overwritten.
  */
object Fts {

  private val D184 = DecimalType(18, 4)

  /** Per-key event totals, error counts and success/error ratios from a
    * boolean error indicator — the core transfer success-rate metric.
    * Two-phase hash aggregate: partial map-side combine, one shuffle on keys.
    */
  def successRate(events: DataFrame, keyCols: Seq[String], isError: Column): DataFrame =
    events.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        count(when(isError, 1)).as("n_errors"),
        (count(when(isError, 1)) / count(lit(1))).as("error_rate"),
        (lit(1) - count(when(isError, 1)) / count(lit(1))).as("success_rate"))

  /** Tumbling time-bucket aggregation (count + exact decimal sum) — same
    * `window()` expression the streaming twin uses, so the batch and stream
    * plans stay equivalent. Output: bucket_start (epoch s), keys, n, sum_value.
    */
  def timeBucket(events: DataFrame, tsCol: String, width: String,
      keyCols: Seq[String], value: Column): DataFrame =
    events
      .groupBy(window(col(tsCol), width).as("w") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(value.cast(D184)).cast("double").as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket_start") +:
        (keyCols.map(col) ++ Seq(col("n"), col("sum_value"))): _*)

  /** Top-k rows per group by `order` (first column of `order` should embed a
    * unique tiebreak for determinism). Adds rn/rank/dense_rank.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
      k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .filter(col("rn") <= k)
  }

  /** Resample to a fixed step with gap filling: a generated spine
    * (min..max of `bucket`, stepped) left-joined to the per-bucket
    * aggregates, empty buckets filled with zeros. The spine is a sequence
    * explode, not a driver loop — it scales with the time range only.
    * `bucket` must be an integral column (e.g. epoch seconds).
    */
  def resampleFill(df: DataFrame, bucket: Column, step: Long,
      value: Column): DataFrame = {
    val ev = df.select(bucket.as("bucket"), value.as("v"))
    val agg = ev.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("v").cast(D184)).cast("double").as("sum_value"))
    val spine = ev.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(step))).as("bucket"))
    spine.join(agg, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  /** As-of enrichment: for every row, the most recent STRICTLY PRIOR row
    * (per `partCols`, ordered by `ordCols`) satisfying `isRef`, surfaced as
    * `asof_<col>` for each of `payloadCols`. The frame ends at -1 so a row
    * that itself satisfies `isRef` matches its predecessor, not itself.
    * Single window pass — no self-join, one sort per partition.
    */
  def asofLastBefore(df: DataFrame, partCols: Seq[String], ordCols: Seq[String],
      isRef: Column, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(ordCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    payloadCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"asof_$c",
        last(when(isRef, col(c)), ignoreNulls = true).over(w))
    }
  }
}
