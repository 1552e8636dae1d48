package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over datalake tables — the
  * Deequ-style "constraint suite" a training-data pipeline runs on every
  * ingest batch before anything downstream trusts the data.
  *
  * Every builder emits the SAME report grain so a suite unions cleanly:
  * `(rule_id, table_name, column_name, n_rows, n_violations,
  * violation_rate, pass)` — counts exact longs, the rate an exact-long
  * IEEE ratio (RAW under the oracle gate), `pass = n_violations == 0`.
  *
  * Scale shape: [[report]] folds EVERY row-grain rule on a table into ONE
  * scan — each rule is a map-side-combinable conditional `sum`, so a
  * 40-rule suite over a 100 TB table costs exactly one pass and a 1-row
  * partial per executor, never one job per rule. [[uniqueKey]] is a
  * count-distinct (two-stage partial agg); [[fkIntegrity]] is a key-grain
  * left-anti join (the child side collapses to key grain FIRST, so the
  * anti join shuffles distinct keys, not fact rows). Each returns a 1-row
  * frame; the suite union is rule-count-sized — driver-trivial.
  */
object Quality {

  /** One row-grain expectation: `violation` is the predicate that marks a
    * BAD row (null-safe: a null predicate value counts as a violation —
    * an expectation that cannot be evaluated is not satisfied).
    */
  final case class Check(ruleId: String, column: String, violation: Column)

  private val reportCols = Seq("rule_id", "table_name", "column_name",
    "n_rows", "n_violations", "violation_rate", "pass")

  /** All row-grain checks on one table in ONE aggregate pass: every rule
    * is a conditional sum in a single `agg`, and the 1-row result UNPIVOTS
    * (explode of literal structs) into rule rows — a union of per-rule
    * projections would re-execute the aggregate (and re-scan the table)
    * once per rule, which PlanSpec pins against.
    */
  def report(df: DataFrame, tableName: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map(c => sum(when(coalesce(c.violation, lit(true)), 1L)
        .otherwise(0L)).as(s"v_${c.ruleId}"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(checks.map(c =>
        struct(lit(c.ruleId).as("rule_id"), lit(c.column).as("column_name"),
          col(s"v_${c.ruleId}").as("n_violations"))): _*)).as("r"))
      .select(col("r.rule_id").as("rule_id"),
        lit(tableName).as("table_name"),
        col("r.column_name").as("column_name"), col("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations").cast("double") / col("n_rows"))
          .as("violation_rate"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Key-uniqueness expectation: violations = n_rows − n_distinct_keys. */
  def uniqueKey(df: DataFrame, tableName: String, keyCol: String,
      ruleId: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        count_distinct(col(keyCol)).as("n_keys"))
      .select(lit(ruleId).as("rule_id"), lit(tableName).as("table_name"),
        lit(keyCol).as("column_name"), col("n_rows"),
        (col("n_rows") - col("n_keys")).as("n_violations"),
        ((col("n_rows") - col("n_keys")).cast("double") / col("n_rows"))
          .as("violation_rate"),
        (col("n_rows") === col("n_keys")).as("pass"))

  /** Referential-integrity expectation: child rows whose `childKey` has no
    * match in `parent(parentKey)`. The child collapses to key grain before
    * the anti join (distinct keys shuffle, not fact rows), then orphaned
    * keys re-weight by their row counts.
    */
  def fkIntegrity(child: DataFrame, childTable: String, childKey: String,
      parent: DataFrame, parentKey: String, ruleId: String): DataFrame = {
    val keyCnt = Caches.cache(
      child.groupBy(col(childKey)).agg(count(lit(1)).as("cnt")))
    val orphans = keyCnt.join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_violations"))
    // total rows fall out of the cached key counts — no second child scan
    val tot = keyCnt.agg(sum(col("cnt")).as("n_rows"))
    tot.crossJoin(orphans)
      .select(lit(ruleId).as("rule_id"), lit(childTable).as("table_name"),
        lit(childKey).as("column_name"), col("n_rows"), col("n_violations"),
        (col("n_violations").cast("double") / col("n_rows"))
          .as("violation_rate"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Tags every row with `violated_rules` — the SORTED array of rule ids
    * whose violation predicate fires on it (empty array = clean row; the
    * same null-counts-as-violation contract as [[report]]). All checks
    * evaluate inside one projection over one scan — the per-row form of
    * [[report]]'s one-pass discipline.
    */
  def violations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    df.withColumn("violated_rules", array_sort(array_compact(array(
      checks.map(c =>
        when(coalesce(c.violation, lit(true)), lit(c.ruleId))): _*))))
  }

  /** Routes a table through the check suite: `(pass, quarantined)` row
    * sets — the ingest gate that doesn't just COUNT bad rows
    * ([[report]]) but SPLITS them out, so downstream trains on `pass`
    * while `quarantined` lands in a review table with its audit trail
    * (`violated_rules`). Every input row appears on exactly one side.
    *
    * Scale shape: both sides are a conditional filter over the same
    * one-projection [[violations]] frame — each side materializes as one
    * column-pruned scan with the OR-of-violations predicate pushed down
    * (no join, no shuffle, no second pass per rule). To pay ONE physical
    * scan total, write `violations(df, checks)` partitioned by
    * `size(violated_rules) > 0` and read the two partitions back — the
    * shard-write discipline; the lazy split here is the composable form.
    */
  def quarantine(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val v = violations(df, checks)
    (v.filter(size(col("violated_rules")) === 0).drop("violated_rules"),
      v.filter(size(col("violated_rules")) > 0))
  }

  /** Union a suite into the canonical report ordering. */
  def suite(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "empty suite")
    reports.map(_.select(reportCols.map(col): _*)).reduce(_.unionAll(_))
      .orderBy("rule_id")
  }
}
