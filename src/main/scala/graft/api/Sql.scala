package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-callable surface over the [[Fts]] builders — the one audience the
  * Scala-only api.* objects exclude: a user who lives in `spark.sql`
  * (notebooks, JDBC/Thrift, dbt-style tooling) and expects the engine's
  * core metrics reachable as relations.
  *
  * Mechanism: each metric registers as a TEMP VIEW over the LAZY builder
  * frame. A temp view stores the analyzed plan, not data — every
  * `spark.sql("SELECT … FROM fts_success_rate …")` re-optimizes the full
  * plan with the caller's predicates/projections PUSHED THROUGH the view
  * (Catalyst inlines views before optimization), so the SQL surface pays
  * exactly what the Scala call pays, and a selective consumer query still
  * prunes/pushes into the parquet scan underneath. Parameterization
  * happens at registration (the production deployment shape: a platform
  * team registers the curated metric views once per session/catalog;
  * ad-hoc parameter changes re-register, which is a metadata-only
  * operation).
  *
  * Scalar custom FUNCTIONS (`vec_dot`, `bloom_probe`, permute hashes …)
  * are already SQL-callable via [[graft.functions.VectorFunctions]] /
  * `GraftExtensions`; this object completes the surface for the
  * TABLE-shaped metrics. ApiSpec pins view == builder row-for-row.
  */
object Sql {

  /** Registers the FTS metric views over an events frame (schema
    * `event_id, ts, user_id, event_type, value, …`). Views installed:
    *
    *  - `graft_events`       — the source frame itself;
    *  - `fts_success_rate`   — per-user totals / error / success rates
    *    ([[Fts.successRate]], error = `event_type = 'error'`);
    *  - `fts_hourly`         — tumbling 1-hour buckets × event_type
    *    ([[Fts.timeBucket]]);
    *  - `fts_top_events`     — top-`k` events per type by value
    *    ([[Fts.topKPerGroup]], deterministic value-then-id order).
    */
  def registerFts(spark: SparkSession, events: DataFrame, k: Int = 3): Unit = {
    events.createOrReplaceTempView("graft_events")
    Fts.successRate(events, Seq("user_id"), col("event_type") === "error")
      .createOrReplaceTempView("fts_success_rate")
    Fts.timeBucket(events, "ts", "1 hour", Seq("event_type"), col("value"))
      .createOrReplaceTempView("fts_hourly")
    Fts.topKPerGroup(events, Seq("event_type"),
        Seq(col("value").desc, col("event_id").asc), k)
      .createOrReplaceTempView("fts_top_events")
  }

  /** Registers the CORPUS-pipeline views over a documents frame (schema
    * `doc_id, text, lang, source, n_chars, …`) — the LLM-data half of the
    * SQL face. Views installed:
    *
    *  - `graft_documents`    — the source frame itself;
    *  - `corpus_quality`     — per-doc quality flags
    *    ([[Text.qualityFlags]]: char band, token floor, stopword-ratio
    *    cap, the `kept` gate);
    *  - `corpus_token_counts`— per-doc whitespace / regex / BPE-proxy
    *    token counts ([[Text.tokenCounts]]);
    *  - `corpus_exact_dups`  — every doc with its `dup_rank` within its
    *    normalized-content group ([[Dedup.exactDupRank]] on
    *    `lower(trim(text))`; `dup_rank = 1` is the surviving copy, so
    *    `WHERE dup_rank > 1` is the SQL deletion list).
    *
    * Same inlining contract as [[registerFts]]: a view stores the
    * analyzed plan, consumer predicates push through to the scan.
    */
  def registerCorpus(spark: SparkSession, docs: DataFrame,
      stopwords: Seq[String] = Text.defaultStopwords): Unit = {
    docs.createOrReplaceTempView("graft_documents")
    Text.qualityFlags(docs, "text", "n_chars", stopwords)
      .createOrReplaceTempView("corpus_quality")
    Text.tokenCounts(docs, "text")
      .createOrReplaceTempView("corpus_token_counts")
    Dedup.exactDupRank(docs, "doc_id", lower(trim(col("text"))))
      .createOrReplaceTempView("corpus_exact_dups")
  }
}
