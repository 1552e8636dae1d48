package graft.api

import org.apache.spark.sql.DataFrame

/** Table-maintenance primitives for snapshot-style datalake tables. */
object Tables {

  // one writer at a time through the read-or-derive gate (the
  // Graph.edgesOrDerive discipline for plain tables)
  private val artifactLock = new Object

  /** Read-or-derive accessor for a SESSION-persisted plain parquet table —
    * the unbucketed sibling of [[Graph.edgesOrDerive]] for derived frames
    * several analytics consume (e.g. the default-parameter n-gram Jaccard
    * pair set six LLM keys share): if `table` is absent from the session
    * catalog, `derive` is computed and written (`saveAsTable`, overwrite —
    * after clearing any warehouse directory a previous JVM's dead catalog
    * orphaned), and the READ-BACK table is returned either way.
    *
    * Same identity contract as `edgesOrDerive`: the table name must
    * uniquely determine the derivation AND its source data (callers embed
    * the fixture directory); artifact lifetime is the session catalog's —
    * a fresh JVM re-derives on first touch, so regenerated source data can
    * never be read through a stale artifact. LlmSpec pins read-back ==
    * direct derivation.
    */
  def tableOrDerive(spark: org.apache.spark.sql.SparkSession, table: String)
      (derive: => DataFrame): DataFrame = artifactLock.synchronized {
    if (!spark.catalog.tableExists(table)) {
      Graph.clearDeadWarehouseDir(spark, table)
      derive.write.mode("overwrite").format("parquet").saveAsTable(table)
    }
    spark.table(table)
  }

  /** Keyed upsert (MERGE): rows of `updates` replace same-keyed rows of
    * `base`; unmatched update rows insert. Both frames must share a schema;
    * `keys` are the merge columns. One left-anti shuffle join plus a union —
    * both sides hash-partition on the key, nothing driver-side, so the
    * shape is the same at 10⁶ or 10¹² rows.
    *
    * PRECONDITIONS the caller owns (checking them would force an eager job
    * on every lazy build): `updates` must carry at most ONE row per key —
    * duplicate-keyed update rows all land in the result (pre-aggregate the
    * change batch, e.g. keep the latest by version, before merging); and
    * key columns must be non-null — SQL null-equality means a null-keyed
    * base row is never anti-joined away, so a null-keyed update INSERTS
    * alongside it rather than replacing it.
    *
    * Idempotent for a fixed conforming change batch:
    * `upsert(upsert(b, u), u)` equals `upsert(b, u)` (the anti-join removes
    * exactly the keys the union re-adds).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base
      .join(updates.select(keys.map(org.apache.spark.sql.functions.col): _*),
        keys, "left_anti")
      .unionByName(updates)

  /** Small-file compaction — the datalake maintenance job that rewrites a
    * directory of too-many-small parquet files into ~`targetRowsPerFile`
    * files. Streaming ingest and over-parallel writers leave thousands of
    * KB-scale files per partition; at 100 TB that's metadata pressure on
    * the catalog and a task-per-file scan explosion, so periodic
    * compaction is a first-class production operator.
    *
    * Shape: ONE distributed read of the input directory, a
    * `repartition(ceil(n/target))` round-robin shuffle that balances rows
    * evenly across exactly the output file count (coalesce would skip the
    * shuffle but inherits the input's skew — a 10 GB file next to 10 KB
    * files defeats the point), and one write. Row count comes from parquet
    * FOOTER METADATA (a metadata-only count job — no column data read),
    * not a full scan. Content is bit-identical row-for-row: compaction
    * reorders files, never values.
    *
    * Returns the compacted-directory frame. File-count expectations are
    * asserted by ApiSpec; content preservation is the oracled gate
    * (`src_compaction`).
    */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetRowsPerFile: Long): DataFrame = {
    val in = spark.read.parquet(inDir)
    val n = in.count() // parquet metadata-only
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    in.repartition(files.toInt)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .parquet(outDir)
    spark.read.parquet(outDir)
  }
}
