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

  /** Canonical fixture-dir tag every artifact name embeds — ONE definition
    * of the identity contract's dir component, so the read-or-derive
    * callers and the GC surface below cannot disagree about which tables
    * belong to which source directory.
    *
    * r15 (r14 ADVICE): the tag is HASH-QUALIFIED — sanitized dir + "_h" +
    * first 8 hex of SHA-256 over the RAW dir string. Sanitization alone
    * collapsed '/' and '_' to '_', so a dir whose sanitized form was a
    * suffix of another's ("/data/sf1" vs "data/sf1", or "/testdata/sf1"
    * vs "/root/testdata/sf1") scoped TOGETHER in [[listArtifacts]] /
    * [[dropArtifacts]]'s suffix match. The hash is injective on the raw
    * string, so two distinct dir strings can no longer share a tag
    * suffix; the sanitized prefix stays for human-readable catalog
    * listings. Callers must still pass the SAME canonical dir strings the
    * derivations used (the edgesOrDerive identity contract — "/x" and
    * "/x/" hash apart, deliberately: distinct strings, distinct artifact
    * families, worst case one redundant re-derivation, never wrong data).
    */
  def dirTag(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase + "_h" + h
  }

  /** Session-artifact name prefixes the engine derives through the
    * read-or-derive gates: `graft_*` ([[tableOrDerive]] /
    * [[Graph.edgesOrDerive]] callers — pair frames, graph edges/orientation,
    * trained side tables) and `graph_edges_*` (the bench-priced persist
    * key's full-rewrite table).
    */
  private val ArtifactPrefixes = Seq("graft_", "graph_edges_")

  /** Enumerates the session catalog's derived artifacts — every table whose
    * name carries an engine artifact prefix, optionally restricted to one
    * fixture directory's tag ([[dirTag]]). This is the admin view a
    * long-lived session uses to audit artifact growth: a PARAMETER change
    * derives a fresh table under a new parameter-embedding name (the
    * identity contract), so the superseded sibling stays in the catalog
    * until swept — enumerable here, dropped by [[dropArtifacts]]. Sorted
    * for stable output.
    */
  def listArtifacts(spark: org.apache.spark.sql.SparkSession,
      dir: Option[String] = None): Seq[String] =
    artifactLock.synchronized {
      val tagSuffix = dir.map(dirTag)
      spark.catalog.listTables().collect().toSeq
        .map(_.name)
        .filter(n => ArtifactPrefixes.exists(n.startsWith))
        // anchored at the artifact-family delimiter: the char before the
        // tag must be '_' (every derive site writes s"<family>_$tag"), on
        // top of the tag's own hash qualifier
        .filter(n => tagSuffix.forall(t => n.endsWith("_" + t)))
        .sorted
    }

  /** Drops every [[listArtifacts]] table (optionally dir-scoped) from the
    * session catalog AND storage, returning the dropped names — the GC half
    * of the artifact lifecycle: safe because every artifact is a derived
    * cache (the next consumer's read-or-derive gate re-derives on first
    * touch), so the only cost of an over-eager sweep is re-derivation.
    * Holds the artifact lock so a concurrent read-or-derive first-caller
    * cannot interleave with the drops.
    */
  def dropArtifacts(spark: org.apache.spark.sql.SparkSession,
      dir: Option[String] = None): Seq[String] =
    // both read-or-derive gates exist (Tables' own and Graph's); hold both
    // locks — always in this order, nothing acquires them Graph-first-then-
    // Tables — so no first-caller can interleave with the drops
    artifactLock.synchronized {
      Graph.withArtifactLock {
        val doomed = listArtifacts(spark, dir)
        doomed.foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
        doomed
      }
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
