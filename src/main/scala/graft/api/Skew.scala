package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic skew-handling toolkit — the reusable form of the machinery the
  * gated keys use inline (`join_skew_salted`'s fixed salt grid, Dedup's
  * salted band pair-join): point it at ANY equi-join whose key distribution
  * is skewed and it detects the hot keys, salts ONLY those, and returns the
  * exact unsalted-join result with the hot keys' rows spread over `salts`
  * reducers instead of one.
  *
  * Production shape notes (100 TB):
  *  - [[hotKeys]] is one map-side-combinable count aggregate over the probe
  *    side's JOIN KEY only (column-pruned scan); its output is bounded by
  *    n/threshold keys, so the hot set always broadcasts. On a corpus where
  *    even that pass is unwelcome, pass `sample` < 1 and the detector runs
  *    over a seeded row sample with a proportionally scaled threshold —
  *    the join stays correct for ANY hot set
  *    (salting a cold key is wasted fan-out, missing a hot key is the
  *    status quo ante), which is what makes the detector's precision a
  *    performance knob rather than a correctness input.
  *  - only the RIGHT side's hot rows replicate (`salts`×); cold keys join
  *    on salt 0 exactly as before. With AQE's skew-join handling available
  *    this builder is the explicit/deterministic alternative for the cases
  *    AQE cannot see (skew materializing after an upstream transform, or a
  *    sort-merge join AQE declines to split).
  */
object Skew {

  /** Keys of `df.keyCol` whose row count exceeds `threshold` — one
    * column-pruned count aggregate, output ≤ count(df)/threshold rows.
    *
    * `sample` < 1.0 runs the detector over a seeded Bernoulli row sample
    * and scales the threshold by the same fraction (a key at the threshold
    * is expected to keep `threshold × sample` sampled rows), so the count
    * pass touches only `sample` of the corpus. Sampling trades detector
    * PRECISION, never join correctness: a key the sample misses simply
    * isn't salted (status quo ante), a cold key it over-detects is wasted
    * fan-out — the contract that makes the hot set a performance knob.
    * The seed is fixed so repeated plans (retry, AQE replan) detect the
    * same set.
    */
  def hotKeys(df: DataFrame, keyCol: String, threshold: Long,
      sample: Double = 1.0): DataFrame = {
    require(sample > 0.0 && sample <= 1.0,
      s"sample must be in (0, 1], got $sample")
    val (src, thr) =
      if (sample >= 1.0) (df, threshold)
      else (df.sample(withReplacement = false, sample, seed = 42L),
        math.max((threshold * sample).toLong, 1L))
    src.groupBy(keyCol).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > thr)
      .select(keyCol)
  }

  /** Inner equi-join `left ⋈ right ON key`, identical result to the plain
    * join, with keys hotter than `hotThreshold` (counted on `left`) spread
    * over `salts` reducers: hot left rows take a deterministic row-hash
    * salt, hot right rows replicate once per salt, cold rows on both sides
    * ride salt 0 untouched.
    *
    * `rowIdCols`: when the left side carries a STABLE row identity (a
    * primary key, an ingest offset — almost always true in a real
    * pipeline), name it here and the salt is `xxhash64(key, rowIdCols…)` —
    * fully DETERMINISTIC, so a fetch-failure partial recompute re-routes
    * every row to the same salt and the plan needs no indeterminate-stage
    * machinery. PREFER this path on a real cluster.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16, hotThreshold: Long = 100000L,
      detectSample: Double = 1.0, rowIdCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, s"saltedJoin requires salts > 0, got $salts")
    val hot = hotKeys(left, key, hotThreshold, detectSample)
      .withColumn("__hot", lit(true))
    // Without rowIdCols the salt hash mixes a PHYSICAL disambiguator
    // (monotonically_increasing_id: partition id << 33 | row index) into
    // the row-value hash: real logs carry fully duplicate rows, and a hot
    // key whose rows are value-identical would otherwise all hash to ONE
    // salt — re-concentrating on a single reducer, exactly the case
    // salting exists for. The salt only ROUTES rows (it is joined on and
    // dropped), so the RESULT is exactly the plain join either way — but
    // the physical input is RUN-VARYING: mid-stage fetch-failure recovery
    // then relies on Spark's indeterminate-stage rollback (the expression
    // is Catalyst-marked nondeterministic, so a lost shuffle partition
    // rolls the whole stage back rather than partially recomputing rows
    // onto different salts — SPARK-23207 machinery). Correct, but a full
    // stage retry where the deterministic path retries one task: pass
    // `rowIdCols` when a stable row id exists.
    val disambiguator =
      if (rowIdCols.nonEmpty) rowIdCols.map(col)
      else Seq(monotonically_increasing_id())
    val l = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull,
          pmod(xxhash64((if (rowIdCols.nonEmpty) Seq(col(key))
            else left.columns.map(col).toSeq) ++ disambiguator: _*),
            lit(salts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val r = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salts",
        when(col("__hot").isNotNull, sequence(lit(0L), lit(salts - 1L)))
          .otherwise(sequence(lit(0L), lit(0L))))
      .withColumn("__salt", explode(col("__salts")))
      .drop("__hot", "__salts")
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Inner equi-join `fact ⋈ dim`, identical result to the plain join,
    * with the fact side (the 100 TB side) pre-filtered by a Bloom filter
    * built over the dim keys BEFORE the join shuffle — the explicit,
    * deterministic form of Spark's runtime bloom filter (which only
    * injects under its own selectivity heuristics). When the dim is
    * selective but too large (or too late-derived) to broadcast-hash-join,
    * the bloom bit array still broadcasts at ~10 bits/key and drops the
    * overwhelming non-matching majority of fact rows at scan time, so the
    * join shuffle carries ~|matching rows| instead of |fact|.
    *
    * Bloom false positives are removed by the exact join that follows;
    * false negatives don't exist — the result is EXACTLY the plain join
    * (ApiSpec pins equality). Keys must be 64-bit integers (the probe is
    * the codegen'd [[graft.functions.BloomProbe]] over the serialized
    * filter — a few hashes on a long, fused into the scan-side codegen
    * span). Eager: building the filter runs one distinct-aggregate job
    * over the dim keys.
    */
  def bloomPrefilterJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey)).distinct()
    val expected = math.max(keys.count(), 1000L)
    val bf = keys.stat.bloomFilter(dimKey, expected, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bf.writeTo(bytes)
    graft.functions.VectorFunctions.register(fact.sparkSession)
    fact.filter(call_function("bloom_probe",
        lit(bytes.toByteArray), col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey))
  }
}
