package graft

/** The library surface: parameterized operator builders over arbitrary
  * conforming DataFrames.
  *
  *  - [[api.Fts]] — transfer-monitoring analytics: success rates, time
  *    buckets, per-group top-k, resample+gap-fill, as-of enrichment.
  *  - [[api.Dedup]] — corpus deduplication: shingles/word-grams, MinHash +
  *    SimHash signatures, the salted band pair-join, exact n-gram Jaccard,
  *    exact dup-rank, O(log n) connected components.
  *  - [[api.Vectors]] — similarity search: normalization, brute-force
  *    cosine top-k, sign-LSH near-dup, unsupervised k-means codebooks, and
  *    the IVF cell-probe ANN path.
  *  - [[api.Text]] — text analysis: quality flags, TF-IDF, language ID,
  *    token counts, benchmark decontamination.
  *  - [[api.Tables]] — snapshot maintenance: keyed upsert (MERGE).
  *  - [[api.Caches]] — lifecycle control for the frames builders persist
  *    internally: call `Caches.sweep(spark)` once results are consumed.
  *
  * Conventions shared by every builder:
  *  - inputs are plain DataFrames plus column NAMES (no fixture coupling);
  *    outputs install fixed column names documented per module — a caller
  *    column with the same name is overwritten.
  *  - nothing collects the data side to the driver; candidate generation is
  *    equi-join-only (salted against hot keys); nothing broadcast grows
  *    with the corpus.
  *  - floating aggregates route through exact DECIMAL arithmetic where
  *    cross-run/cross-engine bit-stability matters (see `graft.ops.H`).
  *
  * Custom Catalyst surface backing the builders: `vec_dot`, `bits_hamming`,
  * `permute_hash` codegen expressions and the `minhash_agg`/`simhash_agg`
  * imperative aggregates — registered per-session by the builders, or via
  * `graft.functions.GraftExtensions` for `SparkSession.builder
  * .withExtensions`.
  */
package object api
