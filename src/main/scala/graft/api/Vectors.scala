package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized similarity-search toolkit over any frame with an id column
  * and an embedding array column. Dot products run through the codegen'd
  * [[graft.functions.VecDot]] expression (`vec_dot`) — a tight primitive
  * loop, no per-element lambda dispatch.
  *
  * Scale design (100 TB):
  *  - the only broadcast sides are constant-size: a fixed query set
  *    ([[cosineTopK]]) or the centroid codebook ([[ivfProbe]]). Nothing
  *    broadcast grows with the corpus.
  *  - candidate generation for near-dup ([[signLshPairs]]) and ANN
  *    ([[ivfProbe]]) is blocked (LSH bands / IVF cells) and the block joins
  *    are salted so hot cells spread over `salt` reducers.
  *
  * Column-name contract: builders install fixed intermediate/output column
  * names (`vd`/`nrm` from [[normalized]]; `q_id`/`n_id`/`cos`/`rn` and
  * friends from the search builders); a caller column with the same name is
  * overwritten.
  */
object Vectors {

  /** Adds `vd` (double vector) and `nrm` (L2 norm) to a frame with an
    * embedding array column; keeps all other columns. Column-based
    * `transform` (not a spliced SQL string) so any column name works.
    */
  def normalized(emb: DataFrame, vecCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(emb.sparkSession)
    emb
      .withColumn("vd", transform(col(vecCol), x => x.cast("double")))
      .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
  }

  def cosine(aVec: String, aNorm: String, bVec: String, bNorm: String) =
    expr(s"vec_dot($aVec, $bVec)") / (col(aNorm) * col(bNorm))

  /** Brute-force cosine top-k of a constant-size query set against the full
    * index: queries broadcast, the index side never shuffles. Inputs are
    * [[normalized]] frames; `queries` may carry extra columns (kept).
    * Output: one row per (q_id, rank) with neighbor_id and cos.
    */
  def cosineTopK(index: DataFrame, queries: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val idx = index.select(col(idCol).as("n_id"), col("vd").as("n_vd"),
      col("nrm").as("n_nrm"))
    val q = queries.withColumnRenamed(idCol, "q_id")
      .withColumnRenamed("vd", "q_vd").withColumnRenamed("nrm", "q_nrm")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    idx.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine("q_vd", "q_nrm", "n_vd", "n_nrm"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Per-cell mean centroids — a deterministic stand-in for a k-means
    * codebook; the codebook is small by construction (one row per cell).
    * The per-position mean runs as an exact DECIMAL(28,10) sum divided by
    * the count, so the codebook is bit-identical regardless of partitioning
    * or engine (raw double sums are association-order-dependent).
    */
  def centroids(index: DataFrame, cellCol: String): DataFrame =
    index.select(col(cellCol).as("cell"), posexplode(col("vd")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double") / count(lit(1))).as("cx"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(pos, cx))), p -> p.cx)").as("cvd"))
      .withColumn("cnrm", expr("sqrt(vec_dot(cvd, cvd))"))

  // ------------------------------------------------------------- k-means

  private def collectCodebook(cb: DataFrame): Array[(Int, Seq[Double], Double)] = {
    val rows = cb.select(col("cell").cast("int"), col("cvd"), col("cnrm")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1)
    // a NaN/Infinity centroid component — a zero-norm vector in a seed, or
    // a degenerate cell mean — would silently poison every cosine it scores
    // (NaN wins/loses by Double.compare order, not geometry). Fail HERE
    // with the real cause instead.
    rows.foreach { case (cell, cvd, cnrm) =>
      require(cvd.forall(java.lang.Double.isFinite) && java.lang.Double.isFinite(cnrm),
        s"codebook cell $cell has a non-finite centroid component — " +
          "check the input for zero-norm or otherwise degenerate vectors")
    }
    rows
  }

  /** Nearest-cell assignment with the codebook compiled into the projection
    * as literals, fused into ONE codegen'd loop over a primitive `double[][]`
    * ([[graft.functions.ArgmaxCell]]: ties → lowest cell id, `Double.compare`
    * total order). A pure per-row map — no join, no shuffle, no k× row
    * blowup — the scale-correct shape for scoring a 100 TB corpus against a
    * small codebook (k rows of doubles always fit in a plan).
    *
    * The earlier `array_max(array(struct(acos, -cell)...))` formulation was
    * result-identical but ~1000× slower per row (per-row struct-array
    * materialization); graft.Stress flagged it at 60k×64×64.
    */
  private def assignCellsTo(nv: DataFrame,
      cb: Array[(Int, Seq[Double], Double)]): DataFrame = {
    // fail HERE with the actual mistake, not deep in analysis where
    // argmax_cell over an empty codebook produces an unresolvable plan
    require(cb.nonEmpty, "assignCells requires a non-empty codebook")
    graft.functions.VectorFunctions.register(nv.sparkSession)
    // ONE Literal node per codebook argument (typedLit through
    // call_function), NOT a spliced `array(array(…))` SQL string: parsing +
    // analyzing a k×dim-node literal expression text is O(k·dim)
    // single-threaded driver work PER PLAN, and was the dominant cost of
    // this path in the stress record once k scaled with the corpus (r5
    // kmeans_train 3.0→7.0→27.1 s at 1×/3×/9×). The generated code
    // references the arrays as JVM objects either way (addReferenceObj), so
    // this only deletes the parse/analyze tax — same expression, same
    // result, bit-for-bit (golden unchanged).
    val cells = typedLit(cb.map(_._2).toSeq)
    val cnrms = typedLit(cb.map(_._3).toSeq)
    val ids = typedLit(cb.map(_._1).toSeq)
    nv.withColumn("cell",
      call_function("argmax_cell", col("vd"), col("nrm"), cells, cnrms, ids))
  }

  /** Adds a `cell` column: the id of the nearest `codebook` centroid by
    * cosine (tie → lowest cell). `nv` is a [[normalized]] frame;
    * `codebook` has (cell, cvd, cnrm) rows, e.g. from [[kmeansCodebook]].
    */
  def assignCells(nv: DataFrame, codebook: DataFrame): DataFrame =
    assignCellsTo(nv, collectCodebook(codebook))

  /** [[assignCells]] for codebooks too large to ship inside the task binary
    * as plan literals (the literal path holds to k ~ tens of thousands —
    * beyond that the k×dim reference arrays serialize with every task).
    * The codebook BROADCASTS instead: each row
    * scores all cells through the broadcast join, a map-side partial
    * `min_by` collapses the n×k scored rows back to one winner per row
    * before anything shuffles, and the assignment joins back onto `nv` by
    * `idCol`. Same argmax semantics as [[assignCells]] — ties to the
    * lowest cell id — for normal finite cosines. Two measure-zero cases
    * diverge from `Double.compare`'s total order: a NaN cosine loses here
    * but wins there ([[kmeansCodebook]] rejects the degenerate vectors
    * that could produce one), and a winning ±0.0 pair ties here (Spark's
    * ordering treats -0.0 == +0.0, so the cell-id tiebreak decides) where
    * `Double.compare` ranks +0.0 above -0.0.
    *
    * Cost shape vs [[assignCells]]: one broadcast (k×dim doubles), n×k
    * scored rows map-side (never shuffled), one n-row shuffle for the
    * reattach join — the right trade exactly when k no longer fits a plan.
    */
  def assignCellsJoin(nv: DataFrame, codebook: DataFrame,
      idCol: String): DataFrame = {
    graft.functions.VectorFunctions.register(nv.sparkSession)
    val scored = nv.select(col(idCol), col("vd"), col("nrm"))
      .crossJoin(broadcast(codebook.select(col("cell"), col("cvd"), col("cnrm"))))
      .withColumn("acos", cosine("vd", "nrm", "cvd", "cnrm"))
    val assign = scored.groupBy(idCol)
      .agg(min_by(col("cell"), struct((-col("acos")).as("na"), col("cell"))).as("cell"))
    nv.join(assign, idCol)
  }

  /** Deterministic distributed k-means codebook over a [[normalized]] frame
    * — unsupervised cell training for the IVF/ANN path (real embedding
    * corpora carry no labels). Output: (cell, cvd, cnrm), k rows.
    *
    *  - init: the k rows with the smallest `md5(id || ':' || seedTag)` —
    *    engine-portable hash seeding (no RNG state), one TakeOrdered.
    *  - assign: [[assignCells]] — literal-codebook codegen projection, the
    *    only full-corpus work per iteration, shuffle-free — while the
    *    codebook fits a task binary (`literalMaxK`, default 32768 ≈ 17 MB of
    *    centroid doubles at dim 64); above it, the [[assignCellsJoin]]
    *    broadcast path, whose shipped state is a real broadcast instead of a
    *    plan literal. SemDeDup's own scale contract (k = n/128) guarantees
    *    large k at corpus scale, so the training loop must not silently hold
    *    onto a plan that ships the codebook with every task. The two paths
    *    agree except in two measure-zero tie cases documented on
    *    [[assignCellsJoin]], none reachable from the finite codebooks
    *    [[collectCodebook]] enforces. (Measured at n=180k/k=1406/dim=64,
    *    local[32]: literal 5.6 s, join 8.4 s for iters=2 — the literal path
    *    stopped being the superlinear stage when [[assignCellsTo]] switched
    *    from SQL-string splicing to typedLit literals, r6.)
    *  - update: per-cell DECIMAL(28,10)-exact per-position means (the
    *    [[centroids]] discipline) — bit-identical regardless of
    *    partitioning; empty cells keep their previous centroid.
    *  - a FIXED iteration count, so the job graph and the result are fully
    *    deterministic (no convergence wobble between runs or engines).
    *
    * Each iteration collects only the k×dim codebook to the driver (tiny by
    * construction); the corpus itself never moves.
    */
  def kmeansCodebook(nv: DataFrame, idCol: String, k: Int, iters: Int = 2,
      seedTag: String = "cb", literalMaxK: Int = 32768,
      memoKey: Option[String] = None): DataFrame = {
    require(k > 0, s"kmeansCodebook requires k > 0, got $k")
    val spark = nv.sparkSession
    import spark.implicits._
    // TRAINED-MODEL MEMO (r12): training is deterministic (hash seeding,
    // DECIMAL-exact means, fixed iterations), so for a given (input
    // identity, k, iters, seedTag) the codebook is a pure value — callers
    // that train repeatedly over an IMMUTABLE corpus (the ANN keys re-train
    // per bench sample; a production scorer re-trains per job submission)
    // pass a `memoKey` naming that input and the collected k×dim codebook
    // is reused for the JVM lifetime instead of re-paying iters+1 corpus
    // passes. Same identity contract as [[graft.api.Graph.edgesOrDerive]]:
    // the key must uniquely name the input data (embed the source path);
    // the memo cannot detect a mutated corpus behind an old key. Default
    // None trains unconditionally (planted-data tests, ad-hoc frames).
    val mk = memoKey.map(m => s"$m|$idCol|k=$k|it=$iters|$seedTag|$literalMaxK")
    mk.flatMap(x => Option(codebookMemo.get(x))) match {
      case Some(cb) => return cb.toSeq.toDF("cell", "cvd", "cnrm")
      case None => ()
    }
    val seeds = nv
      .withColumn("hk", md5(concat(col(idCol).cast("string"), lit(":" + seedTag))))
      .orderBy("hk").limit(k)
      .withColumn("cell", row_number().over(Window.orderBy("hk")) - 1)
      .select(col("cell"), col("vd").as("cvd"), col("nrm").as("cnrm"))
    var cb = collectCodebook(seeds)
    // fewer rows than k → fewer seeds; empty corpora cannot train at all
    require(cb.nonEmpty,
      "kmeansCodebook requires a non-empty input frame (0 seed rows found)")
    for (_ <- 1 to iters) {
      val assigned =
        if (cb.length <= literalMaxK) assignCellsTo(nv, cb).select(col("cell"), col("vd"))
        else assignCellsJoin(nv, cb.toSeq.toDF("cell", "cvd", "cnrm"), idCol)
          .select(col("cell"), col("vd"))
      val updMap = collectCodebook(centroids(assigned, "cell"))
        .map(c => c._1 -> c).toMap
      cb = cb.map(c => updMap.getOrElse(c._1, c))
    }
    mk.foreach(x => codebookMemo.put(x, cb))
    cb.toSeq.toDF("cell", "cvd", "cnrm")
  }

  /** JVM-lifetime store behind [[kmeansCodebook]]'s `memoKey` — holds only
    * collected k×dim codebooks (driver-side doubles, tiny by the literal-
    * path contract), never corpus data. [[clearCodebookMemo]] for tests.
    */
  private val codebookMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      Array[(Int, Seq[Double], Double)]]()

  /** Drops every memoized codebook — for tests and for callers that know
    * the corpus behind their memo keys changed in place.
    */
  def clearCodebookMemo(): Unit = codebookMemo.clear()

  /** Production-width product-quantization encoder — the ONE-PASS form of
    * the m-joined-frames seam llm_ann_pq_recall documents: trains `m`
    * independent hash-seeded sub-codebooks ([[kmeansCodebook]] per
    * contiguous dim/m slice, seedTag `"<seedPrefix><i>"` — the exact
    * seeding of the gated key, so ApiSpec can pin bit-equality with the
    * joined form), then encodes the WHOLE corpus in ONE projection: `m`
    * literal-codebook `argmax_cell` columns chained in a single select,
    * each slicing its subspace and scoring it inside the same codegen
    * stage. No id-keyed rejoin per subspace, no m× corpus scan — at
    * m = 8..64 (the production widths) the joined form pays m−1 narrow
    * shuffles this shape never issues.
    *
    * Output: (idCol, code0..code{m−1}) — int cell ids, i.e. the PQ code
    * word; reconstruction/ADC scoring stays with the caller (the gated
    * key shows the concat-centroids read).
    *
    * Scale: training collects only m codebooks of k×(dim/m) doubles;
    * encoding is a pure per-row map (shuffle-free; PlanSpec pins zero
    * exchanges). Codebook size bounds follow [[kmeansCodebook]]'s
    * literal-path contract (k ≤ literalMaxK per subspace).
    */
  def pqCodes(nv: DataFrame, idCol: String, m: Int, k: Int = 8,
      iters: Int = 2, seedPrefix: String = "pq"): DataFrame = {
    require(m > 0, s"pqCodes requires m > 0, got $m")
    graft.functions.VectorFunctions.register(nv.sparkSession)
    // 1-row dim probe (the bounded-probe discipline): fail on a
    // non-divisible width HERE, not as a wrong-length slice mid-encode
    val dim = nv.select(size(col("vd")).as("d")).head().getInt(0)
    require(dim % m == 0, s"pqCodes: dim $dim is not divisible by m = $m")
    val sub = dim / m
    val cbs = (0 until m).map { i =>
      val subF = nv
        .select(col(idCol), slice(col("vd"), i * sub + 1, sub).as("vd"))
        .withColumn("nrm", expr("sqrt(vec_dot(vd, vd))"))
      collectCodebook(kmeansCodebook(subF, idCol, k, iters, s"$seedPrefix$i"))
    }
    val codeCols = (0 until m).map { i =>
      val cb = cbs(i)
      val sv = slice(col("vd"), i * sub + 1, sub)
      call_function("argmax_cell", sv,
        sqrt(call_function("vec_dot", sv, sv)),
        typedLit(cb.map(_._2).toSeq), typedLit(cb.map(_._3).toSeq),
        typedLit(cb.map(_._1).toSeq)).as(s"code$i")
    }
    nv.select(col(idCol) +: codeCols: _*)
  }

  /** IVF-style ANN probe: rank cells per query against the broadcast
    * centroid codebook, probe the top `probes` cells, exact-rank inside them.
    * The query→index join is a salted shuffle equi-join on (cell, salt) —
    * no broadcast that scales with the corpus, and a hot cell spreads over
    * `salt` reducers (index rows take a deterministic id-hash salt, query
    * rows replicate `salt` ways).
    *
    * `index`: [[normalized]] frame with (idCol, cellCol, vd, nrm).
    * `queries`: [[normalized]] frame with (idCol, vd, nrm) + extra columns,
    * which are all kept on the output rows.
    * Output: per (q_id, rank<=k): n_id, n_cell, cos + query extras.
    *
    * This overload derives the codebook as the per-cell means of the index
    * (right for pre-clustered/bucketed corpora); pair [[kmeansCodebook]] +
    * [[assignCells]] + [[ivfProbeWith]] for unlabeled corpora.
    */
  def ivfProbe(index: DataFrame, queries: DataFrame, idCol: String,
      cellCol: String, k: Int = 5, probes: Int = 2, salt: Int = 8): DataFrame =
    ivfProbeWith(index, centroids(index, cellCol), queries, idCol, cellCol,
      k, probes, salt)

  /** [[ivfProbe]] with an explicit (cell, cvd, cnrm) codebook — e.g. a
    * [[kmeansCodebook]] — instead of one derived from the index's cells.
    */
  def ivfProbeWith(index: DataFrame, codebook: DataFrame, queries: DataFrame,
      idCol: String, cellCol: String, k: Int = 5, probes: Int = 2,
      salt: Int = 8): DataFrame = {
    val cent = codebook
    val q = queries.withColumnRenamed(idCol, "q_id")
      .withColumnRenamed("vd", "q_vd").withColumnRenamed("nrm", "q_nrm")
    val wC = Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell").asc)
    val qCells = q.crossJoin(broadcast(cent))
      .withColumn("ccos", cosine("q_vd", "q_nrm", "cvd", "cnrm"))
      .withColumn("cr", row_number().over(wC))
      .filter(col("cr") <= probes)
      .drop("cvd", "cnrm", "ccos", "cr")
      .withColumn("q_salt", explode(sequence(lit(0), lit(salt - 1))))
    val idx = index.select(col(idCol).as("n_id"), col(cellCol).as("n_cell"),
        col("vd").as("n_vd"), col("nrm").as("n_nrm"))
      .withColumn("i_salt", pmod(xxhash64(col("n_id")), lit(salt.toLong)).cast("int"))
    // two-stage top-k: pre-rank per (q_id, salt) block and keep k, so the
    // final per-query window sees at most salt×k rows per query — without
    // the pre-rank, every candidate the salted join just spread over `salt`
    // reducers re-concentrates in ONE reducer for the global rank. A block's
    // non-top-k row can never be in the global top-k, and both stages break
    // ties identically (cos desc, n_id asc), so the result is unchanged.
    val wPre = Window.partitionBy("q_id", "q_salt")
      .orderBy(col("cos").desc, col("n_id").asc)
    val wK = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    idx.join(qCells,
        col("n_cell") === col("cell") && col("i_salt") === col("q_salt") &&
          col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine("q_vd", "q_nrm", "n_vd", "n_nrm"))
      .withColumn("prn", row_number().over(wPre))
      .filter(col("prn") <= k)
      .withColumn("rn", row_number().over(wK))
      .filter(col("rn") <= k)
      .drop("prn", "cell", "q_salt", "i_salt", "q_vd", "q_nrm", "n_vd", "n_nrm")
  }

  // ------------------------------------------------- persisted IVF index

  /** Trains an IVF index over a [[normalized]] corpus and WRITES it as a
    * parquet layout — the production shape the in-query training keys
    * deliberately avoid: train ONCE, persist the artifacts, and let every
    * subsequent query pay only the probe. Layout under `dir`:
    *
    *  - `codebook/` — (cell, cvd, cnrm), k rows, the [[kmeansCodebook]]
    *    output verbatim;
    *  - `index/` — the corpus with its assigned `cell`, written
    *    `partitionBy("cell")` with deterministic within-cell order, so a
    *    probe that reads a cell subset touches only those directories
    *    (partition pruning) and a 100 TB corpus is never rewritten to
    *    answer a query.
    *
    * The write is `mode("overwrite")` on both artifacts: retraining
    * replaces the index atomically per path, never merges stale cells into
    * a fresh codebook. Training cost and determinism follow
    * [[kmeansCodebook]] (hash-seeded init, DECIMAL-exact means, fixed
    * iterations) — the stored index is bit-identical across runs, which is
    * what lets [[probeIndex]] be oracled against the in-memory probe.
    *
    * `nv`: a [[normalized]] frame with (idCol, vd, nrm).
    */
  def writeIndex(nv: DataFrame, idCol: String, dir: String, k: Int,
      iters: Int = 2, seedTag: String = "cb"): Unit = {
    val cb = kmeansCodebook(nv, idCol, k, iters, seedTag)
    cb.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    assignCells(nv, cb)
      .select(col(idCol), col("cell"), col("vd"), col("nrm"))
      .repartition(col("cell")).sortWithinPartitions(idCol)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/index")
  }

  /** Appends a new vector batch to a [[writeIndex]] layout using the
    * FROZEN stored codebook — the daily-delta maintenance shape: cell
    * assignment is the same literal-codebook codegen projection training
    * used, but NO retraining happens, so existing rows keep their cells
    * and the append is a pure write into the matching `cell=` partition
    * directories (`mode("append")` — new files land beside the old ones,
    * nothing is rewritten). Probe results over the appended index equal a
    * from-scratch assignment of the union under the same codebook
    * (ApiSpec pins it); when drift accumulates enough that frozen cells
    * stop fitting the data, that is a [[writeIndex]] retrain, not an
    * append.
    */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      nv: DataFrame, idCol: String): Unit = {
    val cb = spark.read.parquet(s"$dir/codebook")
    assignCells(nv, cb)
      .select(col(idCol), col("cell"), col("vd"), col("nrm"))
      .repartition(col("cell")).sortWithinPartitions(idCol)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/index")
  }

  /** Compacts a [[writeIndex]]+[[appendToIndex]] layout's accumulated
    * small files — the missing third of the index lifecycle (train →
    * append deltas → COMPACT): every [[appendToIndex]] batch lands new
    * files beside the old ones in each touched `cell=` directory, and
    * after ~100 daily appends the probe-side scan pays file-open overhead
    * per cell instead of one sequential read. This is
    * [[graft.api.Tables.compactFiles]]'s bin-packing discipline applied
    * WITHIN the partitioned layout: one shuffle keyed on `cell`
    * re-gathers each cell's rows, `maxRecordsPerFile` splits only cells
    * over the target, and the rewrite restores [[writeIndex]]'s
    * deterministic within-cell order. The CODEBOOK is untouched — cell
    * assignments are frozen, so compaction is a pure physical rewrite:
    * [[probeIndex]] results before and after are identical (ApiSpec pins
    * read-back probe equality; the `ann_index` stress path counts files
    * per cell before/after N appends).
    *
    * The swap is CRASH-SAFE but not reader-atomic (r12 hardening — the
    * previous delete-then-rename had a window where a crash left NO full
    * index on disk): write the compacted copy to `index_compact_tmp`,
    * rename the live index aside to `index_old`, rename tmp into place,
    * then drop `index_old` — every intermediate state keeps at least one
    * complete index copy, so recovery after a crash is "rename whichever
    * full copy survives back to `index`" rather than data loss. Concurrent
    * READERS can still observe the rename gap — run compaction in the
    * maintenance window that owns the index, the same contract as
    * [[writeIndex]]'s overwrite retrain.
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, targetRowsPerFile: Long = 1L << 20): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val indexPath = new org.apache.hadoop.fs.Path(s"$dir/index")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$dir/index_compact_tmp")
    val oldPath = new org.apache.hadoop.fs.Path(s"$dir/index_old")
    val fs = indexPath.getFileSystem(hconf)
    // leftover of a run that crashed AFTER writing tmp but BEFORE the
    // rename chain: the live index is intact (renames never started), so
    // the stale tmp is safe to clear — mirrored by the oldPath handling
    // below, and belt-and-braces with the overwrite mode on the write
    if (fs.exists(tmpPath)) require(fs.delete(tmpPath, true),
      s"compactIndex could not clear a stale $tmpPath")
    spark.read.parquet(indexPath.toString)
      .repartition(col("cell"))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy("cell")
      .parquet(tmpPath.toString)
    // leftover of a previous crashed compaction: the live index is intact
    // (the rename chain below never ran to completion), so the stale
    // holdover is safe to clear before taking its name
    if (fs.exists(oldPath)) require(fs.delete(oldPath, true),
      s"compactIndex could not clear a stale $oldPath")
    require(fs.rename(indexPath, oldPath),
      s"compactIndex could not set aside the live index as $oldPath")
    require(fs.rename(tmpPath, indexPath),
      s"compactIndex could not move the compacted index into $indexPath" +
        s" — recover by renaming $oldPath back to $indexPath")
    require(fs.delete(oldPath, true),
      s"compactIndex swapped successfully but could not drop $oldPath")
  }

  /** Whether a [[writeIndex]] layout has accumulated enough append files
    * to be worth a [[compactIndex]] pass — the maintenance-policy probe a
    * scheduler calls before paying the rewrite: true when ANY `cell=`
    * directory holds more than `maxFilesPerCell` data files. Pure
    * file-listing (no data read), so it is safe to poll every append.
    */
  def needsCompaction(spark: org.apache.spark.sql.SparkSession,
      dir: String, maxFilesPerCell: Int = 8): Boolean =
    indexFilesPerCell(spark, dir).values.exists(_ > maxFilesPerCell)

  /** Parquet data files per `cell=` partition directory of a
    * [[writeIndex]] layout — the compaction observable ([[compactIndex]]
    * scaladoc): appends grow these counts, compaction collapses them.
    */
  def indexFilesPerCell(spark: org.apache.spark.sql.SparkSession,
      dir: String): Map[Int, Int] = {
    val indexPath = new org.apache.hadoop.fs.Path(s"$dir/index")
    val fs = indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(indexPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map { cellDir =>
        val cell = cellDir.getPath.getName.stripPrefix("cell=").toInt
        val n = fs.listStatus(cellDir.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        cell -> n
      }.toMap
  }

  /** Probes a [[writeIndex]] layout: reads the stored codebook + index and
    * runs the exact [[ivfProbeWith]] plan against them — read-back equals
    * the direct in-memory probe (the `llm_shard_write` physical-round-trip
    * discipline applied to ANN). The query set never touches the training
    * path; at scale this is the hot loop — a constant-size codebook scan
    * plus a CELL-SELECTIVE index read: the union of probed cells is
    * computed first (one bounded job — DISTINCT probed cells never exceeds
    * the k codebook rows, however many queries arrive) and pushed as an
    * `isin` partition filter, so the scan lists only the probed `cell=`
    * directories and a 100 TB index pays only its matching cells
    * (PlanSpec pins the partition filter on the scan). The salted
    * equi-join shape above the scan is unchanged from the in-memory
    * probe, and the cell filter removes exactly rows the cell equi-join
    * would drop — the result is identical (ApiSpec pins it).
    *
    * Eager: ranking probed cells runs one queries x codebook job up
    * front — the price of partition pruning, bounded by the query set.
    */
  def probeIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, k: Int = 5, probes: Int = 2,
      salt: Int = 8): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val cb = spark.read.parquet(s"$dir/codebook")
    val wC = Window.partitionBy("q_id")
      .orderBy(col("ccos").desc, col("cell").asc)
    val probedCells = queries.select(col(idCol).as("q_id"),
        col("vd").as("q_vd"), col("nrm").as("q_nrm"))
      .crossJoin(broadcast(cb))
      .withColumn("ccos", cosine("q_vd", "q_nrm", "cvd", "cnrm"))
      .withColumn("cr", row_number().over(wC))
      .filter(col("cr") <= probes)
      .select("cell").distinct().collect().map(_.getInt(0))
    // partition-column read-back: `cell` returns as the inferred partition
    // type (int for our int cell ids) — select it back into the column
    // order ivfProbeWith documents
    val idx = spark.read.parquet(s"$dir/index")
      .filter(col("cell").isin(probedCells.toSeq: _*))
      .select(col(idCol), col("cell"), col("vd"), col("nrm"))
    ivfProbeWith(idx, cb, queries, idCol, "cell", k, probes, salt)
  }

  /** Johnson–Lindenstrauss random projection: each vector lands on `k`
    * seeded Gaussian directions scaled by `1/sqrt(k)`, so squared norms
    * (and hence pairwise distances) are preserved in expectation with
    * relative distortion O(1/sqrt(k)) — the classic dimensionality step
    * that brings a wide embedding under downstream bounds (e.g.
    * [[signLshPairs]]'s 4096 literal-plane cap) before any LSH/ANN work.
    *
    * Scale shape: the direction matrix is a (k × planeDim) deterministic
    * literal compiled into the plan ([[lshPlanes]] — same public family
    * sign-LSH uses, so an oracle splices identical constants), and each
    * output coordinate is one codegen'd `vec_dot` over the row — NO
    * shuffle, NO join, NO explode; the operator is a pure projection that
    * scans the corpus once and is embarrassingly parallel at any width.
    *
    * `planeDim` must be >= the data's dimension for a full-vector
    * projection (`vec_dot` truncates to the shorter array: a narrower
    * plane would silently project a prefix — same contract documented on
    * [[signLshPairs]], which probes the dim at runtime; here the caller
    * states it, keeping the builder lazy/action-free).
    *
    * Output: the input id as `id`, `p0..p{k-1}` projected coordinates,
    * `pvd` (the projected vector, for chaining into [[normalized]]-style
    * consumers), and `pnorm2`/`norm2` (projected/original squared norms —
    * their ratio is the per-vector JL distortion).
    */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, planeDim: Int = 256, seed: Long = 42L): DataFrame = {
    require(k > 0, s"target dimension k must be positive, got $k")
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val planes = lshPlanes(k, planeDim, seed)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val base = emb
      .withColumn("vd", transform(col(vecCol), x => x.cast("double")))
    val projCols = planes.zipWithIndex.map { case (p, j) =>
      val planeSql = p.mkString("array(", "D, ", "D)")
      (expr(s"vec_dot(vd, $planeSql)") * lit(scale)).as(s"p$j")
    }
    base
      .select(col(idCol).as("id") +: expr("vec_dot(vd, vd)").as("norm2") +:
        projCols.toIndexedSeq: _*)
      .withColumn("pvd", array((0 until k).map(j => col(s"p$j")): _*))
      .withColumn("pnorm2", expr("vec_dot(pvd, pvd)"))
  }

  /** The fixed Gaussian hyperplane family sign-LSH projects onto —
    * deterministic for a given (numPlanes, planeDim, seed), and PUBLIC so an
    * oracle can splice the identical constants into its own SQL: every
    * stage of [[signLshPairs]] downstream of these planes is plain
    * arithmetic both engines reproduce bit-for-bit.
    */
  def lshPlanes(numPlanes: Int, planeDim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, planeDim)(rnd.nextGaussian())
  }

  /** Embedding near-dup via sign-LSH: `numPlanes` fixed Gaussian hyperplanes
    * (seeded — deterministic literals compiled into the plan), grouped into
    * bands of `bandBits` bits for candidate blocking through the salted
    * band pair-join, then an exact cosine >= `threshold` verify on
    * candidates only. Output: (a_id, b_id, cos). Interior frames persist via
    * [[Caches]] — call `Caches.sweep(spark)` when done.
    *
    * The projections are `vec_dot(vd, <literal plane>)` columns — one
    * codegen'd primitive loop per plane, no explode/join/re-aggregate of the
    * vector elements. Band signatures are the band's bits PACKED into an
    * integer (bit 0 highest) rather than hashed: candidate blocking only
    * needs injectivity on the band's bit tuple, and the packed form is
    * reproducible in any engine — which is what lets the embed near-dup
    * query run fully under the DuckDB oracle (r1–r4 hashed the bits with
    * xxhash64: identical candidate sets, but engine-private).
    */
  def signLshPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 16, bandBits: Int = 4,
      minPlaneDim: Int = 256, seed: Long = 42L, salt: Int = 16): DataFrame = {
    // numBands = numPlanes / bandBits truncates: a non-divisor bandBits
    // would silently drop the trailing planes from every band
    require(numPlanes > 0 && bandBits > 0 && numPlanes % bandBits == 0,
      s"numPlanes ($numPlanes) must be a positive multiple of bandBits ($bandBits)")
    // plane length = max(actual embedding dimension, minPlaneDim): vec_dot
    // truncates to the SHORTER array, so planes shorter than the data would
    // silently project onto a prefix of the embedding and degrade LSH
    // quality with no error. The probe aggregates max(size) over the CACHED
    // normalized frame — populating the cache the signature/verify stages
    // reuse, so the input is scanned once total — because probing one
    // arbitrary row would miss longer vectors in a mixed-dimension corpus
    // (and max() skips null vectors instead of NPEing on them).
    val nv = Caches.cache(
      normalized(emb, vecCol).select(col(idCol).as("id"), col("vd"), col("nrm")))
    val dim = nv.agg(coalesce(max(size(col("vd"))), lit(0))).head().getInt(0)
    val planeDim = math.max(dim, minPlaneDim)
    require(planeDim <= 4096,
      s"embedding dimension $dim exceeds the 4096 literal-plane bound; " +
        "project the vectors down before LSH")
    val planes = lshPlanes(numPlanes, planeDim, seed)
    val bitCols = (0 until numPlanes).map { j =>
      val planeSql = planes(j).mkString("array(", "D, ", "D)")
      when(expr(s"vec_dot(vd, $planeSql)") >= 0, 1).otherwise(0).as(s"bit$j")
    }
    val numBands = numPlanes / bandBits
    val sigBits = nv.select(col("id") +: bitCols: _*)
    val bands = (0 until numBands).map(b =>
      (0 until bandBits).map(i =>
          col(s"bit${b * bandBits + i}") * lit(1 << (bandBits - 1 - i)))
        .reduce(_ + _).as(s"band$b"))
    val sig = sigBits.select(col("id"), posexplode(array(bands: _*)).as(Seq("band", "bsig")))
    Dedup.saltedBandPairs(sig, salt)
      .join(nv.select(col("id").as("a_id"), col("vd").as("a_vd"),
        col("nrm").as("a_nrm")), "a_id")
      .join(nv.select(col("id").as("b_id"), col("vd").as("b_vd"),
        col("nrm").as("b_nrm")), "b_id")
      .select(col("a_id"), col("b_id"), {
        // signed-zero collapse (ops.H.r4z discipline) so the emitted cos
        // stays hash-stable for any threshold, including ones that admit
        // near-zero cosines
        val r = round(cosine("a_vd", "a_nrm", "b_vd", "b_nrm"), 4)
        when(r === 0.0, lit(0.0)).otherwise(r).as("cos")
      })
      .filter(col("cos") >= threshold)
  }
}
