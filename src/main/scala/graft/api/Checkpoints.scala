package graft.api

import org.apache.spark.sql.DataFrame

/** Shared per-round lineage truncation for the iterative solvers
  * ([[Dedup.connectedComponents]], [[Graph.pagerankUntil]],
  * [[Graph.kcoreUntil]]) — previously three identical private helpers, now
  * one with a DURABILITY knob (r12).
  *
  * An open-ended loop must truncate LOGICAL lineage every round (persist
  * alone caches data but re-analyzes the whole plan history, so driver
  * planning cost grows superlinearly with iterations). Two ways to cut it:
  *
  *  - `dir = None` (default): `localCheckpoint(eager)` — blocks live on
  *    executors, fastest, and the right default for local mode and for
  *    restartable jobs. THE TRADE: executor-LOCAL blocks are lineage
  *    roots with no recompute path, so on a real cluster losing one
  *    executor (preemption, OOM kill) fails the whole job — acceptable
  *    when the job simply reruns, fatal for a long convergence loop on
  *    spot instances.
  *  - `dir = Some(path)`: RELIABLE `checkpoint(eager)` into `path` (set as
  *    the context's checkpoint dir on first use) — rounds survive executor
  *    loss because every round's state is re-readable from the shared
  *    filesystem; each round pays a write+read of the (node-grain) state
  *    frame. Checkpoint FILES accumulate under `path` for the session
  *    lifetime unless `spark.cleaner.referenceTracking.cleanCheckpoints`
  *    is on — the caller owns the directory (standard Spark contract:
  *    point it at job-scoped scratch space and delete it with the job).
  *
  * Both paths return the SAME rows (ApiSpec pins reliable == local on the
  * CC solver) — durability is a physical knob, never a semantics knob.
  */
private[api] object Checkpoints {

  private var lastDir: Option[String] = None

  /** Eagerly checkpoint `df` (local or reliable per `dir`) and return the
    * truncated frame plus the handle for freeing the SUPERSEDED round:
    * for local checkpoints, the backing RDD (its blocks are freed with
    * `unpersist` — taken directly off the returned plan, never by diffing
    * `sparkContext.getPersistentRDDs`, which would misattribute RDDs
    * another thread persisted concurrently); for reliable checkpoints,
    * None (state lives in files, not in evictable blocks).
    */
  def tracked(df: DataFrame, dir: Option[String])
      : (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = dir match {
    case Some(path) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir mints a fresh UUID SUBDIR under the given path on
      // every call, so "already set?" cannot be read back off the context —
      // remember the last request instead (re-pointing per round would
      // scatter one loop's rounds over as many subdirs). The lock covers
      // the CHECKPOINT WRITE too, not just the dir switch: the context dir
      // is a single process-wide slot, so two concurrent loops with
      // DIFFERENT dirs could otherwise interleave set-then-write and land
      // one loop's round files under the other caller's directory — whose
      // owner may delete it mid-run per the "caller owns the directory"
      // contract. Serializing reliable-checkpoint writes is the price of
      // correctness here (they are per-ROUND, node-grain, and rare);
      // concurrent loops that want parallel checkpoint I/O must share one
      // checkpointDir.
      synchronized {
        if (!lastDir.contains(path) || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(path)
          lastDir = Some(path)
        }
        (df.checkpoint(true), None)
      }
    case None =>
      val out = df.localCheckpoint(true)
      val rdd = out.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
        case _ => None // unexpected plan shape: leak (bounded) over misfree
      }
      (out, rdd)
  }

  /** Frees a superseded round's local-checkpoint blocks (no-op for the
    * reliable path's None handle).
    */
  def free(r: Option[org.apache.spark.rdd.RDD[_]]): Unit =
    r.foreach(_.unpersist(blocking = false))
}
