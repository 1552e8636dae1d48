package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped lifecycle registry for the frames the api builders persist
  * internally.
  *
  * Builders like [[Dedup.minhashPairs]] persist interior frames (signature
  * tables, candidate sets) that the RETURNED lazy plan still references, so
  * the builder itself can never unpersist them — only the caller knows when
  * the composed result has been consumed. Every interior persist therefore
  * routes through [[cache]], and a library user frees all of it with one
  * [[sweep]] call once done:
  *
  * {{{
  *   val pairs = Dedup.minhashPairs(docs, "id", "text")
  *   pairs.write.parquet(out)          // consume the result
  *   Caches.sweep(spark)               // free every builder-cached block
  * }}}
  *
  * Harness surfaces (Verify/Bench/GoldenSpec) sweep between queries.
  * [[Dedup.connectedComponents]] manages its own localCheckpoint lifecycle
  * (only the blocks backing its RETURNED frame outlive the call — freeing
  * those would destroy the result, so they are deliberately not registered).
  */
object Caches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  // entries whose SparkContext has stopped can never be swept (unpersist
  // would throw) and would otherwise pin their analyzed plans for the JVM
  // lifetime — drop them on every registry mutation
  private def purgeStopped(): Unit =
    frames.filterInPlace(f => !f.sparkSession.sparkContext.isStopped)

  /** Persist `df` and register it for a later [[sweep]]. */
  private[api] def cache(df: DataFrame): DataFrame = synchronized {
    purgeStopped()
    val out = df.persist()
    frames += out
    out
  }

  /** Unpersist every builder-cached frame belonging to `spark`'s session.
    * Blocking, so `sparkContext.getPersistentRDDs` is clean on return;
    * idempotent (a second sweep, or one after a harness-side unpersist, is
    * a no-op). A TRANSIENT unpersist failure on a live session keeps the
    * entry registered (logged; the next sweep retries) — dropping the
    * handle would turn a recoverable error into a permanent block leak.
    * Entries of stopped sessions are dropped without unpersisting (their
    * blocks died with the context).
    */
  def sweep(spark: SparkSession): Unit = synchronized {
    frames.filterInPlace { f =>
      if (f.sparkSession ne spark) true
      else if (f.sparkSession.sparkContext.isStopped) false
      else {
        try { f.unpersist(blocking = true); false }
        catch {
          case e: Exception =>
            System.err.println(s"[graft.api.Caches] unpersist failed, keeping handle for retry: $e")
            true
        }
      }
    }
    purgeStopped()
  }
}
