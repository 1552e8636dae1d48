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

  /** Persist `df` and register it for a later [[sweep]]. */
  private[api] def cache(df: DataFrame): DataFrame = synchronized {
    val out = df.persist()
    frames += out
    out
  }

  /** Unpersist every builder-cached frame belonging to `spark`'s session.
    * Blocking, so `sparkContext.getPersistentRDDs` is clean on return;
    * idempotent (a second sweep, or one after a harness-side unpersist, is
    * a no-op).
    */
  def sweep(spark: SparkSession): Unit = synchronized {
    frames.filter(_.sparkSession eq spark).foreach(_.unpersist(blocking = true))
    frames.filterInPlace(_.sparkSession ne spark)
  }
}
