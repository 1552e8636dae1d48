package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Queries run in sorted-name order (deterministic run order across rounds,
  * so positional effects like JIT/code-cache drift are comparable). Failures
  * are recorded as NEGATIVE seconds plus a "failed" list — a broken query
  * cannot masquerade as a fast one. Per-query stderr logs split planning vs
  * execution and track GC + JIT code-cache usage to make late-run JVM
  * degradation visible.
  */
object Bench {
  private def codeCacheMB: Double =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.contains("CodeHeap")).map(_.getUsage.getUsed / 1e6).sum
  private def gcMs: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 96 queries compile far more than the default 100 cached generated
      // classes; shared fragments (signature pipelines, fixture scans)
      // re-compile on eviction without a bigger Janino cache
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: absorb one-time JVM/Hadoop/codegen-infrastructure init
    // so it isn't billed to whichever query happens to run first
    spark.range(100000).selectExpr("count(DISTINCT id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val failed = mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val gc0 = gcMs
      val t0 = System.nanoTime()
      var buildSec = 0.0
      var planSec = 0.0
      val ok =
        try {
          val df = fn(spark, sfDir)
          // builders with eager setup (bucketed-table writes, iterative
          // checkpoints) spend real time here — report it separately so the
          // plan/exec split stays meaningful
          buildSec = (System.nanoTime() - t0) / 1e9
          df.queryExecution.executedPlan // force analyze+optimize+plan
          planSec = (System.nanoTime() - t0) / 1e9 - buildSec
          df.count()
          true
        } catch { case _: Throwable => failed += name; false }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop blocks persisted inside operators so queries stay independent
      // and cold (cache build-up also degrades later queries via GC
      // pressure); localCheckpoint blocks live in persistentRdds, not the
      // SQL cache manager, so clear those too
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.err.println(
        f"[bench] $name%-28s $sec%8.2f s  (build $buildSec%6.2f, plan $planSec%6.2f, gc +${(gcMs - gc0) / 1000.0}%5.2f s, codeCache $codeCacheMB%5.0f MB${if (ok) "" else ", FAILED"})")
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
