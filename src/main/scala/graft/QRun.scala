package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query, print timing and optionally the plan.
  * Usage: runMain graft.QRun <name> [sfDir] [explain]
  */
object QRun {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("QRUN_LOG", "WARN"))
    val tB = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    // eager builders (iterative checkpoints, k-means training, bucketed
    // writes) spend their time HERE — report it, like Bench does
    val buildSec = (System.nanoTime() - tB) / 1e9
    if (args.contains("explain")) df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    printf("[qrun] %s rows=%d build %.2f s, exec %.2f s%n", name, n, buildSec,
      (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
