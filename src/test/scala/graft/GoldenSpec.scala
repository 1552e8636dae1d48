package graft

/** Golden regression net: every declared query must build and execute on
  * sf0.001 without throwing (the driver's Verify would silently score a
  * throw as a missing key). Row-count expectations are loose on purpose —
  * exact values are the DuckDB oracle's job (tools/check.py).
  */
class GoldenSpec extends SparkSpec {

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name executes on sf0.001") {
      val n = q(name).count()
      assert(n > 0, s"$name returned 0 rows")
      // operators persist/checkpoint internally; don't let blocks pile up
      // across the ~100-query sweep
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }

  test("every oracleSql key has a matching queries key") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("registry names are unique") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
  }
}
