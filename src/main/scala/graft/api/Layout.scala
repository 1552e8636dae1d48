package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering, the
  * datalake trick that makes file-level min/max zone maps prune on TWO
  * predicates at once. A layout sorted on `x` alone answers `x = …`
  * scans with tight pruning but reads every file for `y = …`; interleaving
  * the bits of both keys into one sort value gives every file a small
  * BOUNDING BOX in (x, y) space, so either predicate (or both) skips most
  * files. At 100 TB the difference is reading 1/k of the files instead of
  * all of them for the non-leading dimension.
  */
object Layout {

  /** Morton z-value of two non-negative integer columns, `bits` bits each
    * (bit i of x lands at position 2i, bit i of y at 2i+1). Pure bitwise
    * column arithmetic — codegen'd, no UDF — and expressible verbatim in
    * any engine with `>>`/`&`/`<<` (the oracle mirrors it term by term).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    // shift in 64-bit space: JVM shifts mask the count by the OPERAND
    // width, so on an int column the y-term's shift amount 2i+1 wraps at
    // bits >= 16 and silently emits wrong z-values — the long cast makes
    // every shift a long shift (counts here max out at 61 < 64)
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB fragment mirroring [[zValue]] term by term (BIGINT casts
    * mirror the builder's 64-bit shift space).
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Write `df` z-clustered on the (already computed) `zCol` into `files`
    * range-partitioned, z-sorted parquet files, and return the read-back
    * frame. `repartitionByRange` gives each output file a contiguous
    * z-interval (disjoint zone maps); `sortWithinPartitions` makes row
    * groups within a file contiguous too, so parquet page/row-group stats
    * prune below file grain as well.
    */
  def zOrderWrite(spark: SparkSession, df: DataFrame, zCol: String,
      files: Int, outDir: String): DataFrame = {
    df.repartitionByRange(files, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }
}
