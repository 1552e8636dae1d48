package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 sort/limit/top-k and §2.7 set operations. */
object SortSet {

  private val sortMulticol = Q(
    "sort_multicol",
    (s, d) => T.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
        col("o_orderkey").asc),
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC"""))

  private val sortNullsOrder = Q(
    "sort_nulls_order",
    (s, d) => T.orders(s, d)
      .select(col("o_orderkey"), expr("nullif(o_orderstatus, 'O')").as("st"))
      .orderBy(col("st").asc_nulls_last, col("o_orderkey").asc),
    Some("""SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st FROM orders
ORDER BY st ASC NULLS LAST, o_orderkey ASC"""))

  /** orderBy + limit → TakeOrderedAndProjectExec (two-stage top-k: per-
    * partition limit before the global merge — the 100 TB-safe top-k).
    */
  private val limitTopk = Q(
    "limit_topk",
    (s, d) => T.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  private val setUnionAll = Q(
    "set_union_all",
    (s, d) => T.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .unionByName(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("""SELECT nationkey FROM (
SELECT c_nationkey AS nationkey FROM customer
UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
ORDER BY nationkey"""))

  private val setUnionDistinct = Q(
    "set_union_distinct",
    (s, d) => T.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .union(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
UNION SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey"""))

  private val setIntersect = Q(
    "set_intersect",
    (s, d) => T.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
INTERSECT SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey"""))

  private val setExcept = Q(
    "set_except",
    (s, d) => T.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .except(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
EXCEPT SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey"""))

  /** Symmetric difference with side attribution (§2.7 ext, r13) — the
    * two-way snapshot-drift readout [[setExcept]] gives only one direction
    * of: keys present in exactly ONE of the two relations, each tagged
    * with the side it came from (the "what changed between these two
    * feeds" diff both directions at once). Composed from the same
    * set-semantics EXCEPT primitive run both ways + a tagged union — set
    * algebra, not a row-diff (src_row_hash_diff covers value drift at
    * row grain).
    *
    * Scale shape: two hash-distinct anti-join shuffles on the key (AQE
    * can reuse the exchange across the mirrored pair) + a union; nothing
    * driver-side.
    */
  private val setSymmetricDiff = Q(
    "set_symmetric_diff",
    (s, d) => {
      val c = T.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val p = T.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      c.except(p).withColumn("side", lit("customer_only"))
        .unionByName(p.except(c).withColumn("side", lit("supplier_only")))
        .orderBy("nationkey", "side")
    },
    Some("""WITH co AS (SELECT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT s_nationkey FROM supplier),
so AS (SELECT s_nationkey AS nationkey FROM supplier
  EXCEPT SELECT c_nationkey FROM customer)
SELECT nationkey, 'customer_only' AS side FROM co
UNION ALL SELECT nationkey, 'supplier_only' AS side FROM so
ORDER BY nationkey, side"""))

  /** Schema-evolution union: a newer partition carries an extra column; the
    * old rows surface it as NULL (`unionByName(allowMissingColumns)`) — the
    * datalake schema-drift case.
    */
  private val setUnionEvolve = Q(
    "set_union_evolve",
    (s, d) => {
      val v1 = T.region(s, d).select("r_regionkey", "r_name")
      val v2 = T.region(s, d).select("r_regionkey", "r_name")
        .withColumn("r_comment", concat(lit("gen2-"), col("r_name")))
        .withColumn("r_regionkey", col("r_regionkey") + 100)
      v1.unionByName(v2, allowMissingColumns = true)
        .select(col("r_regionkey"), col("r_name"),
          coalesce(col("r_comment"), lit("(none)")).as("r_comment"))
        .orderBy("r_regionkey")
    },
    Some("""SELECT r_regionkey, r_name, coalesce(r_comment, '(none)') AS r_comment
FROM (
  SELECT r_regionkey, r_name, NULL AS r_comment FROM region
  UNION ALL BY NAME
  SELECT r_regionkey + 100 AS r_regionkey, r_name, 'gen2-' || r_name AS r_comment FROM region)
ORDER BY r_regionkey"""))

  /** Keyed upsert (MERGE): a change batch — updates for every 10th order
    * plus synthesized brand-new keys — merged into the base snapshot;
    * updates win on key collision. The datalake table-maintenance primitive.
    * Scale shape: one left-anti shuffle join on the key + a union — both
    * hash-partition on o_orderkey; nothing driver-side, no window. Summary
    * output per resulting status keeps the oracle compact.
    */
  private val setUpsert = Q(
    "set_upsert",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val base = T.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice").cast(DecimalType(18, 4)) + lit(100))
            .cast("double").as("o_totalprice"))
        .unionByName(base.filter(col("o_orderkey") % 1000 === 1)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      val merged = graft.api.Tables.upsert(base, updates, Seq("o_orderkey"))
      merged.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), H.dsum(col("o_totalprice")).as("sum_price"),
          countDistinct(col("o_orderkey")).as("n_keys"))
        .orderBy("o_orderstatus")
    },
    Some(s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
upd AS (
  SELECT o_orderkey, 'U' AS o_orderstatus,
    CAST(CAST(o_totalprice AS DECIMAL(18,4)) + 100 AS DOUBLE) AS o_totalprice
  FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus, o_totalprice
  FROM base WHERE o_orderkey % 1000 = 1),
merged AS (
  SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL SELECT * FROM upd)
SELECT o_orderstatus, count(*) AS n, ${H.dsumSql("o_totalprice")} AS sum_price,
count(DISTINCT o_orderkey) AS n_keys
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  val all: Seq[Q] = Seq(sortMulticol, sortNullsOrder, limitTopk,
    setUnionAll, setUnionDistinct, setIntersect, setExcept, setSymmetricDiff,
    setUnionEvolve, setUpsert)
}
