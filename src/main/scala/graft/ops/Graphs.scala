package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.api.Caches

/** SURVEY.md §2.12 — graph analytics over relationally-derived graphs.
  *
  * Two classic whole-graph computations expressed as iterative / self-join
  * DataFrame plans (the connected-components family in [[Llm]] covers the
  * third). Both run on graphs DERIVED from the star schema — the common
  * production shape where the edge list is itself the output of a join, not
  * a stored table:
  *
  *  - the customer↔supplier TRANSACTION graph (who traded with whom), edges
  *    from `orders ⋈ lineitem`, made symmetric for PageRank;
  *  - the part CO-ORDER graph (parts bought in the same order — the
  *    market-basket co-occurrence graph), the self-join-derived graph
  *    triangle counting runs on.
  *
  * Float discipline (core.scala H): per-iteration PageRank contributions
  * `rank/deg` quantize to DECIMAL(28,6) before the neighbor sum — the sum is
  * then exact decimal (order-independent across both engines' aggregation
  * orders), and the damping step `0.15 + 0.85·sum` is identical IEEE ops on
  * identical bits, so ranks emit RAW (same tie-boundary caveat as the LM
  * log-prob keys: a quotient within 1 ulp of a .5e-6 boundary could round
  * differently per engine; none of the fixture values sits on one).
  */
object Graphs {

  /** Supplier node-id offset: customer keys and supplier keys overlap
    * numerically, so supplier nodes shift into a disjoint long range
    * (max custkey across all fixtures ≪ 1e9). Longs rather than tagged
    * strings keep the join keys codegen-friendly 8-byte comparisons.
    */
  private val SUPP_OFF = 1000000000L

  /** PageRank (5 damped iterations, d = 0.85) over the symmetric
    * customer↔supplier transaction graph — the graph-centrality quality
    * signal of web-corpus curation (a page's rank is a standard keep-weight
    * in pretraining pipelines), here exercised on the star schema's natural
    * bipartite graph.
    *
    * Scale shape: the edge list and degree frame build once and persist via
    * [[Caches]] (read 5× each); every iteration is ONE src-keyed hash join
    * (rank ⋈ deg is node-grain, then edges ⋈ ranks co-partitions on the
    * same key) + ONE dst-keyed hash aggregate — the Pregel step as Catalyst
    * sees it. No windows, no driver-side state beyond the loop counter; the
    * 5-iteration unroll keeps plan depth bounded (an open-ended solver
    * would localCheckpoint per round like the CC operator does). Dangling
    * nodes cannot exist: the graph is symmetric, so every node has outdeg
    * ≥ 1 and the damping constant absorbs the rest.
    */
  private val graphPagerank = Q(
    "graph_pagerank",
    (s, d) => {
      val e0 = T.orders(s, d)
        .join(T.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + SUPP_OFF).as("dst"))
        .distinct()
      val edges = Caches.cache(
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))))
      val deg = Caches.cache(edges.groupBy("src")
        .agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")))
      var rank = deg.select(col("node"), lit(1.0).as("rank"))
      for (_ <- 1 to 5) {
        rank = edges
          .join(rank.join(deg, "node"), col("src") === col("node"))
          .select(col("dst"),
            (col("rank") / col("deg")).cast(DecimalType(28, 6)).as("w"))
          .groupBy(col("dst").as("node"))
          .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double"))
            .as("rank"))
      }
      rank.select(col("node"), col("rank"))
        .orderBy(col("rank").desc, col("node").asc)
    },
    Some {
      val iter = (1 to 5).map { i =>
        s"""r$i AS (SELECT e.dst AS node,
0.15::DOUBLE + 0.85::DOUBLE * CAST(sum(CAST(r.rank / d.deg AS DECIMAL(28,6))) AS DOUBLE) AS rank
FROM edges e JOIN r${i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.node
GROUP BY e.dst)"""
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS src, l_suppkey + $SUPP_OFF AS dst
FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM deg),
$iter
SELECT node, rank FROM r5 ORDER BY rank DESC, node ASC"""
    })

  /** Degree-ordering multiplier for the triangle orientation key
    * `k(n) = deg(n)·KMUL + n` — a single long that totally orders nodes by
    * (degree, id) without a struct comparison (portable to engines without
    * row-value ordering). Degrees are bounded by node count ≪ 1e6 and ids
    * < 1e9, so the product stays far inside long range.
    */
  private val KMUL = 1000000000000L

  /** Triangle count on the PART co-order graph (parts bought in the same
    * order — the market-basket graph: ~0.006 density at sf0.1 vs the
    * supplier variant's ~0.91, which degenerates into a near-complete
    * graph whose Θ(n³) triangles say nothing) via DEGREE-ORDERED edge
    * orientation (the compact-forward / MR-friendly algorithm): every edge
    * points from its lower (degree, id) endpoint to the higher, wedges
    * enumerate ordered out-neighbor pairs of each low node, and a wedge is
    * a triangle iff its closing pair is itself an oriented edge.
    *
    * The orientation is the scale story: out-degrees under (deg, id)
    * ordering are bounded by O(√m) on any graph (arboricity bound), so the
    * wedge self-join fans out per node by the SQUARE ROOT of what a naive
    * adjacency self-join does on a skewed graph — the hub that would
    * generate deg² wedges generates almost none, because nearly all its
    * edges point INTO it. Every join is an equi-join on node keys; the
    * closing-edge probe is an inner join against the distinct oriented edge
    * list (at most one match per wedge — no fan-out). Measured shape at
    * sf0.1: 20k nodes, 1.20M edges, 41.1M wedges, 1.88M triangles.
    */
  private val graphTriangles = Q(
    "graph_triangles",
    (s, d) => {
      val li = T.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e0 = Caches.cache(
        li.as("a").join(li.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
          .select(col("a.pk").as("u"), col("b.pk").as("v"))
          .distinct())
      val deg = e0.select(col("u").as("n"))
        .union(e0.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val ek = e0
        .join(deg.select(col("n").as("u"),
          (col("dg") * KMUL + col("n")).as("ku")), "u")
        .join(deg.select(col("n").as("v"),
          (col("dg") * KMUL + col("n")).as("kv")), "v")
      val oriented = Caches.cache(ek.select(
        when(col("ku") < col("kv"), col("u")).otherwise(col("v")).as("lo"),
        when(col("ku") < col("kv"), col("v")).otherwise(col("u")).as("hi"),
        when(col("ku") < col("kv"), col("kv")).otherwise(col("ku")).as("khi")))
      val wedges = oriented.as("x").join(oriented.as("y"),
          col("x.lo") === col("y.lo") && col("x.khi") < col("y.khi"))
        .select(col("x.hi").as("wu"), col("y.hi").as("wv"))
      val tri = wedges.join(
        oriented.select(col("lo").as("wu"), col("hi").as("wv")), Seq("wu", "wv"))
        .agg(count(lit(1)).as("n_triangles"))
      deg.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(e0.agg(count(lit(1)).as("n_edges")))
        .crossJoin(tri)
    },
    Some(s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (SELECT n, count(*) AS dg FROM (SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0) GROUP BY 1),
ek AS (SELECT u, v, du.dg * $KMUL + u AS ku, dv.dg * $KMUL + v AS kv
       FROM e0 JOIN deg du ON u = du.n JOIN deg dv ON v = dv.n),
o AS (SELECT CASE WHEN ku < kv THEN u ELSE v END AS lo,
             CASE WHEN ku < kv THEN v ELSE u END AS hi,
             CASE WHEN ku < kv THEN kv ELSE ku END AS khi FROM ek),
w AS (SELECT x.hi AS wu, y.hi AS wv FROM o x JOIN o y ON x.lo = y.lo AND x.khi < y.khi),
t AS (SELECT count(*) AS n_triangles FROM w JOIN o ON w.wu = o.lo AND w.wv = o.hi)
SELECT (SELECT count(*) FROM deg) AS n_nodes, (SELECT count(*) FROM e0) AS n_edges, n_triangles FROM t"""))

  val all: Seq[Q] = Seq(graphPagerank, graphTriangles)
}
