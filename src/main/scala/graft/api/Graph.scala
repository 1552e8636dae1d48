package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parameterized graph-analytics builders over any edge-list DataFrame —
  * the reusable core behind the `graph_*` registry keys (ops/Graphs.scala)
  * and the `graph` stress path. Both algorithms are pure DataFrame plans:
  * a Pregel-style join+aggregate iteration (PageRank) and a
  * degree-ordered wedge join (triangles).
  *
  * Float discipline (ops/core.scala H): PageRank contributions `rank/deg`
  * quantize to DECIMAL(28,6) before the neighbor sum — order-independent
  * exact decimal, so ranks are raw-emittable under the cross-engine gate
  * (tie-boundary caveat as the LM log-prob keys).
  */
object Graph {

  /** PageRank over a SYMMETRIC directed edge list `edges(src, dst)` —
    * damped (d = 0.85), `iters` fixed iterations from a uniform rank of 1.
    * Returns (node, rank). The caller guarantees symmetry (every node then
    * has outdeg ≥ 1, so no dangling-mass correction is needed).
    *
    * Scale shape: the edge list and degree frame persist via [[Caches]]
    * (read `iters`× each — `Caches.sweep` when done); each iteration is ONE
    * src-keyed equi-join (rank ⋈ deg is node-grain) + ONE dst-keyed hash
    * aggregate. Bounded-iteration unroll keeps plan depth fixed; an
    * open-ended solver would localCheckpoint per round like the CC builder.
    */
  def pagerank(edgesIn: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val edges = Caches.cache(edgesIn.select(col("src"), col("dst")))
    val deg = Caches.cache(edges.groupBy("src")
      .agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")))
    var rank = deg.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      rank = edges
        .join(rank.join(deg, "node"), col("src") === col("node"))
        .select(col("dst"),
          (col("rank") / col("deg")).cast(DecimalType(28, 6)).as("w"))
        .groupBy(col("dst").as("node"))
        .agg((lit(0.15) + lit(0.85) * sum(col("w")).cast("double"))
          .as("rank"))
    }
    rank.select(col("node"), col("rank"))
  }

  /** Degree-ordering multiplier for [[triangles]]' orientation key
    * `k(n) = deg(n)·KMUL + n` — one long that totally orders nodes by
    * (degree, id) without struct comparison (portable to engines without
    * row-value ordering). Degrees are bounded by node count ≪ 1e6 and ids
    * < 1e9, so the product stays far inside long range.
    */
  val KMUL = 1000000000000L

  /** Triangle count over an UNDIRECTED edge list given as distinct
    * id-ordered pairs `e0(u, v)` with `u < v` — compact-forward
    * degree-ordered orientation: every edge points from its lower
    * (degree, id) endpoint to the higher, wedges enumerate ordered
    * out-neighbor pairs per low node, and a wedge is a triangle iff its
    * closing pair is itself an oriented edge. Returns one row
    * (n_nodes, n_edges, n_triangles).
    *
    * The orientation bounds out-degrees by O(√m) on ANY graph (arboricity),
    * so the wedge self-join fans out per node by the square root of what a
    * naive adjacency join does on a skewed graph — a hub's edges nearly all
    * point INTO it. The edge frame persists via [[Caches]] (read for
    * degrees, orientation, wedges, and the closing probe) —
    * `Caches.sweep` when done.
    */
  def triangles(e0In: DataFrame): DataFrame = {
    val e0 = Caches.cache(e0In.select(col("u"), col("v")))
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
  }
}
