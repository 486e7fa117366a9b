package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a co-occurrence graph derived from the fixtures —
  * the market-basket / co-citation shape every link-analysis pipeline
  * starts from. Nodes are parts; an undirected edge connects two parts
  * that appear in the same order (half the orders, to keep the graph at
  * an honest-but-benchable density: ~116 k edges at sf0.01, ~600 k at
  * sf0.1).
  *
  * Triangle counting uses the degree-ordered orientation (the classic
  * MapReduce-era trick from Suri & Vassilvitskii's "Counting Triangles
  * and the Curse of the Last Reducer"): orient every edge from its
  * lower-(degree, id) endpoint to the higher one, so each node's
  * out-degree is bounded by O(√m) and the wedge (2-path) fan-out —
  * the quadratic step — is Σ outdeg² ≈ m^1.5 instead of Σ deg² which a
  * hub node makes quadratic. Every step is a keyed equi-join or
  * aggregation: no cartesian products, no driver-side graph state, so
  * the same plan runs at 100 TB where the edge list is the big table.
  */
object GraphQueries extends QueryModule {

  /** Undirected distinct edge list (u < v by id) of the part
    * co-occurrence graph. One self-equi-join on the order key; the
    * DISTINCT collapses multi-order repeats into simple-graph edges.
    */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    // one shuffle instead of a self-join: gather each order's distinct
    // part set (orders are small — tens of lines), expand the C(k, 2)
    // intra-order pairs from the sorted array with HOFs, then the global
    // DISTINCT collapses multi-order repeats. A self-join on the order
    // key computes the same thing with an extra exchange + sort.
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 2 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
      .select(explode(expr(
        """flatten(transform(pks, (x, i) ->
          |  transform(slice(pks, i + 2, size(pks)), y ->
          |    struct(x AS u, y AS v))))""".stripMargin)).as("p"))
      .select(col("p.u"), col("p.v")).distinct()
  }

  private val edgesCte =
    """li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      |       FROM lineitem WHERE l_orderkey % 2 = 0),
      |pairs AS (
      |  SELECT DISTINCT a.pk AS u, b.pk AS v
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |deg AS (
      |  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
      |    SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
      |  GROUP BY n)""".stripMargin

  /** Global triangle census: nodes, edges, wedges (open 2-paths after
    * orientation), triangles. The closing-edge probe re-joins the wedge
    * set against the undirected edge list on the (least, greatest) pair
    * key — an equi-join on two integer columns.
    */
  def triangleCount(s: SparkSession, dir: String): DataFrame = {
    val pairs = edges(s, dir).cache() // consumed 3×: degrees, orientation, edge count
    // deg and adj are node-cardinality and each consumed by several
    // branches of the final stats cross-join — without the cache every
    // broadcast materializes its own recompute of the whole lineage
    val deg = pairs.select(col("u").as("n"))
      .unionAll(pairs.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .cache()
    // orient low-(degree,id) -> high-(degree,id); struct compare gives the
    // lexicographic (d, id) order both engines agree on. The degree table
    // is node-cardinality (≪ edges — ~20 k rows at sf0.1), so both lookups
    // broadcast: the edge list never shuffles for the orientation
    val oriented = pairs
      .join(broadcast(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du")), "u")
      .join(broadcast(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
      .cache() // consumed by the adjacency build AND the per-edge probe
    // Sorted-adjacency formulation: NEVER materialize the wedge set.
    // Wedges are pure arithmetic on out-degrees (Σ C(d⁺, 2)); triangles
    // are Σ over oriented edges of |N⁺(src) ∩ N⁺(dst)| — each triangle
    // has exactly one apex with out-edges to the other two, so the count
    // is exact, not 3×. The adjacency table is node-cardinality with
    // O(√m)-bounded lists (the orientation's guarantee), so it
    // broadcasts and the per-edge intersect runs map-side where the edge
    // list sits; at a scale past broadcast, the same two joins shuffle on
    // src/dst — still keyed, never quadratic.
    val adj = oriented.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"),
        count(lit(1)).as("od"))
      .cache()
    // orientation is a bijection on edges, so Σ od = |E| — edge and wedge
    // counts come from one pass over the (cached, node-sized) adjacency
    val edgeWedgeCount = adj
      .agg(sum("od").as("n_edges"),
        sum(expr("od * (od - 1) div 2")).as("n_wedges"))
    val triangleStats = oriented
      .join(broadcast(adj.select(col("src"), col("nbrs").as("ns"))), Seq("src"))
      .join(broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nd"))),
        Seq("dst"), "left")
      .select(when(col("nd").isNull, lit(0))
        .otherwise(size(array_intersect(col("ns"), col("nd")))).as("t"))
      .agg(sum(col("t").cast("long")).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edgeWedgeCount)
      .crossJoin(triangleStats)
      .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
  }

  private val triangleCountSql =
    s"""WITH $edgesCte,
       |ordered AS (
       |  SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END AS src,
       |         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END AS dst
       |  FROM pairs p JOIN deg du ON du.n = p.u JOIN deg dv ON dv.n = p.v),
       |wedges AS (
       |  SELECT e1.src, e1.dst AS b, e2.dst AS c
       |  FROM ordered e1 JOIN ordered e2 ON e1.src = e2.src AND e1.dst < e2.dst)
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       |       (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_edges,
       |       (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
       |       (SELECT CAST(count(*) AS BIGINT) FROM wedges w JOIN pairs p
       |          ON p.u = least(w.b, w.c) AND p.v = greatest(w.b, w.c)) AS n_triangles""".stripMargin

  /** Degree distribution in powers-of-two buckets — the first sanity
    * report on any graph (detects hub blowups before they melt a join).
    * One edge-list scan + one tiny aggregation.
    */
  def degreeHistogram(s: SparkSession, dir: String): DataFrame = {
    val pairs = edges(s, dir)
    val deg = pairs.select(col("u").as("n"))
      .unionAll(pairs.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    deg.groupBy(floor(log2(col("d"))).cast("long").as("log2_degree"))
      .agg(count(lit(1)).as("n_nodes"),
        min("d").as("min_degree"), max("d").as("max_degree"))
      .orderBy("log2_degree")
  }

  private val degreeHistogramSql =
    s"""WITH $edgesCte
       |SELECT CAST(floor(log2(d)) AS BIGINT) AS log2_degree,
       |  CAST(count(*) AS BIGINT) AS n_nodes,
       |  min(d) AS min_degree, max(d) AS max_degree
       |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("graph_triangle_count", triangleCount, Some(triangleCountSql)),
    QueryDef("graph_degree_hist", degreeHistogram, Some(degreeHistogramSql))
  )
}
