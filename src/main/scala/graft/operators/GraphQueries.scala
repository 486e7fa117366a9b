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
    val li = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 2 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.select(col("ok"), col("pk").as("u"))
    val b = li.select(col("ok"), col("pk").as("v"))
    a.join(b, Seq("ok")).where(col("u") < col("v"))
      .select("u", "v").distinct()
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
    val pairs = edges(s, dir).cache() // consumed 3×: degrees, orientation, closing probe
    val deg = pairs.select(col("u").as("n"))
      .unionAll(pairs.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient low-(degree,id) -> high-(degree,id); struct compare gives the
    // lexicographic (d, id) order both engines agree on
    val oriented = pairs
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"))
    val e1 = oriented.select(col("src"), col("dst").as("b"))
    val e2 = oriented.select(col("src"), col("dst").as("c"))
    val wedges = e1.join(e2, Seq("src")).where(col("b") < col("c"))
    val triangles = wedges.join(pairs,
      pairs("u") === least(col("b"), col("c")) &&
        pairs("v") === greatest(col("b"), col("c")))
    deg.agg(count(lit(1)).as("n_nodes")).crossJoin(
        pairs.agg(count(lit(1)).as("n_edges")))
      .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
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
