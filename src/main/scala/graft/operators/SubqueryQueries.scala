package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface (SURVEY.md §4 "Subquery decorrelation"): correlated
  * scalar, IN / NOT IN, uncorrelated scalar, LATERAL. All hit Catalyst's
  * RewriteCorrelatedScalarSubquery / RewritePredicateSubquery — each plans
  * as a join, not a per-row re-execution, which is what makes them viable
  * at 100 TB.
  */
object SubqueryQueries extends QueryModule {

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(q)
  }

  private val scalarCorrSpark =
    """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      |FROM customer c
      |WHERE c_acctbal > 1.8 * (SELECT avg(c2.c_acctbal) FROM customer c2
      |                         WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  private val inSubSpark =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'HOUSEHOLD')
      |  AND o_totalprice > 300000
      |ORDER BY o_orderkey""".stripMargin

  private val notInSubSpark =
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  private val scalarUncorrSpark =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price
      |FROM orders
      |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  private val lateralSpark =
    """SELECT c_custkey, round(top_spend, 2) AS top_spend, n_big
      |FROM customer,
      |LATERAL (SELECT max(o_totalprice) AS top_spend,
      |                count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big
      |         FROM orders WHERE o_custkey = c_custkey) t
      |WHERE top_spend IS NOT NULL
      |ORDER BY c_custkey""".stripMargin

  // DuckDB twin needs only count→BIGINT casts where applicable
  private val lateralDuck =
    """SELECT c_custkey, round(top_spend, 2) AS top_spend,
      |  CAST(n_big AS BIGINT) AS n_big
      |FROM customer,
      |LATERAL (SELECT max(o_totalprice) AS top_spend,
      |                count(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big
      |         FROM orders WHERE o_custkey = c_custkey) t
      |WHERE top_spend IS NOT NULL
      |ORDER BY c_custkey""".stripMargin

  /** Correlated EXISTS / NOT EXISTS — the membership syntax that (unlike
    * IN) is three-valued-logic-safe under NULLs on the probe key; both
    * branches decorrelate to semi/anti joins like the IN forms.
    */
  private val existsSpark =
    """SELECT s_suppkey, s_name
      |FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
      |                  WHERE l2.l_suppkey = s.s_suppkey
      |                    AND l2.l_quantity > 49.5 AND l2.l_discount > 0.095)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): lineitems under half
    * their part's average quantity, brand-filtered, yearly-averaged. The
    * correlated scalar average is the point: Catalyst decorrelates it into
    * one grouped aggregate over lineitem joined back on the part key — a
    * map-side-combinable agg plus one keyed join, never a per-row
    * re-execution (the 100 TB difference). `l_quantity` is integer-valued,
    * so the avg is exact and the `<` comparison is engine-stable.
    */
  private val q17SmallQuantitySpark =
    """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem l JOIN part ON p_partkey = l.l_partkey
      |WHERE p_brand = 'Brand#12'
      |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
      |                      FROM lineitem l2
      |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q17_small_quantity",
      (s, d) => sql(s, d, q17SmallQuantitySpark), Some(q17SmallQuantitySpark)),
    QueryDef("sub_exists_not_exists",
      (s, d) => sql(s, d, existsSpark), Some(existsSpark)),
    QueryDef("sub_scalar_correlated",
      (s, d) => sql(s, d, scalarCorrSpark), Some(scalarCorrSpark)),
    QueryDef("sub_in_predicate",
      (s, d) => sql(s, d, inSubSpark), Some(inSubSpark)),
    QueryDef("sub_not_in_predicate",
      (s, d) => sql(s, d, notInSubSpark), Some(notInSubSpark)),
    QueryDef("sub_scalar_uncorrelated",
      (s, d) => sql(s, d, scalarUncorrSpark), Some(scalarUncorrSpark)),
    QueryDef("sub_lateral_join",
      (s, d) => sql(s, d, lateralSpark), Some(lateralDuck))
  )
}
