package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed-Dataset row models (SURVEY.md §1.3: "typed Dataset[T] facades"). */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
    o_orderstatus: String)
case class EventRow2(event_id: Long, user_id: Long, value: Double)

/** Typed Dataset surface: compile-time-checked filter/map pipelines,
  * groupByKey + reduceGroups, and cogroup. These compile to the same
  * Catalyst plans as the untyped forms (deserialization happens only at
  * the lambda boundaries), so the oracle is plain SQL.
  */
object TypedQueries extends QueryModule {

  /** filter → map → groupByKey → reduceGroups, fully typed. */
  def typedPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .as[OrderRow]
      .filter(_.o_totalprice > 100000)
      .map(o => (o.o_orderstatus, o.o_totalprice * 0.9, 1L))
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, a._2 + b._2, a._3 + b._3))
      .map { case (status, (_, total, n)) => (status, total, n) }
      .toDF("status", "discounted_total", "n")
      .select(col("status"), round(col("discounted_total"), 2).as("discounted_total"), col("n"))
      .orderBy("status")
  }

  private val typedPipelineSql =
    """SELECT o_orderstatus AS status,
      |  round(sum(o_totalprice * 0.9), 2) AS discounted_total,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders WHERE o_totalprice > 100000
      |GROUP BY o_orderstatus ORDER BY status""".stripMargin

  /** cogroup: per-entity merge of two differently-shaped datasets (orders
    * by customer, events by user) without materializing a join — each key's
    * two iterators are folded in one pass.
    */
  def typedCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .as[OrderRow]
      .groupByKey(_.o_custkey)
    val events = Tables.events(s, dir)
      .select("event_id", "user_id", "value")
      .as[EventRow2]
      .groupByKey(_.user_id)
    orders.cogroup(events) { (key, os, es) =>
      val (nOrders, spend) = os.foldLeft((0L, 0.0)) { case ((n, t), o) => (n + 1, t + o.o_totalprice) }
      val nEvents = es.size.toLong
      Iterator((key, nOrders, spend, nEvents))
    }
      .toDF("entity_id", "n_orders", "spend", "n_events")
      .select(col("entity_id"), col("n_orders"), round(col("spend"), 2).as("spend"),
        col("n_events"))
      .orderBy("entity_id")
  }

  private val typedCogroupSql =
    """SELECT coalesce(o.k, e.k) AS entity_id,
      |  coalesce(o.n_orders, 0) AS n_orders,
      |  round(coalesce(o.spend, 0), 2) AS spend,
      |  coalesce(e.n_events, 0) AS n_events
      |FROM (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders,
      |        sum(o_totalprice) AS spend FROM orders GROUP BY 1) o
      |FULL JOIN (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events
      |        FROM events GROUP BY 1) e
      |  ON o.k = e.k
      |ORDER BY entity_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("typed_pipeline", typedPipeline, Some(typedPipelineSql)),
    QueryDef("typed_cogroup", typedCogroup, Some(typedCogroupSql))
  )
}
