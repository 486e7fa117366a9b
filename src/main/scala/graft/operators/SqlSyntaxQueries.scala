package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Modern SQL-surface features beyond the classic SELECT shape: the Spark 4
  * operator pipe syntax (`|>`) and lateral column aliases. Both are parser /
  * analyzer features — they lower onto exactly the same Catalyst logical
  * plans as the classic form, so the 100 TB story (pushdown, pruning,
  * whole-stage codegen) is identical; the declared queries pin that the
  * lowering is value-identical to the ANSI equivalent the oracle runs.
  */
object SqlSyntaxQueries extends QueryModule {

  private def sql(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(q)
  }

  /** SQL pipe syntax (SIGMOD'24 "Pipe Syntax in SQL", shipped in Spark
    * 4.0): each `|>` stage is one relational operator applied top-down.
    * EXTEND adds a computed column (the pipe analogue of a lateral alias),
    * AGGREGATE ... GROUP BY emits grouping keys then aggregates. The plan
    * is the same Filter→Project→Aggregate→Sort chain as the ANSI form —
    * pushdown and codegen are unaffected.
    */
  private def pipeSyntax(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """FROM lineitem
        ||> WHERE l_shipdate >= TIMESTAMP'1995-01-01 00:00:00'
        ||> EXTEND l_extendedprice * (1 - l_discount) AS net
        ||> AGGREGATE count(*) AS n_items, round(sum(net), 2) AS revenue
        |   GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)

  private val pipeSyntaxSql =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Lateral column aliases (Spark 3.4+): a SELECT item referencing a
    * sibling alias defined earlier in the same list. The analyzer expands
    * the reference into a nested Project — no re-evaluation of the source
    * expression per reference. DuckDB supports the same feature natively,
    * so the oracle is written in the identical shape.
    */
  private def lateralAlias(s: SparkSession, dir: String): DataFrame =
    sql(s, dir,
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_quantity AS BIGINT) * 12 AS qty_dozen,
        |  qty_dozen * qty_dozen + l_linenumber AS chained,
        |  CAST(chained > 250000 AS BOOLEAN) AS big_item
        |FROM lineitem WHERE l_orderkey % 1000 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)

  // integer-valued arithmetic end to end: multiplicative math on 2-dp
  // doubles lands on engine-divergent .xx5 rounding boundaries (the
  // misc_merge_upsert lesson), so the alias chain demos on exact values
  private val lateralAliasSql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_quantity AS BIGINT) * 12 AS qty_dozen,
      |  qty_dozen * qty_dozen + l_linenumber AS chained,
      |  chained > 250000 AS big_item
      |FROM lineitem WHERE l_orderkey % 1000 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("sql_pipe_syntax", pipeSyntax, Some(pipeSyntaxSql)),
    QueryDef("sql_lateral_alias", lateralAlias, Some(lateralAliasSql))
  )
}
