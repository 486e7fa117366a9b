package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator from SURVEY.md §2 is declared as a [[QueryDef]] in a module
  * under `graft.operators` / `graft.streaming`; this object is just the
  * aggregation point the driver calls into.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.AggQueries,
    operators.JoinQueries,
    operators.WindowQueries,
    operators.SetOpQueries,
    operators.ScalarQueries,
    operators.ArrayMapJsonQueries,
    operators.TextQueries,
    operators.SubqueryQueries,
    operators.SqlSyntaxQueries,
    operators.GraphQueries,
    operators.MiscQueries,
    operators.TypedQueries,
    operators.TpchQueries,
    operators.AnalyticsQueries,
    sources.SourceQueries,
    operators.DedupQueries,
    operators.CurationQueries,
    operators.SimilarityQueries,
    multimodal.MediaPipeline,
    streaming.StreamingQueries
  )

  lazy val allDefs: Seq[QueryDef] = {
    val ds = modules.flatMap(_.defs)
    val dupes = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.AggQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
