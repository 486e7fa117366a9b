package graft

/** Catalog DDL surface [REF A2-A5]: create (saveAsTable), status
  * (tableExists), list (listTables), use (spark.table), drop — the
  * engine-side analogue of the reference's stream DDL lifecycle
  * (AmazonKinesisRecordProducerSample.java:73-112).
  */
class CatalogSpec extends SparkSuite {

  test("saveAsTable / tableExists / listTables / drop round-trip [REF A2-A5]") {
    val df = sources.SourceQueries.catalogRoundtrip(spark, Sf)
    val rows = df.collect()
    assert(rows.length == 5, s"expected 5 region groups, got ${rows.length}")
    assert(rows.forall(_.getAs[Boolean]("table_exists")))
    assert(rows.forall(_.getAs[Boolean]("listed_once")))
    // lifecycle end [REF A2 negative path]: drop, then existence is false
    assert(spark.catalog.tableExists("graft_catalog_demo"))
    spark.sql("DROP TABLE graft_catalog_demo")
    assert(!spark.catalog.tableExists("graft_catalog_demo"))
  }
}
