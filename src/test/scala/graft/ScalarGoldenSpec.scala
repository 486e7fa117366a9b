package graft

import org.apache.spark.sql.functions._

/** Golden values for functions with no portable DuckDB twin — pinned here
  * so behavior changes are caught (SURVEY.md §2 scalar families remainder).
  */
class ScalarGoldenSpec extends SparkSuite {
  import org.apache.spark.sql.Row

  private def one(exprStr: String): Any =
    spark.sql(s"SELECT $exprStr").head().get(0)

  test("months_between (fractional, 31-day convention)") {
    assert(one("months_between(TIMESTAMP '1997-02-28 10:30:00', TIMESTAMP '1996-10-30 00:00:00')")
      == 3.94959677)
    assert(one("months_between(DATE '2024-03-31', DATE '2024-02-29')") == 1.0)
  }

  test("bround: ROUND_HALF_EVEN vs round's HALF_UP") {
    assert(one("CAST(bround(2.5) AS DOUBLE)") == 2.0)
    assert(one("CAST(bround(3.5) AS DOUBLE)") == 4.0)
    assert(one("CAST(round(2.5) AS DOUBLE)") == 3.0)
    assert(one("CAST(bround(2.675, 2) AS DOUBLE)") == 2.68) // decimal literal: half → even last digit
  }

  test("json_tuple and schema_of_json") {
    val r = spark.sql(
      """SELECT json_tuple('{"a": 1, "b": "x"}', 'a', 'b')""").head()
    assert(r == Row("1", "x"))
    assert(one("""schema_of_json('{"k": 87}')""") == "STRUCT<k: BIGINT>")
  }

  test("explode over a map") {
    import spark.implicits._
    val got = spark.sql(
      "SELECT explode(map('a', 1, 'b', 2))").as[(String, Int)].collect().toSet
    assert(got == Set(("a", 1), ("b", 2)))
  }

  test("xxhash64 seed stability (dedup key contract)") {
    // minhash/LSH bucketing depends on these exact values staying stable
    assert(one("xxhash64('spark')") == -1960931134668248110L)
    assert(one("xxhash64(0, 'spark')") == one("xxhash64(0, 'spark')"))
  }

  test("approx_percentile stays within its accuracy contract") {
    import spark.implicits._
    val li = Tables.lineitem(spark, Sf)
    val Row(exact: Double, approx: Double) = li.select(
      expr("percentile(l_extendedprice, 0.5)"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").cast("double")).head()
    // rank error ≤ n/accuracy ⇒ value gap bounded by the local density;
    // assert the relative gap is small on this distribution
    assert(math.abs(exact - approx) / exact < 0.02, s"exact=$exact approx=$approx")
  }
}
