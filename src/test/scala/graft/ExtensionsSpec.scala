package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: injected functions resolve in SQL, and the
  * SimplifySelfCosine optimizer rule rewrites self-similarity without
  * changing results.
  */
class ExtensionsSpec extends AnyFunSuite {

  // needs its own session: extensions bind at session build time
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .withExtensions(new plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("injected functions resolve without manual registration") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f), Seq(2f, 4f))).toDF("a", "b")
    df.createOrReplaceTempView("ext_vecs")
    val cos = spark.sql("SELECT cosine_sim(a, b) c FROM ext_vecs").as[Double].head()
    assert(math.abs(cos - 1.0) < 1e-12) // colinear vectors
    val dot = spark.sql("SELECT dot_product(a, b) d FROM ext_vecs").as[Double].head()
    assert(math.abs(dot - 10.0) < 1e-12)
  }

  test("SimplifySelfCosine rewrites cosine_sim(x, x) and preserves values") {
    import spark.implicits._
    // range (not a literal LocalRelation) so the optimizer can't just
    // constant-fold the whole projection away
    val df = spark.range(3).select(
      expr("transform(sequence(0, 2), i -> CAST(id * i AS FLOAT))").as("v"))
    val q = df.select(expr("cosine_sim(v, v)").as("c"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("cosine_sim"), s"rule did not fire:\n$optimized")
    assert(optimized.contains("dot_product"), s"expected dot_product guard:\n$optimized")
    val got = q.as[Double].collect().toList
    // id=0 → zero vector → 0.0; id>0 → self-similarity 1.0
    assert(got == List(0.0, 1.0, 1.0))
  }

  test("rule does not fire for distinct inputs") {
    import spark.implicits._
    val df = spark.range(1).select(
      expr("transform(sequence(0, 2), i -> CAST(id + i AS FLOAT))").as("a"),
      expr("transform(sequence(0, 2), i -> CAST(id + i + 1 AS FLOAT))").as("b"))
    val q = df.select(expr("cosine_sim(a, b)").as("c"))
    assert(q.queryExecution.optimizedPlan.toString.contains("cosine_sim"))
    // id=0: a=[0,1,2], b=[1,2,3] → 8 / (sqrt(5)*sqrt(14))
    assert(math.abs(q.as[Double].head() - 8.0 / math.sqrt(70.0)) < 1e-12)
  }
}
