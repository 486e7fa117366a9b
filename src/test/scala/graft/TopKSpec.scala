package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native TopKPerGroup operator: plan shape and equivalence with the
  * window-function formulation.
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-topk-test")
    .withExtensions(new plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val Sf = "/root/testdata/sf0.001"

  test("plans as TopKPerGroupExec, not Window+Filter") {
    val base = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val q = plans.GroupTopK(base, 3, Seq("o_custkey"), Seq(desc("o_totalprice")))
    val physical = q.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(physical.contains("TopKPerGroup"), physical)
    assert(!physical.contains("Window"), physical)
  }

  test("plans a map-side partial phase below the exchange") {
    val base = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val q = plans.GroupTopK(base, 3, Seq("o_custkey"), Seq(desc("o_totalprice")))
    val physical = q.queryExecution.executedPlan.toString
    // plan strings print top-down: final, then the exchange of the
    // k-bounded partials, then the map-side partial
    val lines = physical.linesIterator.toList
    val iFinal = lines.indexWhere(l => l.contains("TopKPerGroup") && !l.contains("Partial"))
    val iEx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val iPartial = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    assert(iFinal >= 0 && iEx >= 0 && iPartial >= 0, physical)
    assert(iFinal < iEx && iEx < iPartial, physical)
  }

  test("partial phase measurably bounds the shuffle at k·groups rows per task") {
    import spark.implicits._
    // 3 groups × 10k rows across 4 partitions: a low-group-cardinality
    // ranking, the shape where a single-phase top-k funnels everything
    // through n_groups reducers
    val df = spark.range(30000)
      .select((col("id") % 3).as("g"), col("id"), (col("id") * 7 % 1000).as("v"))
      .repartition(4)
    val q = plans.GroupTopK(df, 5, Seq("g"), Seq(desc("v"), asc("id")))
    q.collect()
    val finalPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // query stages are leaf wrappers — recurse into them explicitly
    def partials(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = {
      val here = p.collect {
        case t: plans.TopKPerGroupExec if t.partial => t.metrics("numOutputRows").value
      }
      val nested = p.collect {
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => partials(qs.plan)
      }.flatten
      here ++ nested
    }
    val partialRows = partials(finalPlan)
    assert(partialRows.nonEmpty, finalPlan.toString)
    // ≤ k·groups·partitions survive the map side (vs 30 000 input rows)
    assert(partialRows.sum <= 5L * 3 * 4, s"partial emitted ${partialRows.sum} rows")
  }

  test("matches the window row_number formulation exactly") {
    import spark.implicits._
    val base = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val native = plans.GroupTopK(base, 3, Seq("o_custkey"),
        Seq(desc("o_totalprice"), asc("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("gtk_rank").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val windowed = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(native == windowed)
  }

  test("handles ties and groups smaller than k") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0), // 4-way tie
      (2L, 20L, 1.0) // group smaller than k
    ).toDF("g", "id", "v")
    val got = plans.GroupTopK(df, 3, Seq("g"), Seq(desc("v"), asc("id")))
      .select(col("g"), col("id"), col("gtk_rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (2L, 20L, 1)))
  }

  test("RewriteWindowTopK turns the row_number idiom into the native operator") {
    import spark.implicits._
    val base = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val idiom = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    val physical = idiom.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerGroup"), physical)
    assert(!physical.contains("Window"), physical)
    // and values equal the un-extended session's window semantics:
    // rank must survive as the same attribute for downstream use
    val got = idiom.select(col("o_custkey"), col("o_orderkey"), col("rn"))
      .as[(Long, Long, Int)].collect().toSet
    val expected = plans.GroupTopK(base, 3, Seq("o_custkey"),
        Seq(desc("o_totalprice"), asc("o_orderkey")))
      .select(col("o_custkey"), col("o_orderkey"), col("gtk_rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("rewrite does NOT fire for rank() (tie semantics differ)") {
    val base = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val q = base.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    assert(q.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("rewrite keeps residual filter conjuncts") {
    import spark.implicits._
    val base = Tables.orders(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val q = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("o_totalprice") > 100000)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val viaWindow = base.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .filter(col("o_totalprice") > 100000)
      .select("o_orderkey").as[Long].collect().toSet
    assert(q.select("o_orderkey").as[Long].collect().toSet == viaWindow)
  }

  test("rejects unknown columns with a clear error") {
    val base = Tables.orders(spark, Sf)
    val e = intercept[IllegalArgumentException] {
      plans.GroupTopK(base, 3, Seq("nope"), Seq(desc("o_totalprice")))
    }
    assert(e.getMessage.contains("nope"))
  }
}
