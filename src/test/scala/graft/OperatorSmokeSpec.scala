package graft

/** Every declared query runs at sf0.001 and returns a well-formed result.
  * (Value-level correctness is enforced by the DuckDB oracle gate at
  * sf0.01 — tools/check.py; this suite is the fast in-build smoke.)
  */
class OperatorSmokeSpec extends SparkSuite {

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} runs and is non-degenerate") {
      val df = d.run(spark, Sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
      // queries expected to be non-empty on the fixture
      val mayBeEmpty = Set("join_anti_no_orders", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_clusters", "curation_contamination")
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned 0 rows")
      // sweep-level unpartitioned-window guard: an unpartitioned Window
      // moves ALL its input to one task, and the bench tail's WindowExec
      // warning storm would hide a new row-level one — so every such
      // window must be named in the allowlist with its bounded domain AND
      // structurally sit above a collapsed frame
      val ws = WindowAudit.unpartitioned(df.queryExecution.optimizedPlan)
      if (ws.nonEmpty) {
        assert(WindowAudit.BoundedGlobalWindows.contains(d.name),
          s"${d.name} has ${ws.size} unpartitioned window(s) but no " +
            "documented bounded-domain entry in WindowAudit.BoundedGlobalWindows")
        assert(ws.forall(WindowAudit.collapsedBelow),
          s"${d.name}: unpartitioned window over a non-collapsed (row-level) input")
      }
    }
  }

  test("unpartitioned-window allowlist is exact (no stale or unknown entries)") {
    val declared = SparkEntry.allDefs.map(_.name).toSet
    val unknown = WindowAudit.BoundedGlobalWindows.keySet -- declared
    assert(unknown.isEmpty, s"allowlist names unknown queries: $unknown")
    WindowAudit.BoundedGlobalWindows.keys.toSeq.sorted.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, Sf).queryExecution.optimizedPlan
      assert(WindowAudit.unpartitioned(plan).nonEmpty,
        s"$n is allowlisted but no longer has an unpartitioned window — remove it")
    }
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("documents fixture is ASCII-only (multimodal oracle invariant)") {
    // The multimodal oracle equates UTF-8 payload byte k with
    // ascii(substr(text, k+1, 1)) — true only while the fixture's text is
    // pure ASCII (MediaPipeline.extractFeaturesSql). If a future fixture
    // adds multi-byte characters this must fail loudly here, not as a
    // mysterious checksum mismatch in the driver's compare.
    import org.apache.spark.sql.functions._
    val nonAscii = Tables.documents(spark, Sf)
      .filter(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text; the multimodal oracle's " +
        "byte==codepoint equivalence no longer holds")
  }

  test("window guard rejects a row-level window above a join with an aggregate (r12)") {
    // VERDICT r11 #2: the old collapsedBelow accepted an Aggregate found
    // ANYWHERE in the window's subtree — so an unpartitioned window over
    // rowLevelData.join(someAggregate) passed even though the frame is
    // row-level. The barrier-bounded walk must fail exactly that shape,
    // while still accepting aggregate-only inputs (incl. joins of two
    // collapsed frames) and rejecting a Generate re-expansion.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    val rows = Tables.lineitem(spark, Sf)
    val agg = rows.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
    def guard(df: org.apache.spark.sql.DataFrame): Boolean = {
      val ws = WindowAudit.unpartitioned(df.queryExecution.optimizedPlan)
      assert(ws.nonEmpty, "test plan lost its unpartitioned window")
      ws.forall(WindowAudit.collapsedBelow)
    }
    // row-level side joined with a collapsed side: must FAIL
    assert(!guard(rows.join(agg, "l_returnflag")
      .withColumn("rn", row_number().over(W.orderBy("l_orderkey")))))
    // collapsed input: must PASS
    assert(guard(agg.withColumn("rn", row_number().over(W.orderBy("l_returnflag")))))
    // join of two collapsed frames (bounded x bounded): must PASS
    val agg2 = rows.groupBy("l_returnflag").agg(avg("l_extendedprice").as("p"))
    assert(guard(agg.join(agg2, "l_returnflag")
      .withColumn("rn", row_number().over(W.orderBy("l_returnflag")))))
    // Generate above an Aggregate re-expands to row-level: must FAIL
    val reexpanded = rows.agg(collect_list("l_orderkey").as("ks"))
      .select(explode(col("ks")).as("k"))
      .withColumn("rn", row_number().over(W.orderBy("k")))
    assert(!guard(reexpanded))
  }

  test("every query name has either an oracle or a documented exemption") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name).toSet
    // only the genuinely approximate / engine-specific-hash ops are exempt:
    // minhash-LSH and hyperplane-LSH moved to portable md5-based hashing in
    // round 2 and are now oracle-checked like everything else
    assert(noOracle == Set("agg_approx_distinct", "hash_engine_specific"))
  }
}
