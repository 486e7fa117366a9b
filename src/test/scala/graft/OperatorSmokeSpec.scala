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

  test("every query name has either an oracle or a documented exemption") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name).toSet
    // only the genuinely approximate / engine-specific-hash ops are exempt:
    // minhash-LSH and hyperplane-LSH moved to portable md5-based hashing in
    // round 2 and are now oracle-checked like everything else
    assert(noOracle == Set("agg_approx_distinct", "hash_engine_specific"))
  }
}
