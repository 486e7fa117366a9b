package graft

import org.apache.spark.sql.functions._

/** Schema evolution across parquet files (the 100 TB reality: columns get
  * added over time; old files must stay readable with nulls for new
  * fields).
  */
class SchemaEvolutionSpec extends SparkSuite {

  test("mergeSchema unifies old and new file schemas") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve_").toString
    // v1 files: (id, name); v2 adds a score column
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("score"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.5), 4L -> Some(0.9)))
    // and the new column is filterable with old files present
    assert(merged.filter(col("score") > 0.7).count() == 1)
  }
}
