package graft.sources

import java.nio.file.Files
import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink formats beyond parquet (SURVEY.md §2 "Sources / sinks"):
  * CSV, JSON and text scans exercised as write→read round-trips of the
  * fixture tables, then aggregated; the oracle runs the same aggregate on
  * the original parquet, so any loss or mis-parse in the round-trip fails
  * the hash-compare.
  */
object SourceQueries extends QueryModule {

  /** CSV round-trip with header + explicit schema on read. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_csv_") + "/customer"
    Tables.customer(s, dir)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    s.read.option("header", "true").schema(schema).csv(tmp)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("total_bal"),
        countDistinct("c_nationkey").as("n_nations"))
      .orderBy("c_mktsegment")
  }

  private val csvRoundtripSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(c_acctbal), 2) AS total_bal,
      |  CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** JSON lines round-trip with schema inference on read. */
  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_json_") + "/supplier"
    Tables.supplier(s, dir).write.mode("overwrite").json(tmp)
    s.read.json(tmp)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("total_bal"))
      .orderBy("s_nationkey")
  }

  // s_nationkey is CAST up to BIGINT: JSON schema inference has no integer
  // widths (every JSON integer infers as BIGINT), so the round-trip's honest
  // output type is int64 even though the parquet source column is int32.
  private val jsonRoundtripSql =
    """SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(s_acctbal), 2) AS total_bal
      |FROM supplier GROUP BY s_nationkey ORDER BY 1""".stripMargin

  /** ORC round-trip (the columnar alternative to parquet; exercises the
    * second native columnar reader incl. TIMESTAMP round-trip fidelity).
    * Oracle aggregates the original parquet, so any type drift through the
    * ORC writer/reader fails the hash-compare.
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_orc_") + "/orders"
    Tables.orders(s, dir).write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"),
        min("o_orderdate").as("first_order"), max("o_orderdate").as("last_order"))
      .orderBy("o_orderstatus")
  }

  private val orcRoundtripSql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(o_totalprice), 2) AS total_price,
      |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Schema evolution through mergeSchema — the 100 TB reality: columns
    * get added over time and old files must stay readable (nulls for the
    * new fields). Two "generations" of the customer table are written to
    * one directory — v1 (even custkeys) WITHOUT c_acctbal, v2 (odd
    * custkeys) with it — then read back with mergeSchema=true and
    * aggregated per segment. The oracle recomputes the same result from
    * the original parquet with the generation rule inlined, so any row or
    * type drift through the merged read fails the hash-compare.
    */
  def schemaMerge(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_evolve_") + "/customer"
    val c = Tables.customer(s, dir)
    c.filter(col("c_custkey") % 2 === 0)
      .select("c_custkey", "c_mktsegment")
      .write.mode("append").parquet(tmp)
    c.filter(col("c_custkey") % 2 === 1)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .write.mode("append").parquet(tmp)
    s.read.option("mergeSchema", "true").parquet(tmp)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        count(col("c_acctbal")).as("n_with_bal"),
        round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  private val schemaMergeSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END) AS BIGINT)
      |    AS n_with_bal,
      |  round(sum(CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END), 2) AS total_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Text-format round-trip: one document per line (the reference's
    * line-of-text record format [REF A1]), re-read and measured.
    */
  def textRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_text_") + "/docs"
    Tables.documents(s, dir).select("text").write.mode("overwrite").text(tmp)
    s.read.text(tmp)
      .select(length(col("value")).as("len"))
      .agg(count(lit(1)).as("n_lines"), sum("len").as("total_chars"),
        min("len").as("min_len"), max("len").as("max_len"))
  }

  private val textRoundtripSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
      |  CAST(min(length(text)) AS INT) AS min_len,
      |  CAST(max(length(text)) AS INT) AS max_len
      |FROM documents""".stripMargin

  /** XML round-trip through the built-in Spark 4 XML source (one `<part>`
    * element per row): a part-table slice is written as XML, re-read with
    * an explicit schema, and aggregated per brand; the oracle aggregates
    * the original parquet, so any serialization or parse drift (numeric
    * text round-trip, element ordering, escaping in p_type's spaces)
    * fails the hash-compare. Doubles survive exactly: the writer emits
    * the shortest round-trippable decimal and the parser restores the
    * identical IEEE value. Scale shape: identical to the CSV/ORC rows —
    * a parallel write then a parallel scan straight into one
    * map-side-combined aggregation.
    */
  def xmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_xml_") + "/part"
    Tables.part(s, dir)
      .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").option("rowTag", "part").format("xml").save(tmp)
    val schema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_brand", StringType),
      StructField("p_type", StringType), StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType)))
    s.read.option("rowTag", "part").schema(schema).format("xml").load(tmp)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum("p_size").cast("long").as("total_size"),
        round(sum("p_retailprice"), 2).as("total_price"),
        countDistinct("p_type").as("n_types"))
      .orderBy("p_brand")
  }

  private val xmlRoundtripSql =
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(p_size) AS BIGINT) AS total_size,
      |  round(sum(p_retailprice), 2) AS total_price,
      |  CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Binary-file ingest (`binaryFile` source) — the raw-shard shape every
    * multimodal pipeline starts from: opaque blobs on disk, read as
    * (path, content) rows with the decode downstream. Four deterministic
    * text shards (documents concatenated by doc_id within doc_id % 4,
    * newline-joined) are staged, read back through the binaryFile source,
    * and verified BYTE-EXACTLY: the oracle rebuilds each shard's payload
    * from the documents table with the same ordered string_agg and
    * md5-compares, so a single flipped byte anywhere in stage-write →
    * binary scan → UTF-8 decode fails the hash. Staging collects 4 rows
    * (one per shard) to write real files — the same justified-eager
    * pattern as the kinesis fixture; the binaryFile READ is a normal
    * distributed scan, one task per shard at any shard count.
    */
  def binaryFiles(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_bin_") + "/shards"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    val shards = Tables.documents(s, dir)
      .groupBy((col("doc_id") % 4).as("shard"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("doc_id"),
        col("text")))), x => x("text")), "\n").as("payload"))
      .collect()
    shards.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, f"shard_${r.getLong(0)}%d.txt"),
        r.getString(1).getBytes("UTF-8"))
    }
    s.read.format("binaryFile").load(tmp)
      .select(regexp_extract(col("path"), "shard_(\\d+)\\.txt", 1)
          .cast("long").as("shard"),
        col("length").as("n_bytes"),
        md5(col("content")).as("payload_md5"),
        (size(split(col("content").cast("string"), "\n", -1))).cast("long")
          .as("n_docs"))
      .orderBy("shard")
  }

  private val binaryFilesSql =
    """SELECT doc_id % 4 AS shard,
      |  CAST(sum(octet_length(encode(text))) + count(*) - 1 AS BIGINT) AS n_bytes,
      |  md5(string_agg(text, chr(10) ORDER BY doc_id)) AS payload_md5,
      |  CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** PERMISSIVE CSV parse with a corrupt-record column — the batch
    * dead-letter pattern (the batch twin of the streaming poison-pill
    * path [REF A9]): a staged CSV carries the 25 nation rows plus 5
    * deterministically malformed lines (non-numeric key for every
    * nationkey % 5 == 0); the read must park each bad line's RAW TEXT in
    * `_corrupt_record` without failing the scan or corrupting a good
    * row. The oracle rebuilds both populations from the nation table by
    * the same injection rule and md5-pins the ordered corrupt payload —
    * a parser that drops, truncates, or mis-attributes even one line
    * fails the hash. Staging collects 25+5 lines to write one real file
    * (same justified-eager pattern as the binary shards); the read is a
    * normal distributed CSV scan.
    */
  def csvPermissive(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_csvp_")
    val rows = Tables.nation(s, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .collect().sortBy(_.getLong(0))
    val lines = rows.flatMap { r =>
      val k = r.getLong(0)
      val good = s"$k,${r.getString(1)},${r.getLong(2)}"
      if (k % 5 == 0) Seq(good, s"xx$k,BAD,notanum") else Seq(good)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "nation.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(tmp)
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_nationkey"))).as("good_key_sum"),
        md5(expr(
          "CAST(array_join(array_sort(collect_list(_corrupt_record)), '\n') AS BINARY)"))
          .as("corrupt_md5"))
  }

  private val csvPermissiveSql =
    """WITH bad AS (
      |  SELECT 'xx' || CAST(n_nationkey AS VARCHAR) || ',BAD,notanum' AS line
      |  FROM nation WHERE n_nationkey % 5 = 0)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM nation) AS n_good,
      |  (SELECT CAST(count(*) AS BIGINT) FROM bad) AS n_corrupt,
      |  (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation) AS good_key_sum,
      |  (SELECT md5(string_agg(line, chr(10) ORDER BY line)) FROM bad)
      |    AS corrupt_md5""".stripMargin

  /** JSON twin of [[csvPermissive]] [REF A9]: malformed JSON lines park
    * raw in `_corrupt_record` (the poison-pill dead-letter discipline,
    * AmazonKinesisApplicationSampleRecordProcessor.java:63-87) while good
    * records parse — the JSON ingestion contract a log pipeline needs at
    * 100 TB, where one truncated record must never kill a batch. Staged
    * lines derive deterministically from the nation fixture (every 5th key
    * contributes an unterminated-object line); the corrupt set is
    * md5-pinned over its sorted raw lines so the oracle checks CONTENT,
    * not just counts.
    */
  def jsonPermissive(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_jsonp_")
    val rows = Tables.nation(s, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .collect().sortBy(_.getLong(0))
    val lines = rows.flatMap { r =>
      val k = r.getLong(0)
      val good =
        s"""{"n_nationkey":$k,"n_name":"${r.getString(1)}","n_regionkey":${r.getLong(2)}}"""
      if (k % 5 == 0) Seq(good, s"""{"n_nationkey":$k,"n_name":"BAD""") else Seq(good)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "nation.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType),
      StructField("_corrupt_record", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(tmp)
      .agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("n_nationkey"))).as("good_key_sum"),
        md5(expr(
          "CAST(array_join(array_sort(collect_list(_corrupt_record)), '\n') AS BINARY)"))
          .as("corrupt_md5"))
  }

  private val jsonPermissiveSql =
    """WITH bad AS (
      |  SELECT '{"n_nationkey":' || CAST(n_nationkey AS VARCHAR)
      |      || ',"n_name":"BAD' AS line
      |  FROM nation WHERE n_nationkey % 5 = 0)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM nation) AS n_good,
      |  (SELECT CAST(count(*) AS BIGINT) FROM bad) AS n_corrupt,
      |  (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation) AS good_key_sum,
      |  (SELECT md5(string_agg(line, chr(10) ORDER BY line)) FROM bad)
      |    AS corrupt_md5""".stripMargin

  /** Partitioned parquet write → partition-pruned read: only two partition
    * directories may be scanned (the scale-out layout pattern: partition by
    * low-cardinality routing key, prune at read).
    */
  def partitionedWrite(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_part_") + "/orders_by_status"
    Tables.orders(s, dir).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("o_orderstatus").isin("F", "P")) // partition pruning
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("o_orderstatus")
  }

  private val partitionedWriteSql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(o_totalprice), 4) AS avg_price
      |FROM orders WHERE o_orderstatus IN ('F', 'P')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Catalog DDL round-trip [REF A2-A5]: the reference checks stream
    * existence, creates it, waits for ACTIVE, and lists streams
    * (AmazonKinesisRecordProducerSample.java:73-112). The engine-side
    * analogue is the table catalog: `saveAsTable` (create), `tableExists`
    * (status — a saved table is immediately ACTIVE; no poll loop needed),
    * `listTables` (list), `spark.table` (use). The returned frame carries
    * the existence/listing assertions as columns so the oracle checks them.
    */
  def catalogRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tbl = "graft_catalog_demo"
    dropManaged(s, tbl)
    Tables.nation(s, dir)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"))
      .write.mode("overwrite").saveAsTable(tbl) // create [REF A3]
    val exists = s.catalog.tableExists(tbl) // status [REF A2/A4]
    val listedOnce = // list [REF A5]
      s.catalog.listTables().filter(_.name == tbl).count() == 1
    s.table(tbl)
      .withColumn("table_exists", lit(exists))
      .withColumn("listed_once", lit(listedOnce))
      .orderBy("n_regionkey")
  }

  private val catalogRoundtripSql =
    """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
      |  true AS table_exists, true AS listed_once
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Remove a managed table idempotently, including a leftover location
    * from a crashed run (fresh in-memory catalog + existing dir would fail
    * CREATE with LOCATION_ALREADY_EXISTS).
    */
  private def dropManaged(s: SparkSession, tbl: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = java.nio.file.Paths.get(
      new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath)
    val loc = wh.resolve(tbl)
    if (java.nio.file.Files.exists(loc)) {
      java.nio.file.Files.walk(loc)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Bucketed co-located join: both sides pre-bucketed (and sorted) on the
    * join key, so the join itself needs NO exchange — at 100 TB this is the
    * difference between re-shuffling two fact tables per query and reading
    * co-located buckets (PlanSpec asserts the shuffle-free join). The
    * aggregation after the join still shuffles on its own (tiny) key.
    */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    dropManaged(s, "graft_orders_bkt")
    dropManaged(s, "graft_customer_bkt")
    Tables.orders(s, dir).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("graft_orders_bkt")
    Tables.customer(s, dir).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("graft_customer_bkt")
    s.table("graft_orders_bkt")
      .join(s.table("graft_customer_bkt"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("c_mktsegment")
  }

  private val bucketedJoinSql =
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** SQL-DML catalog surface: CTAS + INSERT INTO + query-back, the
    * pure-SQL twin of `src_catalog_ddl`'s DataFrame API round-trip. The
    * CTAS writes parquet through the same datasource path as
    * `saveAsTable`; INSERT INTO appends files (no rewrite of existing
    * data — the append-only layout that scales to continuous ingestion).
    * The final aggregation proves both populations landed in one table.
    */
  def sqlCtasInsert(s: SparkSession, dir: String): DataFrame = {
    val tbl = "graft_sql_ctas"
    dropManaged(s, tbl)
    Tables.registerViews(s, dir)
    s.sql(s"""CREATE TABLE $tbl USING PARQUET AS
             |SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey < 3""".stripMargin)
    s.sql(s"""INSERT INTO $tbl
             |SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey >= 3""".stripMargin)
    s.sql(s"""SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
             |  min(n_name) AS first_nation
             |FROM $tbl GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  private val sqlCtasInsertSql =
    """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
      |  min(n_name) AS first_nation
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Hidden `_metadata` file columns — provenance without a side channel:
    * every parquet row can name the file it came from and its row index
    * inside that file. This is the lineage hook an ingest audit needs
    * (which file produced this bad row?) and the basis of file-granular
    * incremental reprocessing. The declared output pins the row_index
    * contract LAYOUT-INDEPENDENTLY (the oracle runs over table views and
    * cannot see physical file names, and the fixture may be re-generated
    * as a multi-part directory): per physical file the index must be
    * 0-based and dense (count == last + 1), rolled up to `all_dense`, and
    * the per-file counts must partition the table (`n_rows`).
    */
  def fileMetadata(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .select(
        org.apache.spark.sql.functions.col("_metadata.file_name").as("file_name"),
        org.apache.spark.sql.functions.col("_metadata.row_index").as("ri"))
      .groupBy("file_name")
      .agg(count(lit(1)).as("n"),
        min("ri").as("first_idx"), max("ri").as("last_idx"))
      .agg(
        sum("n").as("n_rows"),
        min(col("first_idx") === 0 && col("n") === col("last_idx") + 1)
          .as("all_dense"))

  private val fileMetadataSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS all_dense
      |FROM lineitem""".stripMargin

  /** multiLine JSON: one file holding a single JSON ARRAY of objects —
    * the interchange shape REST dumps and config exports arrive in, which
    * the default JSON-Lines reader cannot parse (it would see one
    * unsplittable corrupt line). The staged array is built from the
    * nation rows (toJSON, driver-side — 25 rows), read back with
    * multiLine=true, and aggregated; the oracle aggregates the original
    * parquet, so a reader that drops or re-types a row fails the hash.
    * multiLine files are NOT splittable — at 100 TB this shape is for
    * small config/dim payloads, never the fact tables (that is the
    * documented trade of the format, not of this query).
    */
  def jsonMultiline(s: SparkSession, dir: String): DataFrame = {
    val tmp = graft.Scratch.dir("graft_jsonml_")
    val rows = Tables.nation(s, dir).orderBy("n_nationkey")
      .toJSON.collect()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "nations.json"),
      rows.mkString("[\n", ",\n", "\n]").getBytes("UTF-8"))
    s.read.option("multiLine", "true").json(tmp)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"),
        sum(length(col("n_name"))).as("name_chars"))
      .orderBy("n_regionkey")
  }

  // n_regionkey CAST to BIGINT: JSON inference has no integer widths
  private val jsonMultilineSql =
    """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
      |  CAST(count(*) AS BIGINT) AS n_nations,
      |  CAST(sum(length(n_name)) AS BIGINT) AS name_chars
      |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin

  /** Parquet compression codecs: the same supplier table written with
    * zstd (the modern scan-speed/ratio default) and gzip (the legacy
    * interchange codec), read back and aggregated — plus a physical
    * assertion that each directory's data files really carry the codec
    * extension, so a silently-ignored option cannot pass. The oracle
    * emits the same aggregate with literal TRUE: any codec-induced value
    * drift or a false extension check fails the hash.
    */
  def parquetCodecs(s: SparkSession, dir: String): DataFrame = {
    val base = graft.Scratch.dir("graft_codec_")
    val src = Tables.supplier(s, dir)
    val perCodec = Seq("gzip" -> ".gz.parquet", "zstd" -> ".zstd.parquet")
      .map { case (codec, ext) =>
        val path = s"$base/$codec"
        src.write.mode("overwrite").option("compression", codec).parquet(path)
        import scala.jdk.CollectionConverters._
        val dataFiles = java.nio.file.Files.list(java.nio.file.Paths.get(path))
          .iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSeq
        val extOk = dataFiles.nonEmpty && dataFiles.forall(_.endsWith(ext))
        s.read.parquet(path)
          .agg(count(lit(1)).as("n_suppliers"),
            round(sum("s_acctbal"), 2).as("total_bal"))
          .select(lit(codec).as("codec"), col("n_suppliers"), col("total_bal"),
            lit(extOk).as("codec_ext_ok"))
      }
    perCodec.reduce(_ unionByName _).orderBy("codec")
  }

  private val parquetCodecsSql =
    """SELECT codec, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  round(sum(s_acctbal), 2) AS total_bal, TRUE AS codec_ext_ok
      |FROM supplier CROSS JOIN (SELECT unnest(['gzip', 'zstd']) AS codec)
      |GROUP BY codec ORDER BY codec""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("src_json_multiline", jsonMultiline, Some(jsonMultilineSql)),
    QueryDef("src_parquet_codecs", parquetCodecs, Some(parquetCodecsSql)),
    QueryDef("src_file_metadata", fileMetadata, Some(fileMetadataSql)),
    QueryDef("src_sql_ctas_insert", sqlCtasInsert, Some(sqlCtasInsertSql)),
    QueryDef("src_bucketed_join", bucketedJoin, Some(bucketedJoinSql)),
    QueryDef("src_catalog_ddl", catalogRoundtrip, Some(catalogRoundtripSql)),
    QueryDef("src_csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql)),
    QueryDef("src_json_roundtrip", jsonRoundtrip, Some(jsonRoundtripSql)),
    QueryDef("src_text_roundtrip", textRoundtrip, Some(textRoundtripSql)),
    QueryDef("src_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    QueryDef("src_partitioned_pruned", partitionedWrite, Some(partitionedWriteSql)),
    QueryDef("src_schema_merge", schemaMerge, Some(schemaMergeSql)),
    QueryDef("src_xml_roundtrip", xmlRoundtrip, Some(xmlRoundtripSql)),
    QueryDef("src_binary_files", binaryFiles, Some(binaryFilesSql)),
    QueryDef("src_csv_permissive", csvPermissive, Some(csvPermissiveSql)),
    QueryDef("src_json_permissive", jsonPermissive, Some(jsonPermissiveSql))
  )
}
