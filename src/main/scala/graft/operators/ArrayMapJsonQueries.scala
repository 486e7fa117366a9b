package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Array / map / JSON families (SURVEY.md §2 Part B). Higher-order
  * functions (transform/filter/aggregate/zip_with) run inside codegen'd
  * projections; float vectors are cast element-wise to double *before*
  * arithmetic so both engines accumulate identically.
  */
object ArrayMapJsonQueries extends QueryModule {

  /** Numeric higher-order functions over the 64-dim embedding vectors. */
  def arrayNumeric(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)"), 6)
          .as("vec_sum"),
        round(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)"), 6)
          .as("norm_sq"),
        size(expr("filter(embedding, x -> x > 0)")).as("n_positive"),
        round(expr("aggregate(zip_with(embedding, reverse(embedding), (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), 0D, (acc, x) -> acc + x)"), 6)
          .as("dot_reversed"))
      .orderBy("vec_id")

  private val arrayNumericSql =
    """SELECT vec_id,
      |  CAST(len(embedding) AS INT) AS dim,
      |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
      |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
      |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm_sq,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
      |  round(list_sum(list_transform(list_zip(embedding, list_reverse(embedding)),
      |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS dot_reversed
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** String-array functions over tokenized documents. */
  def arrayStrings(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        split(col("text"), " ", -1).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        array_contains(col("toks"), "spark").as("has_spark"),
        array_join(slice(col("toks"), 1, 5), " ").as("head5"),
        array_join(sort_array(array_distinct(col("toks"))), ",").as("vocab"),
        size(array_distinct(col("toks"))).as("n_distinct"))
      .orderBy("doc_id")

  private val arrayStringsSql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ') AS head5,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Generator surface: posexplode of a vector slice (lateral view). */
  def explodeVectors(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
      .select(col("vec_id"), col("pos"),
        round(col("col").cast("double"), 6).as("val"))
      .orderBy("vec_id", "pos")

  private val explodeVectorsSql =
    """SELECT vec_id, CAST(idx - 1 AS INT) AS pos, round(CAST(val AS DOUBLE), 6) AS val
      |FROM (
      |  SELECT vec_id, unnest(list_slice(embedding, 1, 8)) AS val,
      |    generate_subscripts(list_slice(embedding, 1, 8), 1) AS idx
      |  FROM embeddings WHERE vec_id < 20
      |) ORDER BY vec_id, pos""".stripMargin

  /** Array construction: sequence, flatten, array_repeat, concat. */
  def arrayConstruct(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .select(
        col("n_nationkey"),
        array_join(expr("sequence(1, 1 + n_nationkey % 3)"), ",").as("seq_str"),
        array_join(flatten(array(expr("sequence(1, 2)"), expr("sequence(3, 4)"))), ",")
          .as("flat_str"),
        array_join(array_repeat(col("n_name"), 2), "|").as("repeated"),
        size(concat(expr("sequence(1, 3)"), expr("sequence(4, 5)"))).as("concat_len"))
      .orderBy("n_nationkey")

  private val arrayConstructSql =
    """SELECT n_nationkey,
      |  array_to_string(range(1, 2 + n_nationkey % 3), ',') AS seq_str,
      |  array_to_string(flatten([range(1, 3), range(3, 5)]), ',') AS flat_str,
      |  array_to_string([n_name, n_name], '|') AS repeated,
      |  CAST(len(list_concat(range(1, 4), range(4, 6))) AS INT) AS concat_len
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** The events fixture staged for per-row-expensive codec work. The file
    * is one parquet row-group, so without an exchange every per-row Jackson
    * parse runs on a single core. Range-partition + sort on `event_id`
    * BEFORE the heavy projection: the explicit partition count keeps AQE
    * from coalescing the spread away at toy scale, and sorting first keeps
    * the range-sampling pass on the narrow raw input instead of evaluating
    * the codec chain twice (orderBy *after* the projection would). At
    * cluster scale the scan splits naturally and this is just the ORDER BY
    * exchange.
    */
  private def eventsSortedSpread(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("props"), col("event_type"))
      .repartitionByRange(s.sparkContext.defaultParallelism, col("event_id"))
      .sortWithinPartitions("event_id")

  /** JSON family over events.props (a JSON object string). */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    eventsSortedSpread(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_get"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"),
        json_tuple(col("props"), "k").as("jt_k"))
      .select(
        col("event_id"),
        col("k_get"),
        element_at(col("m"), "k").as("k_map"),
        array_join(map_keys(col("m")), ",").as("keys"),
        to_json(col("m")).as("rejson"),
        col("jt_k"),
        schema_of_json(lit("""{"k": 87}""")).as("inferred_schema"))

  private val jsonFuncsSql =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS BIGINT) AS k_get,
      |  CAST(props->>'$.k' AS BIGINT) AS k_map,
      |  'k' AS keys,
      |  '{"k":' || (props->>'$.k') || '}' AS rejson,
      |  props->>'$.k' AS jt_k,
      |  'STRUCT<k: BIGINT>' AS inferred_schema
      |FROM events ORDER BY event_id""".stripMargin

  /** Map construction / manipulation from parsed JSON props (staged via
    * [[eventsSortedSpread]] like every per-row-codec query here).
    */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    eventsSortedSpread(s, dir)
      .select(
        col("event_id"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"),
        col("event_type"))
      .select(
        col("event_id"),
        size(col("m")).as("m_size"),
        element_at(col("m"), "k").as("k_val"),
        element_at(col("m"), "missing").as("missing_val"),
        size(map_concat(col("m"), map(lit("etype_len"), length(col("event_type")).cast("long"))))
          .as("merged_size"),
        array_join(transform(map_values(col("m")), x => (x * 2).cast("string")), ",")
          .as("doubled_vals"))

  private val mapFuncsSql =
    """SELECT event_id,
      |  1 AS m_size,
      |  CAST(props->>'$.k' AS BIGINT) AS k_val,
      |  CAST(NULL AS BIGINT) AS missing_val,
      |  2 AS merged_size,
      |  CAST(CAST(props->>'$.k' AS BIGINT) * 2 AS VARCHAR) AS doubled_vals
      |FROM events ORDER BY event_id""".stripMargin

  /** Map higher-order functions: transform_keys / transform_values /
    * map_filter / map_zip_with over the parsed props map. The parse + four
    * interpreted map-HOF lambdas are the per-row hot path — staged via
    * [[eventsSortedSpread]] so they never serialize on one core.
    */
  def mapHof(s: SparkSession, dir: String): DataFrame =
    eventsSortedSpread(s, dir)
      .select(col("event_id"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"))
      .select(
        col("event_id"),
        element_at(expr("transform_values(m, (k, v) -> v * 10)"), "k").as("k_x10"),
        size(expr("map_filter(m, (k, v) -> v > 50)")).as("n_large"),
        array_join(map_keys(expr("transform_keys(m, (k, v) -> upper(k))")), ",").as("upper_keys"),
        element_at(expr(
          "map_zip_with(m, transform_values(m, (k, v) -> v + 1), (k, v1, v2) -> v1 + v2)"), "k")
          .as("k_sum"))

  private val mapHofSql =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS BIGINT) * 10 AS k_x10,
      |  CASE WHEN CAST(props->>'$.k' AS BIGINT) > 50 THEN 1 ELSE 0 END AS n_large,
      |  'K' AS upper_keys,
      |  CAST(props->>'$.k' AS BIGINT) * 2 + 1 AS k_sum
      |FROM events ORDER BY event_id""".stripMargin

  // map_hof last: its four interpreted lambdas are the slowest path to
  // JIT-warm, and the sibling json/map queries warm the from_json + lambda
  // evaluator machinery first
  def defs: Seq[QueryDef] = Seq(
    QueryDef("arr_numeric_hof", arrayNumeric, Some(arrayNumericSql)),
    QueryDef("arr_string_funcs", arrayStrings, Some(arrayStringsSql)),
    QueryDef("arr_explode_vectors", explodeVectors, Some(explodeVectorsSql)),
    QueryDef("arr_construct", arrayConstruct, Some(arrayConstructSql)),
    QueryDef("json_funcs", jsonFuncs, Some(jsonFuncsSql)),
    QueryDef("map_funcs", mapFuncs, Some(mapFuncsSql)),
    QueryDef("map_hof_funcs", mapHof, Some(mapHofSql))
  )
}
