package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function families (SURVEY.md §2 Part B "Scalar function families"):
  * string, date/time, math, conditional/null, hash. All row-parallel,
  * whole-stage-codegen'd projections — no shuffle except the final declared
  * sort.
  */
object ScalarQueries extends QueryModule {

  /** String family over part names/brands/types. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("lo_brand"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        trim(lit("  pad  ")).as("trimmed"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_first_word"),
        size(split(col("p_name"), " ", -1)).as("name_words"),
        instr(col("p_name"), "a").as("first_a"),
        levenshtein(col("p_brand"), lit("Brand#00")).as("lev_brand"))
      .orderBy("p_partkey")

  private val stringFuncsSql =
    """SELECT p_partkey,
      |  upper(p_name) AS up_name,
      |  lower(p_brand) AS lo_brand,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  substring(p_name, 1, 5) AS name_pfx,
      |  concat_ws('#', p_brand, p_type) AS brand_type,
      |  lpad(p_brand, 12, '*') AS brand_pad,
      |  trim('  pad  ') AS trimmed,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
      |  regexp_extract(p_type, '^(\w+)', 1) AS type_first_word,
      |  CAST(len(string_split(p_name, ' ')) AS INT) AS name_words,
      |  CAST(instr(p_name, 'a') AS INT) AS first_a,
      |  CAST(levenshtein(p_brand, 'Brand#00') AS INT) AS lev_brand
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Dictionary rewrite shared by the dt families (r12 scale
    * adjudication): every derived column is a pure function of
    * `o_orderdate`, whose domain is ~2.4k distinct days regardless of
    * corpus size — but formatter/zone-rule evaluation per ROW was what
    * made these two queries the worst non-exempt 10× factors in
    * BENCH_SCALE (9.0–9.5×; profiled this round at ~3.5 µs/row, with the
    * sort contributing only ~2.6×). Computing the derived columns once
    * per DISTINCT date and broadcast-joining back turns the per-row work
    * into a hash probe: measured 15.8 s → 2.6 s at 10×, factor 9.6 → 1.6,
    * and faster at base too. At 100 TB the dictionary is still only
    * |days in history| rows — the classic low-cardinality-projection
    * shape.
    */
  private def withDateDict(o: DataFrame, derived: Seq[Column]): DataFrame =
    o.select("o_orderkey", "o_orderdate")
      .join(broadcast(o.select("o_orderdate").distinct()
        .select(col("o_orderdate") +: derived: _*)), "o_orderdate")

  /** Date/time family over order dates (timestamps pinned UTC both sides). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    withDateDict(Tables.orders(s, dir), Seq(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(col("o_orderdate"), "yyyy-MM").as("yyyymm"),
        date_format(col("o_orderdate"), "EEEE").as("dow_name"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_epoch0"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s")))
      .select("o_orderkey", "yr", "mo", "dom", "qtr", "yyyymm", "dow_name",
        "plus30", "days_since_epoch0", "month_start", "month_end", "epoch_s")
      .orderBy("o_orderkey")

  private val dateFuncsSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  strftime(o_orderdate, '%Y-%m') AS yyyymm,
      |  dayname(o_orderdate) AS dow_name,
      |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
      |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_epoch0,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Math family over lineitem prices. exp/ln/sqrt round to 6 to absorb
    * any libm last-bit differences.
    */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_extendedprice") - 30000).as("price_dev"),
        round(pow(lit(1) + col("l_discount"), 2), 6).as("disc_sq"),
        round(sqrt(col("l_extendedprice")), 6).as("price_sqrt"),
        round(exp(col("l_discount")), 6).as("disc_exp"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        signum(col("l_discount") - 0.05).as("disc_sign"))
      .orderBy("l_orderkey")

  private val mathFuncsSql =
    """SELECT l_orderkey,
      |  round(l_extendedprice, 1) AS price_r1,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  abs(l_extendedprice - 30000) AS price_dev,
      |  round(pow(1 + l_discount, 2), 6) AS disc_sq,
      |  round(sqrt(l_extendedprice), 6) AS price_sqrt,
      |  round(exp(l_discount), 6) AS disc_exp,
      |  round(ln(l_extendedprice), 6) AS price_ln,
      |  ((l_orderkey % 7) + 7) % 7 AS key_mod7,
      |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1 WHEN l_discount - 0.05 < 0 THEN -1 ELSE 0 END AS DOUBLE) AS disc_sign
      |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin

  /** Conditional / null family: CASE WHEN, coalesce, nullif, greatest,
    * least, null-safe equality, nanvl.
    */
  def condFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(redacted)")).as("seg"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor0"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap1k"),
        (col("c_nationkey") <=> nullif(col("c_nationkey"), lit(5))).as("nullsafe_eq"),
        isnull(nullif(col("c_mktsegment"), lit("MACHINERY"))).as("is_machinery"),
        // nanvl: NaN-aware fallback (coalesce only covers NULL) — negative
        // balances become NaN, nanvl repairs them to 0
        round(nanvl(when(col("c_acctbal") < 0, lit(Double.NaN))
          .otherwise(col("c_acctbal")), lit(0.0)), 2).as("bal_nan0"))
      .orderBy("c_custkey")

  private val condFuncsSql =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |       WHEN c_acctbal < 5000 THEN 'standard'
      |       ELSE 'premium' END AS band,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg,
      |  round(greatest(c_acctbal, 0.0), 2) AS bal_floor0,
      |  round(least(c_acctbal, 1000.0), 2) AS bal_cap1k,
      |  (c_nationkey IS NOT DISTINCT FROM nullif(c_nationkey, 5)) AS nullsafe_eq,
      |  (nullif(c_mktsegment, 'MACHINERY') IS NULL) AS is_machinery,
      |  round(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 2) AS bal_nan0
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Cryptographic hash family (dedup keys): md5 / sha-256 hex parity. */
  def hashFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        md5(col("c_name").cast("binary")).as("md5_name"),
        sha2(col("c_name").cast("binary"), 256).as("sha256_name"))
      .orderBy("c_custkey")

  private val hashFuncsSql =
    """SELECT c_custkey, md5(c_name) AS md5_name, sha256(c_name) AS sha256_name
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Non-portable hash functions (xxhash64 with Spark's seed, crc32) —
    * engine-specific by design, so no DuckDB oracle; pinned by golden
    * values in ScalarSpec instead.
    */
  def hashEngineSpecific(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        xxhash64(col("c_name")).as("xx_name"),
        crc32(col("c_name").cast("binary")).as("crc_name"),
        hash(col("c_name"), col("c_nationkey")).as("murmur_name"))
      .orderBy("c_custkey")

  /** Predicate surface in one filter: AND/OR/NOT, IN, BETWEEN, LIKE,
    * IS NULL — pushed into the parquet scan where possible.
    */
  def filterPredicates(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(
        (col("p_name").like("%a%") &&
          col("p_size").between(10, 40) &&
          col("p_brand").isin("Brand#11", "Brand#22", "Brand#33") &&
          !(col("p_type").startsWith("small"))) ||
          col("p_retailprice").isNull)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .orderBy("p_partkey")

  private val filterPredicatesSql =
    """SELECT p_partkey, p_brand, p_size FROM part
      |WHERE (p_name LIKE '%a%'
      |  AND p_size BETWEEN 10 AND 40
      |  AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      |  AND NOT (p_type LIKE 'small%'))
      |  OR p_retailprice IS NULL
      |ORDER BY p_partkey""".stripMargin

  /** String collation (Spark 4): `collate(expr, 'UTF8_LCASE')` makes
    * comparison, DISTINCT, and filtering case-insensitive AT THE TYPE
    * LEVEL — no lower() wrapping at every use site, and (unlike the
    * lower() idiom) the collation participates in Catalyst equality
    * semantics. Mixed-case variants are derived deterministically; the
    * declared output is summary counts only — grouping BY a collated key
    * would surface an engine-chosen case representative, which is exactly
    * the nondeterminism the contract forbids. The oracle lowers.
    */
  def collationFuncs(s: SparkSession, dir: String): DataFrame = {
    val variant = when(col("c_custkey") % 3 === 0, upper(col("c_mktsegment")))
      .when(col("c_custkey") % 3 === 1, lower(col("c_mktsegment")))
      .otherwise(initcap(lower(col("c_mktsegment"))))
    Tables.customer(s, dir)
      .select(variant.as("seg"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("seg")).as("distinct_raw"),
        countDistinct(expr("collate(seg, 'UTF8_LCASE')")).as("distinct_ci"),
        sum(when(expr("collate(seg, 'UTF8_LCASE') = 'automobile'"), 1L)
          .otherwise(0L)).as("n_automobile_ci"),
        sum(when(col("seg") === "AUTOMOBILE", 1L).otherwise(0L)).as("n_automobile_cs"))
  }

  private val collationFuncsSql =
    """WITH v AS (
      |  SELECT CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
      |              WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
      |              ELSE upper(substr(c_mktsegment, 1, 1)) ||
      |                   lower(substr(c_mktsegment, 2)) END AS seg
      |  FROM customer)
      |SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT seg) AS BIGINT) AS distinct_raw,
      |  CAST(count(DISTINCT lower(seg)) AS BIGINT) AS distinct_ci,
      |  CAST(sum(CASE WHEN lower(seg) = 'automobile' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_automobile_ci,
      |  CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_automobile_cs
      |FROM v""".stripMargin

  /** Timezone conversion family: `from_utc_timestamp` /
    * `to_utc_timestamp` / `convert_timezone` / `make_date` /
    * `make_timestamp` — the functions every multi-region event pipeline
    * leans on, and a classic cross-engine correctness trap (DST rules,
    * naive-vs-instant semantics). The session timezone is pinned to UTC
    * on both engines; results render as strings so the comparison is on
    * wall-clock VALUES, not on timestamp internals.
    */
  def timezoneFuncs(s: SparkSession, dir: String): DataFrame =
    withDateDict(Tables.orders(s, dir), Seq(
        date_format(expr("from_utc_timestamp(o_orderdate, 'America/New_York')"),
          "yyyy-MM-dd HH:mm:ss").as("utc_as_ny"),
        date_format(expr("to_utc_timestamp(o_orderdate, 'America/New_York')"),
          "yyyy-MM-dd HH:mm:ss").as("ny_as_utc"),
        date_format(expr("convert_timezone('UTC', 'Asia/Tokyo', o_orderdate)"),
          "yyyy-MM-dd HH:mm:ss").as("utc_as_tokyo"),
        date_format(expr("make_date(year(o_orderdate), month(o_orderdate), 1)"),
          "yyyy-MM-dd").as("month_first"),
        date_format(expr(
          "make_timestamp(year(o_orderdate), month(o_orderdate), day(o_orderdate), 12, 30, 0)"),
          "yyyy-MM-dd HH:mm:ss").as("noonish")))
      .select("o_orderkey", "utc_as_ny", "ny_as_utc", "utc_as_tokyo",
        "month_first", "noonish")
      .orderBy("o_orderkey")

  private val timezoneFuncsSql =
    """SELECT o_orderkey,
      |  strftime(timezone('America/New_York', timezone('UTC', o_orderdate)),
      |    '%Y-%m-%d %H:%M:%S') AS utc_as_ny,
      |  strftime(timezone('UTC', timezone('America/New_York', o_orderdate)),
      |    '%Y-%m-%d %H:%M:%S') AS ny_as_utc,
      |  strftime(timezone('Asia/Tokyo', timezone('UTC', o_orderdate)),
      |    '%Y-%m-%d %H:%M:%S') AS utc_as_tokyo,
      |  strftime(make_date(CAST(year(o_orderdate) AS BIGINT),
      |    CAST(month(o_orderdate) AS BIGINT), 1), '%Y-%m-%d') AS month_first,
      |  strftime(make_timestamp(CAST(year(o_orderdate) AS BIGINT),
      |    CAST(month(o_orderdate) AS BIGINT), CAST(day(o_orderdate) AS BIGINT),
      |    12, 30, 0.0), '%Y-%m-%d %H:%M:%S') AS noonish
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("dt_timezone_funcs", timezoneFuncs, Some(timezoneFuncsSql)),
    QueryDef("str_collation", collationFuncs, Some(collationFuncsSql)),
    QueryDef("filter_predicates", filterPredicates, Some(filterPredicatesSql)),
    QueryDef("str_funcs", stringFuncs, Some(stringFuncsSql)),
    QueryDef("dt_funcs", dateFuncs, Some(dateFuncsSql)),
    QueryDef("math_funcs", mathFuncs, Some(mathFuncsSql)),
    QueryDef("cond_funcs", condFuncs, Some(condFuncsSql)),
    QueryDef("hash_funcs", hashFuncs, Some(hashFuncsSql)),
    QueryDef("hash_engine_specific", hashEngineSpecific, None)
  )
}
