package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Scalar-function batteries: oracle-checked coverage of SURVEY.md §2.9
  * (string / regex / math / datetime / conditional / array / higher-order /
  * struct-map / json / bitwise). Each query evaluates a batch of functions
  * over a deterministic slice of the corpus; int-valued results are cast to
  * long and array results joined to strings so Spark parquet output and the
  * DuckDB oracle compare bit-for-bit.
  */
object Functions {

  /** Arrays rendered as strings for comparison (`[1 2]` vs `[1, 2]`). */
  private def aj(c: Column): Column =
    array_join(transform(c, _.cast("string")), ",")

  def fnString1(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        lower(col("n_name")).as("lo"),
        initcap(lower(col("n_name"))).as("cap"),
        length(col("n_name")).cast("long").as("len"),
        substring(col("n_name"), 1, 6).as("sub"),
        concat(col("n_name"), lit("-"), col("n_nationkey").cast("string")).as("cat"),
        concat_ws("/", col("n_name"), lit("x"), col("n_name")).as("catws"),
        lpad(col("n_name"), 12, "*").as("padl"),
        rpad(col("n_name"), 12, "#").as("padr"),
        trim(lpad(col("n_name"), 12, "*"), "*").as("trm"),
        reverse(col("n_name")).as("rev"),
        repeat(substring(col("n_name"), 1, 2), 3).as("rep"),
        expr("left(n_name, 3)").as("lft"),
        expr("right(n_name, 3)").as("rgt"),
        instr(col("n_name"), "_").cast("long").as("pos"),
        expr("replace(n_name, 'NATION', 'N')").as("rpl"),
        expr("split_part(n_name, '_', 2)").as("spl"),
        ascii(substring(col("n_name"), 1, 1)).cast("long").as("asc_code"),
        expr("char(65 + n_nationkey % 26)").as("chr_out"),
        translate(col("n_name"), "NAT", "xyz").as("tra"))
      .orderBy("key")
  val fnString1Sql: String =
    """SELECT n_nationkey AS key,
      |  lower(n_name) AS lo,
      |  upper(substr(lower(n_name),1,1)) || substr(lower(n_name),2) AS cap,
      |  length(n_name) AS len,
      |  substr(n_name, 1, 6) AS sub,
      |  n_name || '-' || CAST(n_nationkey AS VARCHAR) AS cat,
      |  concat_ws('/', n_name, 'x', n_name) AS catws,
      |  lpad(n_name, 12, '*') AS padl,
      |  rpad(n_name, 12, '#') AS padr,
      |  trim(lpad(n_name, 12, '*'), '*') AS trm,
      |  reverse(n_name) AS rev,
      |  repeat(substr(n_name, 1, 2), 3) AS rep,
      |  left(n_name, 3) AS lft,
      |  right(n_name, 3) AS rgt,
      |  instr(n_name, '_') AS pos,
      |  replace(n_name, 'NATION', 'N') AS rpl,
      |  split_part(n_name, '_', 2) AS spl,
      |  CAST(ascii(substr(n_name, 1, 1)) AS BIGINT) AS asc_code,
      |  chr(65 + n_nationkey % 26) AS chr_out,
      |  translate(n_name, 'NAT', 'xyz') AS tra
      |FROM nation ORDER BY key""".stripMargin

  def fnString2(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        md5(col("n_name").cast("binary")).as("md5_hex"),
        sha2(col("n_name").cast("binary"), 256).as("sha256_hex"),
        base64(col("n_name").cast("binary")).as("b64"),
        decode(unbase64(base64(col("n_name").cast("binary"))), "UTF-8").as("b64_rt"),
        lower(hex(col("n_name"))).as("hex_str"),
        levenshtein(col("n_name"), lit("NATION_1")).cast("long").as("lev"),
        col("n_name").startsWith("NATION_1").as("sw"),
        col("n_name").endsWith("1").as("ew"),
        col("n_name").contains("_1").as("ct"),
        find_in_set(col("n_name"), lit("NATION_1,NATION_5,NATION_9")).cast("long").as("fis"),
        col("n_name").like("NATION_1%").as("lk"),
        col("n_name").ilike("nation_1%").as("ilk"))
      .orderBy("key")
  val fnString2Sql: String =
    """SELECT n_nationkey AS key,
      |  md5(n_name) AS md5_hex,
      |  sha256(n_name) AS sha256_hex,
      |  base64(n_name::BLOB) AS b64,
      |  n_name AS b64_rt,
      |  lower(hex(n_name)) AS hex_str,
      |  levenshtein(n_name, 'NATION_1') AS lev,
      |  starts_with(n_name, 'NATION_1') AS sw,
      |  ends_with(n_name, '1') AS ew,
      |  contains(n_name, '_1') AS ct,
      |  CAST(coalesce(list_position(string_split('NATION_1,NATION_5,NATION_9', ','),
      |    n_name), 0) AS BIGINT) AS fis,
      |  n_name LIKE 'NATION_1%' AS lk,
      |  n_name ILIKE 'nation_1%' AS ilk
      |FROM nation ORDER BY key""".stripMargin

  def fnRegex(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        col("n_name").rlike("[02468]$").as("even_end"),
        regexp_extract(col("n_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("n_name"), "[0-9]", "#").as("masked"),
        regexp_count(col("n_name"), lit("[0-9]")).cast("long").as("n_digits"),
        aj(regexp_extract_all(col("n_name"), lit("[A-Z]+"), lit(0))).as("letter_runs"))
      .orderBy("key")
  val fnRegexSql: String =
    """SELECT n_nationkey AS key,
      |  regexp_matches(n_name, '[02468]$') AS even_end,
      |  regexp_extract(n_name, '([0-9]+)', 1) AS digits,
      |  regexp_replace(n_name, '[0-9]', '#', 'g') AS masked,
      |  CAST(len(regexp_extract_all(n_name, '[0-9]')) AS BIGINT) AS n_digits,
      |  array_to_string(regexp_extract_all(n_name, '[A-Z]+'), ',') AS letter_runs
      |FROM nation ORDER BY key""".stripMargin

  def fnMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").filter(col("p_partkey") < 200)
      .select(
        col("p_partkey").as("key"),
        abs(-col("p_size")).cast("long").as("absv"),
        ceil(col("p_retailprice")).cast("long").as("ceilv"),
        floor(col("p_retailprice")).cast("long").as("floorv"),
        round(col("p_retailprice") * 2, 3).as("dbl_price"),
        round(sqrt(col("p_size")), 6).as("sq"),
        round(cbrt(col("p_retailprice")), 6).as("cb"),
        round(exp(col("p_size") % 5), 6).as("expv"),
        round(log(col("p_retailprice")), 6).as("lnv"),
        round(log10(col("p_retailprice")), 6).as("l10"),
        round(log2(col("p_size")), 6).as("l2"),
        pow(col("p_size"), 2).as("powv"),
        pmod(-col("p_size"), lit(7)).cast("long").as("pm"),
        factorial(col("p_size") % 10).as("fact"),
        signum(col("p_retailprice") - 1000).as("sgn"),
        greatest(col("p_size"), lit(25)).cast("long").as("grt"),
        least(col("p_size"), lit(25)).cast("long").as("lst"),
        width_bucket(col("p_retailprice"), lit(0.0), lit(2000.0), lit(10)).as("bucket"))
      .orderBy("key")
  val fnMathSql: String =
    """SELECT p_partkey AS key,
      |  CAST(abs(-p_size) AS BIGINT) AS absv,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS ceilv,
      |  CAST(floor(p_retailprice) AS BIGINT) AS floorv,
      |  round(p_retailprice * 2, 3) AS dbl_price,
      |  round(sqrt(p_size), 6) AS sq,
      |  round(cbrt(p_retailprice), 6) AS cb,
      |  round(exp(p_size % 5), 6) AS expv,
      |  round(ln(p_retailprice), 6) AS lnv,
      |  round(log10(p_retailprice), 6) AS l10,
      |  round(log2(p_size), 6) AS l2,
      |  pow(p_size, 2) AS powv,
      |  CAST((-p_size % 7 + 7) % 7 AS BIGINT) AS pm,
      |  CAST(factorial(p_size % 10) AS BIGINT) AS fact,
      |  CAST(sign(p_retailprice - 1000) AS DOUBLE) AS sgn,
      |  CAST(greatest(p_size, 25) AS BIGINT) AS grt,
      |  CAST(least(p_size, 25) AS BIGINT) AS lst,
      |  CASE WHEN p_retailprice < 0 THEN 0
      |       WHEN p_retailprice >= 2000 THEN 11
      |       ELSE CAST(floor(p_retailprice / (2000.0 / 10)) AS BIGINT) + 1
      |  END AS bucket
      |FROM part WHERE p_partkey < 200 ORDER BY key""".stripMargin

  def fnTrig(s: SparkSession, d: String): DataFrame = {
    val x = col("p_size") / 10.0
    val y = col("p_size") / 50.0
    t(s, d, "part").filter(col("p_partkey") < 200)
      .select(
        col("p_partkey").as("key"),
        round(sin(x), 9).as("sinv"),
        round(cos(x), 9).as("cosv"),
        round(tan(x), 9).as("tanv"),
        round(cot(x), 9).as("cotv"),
        round(asin(y), 9).as("asinv"),
        round(acos(y), 9).as("acosv"),
        round(atan(x), 9).as("atanv"),
        round(atan2(y, x), 9).as("atan2v"),
        round(sinh(y), 9).as("sinhv"),
        round(cosh(y), 9).as("coshv"),
        round(tanh(y), 9).as("tanhv"),
        round(degrees(y), 9).as("degv"),
        round(radians(col("p_size")), 9).as("radv"))
      .orderBy("key")
  }
  val fnTrigSql: String =
    """SELECT p_partkey AS key,
      |  round(sin(p_size / 10.0), 9) AS sinv,
      |  round(cos(p_size / 10.0), 9) AS cosv,
      |  round(tan(p_size / 10.0), 9) AS tanv,
      |  round(cot(p_size / 10.0), 9) AS cotv,
      |  round(asin(p_size / 50.0), 9) AS asinv,
      |  round(acos(p_size / 50.0), 9) AS acosv,
      |  round(atan(p_size / 10.0), 9) AS atanv,
      |  round(atan2(p_size / 50.0, p_size / 10.0), 9) AS atan2v,
      |  round((exp(p_size / 50.0) - exp(-(p_size / 50.0))) / 2, 9) AS sinhv,
      |  round((exp(p_size / 50.0) + exp(-(p_size / 50.0))) / 2, 9) AS coshv,
      |  round((exp(2 * (p_size / 50.0)) - 1) / (exp(2 * (p_size / 50.0)) + 1), 9)
      |    AS tanhv,
      |  round(degrees(p_size / 50.0), 9) AS degv,
      |  round(radians(p_size), 9) AS radv
      |FROM part WHERE p_partkey < 200 ORDER BY key""".stripMargin

  def fnDatetime1(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").filter(col("o_orderkey") < 200)
      .select(
        col("o_orderkey").as("key"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dy"),
        weekday(col("o_orderdate")).cast("long").as("dow"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        quarter(col("o_orderdate")).cast("long").as("qt"),
        date_trunc("month", col("o_orderdate")).as("trunc_m"),
        // DATE results surfaced as timestamps: pandas/pyarrow render date32
        // as objects vs DuckDB DATE as datetime64, which breaks value
        // comparison even when equal
        date_add(col("o_orderdate"), 30).cast("timestamp").as("plus30"),
        date_sub(col("o_orderdate"), 7).cast("timestamp").as("minus7"),
        add_months(col("o_orderdate"), 2).cast("timestamp").as("plus2mo"),
        last_day(col("o_orderdate")).cast("timestamp").as("eom"),
        datediff(ts("1998-01-01"), col("o_orderdate")).cast("long").as("days_to_98"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        make_date(lit(2020), month(col("o_orderdate")), dayofmonth(col("o_orderdate")))
          .cast("timestamp").as("mkd"))
      .orderBy("key")
  val fnDatetime1Sql: String =
    """SELECT o_orderkey AS key,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  day(o_orderdate) AS dy,
      |  CAST(isodow(o_orderdate) - 1 AS BIGINT) AS dow,
      |  dayofyear(o_orderdate) AS doy, quarter(o_orderdate) AS qt,
      |  date_trunc('month', o_orderdate)::TIMESTAMP AS trunc_m,
      |  (o_orderdate + INTERVAL 30 DAY)::TIMESTAMP AS plus30,
      |  (o_orderdate - INTERVAL 7 DAY)::TIMESTAMP AS minus7,
      |  (o_orderdate + INTERVAL 2 MONTH)::TIMESTAMP AS plus2mo,
      |  last_day(o_orderdate::DATE)::TIMESTAMP AS eom,
      |  date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS days_to_98,
      |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
      |  make_date(2020, month(o_orderdate), day(o_orderdate))::TIMESTAMP AS mkd
      |FROM orders WHERE o_orderkey < 200 ORDER BY key""".stripMargin

  def fnDatetime2(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").filter(col("event_id") < 200)
      .select(
        col("event_id").as("key"),
        hour(col("ts")).cast("long").as("hr"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("se"),
        unix_timestamp(col("ts")).as("ep_sec"),
        unix_micros(col("ts")).as("ep_us"),
        unix_millis(col("ts")).as("ep_ms"),
        from_unixtime(unix_timestamp(col("ts"))).as("ep_rt"),
        to_date(col("ts")).cast("timestamp").as("dt"),
        // date_bin: 15-minute tumbling bucket (reference date_bin,
        // functions/__init__.py:2788)
        timestamp_seconds((unix_micros(col("ts")) / lit(900000000L))
          .cast("long") * 900).as("bucket15m"),
        to_timestamp(lit("2024-03-05 10:30:00")).as("parsed"))
      .orderBy("key")
  val fnDatetime2Sql: String =
    """SELECT event_id AS key,
      |  hour(ts) AS hr, minute(ts) AS mi, second(ts) AS se,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ep_sec,
      |  epoch_us(ts) AS ep_us, epoch_ms(ts) AS ep_ms,
      |  strftime(to_timestamp(floor(epoch(ts)))::TIMESTAMP,
      |    '%Y-%m-%d %H:%M:%S') AS ep_rt,
      |  ts::DATE::TIMESTAMP AS dt,
      |  time_bucket(INTERVAL 15 MINUTE, ts)::TIMESTAMP AS bucket15m,
      |  TIMESTAMP '2024-03-05 10:30:00' AS parsed
      |FROM events WHERE event_id < 200 ORDER BY key""".stripMargin

  def fnConditional(s: SparkSession, d: String): DataFrame = {
    val premium = when(col("c_acctbal") > 5000, col("c_acctbal"))
    t(s, d, "customer").filter(col("c_custkey") < 300)
      .select(
        col("c_custkey").as("key"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        nvl(premium, lit(-1.0)).as("nv"),
        nvl2(premium, lit("rich"), lit("modest")).as("nv2"),
        col("c_mktsegment").isin("BUILDING", "MACHINERY").as("inl"),
        col("c_acctbal").between(0, 5000).as("btw"),
        premium.isNull.as("is_n"),
        premium.isNotNull.as("is_nn"),
        nanvl(when(col("c_acctbal") < 0, lit(Double.NaN))
          .otherwise(col("c_acctbal")), lit(-1.0)).as("nanv"),
        isnan(when(col("c_acctbal") < 0, lit(Double.NaN))
          .otherwise(col("c_acctbal"))).as("isn"))
      .orderBy("key")
  }
  val fnConditionalSql: String =
    """SELECT c_custkey AS key,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
      |  ifnull(CASE WHEN c_acctbal > 5000 THEN c_acctbal END, -1.0) AS nv,
      |  CASE WHEN c_acctbal > 5000 THEN 'rich' ELSE 'modest' END AS nv2,
      |  c_mktsegment IN ('BUILDING', 'MACHINERY') AS inl,
      |  c_acctbal BETWEEN 0 AND 5000 AS btw,
      |  (CASE WHEN c_acctbal > 5000 THEN c_acctbal END) IS NULL AS is_n,
      |  (CASE WHEN c_acctbal > 5000 THEN c_acctbal END) IS NOT NULL AS is_nn,
      |  CASE WHEN c_acctbal < 0 THEN -1.0 ELSE c_acctbal END AS nanv,
      |  c_acctbal < 0 AS isn
      |FROM customer WHERE c_custkey < 300 ORDER BY key""".stripMargin

  def fnArray1(s: SparkSession, d: String): DataFrame = {
    val arr = sequence(lit(1L), lit(1L) + col("n_nationkey").cast("long") % 4)
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        size(arr).cast("long").as("ln"),
        array_contains(arr, 2L).as("has2"),
        array_position(arr, 2L).as("pos2"),
        array_max(arr).as("mx"),
        array_min(arr).as("mn"),
        aj(reverse(arr)).as("rev"),
        aj(sort_array(arr, asc = false)).as("sorted_desc"),
        aj(sort_array(array_distinct(concat(arr, arr)))).as("dst"),
        aj(array_append(arr, 99L)).as("app"),
        aj(array_prepend(arr, 0L)).as("pre"),
        aj(concat(arr, array(lit(100L), lit(101L)))).as("cc"),
        aj(slice(arr, 1, 2)).as("sl"),
        element_at(arr, 1).as("el1"),
        aj(array_compact(array(lit(1L), lit(null).cast("long"), lit(2L)))).as("cmp"),
        aj(array_repeat(col("n_nationkey").cast("long") % 3, 3)).as("rpt"))
      .orderBy("key")
  }
  val fnArray1Sql: String =
    """WITH base AS (SELECT n_nationkey, generate_series(1, 1 + n_nationkey % 4) AS arr
      |  FROM nation)
      |SELECT n_nationkey AS key,
      |  len(arr) AS ln,
      |  list_contains(arr, 2) AS has2,
      |  CAST(coalesce(list_position(arr, 2), 0) AS BIGINT) AS pos2,
      |  CAST(list_max(arr) AS BIGINT) AS mx,
      |  CAST(list_min(arr) AS BIGINT) AS mn,
      |  array_to_string(list_reverse(arr), ',') AS rev,
      |  array_to_string(list_sort(arr, 'DESC'), ',') AS sorted_desc,
      |  array_to_string(list_sort(list_distinct(list_concat(arr, arr))), ',') AS dst,
      |  array_to_string(list_append(arr, 99), ',') AS app,
      |  array_to_string(list_prepend(0, arr), ',') AS pre,
      |  array_to_string(list_concat(arr, [100, 101]), ',') AS cc,
      |  array_to_string(array_slice(arr, 1, 2), ',') AS sl,
      |  CAST(arr[1] AS BIGINT) AS el1,
      |  '1,2' AS cmp,
      |  array_to_string(list_transform(generate_series(1, 3),
      |    x -> n_nationkey % 3), ',') AS rpt
      |FROM base ORDER BY key""".stripMargin

  def fnArray2(s: SparkSession, d: String): DataFrame = {
    val a = sequence(lit(1L), lit(1L) + col("n_nationkey").cast("long") % 3)
    val b = sequence(lit(2L), lit(4L))
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        aj(sort_array(array_intersect(a, b))).as("ix"),
        aj(sort_array(array_union(a, b))).as("un"),
        aj(sort_array(array_except(b, a))).as("exc"),
        arrays_overlap(a, b).as("ov"),
        aj(flatten(array(a, b))).as("fl"),
        aj(zip_with(a, a, (x, y) => x + y)).as("zw"))
      .orderBy("key")
  }
  val fnArray2Sql: String =
    """WITH base AS (SELECT n_nationkey,
      |    generate_series(1, 1 + n_nationkey % 3) AS a,
      |    generate_series(2, 4) AS b
      |  FROM nation)
      |SELECT n_nationkey AS key,
      |  coalesce(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS ix,
      |  array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS un,
      |  array_to_string(list_sort(list_filter(list_distinct(b),
      |    x -> NOT list_contains(a, x))), ',') AS exc,
      |  list_has_any(a, b) AS ov,
      |  array_to_string(flatten([a, b]), ',') AS fl,
      |  array_to_string(list_transform(a, x -> x + x), ',') AS zw
      |FROM base ORDER BY key""".stripMargin

  /** Higher-order functions with lambdas (reference functions/__init__.py:
    * 535-674, crates/core/src/expr/higher_order_function.rs). */
  def fnHof(s: SparkSession, d: String): DataFrame = {
    val a = sequence(lit(1L), lit(2L) + col("n_nationkey").cast("long") % 4)
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        aj(transform(a, x => x * 2 + 1)).as("tr"),
        aj(filter(a, x => x % 2 === 1)).as("odd"),
        exists(a, x => x > 3).as("any_big"),
        forall(a, x => x > 0).as("all_pos"),
        aggregate(a, lit(0L), (acc, x) => acc + x).as("total"),
        aggregate(a, lit(0L), (acc, x) => acc + x, acc => acc * 10).as("total10"))
      .orderBy("key")
  }
  val fnHofSql: String =
    """WITH base AS (SELECT n_nationkey,
      |    generate_series(1, 2 + n_nationkey % 4) AS a FROM nation)
      |SELECT n_nationkey AS key,
      |  array_to_string(list_transform(a, x -> x * 2 + 1), ',') AS tr,
      |  array_to_string(list_filter(a, x -> x % 2 = 1), ',') AS odd,
      |  len(list_filter(a, x -> x > 3)) > 0 AS any_big,
      |  len(list_filter(a, x -> x <= 0)) = 0 AS all_pos,
      |  CAST(list_sum(a) AS BIGINT) AS total,
      |  CAST(list_sum(a) * 10 AS BIGINT) AS total10
      |FROM base ORDER BY key""".stripMargin

  def fnStructMap(s: SparkSession, d: String): DataFrame = {
    val st = struct(col("n_name").as("name"), col("n_nationkey").as("id"))
    val mp = map_from_arrays(
      array(lit("a"), lit("b")),
      array(col("n_nationkey").cast("long"), col("n_nationkey").cast("long") * 2))
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        st.getField("name").as("st_name"),
        st.getField("id").cast("long").as("st_id"),
        element_at(mp, "b").as("mp_b"),
        aj(map_keys(mp)).as("mp_keys"),
        aj(map_values(mp)).as("mp_vals"),
        size(mp).cast("long").as("mp_size"))
      .orderBy("key")
  }
  val fnStructMapSql: String =
    """SELECT n_nationkey AS key,
      |  n_name AS st_name,
      |  CAST(n_nationkey AS BIGINT) AS st_id,
      |  CAST(n_nationkey * 2 AS BIGINT) AS mp_b,
      |  'a,b' AS mp_keys,
      |  CAST(n_nationkey AS VARCHAR) || ',' ||
      |    CAST(n_nationkey * 2 AS VARCHAR) AS mp_vals,
      |  CAST(2 AS BIGINT) AS mp_size
      |FROM nation ORDER BY key""".stripMargin

  def fnJson(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").filter(col("event_id") < 300)
      .select(
        col("event_id").as("key"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        from_json(col("props"), lit("map<string,long>"))("k").as("k_parsed"),
        get_json_object(col("props"), "$.missing").as("absent"))
      .orderBy("key")
  val fnJsonSql: String =
    """SELECT event_id AS key,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
      |  json_extract_string(props, '$.missing') AS absent
      |FROM events WHERE event_id < 300 ORDER BY key""".stripMargin

  def fnBitwise(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        col("n_nationkey").bitwiseAND(lit(12)).cast("long").as("band"),
        col("n_nationkey").bitwiseOR(lit(3)).cast("long").as("bor"),
        col("n_nationkey").bitwiseXOR(lit(5)).cast("long").as("bxor"),
        expr("~n_nationkey").cast("long").as("bnot"),
        shiftleft(col("n_nationkey"), 2).cast("long").as("shl"),
        shiftright(col("n_nationkey"), 1).cast("long").as("shr"),
        bit_count(col("n_nationkey")).cast("long").as("bcnt"),
        expr("getbit(n_nationkey, 1)").cast("long").as("bget"))
      .orderBy("key")
  val fnBitwiseSql: String =
    """SELECT n_nationkey AS key,
      |  CAST(n_nationkey & 12 AS BIGINT) AS band,
      |  CAST(n_nationkey | 3 AS BIGINT) AS bor,
      |  CAST(xor(n_nationkey, 5) AS BIGINT) AS bxor,
      |  CAST(~n_nationkey AS BIGINT) AS bnot,
      |  CAST(n_nationkey << 2 AS BIGINT) AS shl,
      |  CAST(n_nationkey >> 1 AS BIGINT) AS shr,
      |  CAST(bit_count(n_nationkey) AS BIGINT) AS bcnt,
      |  CAST((n_nationkey >> 1) & 1 AS BIGINT) AS bget
      |FROM nation ORDER BY key""".stripMargin

  /** digest(expr, algo) dispatch (reference functions/__init__.py:742). */
  def digest(c: Column, algo: String): Column = algo match {
    case "md5" => md5(c.cast("binary"))
    case "sha1" => sha1(c.cast("binary"))
    case "sha224" => sha2(c.cast("binary"), 224)
    case "sha256" => sha2(c.cast("binary"), 256)
    case "sha384" => sha2(c.cast("binary"), 384)
    case "sha512" => sha2(c.cast("binary"), 512)
    case "crc32" => crc32(c.cast("binary"))
    case other => throw new IllegalArgumentException(s"unknown digest algo: $other")
  }

  def fnMisc(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        overlay(col("n_name"), lit("##"), lit(3), lit(2)).as("ovl"),
        digest(col("n_name"), "md5").as("dg_md5"),
        digest(col("n_name"), "sha256").as("dg_sha256"),
        substring_index(col("n_name"), "_", 1).as("before_us"),
        format_string("%s-%03d", col("n_name"), col("n_nationkey")).as("fmt"),
        expr("elt(1 + n_nationkey % 2, 'even', 'odd')").as("parity"),
        locate("_", col("n_name"), 2).cast("long").as("us_from2"),
        concat(lit("["), expr("space(2)"), lit("]")).as("spaced"),
        make_timestamp(lit(2024), lit(3), col("n_nationkey") % 28 + 1,
          lit(10), lit(30), lit(0.0)).as("mk_ts"))
      .orderBy("key")
  val fnMiscSql: String =
    """SELECT n_nationkey AS key,
      |  substr(n_name, 1, 2) || '##' || substr(n_name, 5) AS ovl,
      |  md5(n_name) AS dg_md5,
      |  sha256(n_name) AS dg_sha256,
      |  string_split(n_name, '_')[1] AS before_us,
      |  printf('%s-%03d', n_name, n_nationkey) AS fmt,
      |  (['even', 'odd'])[1 + n_nationkey % 2] AS parity,
      |  CAST(CASE WHEN instr(substr(n_name, 2), '_') = 0 THEN 0
      |            ELSE instr(substr(n_name, 2), '_') + 1 END AS BIGINT)
      |    AS us_from2,
      |  '[  ]' AS spaced,
      |  make_timestamp(2024, 3, n_nationkey % 28 + 1, 10, 30, 0.0) AS mk_ts
      |FROM nation ORDER BY key""".stripMargin

  /** Bitmap functions (reference spark-namespace bitmap_count /
    * bit_position / bucket_number, functions/spark.py:295-323): position
    * arithmetic oracle-checked directly; bitmap_count over a constructed
    * bitmap equals distinct slot count. */
  def fnBitmap(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_keys"),
        expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(c_custkey + 1)))")
          .as("distinct_slots"),
        min(expr("bitmap_bit_position(c_custkey + 1)")).as("min_pos"),
        max(expr("bitmap_bucket_number(c_custkey + 1)")).as("max_bucket"))
      .orderBy("c_mktsegment")
  val fnBitmapSql: String =
    """SELECT c_mktsegment, count(*) AS n_keys,
      |  count(DISTINCT c_custkey % 32768) AS distinct_slots,
      |  min(c_custkey % 32768) AS min_pos,
      |  max(CAST(floor(c_custkey / 32768) + 1 AS BIGINT)) AS max_bucket
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Known-answer digests for the engine-specific hash battery over the
    * 25 fixed nation names (identical at every scale factor): xxhash64
    * (seed 42), crc32, murmur3 (seed 42), sha1, soundex. Captured once
    * from the shipped implementation; any drift in a hash kernel flips
    * the corresponding `_ok` boolean and fails the oracle hash gate. */
  private val hashKat: Seq[(Int, Long, Long, Long, String, String)] = Seq(
    (0, -3635279775981152085L, 3678181428L, -1410831725L, "1a90e65cfdf74f01f73e0898c48e42a23146d93f", "N350"),
    (1, -3191739825536951345L, 2889590946L, -535432793L, "84b53a4ba1b4da60205db37bbf2cf226a1caa7fa", "N350"),
    (2, -1122549408961623051L, 892533016L, -2095085442L, "6376bb52f51a7fb0d214d6ac32e162a4911ea79c", "N350"),
    (3, -6553752320078117943L, 1110821262L, -990314687L, "6b8582de89c84e237171dd66fe7daf1ab8bb683b", "N350"),
    (4, -2331079757126508432L, 3696319533L, -94285657L, "35e00a9de3ea0e0b76fdfd9e91276510e7055140", "N350"),
    (5, -1294387990695063588L, 2874567867L, -1912865338L, "0e940890e978abc08fc652f12aaae83540230da9", "N350"),
    (6, 429854463658653475L, 845102337L, 2114803422L, "ba7e94ea75dbe30b99b6b36076e8ffef3ebddef2", "N350"),
    (7, -1821898194479978266L, 1163398551L, 684737612L, "48d48664b5b6fc2acb4446e2d5db0fe7816b10a0", "N350"),
    (8, 9004275367934011975L, 3588689926L, -699653559L, "28d93f603990ba38349c0479b4e52b86ed3ca1db", "N350"),
    (9, -2287288453389768943L, 2732597392L, -1504658630L, "ebeff2be216d7bc2081c20bf681bf02d9afdbfa1", "N350"),
    (10, 9031943545092929825L, 3434030669L, -1389056751L, "efee0918f19590574f687e56d92db60398048629", "N350"),
    (11, 2281512348945990958L, 3148355291L, -408600478L, "0af3b8823e012a3f71b2f4257094c4829e74cdbb", "N350"),
    (12, -5326869236346025150L, 580994913L, -1159793486L, "a00860cf2fe35c6f3ef469578b0c006ecd09a429", "N350"),
    (13, -1287700060914886076L, 1436973047L, 202222762L, "c13434ff68e3d89801a44ffd4dcb3f302ace4a31", "N350"),
    (14, 8953969587697275637L, 3418546772L, 931982787L, "f9e5b01802658cab1db3e001c6672a3c6d0a8ed7", "N350"),
    (15, 8921703177071605178L, 3167081154L, 1524635837L, "5aeed18f44ff9de7e6570f6626a62ef6dc3597bb", "N350"),
    (16, -1323510064612203124L, 634159992L, -1836591637L, "0ce789a799dcc43aa9829346a94c87177b99f590", "N350"),
    (17, 8525034706716842015L, 1389081582L, 2112270236L, "788adb82d6ff2e45bff8d283fc9cd7e2cc501fc3", "N350"),
    (18, 9134329436019486759L, 3262426751L, 816357108L, "a9ed2db7db7ba788d3ea9a7822fa812865ee60a0", "N350"),
    (19, 3727839146706945451L, 3044253417L, 1154776119L, "3e71fb1d6927dda5b94c6fd80ad56cd58e9c41b5", "N350"),
    (20, -7170314187469782521L, 3884086670L, 721845699L, "f3204ca364c7a9b263ac0467da774721da418dcc", "N350"),
    (21, 5021686427711143555L, 2424653080L, 681881590L, "51361fe20853a86cb12de2e931475d362e6130d3", "N350"),
    (22, 1145888113185677229L, 160175266L, -1579254473L, "123936e0ec1877cf44f40584335ef6a7e771af60", "N350"),
    (23, -8151388513236445183L, 2123047988L, 1391635933L, "373800b1486d79cb703fd11ef677fad99bd8bb7d", "N350"),
    (24, -1615532261484927898L, 3773804951L, -607352285L, "e09196f17c606e72dfcaabc839280108b6ec7cc2", "N350"))

  /** Hash battery. md5 / sha256 exist in BOTH engines and are emitted as
    * hex for the oracle to recompute; the engine-specific kernels
    * (xxhash64, crc32, murmur3, sha1, soundex) have no DuckDB equivalent,
    * so each is compared in-plan against the inline known-answer table
    * above and emitted as a match boolean the oracle pins to `true` —
    * making the whole battery oracle-checkable instead of rows-only. */
  def fnHashEngine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kat = broadcast(hashKat.toDF(
      "key", "e_xx64", "e_crc", "e_murmur", "e_sha1", "e_sdx"))
    t(s, d, "nation")
      .select(
        col("n_nationkey").as("key"),
        col("n_name"),
        xxhash64(col("n_name")).as("xx64"),
        crc32(col("n_name").cast("binary")).as("crc"),
        hash(col("n_name")).cast("long").as("murmur"),
        sha1(col("n_name").cast("binary")).as("sha1_hex"),
        soundex(col("n_name")).as("sdx"))
      .join(kat, "key")
      .select(
        col("key").cast("long").as("key"),
        md5(col("n_name").cast("binary")).as("md5_hex"),
        sha2(col("n_name").cast("binary"), 256).as("sha256_hex"),
        (col("xx64") === col("e_xx64")).as("xx64_ok"),
        (col("crc") === col("e_crc")).as("crc_ok"),
        (col("murmur") === col("e_murmur")).as("murmur_ok"),
        (col("sha1_hex") === col("e_sha1")).as("sha1_ok"),
        (col("sdx") === col("e_sdx")).as("sdx_ok"))
      .orderBy("key")
  }
  val fnHashEngineSql: String =
    """SELECT CAST(n_nationkey AS BIGINT) AS key,
      |  md5(n_name) AS md5_hex,
      |  sha256(n_name) AS sha256_hex,
      |  true AS xx64_ok, true AS crc_ok, true AS murmur_ok,
      |  true AS sha1_ok, true AS sdx_ok
      |FROM nation ORDER BY key""".stripMargin

  /** Fuzzy string matching: edit distance (levenshtein, plus a bounded
    * variant returning -1 over the threshold, and a length-normalized
    * similarity) — the record-linkage battery. All integer-exact except
    * the similarity ratio, an exact-rational division rounded at 6.
    * Map-side only. */
  def fnFuzzy(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").filter(col("p_partkey") < 200)
      .select(
        col("p_partkey").as("key"),
        levenshtein(col("p_name"), col("p_type")).cast("long").as("lev"),
        levenshtein(col("p_name"), reverse(col("p_name"))).cast("long")
          .as("lev_rev"),
        // distance to p_brand + (p_size % 6) appended chars = p_size % 6,
        // so rows land on BOTH sides of the threshold (0..3 pass, 4..5
        // cap to -1) and the oracle CASE pins both branches
        levenshtein(col("p_brand"),
          concat(col("p_brand"), repeat(lit("x"), col("p_size") % 6)), 3)
          .cast("long").as("lev_capped"),
        round(lit(1.0) - levenshtein(col("p_name"), col("p_type"))
          .cast("double") / greatest(length(col("p_name")), length(col("p_type"))),
          6).as("sim_ratio"))
      .orderBy("key")
  val fnFuzzySql: String =
    """SELECT p_partkey AS key,
      |  levenshtein(p_name, p_type) AS lev,
      |  levenshtein(p_name, reverse(p_name)) AS lev_rev,
      |  CASE WHEN levenshtein(p_brand, p_brand || repeat('x', p_size % 6)) > 3
      |       THEN -1
      |       ELSE levenshtein(p_brand, p_brand || repeat('x', p_size % 6))
      |       END AS lev_capped,
      |  round(1.0 - CAST(levenshtein(p_name, p_type) AS DOUBLE)
      |    / greatest(length(p_name), length(p_type)), 6) AS sim_ratio
      |FROM part WHERE p_partkey < 200 ORDER BY key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string1" -> (fnString1 _),
    "fn_string2" -> (fnString2 _),
    "fn_regex" -> (fnRegex _),
    "fn_math" -> (fnMath _),
    "fn_trig" -> (fnTrig _),
    "fn_datetime1" -> (fnDatetime1 _),
    "fn_datetime2" -> (fnDatetime2 _),
    "fn_conditional" -> (fnConditional _),
    "fn_array1" -> (fnArray1 _),
    "fn_array2" -> (fnArray2 _),
    "fn_hof" -> (fnHof _),
    "fn_struct_map" -> (fnStructMap _),
    "fn_json" -> (fnJson _),
    "fn_bitwise" -> (fnBitwise _),
    "fn_misc" -> (fnMisc _),
    "fn_fuzzy" -> (fnFuzzy _),
    "fn_bitmap" -> (fnBitmap _),
    "fn_hash_engine" -> (fnHashEngine _))

  val oracle: Map[String, String] = Map(
    "fn_string1" -> fnString1Sql,
    "fn_string2" -> fnString2Sql,
    "fn_regex" -> fnRegexSql,
    "fn_math" -> fnMathSql,
    "fn_trig" -> fnTrigSql,
    "fn_datetime1" -> fnDatetime1Sql,
    "fn_datetime2" -> fnDatetime2Sql,
    "fn_conditional" -> fnConditionalSql,
    "fn_array1" -> fnArray1Sql,
    "fn_array2" -> fnArray2Sql,
    "fn_hof" -> fnHofSql,
    "fn_struct_map" -> fnStructMapSql,
    "fn_json" -> fnJsonSql,
    "fn_bitwise" -> fnBitwiseSql,
    "fn_misc" -> fnMiscSql,
    "fn_fuzzy" -> fnFuzzySql,
    "fn_bitmap" -> fnBitmapSql,
    "fn_hash_engine" -> fnHashEngineSql)
}
