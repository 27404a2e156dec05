package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Q._

/** Relational operator coverage: one oracle-checked query per operator row
  * of SURVEY.md §2.3–2.8 and §2.13 (row ops, joins, aggregation, windows,
  * sort/limit, set ops, SQL surface). Scale notes per query: joins are
  * key-equi (shuffle-partitioned) or explicitly broadcast; nothing
  * collects to the driver.
  */
object Ops {

  // ---------- §2.4 joins ----------

  /** join with `on=` semantics: shared column name, key coalesced
    * (reference dataframe.py:1012 `coalesce_duplicate_keys=True`). */
  def joinUsing(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val o = t(s, d, "orders").select(col("o_custkey").as("custkey"), col("o_totalprice"))
    c.join(o, Seq("custkey"))
      .groupBy("custkey")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy("custkey")
  }
  val joinUsingSql: String =
    s"""SELECT c_custkey AS custkey, count(*) AS n_orders,
       |  ${DSUM("o_totalprice")} AS total
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |GROUP BY custkey ORDER BY custkey""".stripMargin

  def joinLeft(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_orderdate") >= ts("2001-06-01")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_recent"))
      .orderBy("c_custkey")
  val joinLeftSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_recent
      |FROM customer LEFT JOIN orders
      |  ON c_custkey = o_custkey AND o_orderdate >= TIMESTAMP '2001-06-01'
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  def joinRight(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_quantity") >= 49)
      .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"), "right")
      .groupBy(col("p_partkey"))
      .agg(count(col("l_orderkey")).as("n_bulk"))
      .orderBy("p_partkey")
  val joinRightSql: String =
    """SELECT p_partkey, count(l_orderkey) AS n_bulk
      |FROM (SELECT * FROM lineitem WHERE l_quantity >= 49) l
      |RIGHT JOIN part ON l_partkey = p_partkey
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin

  def joinFull(s: SparkSession, d: String): DataFrame = {
    val cn = t(s, d, "customer").select(col("c_nationkey")).distinct()
    val sn = t(s, d, "supplier").select(col("s_nationkey")).distinct()
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        col("c_nationkey").isNotNull.as("has_customers"),
        col("s_nationkey").isNotNull.as("has_suppliers"))
      .orderBy("nationkey")
  }
  val joinFullSql: String =
    """SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
      |  c_nationkey IS NOT NULL AS has_customers,
      |  s_nationkey IS NOT NULL AS has_suppliers
      |FROM (SELECT DISTINCT c_nationkey FROM customer) c
      |FULL JOIN (SELECT DISTINCT s_nationkey FROM supplier) s
      |  ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin

  def joinSemi(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  val joinSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  def joinAnti(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_small"))
      .orderBy("c_mktsegment")
  val joinAntiSql: String =
    """SELECT c_mktsegment, count(*) AS n_small FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  def joinCross(s: SparkSession, d: String): DataFrame =
    t(s, d, "region")
      .crossJoin(t(s, d, "orders").select(col("o_orderstatus")).distinct())
      .select("r_name", "o_orderstatus")
      .orderBy("r_name", "o_orderstatus")
  val joinCrossSql: String =
    """SELECT r_name, o_orderstatus
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) o
      |ORDER BY r_name, o_orderstatus""".stripMargin

  /** join_on with a non-equi (theta) predicate (reference dataframe.py:1153). */
  def joinTheta(s: SparkSession, d: String): DataFrame = {
    val s1 = t(s, d, "supplier")
      .select(col("s_suppkey").as("k1"), col("s_nationkey").as("n1"), col("s_acctbal").as("b1"))
    val s2 = t(s, d, "supplier")
      .select(col("s_nationkey").as("n2"), col("s_acctbal").as("b2"))
    s1.join(s2, col("n1") === col("n2") && col("b1") < col("b2"))
      .groupBy(col("k1"))
      .agg(count(lit(1)).as("n_richer"))
      .orderBy("k1")
  }
  val joinThetaSql: String =
    """SELECT s1.s_suppkey AS k1, count(*) AS n_richer
      |FROM supplier s1 JOIN supplier s2
      |  ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal < s2.s_acctbal
      |GROUP BY k1 ORDER BY k1""".stripMargin

  /** Pure range join (no equi key): customers against overlapping account-
    * balance bands, `lo <= c_acctbal < hi`. Executed as a BINNED equi-join:
    * each interval explodes into the fixed-width bins it covers (at most
    * `ceil(width / BIN) + 1` rows — bounded, dim-side only), each fact row
    * computes its single bin, and the two meet in a hash equi-join on
    * `bin` with the exact inequality as a residual filter. Without the
    * binning, a no-equi-key join is a broadcast-nested-loop (O(facts ×
    * bands) comparisons, driver-sized dim only); with it, the plan is an
    * ordinary hash join that shuffles by bin and scales out — bin width
    * trades dim-side fanout against residual selectivity, and a hot bin
    * (interval-dense region) salts like any skewed hash key. Same
    * technique as Spark's own range-join bucketing hint in Databricks
    * runtime and DuckDB's IEJoin fallback avoidance. */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    val binW = 512.0
    joinRangeBands(s, d)
      .withColumn("bin", explode(expr(
        s"sequence(CAST(floor(lo / $binW) AS BIGINT), CAST(floor(hi / $binW) AS BIGINT))")))
      .join(
        t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
          .withColumn("bin", floor(col("c_acctbal") / binW).cast("long")),
        Seq("bin"))
      .filter(col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("band_id")
  }

  /** Overlapping balance bands derived deterministically from `nation`
    * (width 150..1230, start step 370 — wide bands overlap neighbours). */
  def joinRangeBands(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation").select(
      col("n_nationkey").cast("long").as("band_id"),
      (col("n_nationkey") * 370.0 - 500.0).as("lo"),
      (col("n_nationkey") * 370.0 - 350.0 + (col("n_nationkey") % 7) * 180.0)
        .as("hi"))

  val joinRangeSql: String =
    s"""WITH bands AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS band_id,
       |    n_nationkey * 370.0 - 500.0 AS lo,
       |    n_nationkey * 370.0 - 350.0 + (n_nationkey % 7) * 180.0 AS hi
       |  FROM nation)
       |SELECT band_id, count(*) AS n_cust, ${DSUM("c_acctbal")} AS sum_bal
       |FROM customer JOIN bands ON c_acctbal >= lo AND c_acctbal < hi
       |GROUP BY band_id ORDER BY band_id""".stripMargin

  // ---------- §2.8 set operations ----------

  def setUnionAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("k"))
      .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")
  val setUnionAllSql: String =
    """SELECT k, count(*) AS n FROM (
      |  SELECT c_nationkey AS k FROM customer
      |  UNION ALL SELECT s_nationkey FROM supplier) u
      |GROUP BY k ORDER BY k""".stripMargin

  def setUnionDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("k"))
      .union(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .distinct()
      .orderBy("k")
  val setUnionDistinctSql: String =
    """SELECT c_nationkey AS k FROM customer
      |UNION SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin

  def setUnionByName(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "nation").select(col("n_nationkey").as("key"), col("n_name").as("name"))
    val b = t(s, d, "region").select(col("r_name").as("name"), col("r_regionkey").as("key"))
    a.unionByName(b).orderBy("key", "name")
  }
  val setUnionByNameSql: String =
    """SELECT n_nationkey AS key, n_name AS name FROM nation
      |UNION ALL BY NAME
      |SELECT r_name AS name, r_regionkey AS key FROM region
      |ORDER BY key, name""".stripMargin

  def setIntersect(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("k"))
      .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .orderBy("k")
  val setIntersectSql: String =
    """SELECT c_nationkey AS k FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin

  def setIntersectAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select((col("c_custkey") % 200).as("k"))
      .intersectAll(t(s, d, "part").select((col("p_partkey") % 200).as("k")))
      .orderBy("k")
  val setIntersectAllSql: String =
    """SELECT c_custkey % 200 AS k FROM customer
      |INTERSECT ALL SELECT p_partkey % 200 FROM part ORDER BY k""".stripMargin

  def setExcept(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation").select(col("n_nationkey").as("k"))
      .except(t(s, d, "supplier").select(col("s_nationkey").as("k")))
      .orderBy("k")
  val setExceptSql: String =
    """SELECT n_nationkey AS k FROM nation
      |EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""".stripMargin

  def setExceptAll(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select((col("c_custkey") % 100).as("k"))
      .exceptAll(t(s, d, "supplier").select((col("s_suppkey") % 100).as("k")))
      .orderBy("k")
  val setExceptAllSql: String =
    """SELECT c_custkey % 100 AS k FROM customer
      |EXCEPT ALL SELECT s_suppkey % 100 FROM supplier ORDER BY k""".stripMargin

  // ---------- §2.5 aggregation ----------

  def aggGlobal(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      min(col("l_shipdate")).as("first_ship"),
      max(col("l_shipdate")).as("last_ship"),
      dsum(col("l_quantity")).as("total_qty"),
      davg(col("l_extendedprice")).as("avg_price"))
  val aggGlobalSql: String =
    s"""SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
       |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
       |  ${DSUM("l_quantity")} AS total_qty,
       |  ${DAVG("l_extendedprice")} AS avg_price
       |FROM lineitem""".stripMargin

  def aggRollup(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
        grouping(col("o_orderstatus")).cast("long").as("g_status"),
        grouping(col("o_orderpriority")).cast("long").as("g_prio"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  val aggRollupSql: String =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       |  ${DSUM("o_totalprice")} AS total,
       |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
       |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  def aggCube(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  val aggCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    t(s, d, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }
  val aggGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Aggregate modifiers: DISTINCT and FILTER (reference expr.py:1020-1072). */
  def aggFilterDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_orderpriority")).as("n_prios"),
        sum_distinct(col("o_custkey")).as("sum_custs"),
        expr("count(*) FILTER (WHERE o_totalprice > 200000)").as("n_big"),
        expr("min(o_orderdate) FILTER (WHERE o_orderpriority = '1-URGENT')").as("first_urgent"))
      .orderBy("o_orderstatus")
  val aggFilterDistinctSql: String =
    """SELECT o_orderstatus,
      |  count(DISTINCT o_orderpriority) AS n_prios,
      |  CAST(sum(DISTINCT o_custkey) AS BIGINT) AS sum_custs,
      |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |  min(o_orderdate) FILTER (WHERE o_orderpriority = '1-URGENT') AS first_urgent
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  def aggStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").agg(
      round(stddev_samp(col("p_retailprice")), 2).as("sd_samp"),
      round(stddev_pop(col("p_retailprice")), 2).as("sd_pop"),
      round(var_samp(col("p_retailprice")), 2).as("v_samp"),
      round(var_pop(col("p_retailprice")), 2).as("v_pop"),
      round(corr(col("p_retailprice"), col("p_size")), 6).as("price_size_corr"),
      round(covar_samp(col("p_retailprice"), col("p_size")), 2).as("cov_samp"),
      round(covar_pop(col("p_retailprice"), col("p_size")), 2).as("cov_pop"),
      round(regr_slope(col("p_retailprice"), col("p_size")), 4).as("slope"),
      round(regr_intercept(col("p_retailprice"), col("p_size")), 2).as("icept"),
      regr_count(col("p_retailprice"), col("p_size")).as("n"))
  val aggStatsSql: String =
    """SELECT round(stddev_samp(p_retailprice), 2) AS sd_samp,
      |  round(stddev_pop(p_retailprice), 2) AS sd_pop,
      |  round(var_samp(p_retailprice), 2) AS v_samp,
      |  round(var_pop(p_retailprice), 2) AS v_pop,
      |  round(corr(p_retailprice, p_size), 6) AS price_size_corr,
      |  round(covar_samp(p_retailprice, p_size), 2) AS cov_samp,
      |  round(covar_pop(p_retailprice, p_size), 2) AS cov_pop,
      |  round(regr_slope(p_retailprice, p_size), 4) AS slope,
      |  round(regr_intercept(p_retailprice, p_size), 2) AS icept,
      |  regr_count(p_retailprice, p_size) AS n
      |FROM part""".stripMargin

  /** first/last-by-order (reference first_value/last_value with order_by,
    * functions/__init__.py:6193-6305) via min_by/max_by on a unique key. */
  def aggMinMaxBy(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy(col("o_orderstatus"))
      .agg(
        min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"),
        max_by(col("o_custkey"), col("o_orderkey")).as("last_cust"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
      .orderBy("o_orderstatus")
  val aggMinMaxBySql: String =
    """SELECT o_orderstatus,
      |  arg_min(o_custkey, o_orderkey) AS first_cust,
      |  arg_max(o_custkey, o_orderkey) AS last_cust,
      |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  def aggMedianPercentile(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy(col("o_orderstatus"))
      .agg(
        round(median(col("o_totalprice")), 4).as("med"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"))
      .orderBy("o_orderstatus")
  val aggMedianPercentileSql: String =
    """SELECT o_orderstatus, round(median(o_totalprice), 4) AS med,
      |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Ordered array_agg / string_agg (reference functions/__init__.py:5164,7054)
    * rewritten distributed-safe: collect then sort inside the group. */
  def aggCollect(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation").groupBy(col("n_regionkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        concat_ws(",", array_sort(collect_set(col("n_name")))).as("nation_set"),
        size(collect_list(col("n_name"))).cast("long").as("n"))
      .orderBy("n_regionkey")
  val aggCollectSql: String =
    """SELECT n_regionkey,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |  string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nation_set,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  def aggBitBool(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").groupBy(col("o_orderstatus"))
      .agg(
        bit_and(col("o_orderkey")).as("k_and"),
        bit_or(col("o_orderkey")).as("k_or"),
        bit_xor(col("o_orderkey")).as("k_xor"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_totalprice") > 400000).as("any_big"))
      .orderBy("o_orderstatus")
  val aggBitBoolSql: String =
    """SELECT o_orderstatus,
      |  bit_and(o_orderkey) AS k_and, bit_or(o_orderkey) AS k_or,
      |  bit_xor(o_orderkey) AS k_xor,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  bool_or(o_totalprice > 400000) AS any_big
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------- §2.6 windows ----------

  def winRanking(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("pr", round(percent_rank().over(w), 8))
      .withColumn("cd", round(cume_dist().over(w), 8))
      .withColumn("tile", ntile(4).over(w))
      .filter(col("rn") <= 5)
      .select("o_orderstatus", "o_orderkey", "rn", "rk", "drk", "pr", "cd", "tile")
      .orderBy("o_orderstatus", "rn")
  }
  val winRankingSql: String =
    """WITH w AS (SELECT o_orderstatus, o_orderkey,
      |    row_number() OVER win AS rn, rank() OVER win AS rk,
      |    dense_rank() OVER win AS drk,
      |    round(percent_rank() OVER win, 8) AS pr,
      |    round(cume_dist() OVER win, 8) AS cd,
      |    ntile(4) OVER win AS tile
      |  FROM orders
      |  WINDOW win AS (PARTITION BY o_orderstatus
      |                 ORDER BY o_totalprice DESC, o_orderkey))
      |SELECT * FROM w WHERE rn <= 5 ORDER BY o_orderstatus, rn""".stripMargin

  def winLeadLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    t(s, d, "orders").filter(col("o_custkey") < 100)
      .withColumn("prev_price", lag(col("o_totalprice"), 1, -1.0).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1, -1.0).over(w))
      .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price")
      .orderBy("o_custkey", "o_orderkey")
  }
  val winLeadLagSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  lag(o_totalprice, 1, -1.0) OVER win AS prev_price,
      |  lead(o_totalprice, 1, -1.0) OVER win AS next_price
      |FROM orders WHERE o_custkey < 100
      |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Running totals + moving average over ROWS frames; decimal-cast so the
    * running double accumulation is engine-independent. */
  def winFrames(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val dec = col("o_totalprice").cast(DecimalType(18, 2))
    t(s, d, "orders").filter(col("o_custkey") < 100)
      .withColumn("running_total",
        sum(dec).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("moving_sum3",
        sum(dec).over(w.rowsBetween(-2, 0)).cast("double"))
      .withColumn("n_so_far",
        count(lit(1)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("o_custkey", "o_orderkey", "running_total", "moving_sum3", "n_so_far")
      .orderBy("o_custkey", "o_orderkey")
  }
  val winFramesSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |    OVER (win ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS moving_sum3,
      |  count(*) OVER (win ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS n_so_far
      |FROM orders WHERE o_custkey < 100
      |WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** RANGE frame over a numeric ordering column. */
  def winRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
      .rangeBetween(-1000, 0)
    t(s, d, "orders").filter(col("o_orderkey") < 2000)
      .withColumn("n_in_range", count(lit(1)).over(w))
      .select("o_orderstatus", "o_orderkey", "n_in_range")
      .orderBy("o_orderstatus", "o_orderkey")
  }
  val winRangeSql: String =
    """SELECT o_orderstatus, o_orderkey,
      |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
      |    AS n_in_range
      |FROM orders WHERE o_orderkey < 2000
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  def winValue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders").filter(col("o_orderkey") < 2000)
      .withColumn("first_key", first(col("o_orderkey")).over(w))
      .withColumn("last_key", last(col("o_orderkey")).over(w))
      .withColumn("second_cust", nth_value(col("o_custkey"), 2).over(w))
      .select("o_orderstatus", "o_orderkey", "first_key", "last_key", "second_cust")
      .orderBy("o_orderstatus", "o_orderkey")
  }
  val winValueSql: String =
    """SELECT o_orderstatus, o_orderkey,
      |  first_value(o_orderkey) OVER win AS first_key,
      |  last_value(o_orderkey) OVER win AS last_key,
      |  nth_value(o_custkey, 2) OVER win AS second_cust
      |FROM orders WHERE o_orderkey < 2000
      |WINDOW win AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin

  /** Any aggregate over a window (reference expr.py:1074). */
  def winAggOver(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
    t(s, d, "lineitem").filter(col("l_orderkey") < 100)
      .withColumn("flag_qty",
        sum(col("l_quantity").cast(DecimalType(18, 2))).over(w).cast("double"))
      .withColumn("flag_n", count(lit(1)).over(w))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "flag_qty", "flag_n")
      .orderBy("l_orderkey", "l_linenumber")
  }
  val winAggOverSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
      |    OVER (PARTITION BY l_returnflag) AS DOUBLE) AS flag_qty,
      |  count(*) OVER (PARTITION BY l_returnflag) AS flag_n
      |FROM lineitem WHERE l_orderkey < 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------- §2.3 / §2.7 row ops, sort, limit ----------

  def rowopWithColumn(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .withColumn("inventory_value", col("p_retailprice") * col("p_size"))
      .withColumnRenamed("p_type", "category")
      .withColumn("size_long", col("p_size").cast("long"))
      .withColumn("not_a_number", expr("try_cast(p_name AS INT)"))
      .drop("p_brand")
      .select("p_partkey", "category", "inventory_value", "size_long", "not_a_number")
      .orderBy("p_partkey")
  val rowopWithColumnSql: String =
    """SELECT p_partkey, p_type AS category,
      |  p_retailprice * p_size AS inventory_value,
      |  CAST(p_size AS BIGINT) AS size_long,
      |  TRY_CAST(p_name AS INT) AS not_a_number
      |FROM part ORDER BY p_partkey""".stripMargin

  /** filter/select from SQL strings (reference dataframe.py:641 accepts
    * SQL-string predicates; select_exprs dataframe.py:515). */
  def rowopSelectExpr(s: SparkSession, d: String): DataFrame =
    t(s, d, "part")
      .filter("p_size BETWEEN 10 AND 20 AND p_type LIKE 'S%'")
      .selectExpr("p_partkey", "upper(p_name) AS shout",
        "p_retailprice * 1.1 AS marked_up")
      .orderBy("p_partkey")
  val rowopSelectExprSql: String =
    """SELECT p_partkey, upper(p_name) AS shout, p_retailprice * 1.1 AS marked_up
      |FROM part WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE 'S%'
      |ORDER BY p_partkey""".stripMargin

  /** fill_null (reference dataframe.py:1853 / df.na.fill). */
  def rowopFillNull(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("premium_bal", when(col("c_acctbal") > 5000, col("c_acctbal")))
      .na.fill(Map("premium_bal" -> -1.0))
      .groupBy(col("c_mktsegment"))
      .agg(dsum(col("premium_bal")).as("total"), count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  val rowopFillNullSql: String =
    s"""SELECT c_mktsegment,
       |  ${DSUM("coalesce(CASE WHEN c_acctbal > 5000 THEN c_acctbal END, -1.0)")} AS total,
       |  count(*) AS n
       |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** distinct_on rewrite (reference dataframe.py:1420): latest order per
    * customer via a ranked window. */
  def rowopDistinctOn(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_orderdate"), desc("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }
  val rowopDistinctOnSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders) t
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** unnest_columns (reference dataframe.py:1741) via sequence + explode. */
  def rowopUnnest(s: SparkSession, d: String): DataFrame =
    t(s, d, "nation")
      .withColumn("i", explode(sequence(lit(0), col("n_nationkey") % 3)))
      .select(col("n_nationkey"), col("i").cast("long").as("i"))
      .orderBy("n_nationkey", "i")
  val rowopUnnestSql: String =
    """SELECT n_nationkey, CAST(unnest(generate_series(0, n_nationkey % 3)) AS BIGINT) AS i
      |FROM nation ORDER BY n_nationkey, i""".stripMargin

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): null keys match
    * each other instead of dropping out. EqualNullSafe on the join keys
    * still compiles to a hash join (null is just another key value), so
    * the plan keeps the shuffle/broadcast topology of a plain equi-join —
    * no fallback to nested-loop. */
  def joinNullsafe(s: SparkSession, d: String): DataFrame = {
    val a = t(s, d, "nation")
      .select(col("n_nationkey"), nullif(col("n_regionkey"), lit(2)).as("rk"))
    val b = t(s, d, "region")
      .select(nullif(col("r_regionkey"), lit(2)).as("rk2"), col("r_name"))
    a.join(b, col("rk") <=> col("rk2"))
      .select(col("n_nationkey"), col("rk"), col("r_name"))
      .orderBy("n_nationkey", "r_name")
  }
  val joinNullsafeSql: String =
    """SELECT n_nationkey, nullif(n_regionkey, 2) AS rk, r_name
      |FROM nation JOIN region
      |  ON nullif(n_regionkey, 2) IS NOT DISTINCT FROM nullif(r_regionkey, 2)
      |ORDER BY n_nationkey, r_name""".stripMargin

  /** Pivot (long→wide reshape): per line status, quantity by return flag
    * spread into one column per flag value. Spark's `.pivot(col, values)`
    * with an explicit value list compiles to one hash aggregate with
    * conditional sums — a single shuffle by the grouping key, no per-value
    * scan fan-out, which is exactly the conditional-aggregation SQL the
    * oracle states. Explicit values also keep the plan static at 100 TB
    * (no driver-side distinct scan to discover pivot columns). */
  def rowopPivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum(col("l_quantity")))
      .select(col("l_linestatus"), col("A").as("qty_a"),
        col("N").as("qty_n"), col("R").as("qty_r"))
      .orderBy("l_linestatus")
  val rowopPivotSql: String =
    s"""SELECT l_linestatus,
       |  ${DSUM("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
       |  ${DSUM("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
       |  ${DSUM("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
       |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Unpivot / melt (wide→long reshape, the inverse of [[rowopPivot]]):
    * part metric columns stacked into (metric, value) rows. Spark's
    * `unpivot` is a zero-shuffle map-side expand (each input row emits one
    * row per value column) — the stacked UNION ALL the oracle states, but
    * in one scan instead of one per metric. */
  def rowopUnpivot(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").filter(col("p_partkey") < 50)
      .unpivot(
        Array(col("p_partkey")),
        Array(col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice")),
        "metric", "value")
      .orderBy("p_partkey", "metric")
  val rowopUnpivotSql: String =
    """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
      |FROM part WHERE p_partkey < 50
      |UNION ALL
      |SELECT p_partkey, 'retailprice', p_retailprice
      |FROM part WHERE p_partkey < 50
      |ORDER BY p_partkey, metric""".stripMargin

  /** Fixed-width histogram over a measure: bucket index from explicit
    * floor arithmetic (bit-identical across engines, unlike width_bucket
    * whose internal rounding is implementation-defined), count + exact
    * min/max per bucket. One map-side bucket computation + one keyed
    * aggregate — the canonical distributed histogram; at 100 TB the
    * partial aggregation means each executor ships at most n_buckets
    * rows to the shuffle. */
  def aggHistogram(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .withColumn("bucket",
        floor((col("l_extendedprice") - 900.0) / 5000.0).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy("bucket")
  val aggHistogramSql: String =
    """SELECT CAST(floor((l_extendedprice - 900.0) / 5000.0) AS BIGINT) AS bucket,
      |  count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin

  def rowopCaseWhen(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("size_class",
        when(col("o_totalprice") > 300000, "large")
          .when(col("o_totalprice") > 100000, "medium")
          .otherwise("small"))
      .groupBy("size_class")
      .agg(count(lit(1)).as("n"))
      .orderBy("size_class")
  val rowopCaseWhenSql: String =
    """SELECT CASE WHEN o_totalprice > 300000 THEN 'large'
      |            WHEN o_totalprice > 100000 THEN 'medium'
      |            ELSE 'small' END AS size_class, count(*) AS n
      |FROM orders GROUP BY size_class ORDER BY size_class""".stripMargin

  /** In-memory source (reference from_pydict, context.py:783). */
  def memSource(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5), (4L, "delta", -1.0))
      .toDF("id", "name", "score")
      .filter(col("score") > 0)
      .orderBy("id")
  }
  val memSourceSql: String =
    """SELECT CAST(id AS BIGINT) AS id, name, score FROM (VALUES
      |  (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', 3.5)) v(id, name, score)
      |ORDER BY id""".stripMargin

  def sortNulls(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("premium_bal", when(col("c_acctbal") > 9000, col("c_acctbal")))
      .select("c_custkey", "premium_bal")
      .orderBy(col("premium_bal").desc_nulls_last, col("c_custkey").asc)
      .limit(60)
  val sortNullsSql: String =
    """SELECT c_custkey, CASE WHEN c_acctbal > 9000 THEN c_acctbal END AS premium_bal
      |FROM customer
      |ORDER BY premium_bal DESC NULLS LAST, c_custkey LIMIT 60""".stripMargin

  def limitOffset(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
      .offset(10)
      .limit(10)
  val limitOffsetSql: String =
    "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 10 OFFSET 10"

  /** tail (reference dataframe.py:945) as sort-reverse-limit-reverse. */
  def sortTail(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select("c_custkey", "c_name")
      .orderBy(desc("c_custkey"))
      .limit(5)
      .orderBy(asc("c_custkey"))
  val sortTailSql: String =
    """SELECT * FROM (SELECT c_custkey, c_name FROM customer
      |  ORDER BY c_custkey DESC LIMIT 5) t ORDER BY c_custkey""".stripMargin

  // ---------- §2.13 SQL surface ----------

  /** Parameterized SQL (reference context.py:692 `param_values`). */
  def sqlParams(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    s.sql(
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_totalprice > :minp AND o_orderstatus = :status
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      Map("minp" -> 250000, "status" -> "F"))
  }
  val sqlParamsSql: String =
    """SELECT o_orderpriority, count(*) AS n FROM orders
      |WHERE o_totalprice > 250000 AND o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Identifier splicing (reference `param_strings`, context.py:692-756,
    * context.rs:541): `$tbl`/`$key` name a relation and a column — things
    * `:name` value binding cannot parameterize — validated and substituted
    * pre-parse, combined here with a typed `:minkey` value parameter. */
  def sqlParamStrings(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    new GraftSession(s).sql(
      """SELECT $key AS nation_key, n_name FROM $tbl
        |WHERE $key >= :minkey ORDER BY nation_key""".stripMargin,
      params = Map("minkey" -> 5),
      paramStrings = Map("tbl" -> "nation", "key" -> "n_nationkey"))
  }
  val sqlParamStringsSql: String =
    """SELECT n_nationkey AS nation_key, n_name FROM nation
      |WHERE n_nationkey >= 5 ORDER BY nation_key""".stripMargin

  /** Scalar + IN + EXISTS subqueries through the SQL front end. */
  def sqlSubqueries(s: SparkSession, d: String): DataFrame = {
    registerAll(s, d)
    s.sql(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) + 4000 FROM customer)
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }
  val sqlSubqueriesSql: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) + 4000 FROM customer)
      |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
      |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** View registration + CTE through SQL (reference into_view/register_view,
    * dataframe.py:364, context.py:888). */
  def sqlView(s: SparkSession, d: String): DataFrame = {
    t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .createOrReplaceTempView("returned_items")
    s.sql(
      s"""WITH by_part AS (
         |  SELECT l_partkey, count(*) AS n_returns
         |  FROM returned_items GROUP BY l_partkey)
         |SELECT n_returns, count(*) AS n_parts FROM by_part
         |GROUP BY n_returns ORDER BY n_returns""".stripMargin)
  }
  val sqlViewSql: String =
    """WITH by_part AS (
      |  SELECT l_partkey, count(*) AS n_returns
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
      |SELECT n_returns, count(*) AS n_parts FROM by_part
      |GROUP BY n_returns ORDER BY n_returns""".stripMargin

  // ---------- registry ----------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_using" -> (joinUsing _),
    "join_left" -> (joinLeft _),
    "join_right" -> (joinRight _),
    "join_full" -> (joinFull _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "join_cross" -> (joinCross _),
    "join_theta" -> (joinTheta _),
    "join_range" -> (joinRange _),
    "join_nullsafe" -> (joinNullsafe _),
    "set_union_all" -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_union_by_name" -> (setUnionByName _),
    "set_intersect" -> (setIntersect _),
    "set_intersect_all" -> (setIntersectAll _),
    "set_except" -> (setExcept _),
    "set_except_all" -> (setExceptAll _),
    "agg_global" -> (aggGlobal _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_filter_distinct" -> (aggFilterDistinct _),
    "agg_stats" -> (aggStats _),
    "agg_min_max_by" -> (aggMinMaxBy _),
    "agg_median_percentile" -> (aggMedianPercentile _),
    "agg_collect" -> (aggCollect _),
    "agg_bit_bool" -> (aggBitBool _),
    "win_ranking" -> (winRanking _),
    "win_lead_lag" -> (winLeadLag _),
    "win_frames" -> (winFrames _),
    "win_range" -> (winRange _),
    "win_value" -> (winValue _),
    "win_agg_over" -> (winAggOver _),
    "rowop_with_column" -> (rowopWithColumn _),
    "rowop_select_expr" -> (rowopSelectExpr _),
    "rowop_fill_null" -> (rowopFillNull _),
    "rowop_distinct_on" -> (rowopDistinctOn _),
    "rowop_unnest" -> (rowopUnnest _),
    "rowop_case_when" -> (rowopCaseWhen _),
    "rowop_pivot" -> (rowopPivot _),
    "rowop_unpivot" -> (rowopUnpivot _),
    "agg_histogram" -> (aggHistogram _),
    "mem_source" -> (memSource _),
    "sort_nulls" -> (sortNulls _),
    "limit_offset" -> (limitOffset _),
    "sort_tail" -> (sortTail _),
    "sql_params" -> (sqlParams _),
    "sql_param_strings" -> (sqlParamStrings _),
    "sql_subqueries" -> (sqlSubqueries _),
    "sql_view" -> (sqlView _))

  val oracle: Map[String, String] = Map(
    "join_using" -> joinUsingSql,
    "join_left" -> joinLeftSql,
    "join_right" -> joinRightSql,
    "join_full" -> joinFullSql,
    "join_semi" -> joinSemiSql,
    "join_anti" -> joinAntiSql,
    "join_cross" -> joinCrossSql,
    "join_theta" -> joinThetaSql,
    "join_range" -> joinRangeSql,
    "join_nullsafe" -> joinNullsafeSql,
    "set_union_all" -> setUnionAllSql,
    "set_union_distinct" -> setUnionDistinctSql,
    "set_union_by_name" -> setUnionByNameSql,
    "set_intersect" -> setIntersectSql,
    "set_intersect_all" -> setIntersectAllSql,
    "set_except" -> setExceptSql,
    "set_except_all" -> setExceptAllSql,
    "agg_global" -> aggGlobalSql,
    "agg_rollup" -> aggRollupSql,
    "agg_cube" -> aggCubeSql,
    "agg_grouping_sets" -> aggGroupingSetsSql,
    "agg_filter_distinct" -> aggFilterDistinctSql,
    "agg_stats" -> aggStatsSql,
    "agg_min_max_by" -> aggMinMaxBySql,
    "agg_median_percentile" -> aggMedianPercentileSql,
    "agg_collect" -> aggCollectSql,
    "agg_bit_bool" -> aggBitBoolSql,
    "win_ranking" -> winRankingSql,
    "win_lead_lag" -> winLeadLagSql,
    "win_frames" -> winFramesSql,
    "win_range" -> winRangeSql,
    "win_value" -> winValueSql,
    "win_agg_over" -> winAggOverSql,
    "rowop_with_column" -> rowopWithColumnSql,
    "rowop_select_expr" -> rowopSelectExprSql,
    "rowop_fill_null" -> rowopFillNullSql,
    "rowop_distinct_on" -> rowopDistinctOnSql,
    "rowop_unnest" -> rowopUnnestSql,
    "rowop_case_when" -> rowopCaseWhenSql,
    "rowop_pivot" -> rowopPivotSql,
    "rowop_unpivot" -> rowopUnpivotSql,
    "agg_histogram" -> aggHistogramSql,
    "mem_source" -> memSourceSql,
    "sort_nulls" -> sortNullsSql,
    "limit_offset" -> limitOffsetSql,
    "sort_tail" -> sortTailSql,
    "sql_params" -> sqlParamsSql,
    "sql_param_strings" -> sqlParamStringsSql,
    "sql_subqueries" -> sqlSubqueriesSql,
    "sql_view" -> sqlViewSql)
}
