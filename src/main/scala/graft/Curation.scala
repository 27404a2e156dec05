package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Warehouse-curation operators: slowly-changing-dimension history builds,
  * CDC-style MERGE/upsert application, and declarative data-quality audits
  * — the maintenance layer that keeps a 100 TB lakehouse consistent
  * between analytical reads. Mirrors the reference's DML surface
  * (`/root/reference/python/datafusion/context.py` write/insert paths)
  * re-expressed as set operations Spark executes as ordinary shuffles.
  */
object Curation {

  // ---------- SCD Type-2 dimension build ----------

  /** Slowly-changing-dimension (Type 2) history of each customer's order
    * priority: consecutive same-priority runs (by order date, key-broken
    * by order key) collapse into validity intervals with `valid_from` /
    * `valid_to` and a current-row flag — the gaps-and-islands build every
    * dimension table with history needs. `valid_to` is the next interval's
    * start (half-open convention); the last interval is open (null) and
    * flagged current.
    *
    * Scale: one customer-keyed window for the change detector and island
    * id (running sum of change flags), one keyed aggregation per island,
    * one more window for the interval chaining — all partitioned by the
    * dimension key, no global sort, no driver participation. This is the
    * standard distributed SCD2 rebuild shape at any size. */
  def dimScd2(s: SparkSession, d: String): DataFrame = {
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    // ties: two islands can share valid_from when one date holds orders of
    // two priorities — the island id (itself ordered by orderkey) breaks them
    val byStart = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("island"))
    t(s, d, "orders")
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(byTime))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("o_orderpriority"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("chg")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("island"), col("o_orderpriority"))
      .agg(min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_orders"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .drop("island")
      .withColumn("is_current",
        when(col("valid_to").isNull, 1L).otherwise(0L))
      .select(col("o_custkey"), col("o_orderpriority").as("priority"),
        col("valid_from"), col("valid_to"), col("n_orders"), col("is_current"))
      .orderBy("o_custkey", "valid_from")
  }
  val dimScd2Sql: String =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |    lag(o_orderpriority) OVER w AS prev
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |isl AS (
      |  SELECT o_custkey, o_orderdate, o_orderpriority,
      |    sum(CASE WHEN prev IS NULL OR prev <> o_orderpriority THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM seq),
      |runs AS (
      |  SELECT o_custkey, island, o_orderpriority AS priority,
      |    min(o_orderdate) AS valid_from, CAST(count(*) AS BIGINT) AS n_orders
      |  FROM isl GROUP BY 1, 2, 3)
      |SELECT o_custkey, priority, valid_from,
      |  lead(valid_from) OVER w AS valid_to, n_orders,
      |  CAST(CASE WHEN lead(valid_from) OVER w IS NULL THEN 1 ELSE 0 END
      |    AS BIGINT) AS is_current
      |FROM runs
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, island)
      |ORDER BY o_custkey, valid_from""".stripMargin

  // ---------- CDC MERGE / upsert ----------

  /** MERGE-style upsert application: a changeset (per-customer revenue of
    * big-ticket orders, exact-decimal summed) is applied onto a target
    * dimension slice (customers of nations 0–12). The slicing makes every
    * MERGE branch non-empty: big spenders inside the slice update,
    * big spenders outside it insert, and slice customers without a
    * qualifying order keep — each row tagged with its `action`, the full
    * MERGE matrix visible as one relation.
    *
    * Scale: a full outer hash join on the merge key plus row-local
    * conditionals — exactly what Delta/Iceberg MERGE lowers to after
    * file pruning. Both sides shuffle on the key once; no driver state.
    * The one float add per row is IEEE-deterministic. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val target = t(s, d, "customer").filter(col("c_nationkey") < 13)
      .select(col("c_custkey"), col("c_acctbal"))
    val source = t(s, d, "orders").filter(col("o_totalprice") > 350000.0)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("delta"))
    target.join(source, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        when(col("o_custkey").isNull, lit("keep"))
          .when(col("c_custkey").isNull, lit("insert"))
          .otherwise(lit("update")).as("action"),
        col("c_acctbal").as("old_bal"),
        col("delta"),
        round(
          when(col("o_custkey").isNull, col("c_acctbal"))
            .when(col("c_custkey").isNull, col("delta"))
            .otherwise(col("c_acctbal") + col("delta")), 2).as("new_bal"))
      .orderBy("custkey")
  }
  val mergeUpsertSql: String =
    s"""WITH target AS (
       |  SELECT c_custkey, c_acctbal FROM customer WHERE c_nationkey < 13),
       |source AS (
       |  SELECT o_custkey, ${DSUM("o_totalprice")} AS delta
       |  FROM orders WHERE o_totalprice > 350000.0 GROUP BY o_custkey)
       |SELECT coalesce(t.c_custkey, s.o_custkey) AS custkey,
       |  CASE WHEN s.o_custkey IS NULL THEN 'keep'
       |       WHEN t.c_custkey IS NULL THEN 'insert'
       |       ELSE 'update' END AS action,
       |  t.c_acctbal AS old_bal, s.delta,
       |  round(CASE WHEN s.o_custkey IS NULL THEN t.c_acctbal
       |             WHEN t.c_custkey IS NULL THEN s.delta
       |             ELSE t.c_acctbal + s.delta END, 2) AS new_bal
       |FROM target t FULL OUTER JOIN source s ON s.o_custkey = t.c_custkey
       |ORDER BY custkey""".stripMargin

  // ---------- data-quality audit ----------

  /** Declarative data-quality audit: a fixed expectation suite evaluated
    * with ONE conditional-aggregation pass per audited table plus one
    * anti-join for referential integrity, emitted as a long-form report
    * (check, table, violations, total, pass). The expectations-style gate
    * (Great Expectations / dbt tests) a pipeline runs before promoting a
    * snapshot.
    *
    * Scale: per-table checks are fused into a single scan each (sums of
    * CASE flags — map-side combinable); the orphan check is a broadcast-
    * able anti-join on the fact's key. Adding a check adds a column to an
    * existing scan, not a new pass. */
  def dqAudit(s: SparkSession, d: String): DataFrame = {
    // one agg per table computes every check as a named column; a second
    // projection explodes that single row into the long-form report
    def report(agged: DataFrame, tbl: String, checks: String*): DataFrame =
      agged.select(explode(array(checks.map(c =>
        struct(lit(c).as("check"), lit(tbl).as("tbl"),
          col(c).as("violations"))): _*)).as("r"))
    val li = report(
      t(s, d, "lineitem").agg(
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("range_discount"),
        sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("range_quantity"),
        count(lit(1)).as("total_rows")),
      "lineitem", "range_discount", "range_quantity", "total_rows")
    val ord = report(
      t(s, d, "orders").agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_order_pk"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
        count(lit(1)).as("total_rows")),
      "orders", "dup_order_pk", "null_custkey", "total_rows")
    val cust = report(
      t(s, d, "customer").agg(
        sum(when(col("c_acctbal") < 0.0, 1L).otherwise(0L)).as("negative_acctbal"),
        count(lit(1)).as("total_rows")),
      "customer", "negative_acctbal", "total_rows")
    val doc = report(
      t(s, d, "documents").agg(
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("empty_text"),
        sum(when(col("n_chars") <= 0L, 1L).otherwise(0L)).as("nonpositive_chars"),
        count(lit(1)).as("total_rows")),
      "documents", "empty_text", "nonpositive_chars", "total_rows")
    val orphan = report(
      t(s, d, "lineitem").select(col("l_orderkey"))
        .join(t(s, d, "orders").select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_order_fk")),
      "lineitem", "orphan_order_fk")
    li.unionByName(ord).unionByName(cust).unionByName(doc).unionByName(orphan)
      .select(col("r.check").as("check"), col("r.tbl").as("tbl"),
        col("r.violations").as("violations"),
        when(col("r.check") === "total_rows" || col("r.violations") === 0L, 1L)
          .otherwise(0L).as("pass"))
      .orderBy("tbl", "check")
  }
  val dqAuditSql: String =
    """WITH checks AS (
      |  SELECT 'range_discount' AS "check", 'lineitem' AS tbl,
      |    CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS violations
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'range_quantity', 'lineitem',
      |    CAST(sum(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'total_rows', 'lineitem', CAST(count(*) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'dup_order_pk', 'orders',
      |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'null_custkey', 'orders',
      |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'total_rows', 'orders', CAST(count(*) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'negative_acctbal', 'customer',
      |    CAST(sum(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM customer
      |  UNION ALL
      |  SELECT 'total_rows', 'customer', CAST(count(*) AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT 'empty_text', 'documents',
      |    CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'nonpositive_chars', 'documents',
      |    CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM documents
      |  UNION ALL
      |  SELECT 'total_rows', 'documents', CAST(count(*) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT 'orphan_order_fk', 'lineitem', CAST(count(*) AS BIGINT)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |SELECT "check", tbl, violations,
      |  CAST(CASE WHEN "check" = 'total_rows' OR violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
      |FROM checks ORDER BY tbl, "check"""".stripMargin

  // ---------- registry ----------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dim_scd2" -> (dimScd2 _),
    "merge_upsert" -> (mergeUpsert _),
    "dq_audit" -> (dqAudit _))

  val oracle: Map[String, String] = Map(
    "dim_scd2" -> dimScd2Sql,
    "merge_upsert" -> mergeUpsertSql,
    "dq_audit" -> dqAuditSql)
}
