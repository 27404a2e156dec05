package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frame facade: reference-API semantics over Spark plans, plus plan
  * introspection and plan-shape audits (pushdown / broadcast). */
class FrameSpec extends AnyFunSuite {
  import SparkSpec._

  private def nation = Frame(Q.t(spark, sf, "nation"))
  private def orders = Frame(Q.t(spark, sf, "orders"))

  test("multi-predicate filter AND-combines") {
    val n = nation.filter(col("n_regionkey") === 2, col("n_nationkey") > 10).count()
    val m = nation.df.filter(col("n_regionkey") === 2 && col("n_nationkey") > 10).count()
    assert(n == m)
  }

  test("distinct_on returns first row per key under the sort") {
    val latest = orders.distinctOn(
      Seq(col("o_custkey")),
      Seq(col("o_custkey"), col("o_orderkey")),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc))
    assert(latest.count() == orders.df.select("o_custkey").distinct().count())
  }

  test("limit with offset") {
    val keys = orders.sort(col("o_orderkey")).limit(5, 10)
      .df.collect().map(_.getLong(0))
    val expected = orders.sort(col("o_orderkey")).df
      .collect().map(_.getLong(0)).slice(10, 15)
    assert(keys.sameElements(expected))
  }

  test("aggregate with empty group is a global aggregate") {
    val r = orders.aggregate(Nil, Seq(count(lit(1)).as("n"))).df.collect()
    assert(r.length == 1 && r.head.getLong(0) == orders.count())
  }

  test("unnest recursion depth flattens nested arrays") {
    import spark.implicits._
    val f = Frame(Seq((1, Seq(Seq(1, 2), Seq(3)))).toDF("id", "a"))
      .unnest("a", recursions = 2)
    assert(f.df.collect().map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)))
  }

  test("semi/anti how-strings normalize") {
    val withOrders = nation.join(
      Frame(orders.df.select(col("o_custkey").as("n_nationkey"))),
      Seq("n_nationkey"), "semi").count()
    val without = nation.join(
      Frame(orders.df.select(col("o_custkey").as("n_nationkey"))),
      Seq("n_nationkey"), "anti").count()
    assert(withOrders + without == nation.count())
  }

  test("introspection exposes all plan stages and metrics") {
    val f = orders.filter(col("o_totalprice") > 100)
      .aggregate(Seq(col("o_orderstatus")), Seq(count(lit(1)).as("n")))
    assert(f.logicalPlan.nonEmpty)
    assert(f.optimizedPlan.contains("Aggregate"))
    assert(f.explainString("formatted").contains("HashAggregate"))
    f.count()
    val m = f.metrics
    assert(m.nonEmpty && m.values.exists(_.nonEmpty))
    // partial+final aggregation repeats the operator — both entries must survive
    assert(m.keys.count(_.startsWith("HashAggregate#")) >= 2, m.keys.toSeq.sorted)
    assert(f.metricsSeq.size == m.size)
    assert(f.partitionCount > 0)
  }

  test("plan audit: filters and projection reach the parquet scan") {
    val plan = Frame(Q.t(spark, sf, "lineitem"))
      .filter(col("l_shipdate") > Q.ts("1997-01-01"))
      .select(col("l_orderkey"), col("l_shipdate"))
      .explainString("formatted")
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("ReadSchema") &&
      plan.contains("l_orderkey") && !plan.contains("l_extendedprice"), plan)
  }

  test("plan audit: dimension joins broadcast") {
    val plan = Tpch.q5(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("execute_stream delivers every row; partitioned variant preserves boundaries") {
    val f = Frame(Q.t(spark, sf, "nation").repartition(4))
    val collected = f.df.collect().map(_.toString).sorted.toSeq
    assert(f.executeStream().map(_.toString).toSeq.sorted == collected)
    val parts = f.executeStreamPartitioned().map(_.map(_.toString).toSeq).toSeq
    assert(parts.length == f.partitionCount)
    assert(parts.flatten.sorted == collected)
    // boundary fidelity: per-partition contents equal the RDD's own layout
    val glom = f.df.rdd.glom().collect().map(_.map(_.toString).toSeq).toSeq
    assert(parts == glom)
  }
}
