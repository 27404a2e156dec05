package graft

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relation facade with the reference `DataFrame`'s method surface
  * (`/root/reference/python/datafusion/dataframe.py:347` — lazy plan
  * builder; every method returns a new frame). Thin delegation to Spark's
  * `DataFrame` where semantics coincide; where they differ, the reference
  * behavior is implemented as a plan rewrite (`distinct_on`, `tail`,
  * offset-limit, AND-combined multi-predicate filter, `unnest` recursion).
  * Execution stays fully distributed — `tail`/`head` are the only
  * driver-materializing calls, as in the reference.
  */
final case class Frame(df: DataFrame) {

  // §2.3 projection / row ops
  def select(exprs: Column*): Frame = Frame(df.select(exprs: _*))
  def selectExprs(sql: String*): Frame = Frame(df.selectExpr(sql: _*))
  def drop(cols: String*): Frame = Frame(df.drop(cols: _*))
  /** filter(*preds): predicates AND-combined (dataframe.py:641). */
  def filter(preds: Column*): Frame = Frame(df.filter(preds.reduce(_ && _)))
  def filterSql(preds: String*): Frame = filter(preds.map(expr): _*)
  def withColumn(name: String, c: Column): Frame = Frame(df.withColumn(name, c))
  def withColumns(cols: (String, Column)*): Frame =
    Frame(df.withColumns(cols.toMap))
  def withColumnRenamed(from: String, to: String): Frame =
    Frame(df.withColumnRenamed(from, to))
  def cast(types: (String, String)*): Frame =
    Frame(types.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) })
  /** fill_null(value, subset) (dataframe.py:1853). */
  def fillNull(value: Any, subset: Seq[String] = Nil): Frame = {
    val cols = if (subset.isEmpty) df.columns.toSeq else subset
    Frame(value match {
      case d: Double => df.na.fill(d, cols)
      case l: Long => df.na.fill(l, cols)
      case i: Int => df.na.fill(i.toLong, cols)
      case s: String => df.na.fill(s, cols)
      case b: Boolean => df.na.fill(b, cols)
    })
  }
  def distinct: Frame = Frame(df.distinct())
  /** distinct_on(on, select, sort) (dataframe.py:1420): first row per key
    * under the given order — a ranked-window rewrite, no Spark native op. */
  def distinctOn(on: Seq[Column], selectCols: Seq[Column],
      sortBy: Seq[Column]): Frame = {
    val w = Window.partitionBy(on: _*).orderBy(sortBy: _*)
    Frame(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(selectCols: _*))
  }
  /** unnest_columns with recursion depth (dataframe.py:1741). */
  def unnest(column: String, preserveNulls: Boolean = true,
      recursions: Int = 1): Frame = {
    val explodeFn: Column => Column =
      if (preserveNulls) explode_outer else explode
    Frame((1 to recursions).foldLeft(df)((d, _) =>
      d.withColumn(column, explodeFn(col(column)))))
  }
  def transform(f: Frame => Frame): Frame = f(this)

  // §2.4 joins
  /** join with shared key names — duplicate keys coalesced, as
    * `coalesce_duplicate_keys=True` (dataframe.py:1012). */
  def join(right: Frame, on: Seq[String], how: String = "inner"): Frame =
    Frame(df.join(right.df, on, normalizeHow(how)))
  /** join_on with arbitrary predicates (dataframe.py:1153). */
  def joinOn(right: Frame, cond: Column, how: String = "inner"): Frame =
    Frame(df.join(right.df, cond, normalizeHow(how)))
  private def normalizeHow(how: String): String = how match {
    case "semi" => "left_semi"
    case "anti" => "left_anti"
    case other => other
  }

  // §2.5 aggregation: aggregate(group_by, aggs); empty group = global
  def aggregate(groupBy: Seq[Column], aggs: Seq[Column]): Frame =
    Frame(
      if (groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupBy: _*).agg(aggs.head, aggs.tail: _*))

  // §2.7 sort / limit
  def sort(keys: Column*): Frame = Frame(df.orderBy(keys: _*))
  def limit(count: Int, offset: Int = 0): Frame =
    Frame(if (offset == 0) df.limit(count) else df.offset(offset).limit(count))
  def head(n: Int): Array[Row] = df.head(n)
  /** tail(n): the reference computes count then offsets (dataframe.py:945). */
  def tail(n: Int): Array[Row] = df.tail(n)

  // §2.8 set operations
  def union(other: Frame, distinct: Boolean = false): Frame = {
    val u = df.union(other.df)
    Frame(if (distinct) u.distinct() else u)
  }
  def unionByName(other: Frame): Frame = Frame(df.unionByName(other.df))
  def intersect(other: Frame, distinct: Boolean = true): Frame =
    Frame(if (distinct) df.intersect(other.df) else df.intersectAll(other.df))
  def exceptAll(other: Frame, distinct: Boolean = false): Frame =
    Frame(if (distinct) df.except(other.df) else df.exceptAll(other.df))

  // misc §2.3
  def alias(name: String): Frame = Frame(df.as(name))
  def intoView(name: String): Frame = { df.createOrReplaceTempView(name); this }
  def cache(): Frame = Frame(df.cache())
  def count(): Long = df.count()
  def describe(cols: String*): Frame = Frame(df.describe(cols: _*))

  // §2.11 incremental result delivery (reference dataframe.py:1681-1689)
  /** execute_stream (reference dataframe.py:1681, record_batch.py:70):
    * rows stream to the caller incrementally — Spark's toLocalIterator
    * fetches one partition at a time, so driver memory is bounded by a
    * single partition, not the result. */
  def executeStream(): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
  /** execute_stream_partitioned (reference dataframe.py:1689,
    * dataframe.rs:1250): one stream per partition, preserving partition
    * boundaries. Outer iterator is lazy — each partition is fetched with
    * its own single-partition job only when reached, the same
    * incremental-delivery contract as the reference's per-partition
    * RecordBatchStreams. The plan is localCheckpoint'ed first so the P
    * single-partition jobs replay materialized partitions instead of
    * recomputing the full upstream plan P times (quadratic work for wide
    * plans) — which also pins one evaluation of any nondeterministic
    * expression across partitions. */
  def executeStreamPartitioned(): Iterator[Iterator[Row]] = {
    val pinned = df.localCheckpoint()
    val rdd = pinned.rdd
    val sc = pinned.sparkSession.sparkContext
    (0 until rdd.getNumPartitions).iterator.map { i =>
      sc.runJob(rdd, (it: Iterator[Row]) => it.toArray, Seq(i)).head.iterator
    }
  }

  // §2.13 introspection (reference dataframe.py:1205-1258)
  /** Plan → SQL text (reference unparser.py:18); raises outside the
    * relational core [[Unparser]] covers. */
  def toSql: String = Unparser(df)
  def explainString(mode: String = "simple"): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))
  def logicalPlan: String = df.queryExecution.logical.toString
  def optimizedPlan: String = df.queryExecution.optimizedPlan.toString
  def physicalPlan: String = df.queryExecution.executedPlan.toString
  def partitionCount: Int = df.rdd.getNumPartitions
  /** Per-operator metrics after execution (reference metrics.rs:27-77).
    * AQE wrapper nodes hide the materialized plan behind accessors rather
    * than `children` — unwrap them explicitly. Returned as an ordered Seq:
    * plans routinely contain the same operator twice (two Exchanges, two
    * HashAggregates), so a nodeName-keyed Map would silently drop entries. */
  def metricsSeq: Seq[(String, Map[String, Long])] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[(String, Map[String, Long])] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec =>
        (q.nodeName -> q.metrics.map { case (k, m) => k -> m.value }.toMap) +:
          walk(q.plan)
      case _ =>
        (p.nodeName -> p.metrics.map { case (k, m) => k -> m.value }.toMap) +:
          p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }
  /** Map view keyed by `nodeName#<occurrence>` so repeated operators keep
    * distinct entries ("HashAggregate#0", "HashAggregate#1", …). */
  def metrics: Map[String, Map[String, Long]] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    metricsSeq.map { case (name, m) =>
      val i = counts.getOrElse(name, 0)
      counts(name) = i + 1
      s"$name#$i" -> m
    }.toMap
  }
}

object Frame {
  def apply(session: GraftSession, name: String): Frame =
    Frame(session.spark.table(name))
}
