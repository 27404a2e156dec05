package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._

/** Plan → SQL unparser — the reference's `unparser` surface
  * (`/root/reference/python/datafusion/unparser.py:18`, plan-to-SQL via
  * the DataFusion unparser crate). Spark has had no public plan→SQL since
  * 2.x, so this re-derives it for the relational core: Project / Filter /
  * Aggregate / Join (inner, outer, semi, anti, cross) / Sort / Limit /
  * Offset / Distinct / Deduplicate / Union / Intersect / Except /
  * SubqueryAlias over named relations. Expression rendering delegates to
  * Catalyst's own `Expression.sql`. Plans outside the subset raise
  * `UnsupportedOperationException` with the offending node — explicit
  * scope, no silent wrong SQL.
  *
  * The output targets Spark SQL (round-trip: `spark.sql(Unparser(df))`
  * must produce the same result set), which is the reference unparser's
  * own contract (DataFrame → dialect SQL text).
  */
object Unparser {

  def apply(df: DataFrame): String = {
    val counter = new AtomicInteger()
    sql(df.queryExecution.analyzed, counter)
  }

  private def sub(plan: LogicalPlan, c: AtomicInteger): String = plan match {
    // a bare named relation needs no wrapping
    case SubqueryAlias(id, child) if isLeafRelation(child) => quote(id.name)
    case _ => s"(${sql(plan, c)}) AS ${freshAlias(c)}"
  }

  private def isLeafRelation(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case View(_, _, child, _) => isLeafRelation(child)
    case SubqueryAlias(_, child) => isLeafRelation(child)
    case Project(exprs, child) => // view definitions often add an identity projection
      exprs.forall(_.isInstanceOf[Attribute]) && isLeafRelation(child)
    case _ => false
  }

  private def freshAlias(c: AtomicInteger): String = s"__u${c.getAndIncrement()}"

  private def quote(name: String): String = s"`$name`"

  /** Render an expression with attribute qualifiers stripped: generated
    * subqueries carry fresh `__uN` aliases, so the analyzed plan's original
    * qualifiers (view names) would no longer resolve. */
  private def esql(e: Expression): String =
    e.transform { case a: AttributeReference => a.withQualifier(Nil) }.sql

  private def sql(plan: LogicalPlan, c: AtomicInteger): String = plan match {
    case Project(exprs, child) =>
      s"SELECT ${exprs.map(named).mkString(", ")} FROM ${sub(child, c)}"

    case Filter(cond, child) =>
      s"SELECT * FROM ${sub(child, c)} WHERE ${esql(cond)}"

    case Aggregate(grouping, aggExprs, child, _) =>
      val select = s"SELECT ${aggExprs.map(named).mkString(", ")} FROM ${sub(child, c)}"
      if (grouping.isEmpty) select
      else s"$select GROUP BY ${grouping.map(esql).mkString(", ")}"

    case Join(left, right, joinType, cond, _) =>
      val kw = joinType match {
        case Inner => "JOIN"
        case LeftOuter => "LEFT JOIN"
        case RightOuter => "RIGHT JOIN"
        case FullOuter => "FULL JOIN"
        case LeftSemi => "LEFT SEMI JOIN"
        case LeftAnti => "LEFT ANTI JOIN"
        case Cross => "CROSS JOIN"
        case other => unsupported(s"join type $other", plan)
      }
      val on = cond.map(e => s" ON ${esql(e)}").getOrElse("")
      s"SELECT * FROM ${sub(left, c)} $kw ${sub(right, c)}$on"

    case Sort(order, true, child, _) =>
      s"SELECT * FROM ${sub(child, c)} ORDER BY ${order.map(esql).mkString(", ")}"

    case GlobalLimit(expr, LocalLimit(_, child)) =>
      s"SELECT * FROM ${sub(child, c)} LIMIT ${esql(expr)}"

    case Offset(expr, child) =>
      s"SELECT * FROM ${sub(child, c)} OFFSET ${esql(expr)}"

    case Window(windowExprs, _, _, child, _) =>
      // WindowExpression.sql renders the full `fn(...) OVER (PARTITION BY
      // ... ORDER BY ... frame)` clause; child columns pass through
      s"SELECT *, ${windowExprs.map(named).mkString(", ")} FROM ${sub(child, c)}"

    case Distinct(child) =>
      s"SELECT DISTINCT * FROM ${sub(child, c)}"

    case Deduplicate(keys, child) if keys.map(_.name).toSet ==
        child.output.map(_.name).toSet =>
      s"SELECT DISTINCT * FROM ${sub(child, c)}"

    case Union(children, false, false) =>
      children.map(ch => s"SELECT * FROM ${sub(ch, c)}")
        .mkString(" UNION ALL ")

    case Intersect(left, right, isAll) =>
      val kw = if (isAll) "INTERSECT ALL" else "INTERSECT"
      s"SELECT * FROM ${sub(left, c)} $kw SELECT * FROM ${sub(right, c)}"

    case Except(left, right, isAll) =>
      val kw = if (isAll) "EXCEPT ALL" else "EXCEPT"
      s"SELECT * FROM ${sub(left, c)} $kw SELECT * FROM ${sub(right, c)}"

    case SubqueryAlias(id, child) if isLeafRelation(child) =>
      s"SELECT * FROM ${quote(id.name)}"

    case SubqueryAlias(_, child) => sql(child, c)

    case View(_, _, child, _) => sql(child, c)

    case other => unsupported(other.nodeName, other)
  }

  private def named(e: org.apache.spark.sql.catalyst.expressions.NamedExpression)
    : String = e match {
    case a: Attribute => quote(a.name)
    case Alias(child, name) => s"${esql(child)} AS ${quote(name)}"
    case other => esql(other)
  }

  private def unsupported(what: String, plan: LogicalPlan): Nothing =
    throw new UnsupportedOperationException(
      s"Unparser does not cover $what; supported: project/filter/aggregate/" +
        s"join/sort/limit/offset/distinct/set-ops over named relations.\n$plan")
}
