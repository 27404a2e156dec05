package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types._

/** Plan → SQL unparser — the reference's `unparser` surface
  * (`/root/reference/python/datafusion/unparser.py:18-80`, plan-to-SQL via
  * the DataFusion unparser crate, with per-dialect emitters). Spark has had
  * no public plan→SQL since 2.x, so this re-derives it for the relational
  * core: Project / Filter / Aggregate / Join (inner, outer, semi, anti,
  * cross) / Sort / Limit / Offset / Distinct / Deduplicate / Union /
  * Intersect / Except / SubqueryAlias over named relations. Plans outside
  * the subset raise `UnsupportedOperationException` with the offending
  * node — explicit scope, no silent wrong SQL.
  *
  * Five dialects, mirroring the reference's dialect objects
  * (`unparser.py:35-55`: default/mysql/postgres/sqlite/duckdb):
  *  - [[Spark]]: expression rendering delegates to Catalyst's own
  *    `Expression.sql`; round-trip contract `spark.sql(Unparser(df))`
  *    must produce the same result set.
  *  - [[DuckDb]] / [[Postgres]] / [[MySql]] / [[Sqlite]]: a shared
  *    self-contained renderer for the relational-core expression subset
  *    (attributes, literals, casts, binary operators, null tests, IN,
  *    CASE, the classic aggregates) — Catalyst's `.sql` emits Spark-isms
  *    (`1.0D`, backtick quoting) most engines reject — parameterized by
  *    the per-engine deltas: identifier quoting (backticks for MySQL,
  *    double quotes elsewhere), null-safe equality spelling
  *    (`IS NOT DISTINCT FROM` / `<=>` / `IS`), CAST target type names,
  *    semi/anti join spelling (DuckDB's SEMI/ANTI JOIN keywords vs the
  *    portable correlated [NOT] EXISTS), bare-OFFSET idioms (Postgres
  *    `OFFSET n`, MySQL's all-rows `LIMIT 18446744073709551615 OFFSET n`,
  *    SQLite's `LIMIT -1 OFFSET n`), and null ordering (explicit NULLS
  *    clause where supported; MySQL lacks it, so non-default orderings
  *    prepend an `(expr IS [NOT] NULL)` key — MySQL's own defaults match
  *    Spark's ASC=NULLS FIRST / DESC=NULLS LAST, so the common case stays
  *    clean). Typed DATE/TIMESTAMP literals degrade to plain strings on
  *    SQLite, which has no date types.
  *
  * Joins whose legs share output column names (self-joins): stripping
  * qualifiers would emit an ambiguous ON clause, so both legs get fresh
  * `__uN` aliases and the condition is re-qualified by which leg each
  * attribute comes from. For semi/anti joins the output is the left leg
  * only, so the result is unambiguous; for other join types the output
  * itself carries duplicate names that downstream references cannot
  * disambiguate — those raise the standard "does not cover" error instead
  * of emitting SQL that fails (or silently mis-binds) at re-execution.
  */
object Unparser {

  sealed trait Dialect
  /** Target Spark SQL (backtick quoting, Catalyst expression rendering). */
  case object Spark extends Dialect
  /** Dialects sharing the portable expression renderer. */
  sealed trait Portable extends Dialect
  /** Target DuckDB (double-quote quoting, SEMI/ANTI JOIN keywords). */
  case object DuckDb extends Portable
  /** Target PostgreSQL (double-quote quoting, EXISTS semi/anti, bare OFFSET). */
  case object Postgres extends Portable
  /** Target MySQL (backtick quoting, `<=>`, no NULLS clause, LIMIT-all OFFSET). */
  case object MySql extends Portable
  /** Target SQLite (double-quote quoting, `IS` null-safe, LIMIT -1 OFFSET). */
  case object Sqlite extends Portable

  def apply(df: DataFrame): String = apply(df, Spark)

  def apply(df: DataFrame, dialect: Dialect): String = {
    val counter = new AtomicInteger()
    sql(df.queryExecution.analyzed, counter)(dialect)
  }

  private def sub(plan: LogicalPlan, c: AtomicInteger)(implicit d: Dialect)
    : String = relationName(plan) match {
    // a bare named relation needs no wrapping
    case Some(name) => quote(name)
    case None => s"(${sql(plan, c)}) AS ${freshAlias(c)}"
  }

  /** Like [[sub]] but under a caller-chosen alias (self-join legs). */
  private def subAs(plan: LogicalPlan, c: AtomicInteger, alias: String)(
      implicit d: Dialect): String = relationName(plan) match {
    case Some(name) => s"${quote(name)} AS $alias"
    case None => s"(${sql(plan, c)}) AS $alias"
  }

  /** The catalog name of a bare named relation, if the plan is one. A
    * user alias (`df.as("x")`) wraps the view's own SubqueryAlias in
    * another — the INNERMOST alias over the leaf is the registered name;
    * emitting the outer alias would reference a table that doesn't exist. */
  private def relationName(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(id, child) =>
      relationName(child)
        .orElse(if (isLeafRelation(child)) Some(id.name) else None)
    case _ => None
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

  private def quote(name: String)(implicit d: Dialect): String = d match {
    case Spark | MySql => "`" + name.replace("`", "``") + "`"
    case _ => "\"" + name.replace("\"", "\"\"") + "\""
  }

  /** Render an expression with attribute qualifiers stripped: generated
    * subqueries carry fresh `__uN` aliases, so the analyzed plan's original
    * qualifiers (view names) would no longer resolve. */
  private def esql(e: Expression)(implicit d: Dialect): String =
    render(e.transform { case a: AttributeReference => a.withQualifier(Nil) })

  private def render(e: Expression)(implicit d: Dialect): String = d match {
    case Spark => e.sql
    case _ => port(e)
  }

  /** Portable rendering for the relational-core expression subset, shared
    * by the non-Spark dialects with per-engine deltas (quoting, null-safe
    * equality, CAST targets, NULLS ordering). Anything outside it raises —
    * same loud-rejection contract as the plan walker. */
  private def port(e: Expression)(implicit d: Dialect): String = e match {
    case a: AttributeReference =>
      (a.qualifier :+ a.name).map(n => quote(n)).mkString(".")
    case Literal(null, _) => "NULL"
    case l @ Literal(v, t) => t match {
      case StringType => "'" + String.valueOf(v).replace("'", "''") + "'"
      case ByteType | ShortType | IntegerType | LongType => v.toString
      case FloatType | DoubleType | _: DecimalType => v.toString
      case BooleanType => v.toString.toUpperCase
      // Catalyst renders these as standard `DATE '...'` / `TIMESTAMP '...'`;
      // SQLite has no date types — degrade to the bare string literal,
      // which is exactly how SQLite stores and compares dates
      case DateType | TimestampType | TimestampNTZType =>
        if (d == Sqlite) l.sql.dropWhile(_ != '\'') else l.sql
      case other => unsupportedExpr(s"literal of type ${other.simpleString}", e)
    }
    case Cast(child, dt, _, _) => s"CAST(${port(child)} AS ${typeName(dt, e)})"
    // Q.ddec's fast cast IS `CAST(x AS DECIMAL(p,s))` (bit-identical by
    // its property pins) — render it as the cast it replaces, so the
    // round-tripped SQL text is unchanged by the r19 rewrite
    case graft.functions.FastDoubleToDecimal(child, p, s, _) =>
      s"CAST(${port(child)} AS ${typeName(DecimalType(p, s), e)})"
    case Not(IsNull(child)) => s"(${port(child)} IS NOT NULL)"
    case IsNull(child) => s"(${port(child)} IS NULL)"
    case IsNotNull(child) => s"(${port(child)} IS NOT NULL)"
    case Not(child) => s"(NOT ${port(child)})"
    case In(value, list) =>
      s"(${port(value)} IN (${list.map(port).mkString(", ")}))"
    case CaseWhen(branches, elseValue) =>
      val whens = branches
        .map { case (cond, v) => s"WHEN ${port(cond)} THEN ${port(v)}" }
        .mkString(" ")
      val els = elseValue.map(v => s" ELSE ${port(v)}").getOrElse("")
      s"CASE $whens$els END"
    case AggregateExpression(fn, _, isDistinct, None, _) =>
      val mod = if (isDistinct) "DISTINCT " else ""
      fn match {
        case Count(Seq(Literal(_, _))) if !isDistinct => "count(*)"
        case Count(children) => s"count($mod${children.map(port).mkString(", ")})"
        case Sum(child, _) => s"sum($mod${port(child)})"
        case Min(child) => s"min(${port(child)})"
        case Max(child) => s"max(${port(child)})"
        case Average(child, _) => s"avg($mod${port(child)})"
        case other => unsupportedExpr(s"aggregate ${other.prettyName}", e)
      }
    case SortOrder(child, direction, nullOrdering, _) =>
      val cs = port(child)
      d match {
        // MySQL has no NULLS clause; its own defaults already match
        // Spark's (ASC ⇒ NULLS FIRST, DESC ⇒ NULLS LAST). Non-default
        // orderings prepend an IS NULL key that forces the right side.
        case MySql => (direction, nullOrdering) match {
          case (Ascending, NullsFirst) => s"$cs ASC"
          case (Descending, NullsLast) => s"$cs DESC"
          case (Ascending, NullsLast) => s"($cs IS NULL) ASC, $cs ASC"
          case (Descending, NullsFirst) => s"($cs IS NULL) DESC, $cs DESC"
        }
        case _ => s"$cs ${direction.sql} ${nullOrdering.sql}"
      }
    // Binary operators: only the portable subset. Spark-isms (`<=>`,
    // `div`, bitwise ops) either fail to parse in the target engines or —
    // worse — parse with different semantics, so everything off the
    // whitelist raises per the dialect's loud-rejection contract.
    case EqualNullSafe(l, r) => d match {
      case MySql => s"(${port(l)} <=> ${port(r)})"
      case Sqlite => s"(${port(l)} IS ${port(r)})"
      case _ => s"(${port(l)} IS NOT DISTINCT FROM ${port(r)})"
    }
    case b: BinaryOperator if portableOps.contains(b.sqlOperator) =>
      s"(${port(b.left)} ${b.sqlOperator} ${port(b.right)})"
    case other => unsupportedExpr(other.prettyName, other)
  }

  /** Operators whose spelling AND semantics coincide in Spark and the
    * portable targets: boolean connectives, comparisons, and fractional
    * arithmetic (Spark's analyzer widens integer `/` to double, as do the
    * target engines' `/`, except SQLite where integer `/` truncates —
    * Spark plans reaching the unparser have already been widened by the
    * analyzer's cast insertion, so the emitted text carries the CAST). */
  private val portableOps =
    Set("AND", "OR", "=", "<", "<=", ">", ">=", "+", "-", "*", "/", "%")

  private def typeName(dt: DataType, in: Expression)(implicit d: Dialect)
    : String = (d, dt) match {
    // SQLite: storage-class names only; no date/time types (loud reject)
    case (Sqlite, ByteType | ShortType | IntegerType | LongType) => "INTEGER"
    case (Sqlite, FloatType | DoubleType) => "REAL"
    case (Sqlite, _: DecimalType) => "NUMERIC"
    case (Sqlite, StringType) => "TEXT"
    case (Sqlite, other) =>
      unsupportedExpr(s"SQLite cast to ${other.simpleString}", in)
    // MySQL: CAST accepts a restricted target list (SIGNED/CHAR/DATETIME)
    case (MySql, ByteType | ShortType | IntegerType | LongType) => "SIGNED"
    case (MySql, FloatType | DoubleType) => "DOUBLE"
    case (MySql, t: DecimalType) => s"DECIMAL(${t.precision},${t.scale})"
    case (MySql, StringType) => "CHAR"
    case (MySql, DateType) => "DATE"
    case (MySql, TimestampType | TimestampNTZType) => "DATETIME"
    case (MySql, other) =>
      unsupportedExpr(s"MySQL cast to ${other.simpleString}", in)
    case (Postgres, ByteType) => "SMALLINT" // no 1-byte int in Postgres
    case (Postgres, FloatType) => "REAL"
    case (Postgres, DoubleType) => "DOUBLE PRECISION"
    // DuckDB names, shared by Postgres where they coincide
    case (_, BooleanType) => "BOOLEAN"
    case (_, ByteType) => "TINYINT"
    case (_, ShortType) => "SMALLINT"
    case (_, IntegerType) => "INTEGER"
    case (_, LongType) => "BIGINT"
    case (_, FloatType) => "FLOAT"
    case (_, DoubleType) => "DOUBLE"
    case (_, t: DecimalType) => s"DECIMAL(${t.precision},${t.scale})"
    case (_, StringType) => "VARCHAR"
    case (_, DateType) => "DATE"
    case (_, TimestampType | TimestampNTZType) => "TIMESTAMP"
    case (_, other) => unsupportedExpr(s"cast to ${other.simpleString}", in)
  }

  private def sql(plan: LogicalPlan, c: AtomicInteger)(implicit d: Dialect)
    : String = plan match {
    case Project(exprs, child) =>
      s"SELECT ${exprs.map(named).mkString(", ")} FROM ${sub(child, c)}"

    case Filter(cond, child) =>
      s"SELECT * FROM ${sub(child, c)} WHERE ${esql(cond)}"

    case Aggregate(grouping, aggExprs, child, _) =>
      val select = s"SELECT ${aggExprs.map(named).mkString(", ")} FROM ${sub(child, c)}"
      if (grouping.isEmpty) select
      else s"$select GROUP BY ${grouping.map(esql).mkString(", ")}"

    // Postgres/MySQL/SQLite have no SEMI/ANTI JOIN keywords: emit the
    // portable correlated [NOT] EXISTS, which is exactly LeftSemi/LeftAnti
    // semantics (a null or false condition never matches). Legs always get
    // fresh aliases so self-joins qualify cleanly.
    case Join(left, right, jt @ (LeftSemi | LeftAnti), cond, _)
        if d == Postgres || d == MySql || d == Sqlite =>
      val la = freshAlias(c); val ra = freshAlias(c)
      val lset = left.outputSet
      val where = cond.map { e =>
        val q = e.transform {
          case a: AttributeReference =>
            a.withQualifier(Seq(if (lset.contains(a)) la else ra))
        }
        s" WHERE ${render(q)}"
      }.getOrElse("")
      val neg = if (jt == LeftAnti) "NOT " else ""
      s"SELECT * FROM ${subAs(left, c, la)} WHERE ${neg}EXISTS " +
        s"(SELECT 1 FROM ${subAs(right, c, ra)}$where)"

    case Join(left, right, joinType, cond, _) =>
      val kw = joinType match {
        case Inner => "JOIN"
        case LeftOuter => "LEFT JOIN"
        case RightOuter => "RIGHT JOIN"
        case FullOuter => "FULL JOIN"
        case LeftSemi => if (d == DuckDb) "SEMI JOIN" else "LEFT SEMI JOIN"
        case LeftAnti => if (d == DuckDb) "ANTI JOIN" else "LEFT ANTI JOIN"
        case Cross => "CROSS JOIN"
        case other => unsupported(s"join type $other", plan)
      }
      val dupNames = left.output.map(_.name).toSet
        .intersect(right.output.map(_.name).toSet)
      if (dupNames.isEmpty) {
        val on = cond.map(e => s" ON ${esql(e)}").getOrElse("")
        s"SELECT * FROM ${sub(left, c)} $kw ${sub(right, c)}$on"
      } else if (joinType == LeftSemi || joinType == LeftAnti) {
        // Self-join: qualify the ON clause by leg alias. Output = left leg
        // only, so the duplicate names never escape the join.
        val la = freshAlias(c); val ra = freshAlias(c)
        val lset = left.outputSet
        val on = cond.map { e =>
          val q = e.transform {
            case a: AttributeReference =>
              a.withQualifier(Seq(if (lset.contains(a)) la else ra))
          }
          s" ON ${render(q)}"
        }.getOrElse("")
        s"SELECT * FROM ${subAs(left, c, la)} $kw ${subAs(right, c, ra)}$on"
      } else unsupported(
        s"$kw whose legs share output column names " +
          s"(${dupNames.toSeq.sorted.mkString(", ")}) — the joined output is " +
          "ambiguous; project/rename the legs to distinct names first", plan)

    case Sort(order, true, child, _) =>
      s"SELECT * FROM ${sub(child, c)} ORDER BY ${order.map(esql).mkString(", ")}"

    case GlobalLimit(expr, LocalLimit(_, child)) =>
      s"SELECT * FROM ${sub(child, c)} LIMIT ${esql(expr)}"

    case Offset(expr, child) =>
      val n = esql(expr)
      d match {
        // neither engine accepts a bare OFFSET: MySQL's documented
        // all-rows idiom is LIMIT 2^64-1; SQLite's is LIMIT -1
        case MySql => s"SELECT * FROM ${sub(child, c)} LIMIT 18446744073709551615 OFFSET $n"
        case Sqlite => s"SELECT * FROM ${sub(child, c)} LIMIT -1 OFFSET $n"
        case _ => s"SELECT * FROM ${sub(child, c)} OFFSET $n"
      }

    case Window(windowExprs, _, _, child, _) if d == Spark =>
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
      if (isAll && d == Sqlite) unsupported("INTERSECT ALL (SQLite has no ALL set ops)", plan)
      val kw = if (isAll) "INTERSECT ALL" else "INTERSECT"
      s"SELECT * FROM ${sub(left, c)} $kw SELECT * FROM ${sub(right, c)}"

    case Except(left, right, isAll) =>
      if (isAll && d == Sqlite) unsupported("EXCEPT ALL (SQLite has no ALL set ops)", plan)
      val kw = if (isAll) "EXCEPT ALL" else "EXCEPT"
      s"SELECT * FROM ${sub(left, c)} $kw SELECT * FROM ${sub(right, c)}"

    case p: SubqueryAlias if relationName(p).isDefined =>
      s"SELECT * FROM ${quote(relationName(p).get)}"

    case SubqueryAlias(_, child) => sql(child, c)

    case View(_, _, child, _) => sql(child, c)

    case other => unsupported(other.nodeName, other)
  }

  private def named(e: NamedExpression)(implicit d: Dialect): String = e match {
    case a: Attribute => quote(a.name)
    case Alias(child, name) => s"${esql(child)} AS ${quote(name)}"
    case other => esql(other)
  }

  private def unsupported(what: String, plan: LogicalPlan): Nothing =
    throw new UnsupportedOperationException(
      s"Unparser does not cover $what; supported: project/filter/aggregate/" +
        s"join/sort/limit/offset/distinct/set-ops over named relations.\n$plan")

  private def unsupportedExpr(what: String, e: Expression): Nothing =
    throw new UnsupportedOperationException(
      s"Unparser does not cover expression $what in the portable dialects " +
        s"(subset: attributes, literals, casts, binary operators, " +
        s"null tests, IN, CASE, count/sum/min/max/avg).\n$e")
}
