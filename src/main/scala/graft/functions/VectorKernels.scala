package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst vector kernels for the similarity-search operators the
  * reference exposes as array functions (`cosine_distance`
  * `/root/reference/python/datafusion/functions/__init__.py:3584`,
  * `inner_product` `:3638`, `array_distance` `:4535`).
  *
  * Implemented as codegen'd `BinaryExpression`s rather than Scala UDFs:
  * the generated loop runs inside whole-stage codegen with no boxing or
  * lambda dispatch per element — the preferred Spark-native shape for a
  * hot 100 TB scoring kernel (SURVEY.md §4 item 2). Accumulation is
  * sequential over elements, matching the fold order of the HOF
  * formulation and the DuckDB oracle.
  */
abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def compute(a: ArrayData, b: ArrayData): Double
  /** Java loop body: given array vars `a`,`b`,`n`, assign to `result`.
    * All local variables must come from `ctx.freshName` — the same kernel
    * can appear several times inside one whole-stage-codegen'd projection. */
  protected def loopBody(ctx: CodegenContext, a: String, b: String, n: String,
      result: String): String

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |${loopBody(ctx, a, b, n, ev.value.toString)}
       """.stripMargin
    })
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "cosine_sim"
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def loopBody(ctx: CodegenContext, a: String, b: String,
      n: String, result: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
    val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = $a.getDouble($i); double $y = $b.getDouble($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = $dot / (Math.sqrt($na) * Math.sqrt($nb));
     """.stripMargin
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class InnerProduct(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "inner_product"
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    var dot = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }
  override protected def loopBody(ctx: CodegenContext, a: String, b: String,
      n: String, result: String): String = {
    val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    s"""
       |double $dot = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $dot += $a.getDouble($i) * $b.getDouble($i);
       |}
       |$result = $dot;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class L2Distance(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "l2_distance"
  override protected def compute(a: ArrayData, b: ArrayData): Double = {
    var acc = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) {
      val diff = a.getDouble(i) - b.getDouble(i)
      acc += diff * diff; i += 1
    }
    math.sqrt(acc)
  }
  override protected def loopBody(ctx: CodegenContext, a: String, b: String,
      n: String, result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    val diff = ctx.freshName("diff")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $diff = $a.getDouble($i) - $b.getDouble($i);
       |  $acc += $diff * $diff;
       |}
       |$result = Math.sqrt($acc);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registry wiring: session-local registration plus a
  * [[SparkSessionExtensions]] hook for `--conf spark.sql.extensions`. */
object GraftFunctions {
  private def binary(name: String)(
      make: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != 2) throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments (array<double>, array<double>), got ${es.length}")
      make(es.head, es(1))
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> binary("cosine_sim")(CosineSimilarity),
    "inner_product" -> binary("inner_product")(InnerProduct),
    "l2_distance" -> binary("l2_distance")(L2Distance))

  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(KernelSimplify))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ KernelSimplify
  }

  /** Column-API entry points (SQL names resolve via [[register]]). */
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  def inner_product(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("inner_product", a, b)
  def l2_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("l2_distance", a, b)
}

/** Algebraic simplification for the vector kernels — an engine-owned
  * Catalyst optimizer rule (the reference's pluggable-optimizer-rule
  * surface, `/root/reference/python/datafusion/context.py:1738`):
  * `cosine_sim(v, v)` → 1.0 and `l2_distance(v, v)` → 0.0 for any
  * deterministic `v`, preserving null-in-null-out semantics. */
object KernelSimplify
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b)
          if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal.create(null, DoubleType), Literal(1.0))
      case L2Distance(a, b) if a.deterministic && a.semanticEquals(b) =>
        If(IsNull(a), Literal.create(null, DoubleType), Literal(0.0))
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` wiring, the
  * deployment-time analog of [[GraftFunctions.register]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[VectorKernel].getName, name),
        builder))
    }
    e.injectOptimizerRule(_ => KernelSimplify)
  }
}
