package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProductFloat

/** Optimizer rule: rewrite the PORTABLE fold formulation of a float32 dot
  * product —
  *
  *   `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  *              0.0, (acc, v) => acc + v)`
  *
  * — into the native codegen kernel [[DotProductFloat]]. Users (and the
  * DuckDB oracle) keep writing the declarative higher-order form, which
  * Spark executes on the interpreted HOF path (lambda-variable rows +
  * boxing per element); with this rule installed it runs as a fused
  * whole-stage-codegen loop instead. The kernel is bit-identical to the
  * fold by construction — same left-to-right float64 summation, same
  * null/shape semantics (null element or length mismatch → null, empty →
  * 0.0; `DedupKnnSpec` pins the equivalence) — so the rewrite never
  * changes results.
  *
  * The match is deliberately narrow: both arrays must be `array<float>`,
  * the zero must be literal `0.0d`, the zip lambda exactly
  * `double(x) * double(y)` over the two lambda variables, the merge
  * exactly `acc + v`, and the finish the identity — anything else (other
  * element types, seeded folds, extra arithmetic) is left untouched.
  *
  * Install via `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * (config path) or `GraftOptimizations.install(spark)` (imperative
  * path, idempotent).
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean =
    (e, v) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        a.exprId == b.exprId
      case _ => false
    }

  /** `Cast(v as double)` over exactly the given lambda variable. */
  private def doubleOfVar(e: Expression, v: NamedExpression): Boolean =
    e match {
      case c: Cast => c.dataType == DoubleType && sameVar(c.child, v)
      case _ => false
    }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(m: Multiply, Seq(xv, yv), _)),
            zero @ Literal(0.0, DoubleType),
            LambdaFunction(a: Add, Seq(av, ev), _),
            LambdaFunction(fin, Seq(fv), _))
          if java.lang.Double.doubleToRawLongBits(
            zero.value.asInstanceOf[Double]) == 0L &&
            // (-0.0 == 0.0 matches the pattern, but an empty-array fold
            // seeded -0.0 returns -0.0 where the kernel returns +0.0)
            isFloatArray(l) && isFloatArray(r) &&
            doubleOfVar(m.left, xv) && doubleOfVar(m.right, yv) &&
            sameVar(a.left, av) && sameVar(a.right, ev) &&
            sameVar(fin, fv) =>
        DotProductFloat(l, r)
    }
}

/** Imperative installation of the engine's optimizer rules (the
  * config-free counterpart of `GraftSparkExtensions`). Idempotent.
  */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.exists(_ eq NativeDotRewrite)) {
      spark.experimental.extraOptimizations = current :+ NativeDotRewrite
    }
  }
}
