package org.apache.spark.sql.graftfn

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Session extension wiring for graft's native expressions — the
  * supported `SparkSessionExtensions` path, so a deployment opts in with
  * `spark.sql.extensions=org.apache.spark.sql.graftfn.GraftSparkExtensions`
  * and gets:
  *
  *  1. SQL-callable functions `float_vec_dot(a, b)` and `fast_md5(x)` —
  *     the codegen'd expressions become available to pure-SQL users, not
  *     just the Scala DataFrame API;
  *  2. [[FloatDotRewrite]], an optimizer rule that rewrites the idiomatic
  *     higher-order-function dot product
  *     `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d,
  *     (acc, v) -> acc + v)` into [[FloatVecDot]]. The HOF form is what a
  *     SQL user naturally writes, but Spark interprets lambda bodies per
  *     element AND duplicates them into join residual conditions — the
  *     rewrite moves exactly that shape into whole-stage codegen.
  *     Bit-identical by construction: same per-element double products,
  *     same left-to-right double additions.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("fast_md5"),
      new ExpressionInfo(classOf[FastMd5Expr].getName, "fast_md5"),
      (children: Seq[Expression]) => FastMd5Expr(children.head)))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head)))
    ext.injectOptimizerRule(_ => FloatDotRewrite)
  }
}

/** `aggregate(zip_with(a, b, (x, y) -> double·double product), 0.0,
  * (acc, v) -> sum)` over float arrays → [[FloatVecDot]](a, b).
  *
  * Deliberately narrow: both zip_with lambda variables must be cast to
  * double before the multiply (otherwise the HOF computes FLOAT products
  * and the rewrite would change results), the zero must be literal double
  * 0.0, the merge a pure two-term sum of the lambda's own variables, and
  * the finish the identity — anything else is left untouched.
  *
  * Degenerate inputs are safe because [[FloatVecDot]] itself mirrors the
  * HOF's null semantics (null on unequal lengths or a null element —
  * zip_with pads the shorter array with null and the null product poisons
  * the fold), so the rule may match `ArrayType(FloatType, _)` with any
  * `containsNull` and stay a pure performance rewrite.
  */
object FloatDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** `double(x) * double(y)` in either operand order. */
  private def isDoubleProduct(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = body match {
    case Multiply(Cast(l, DoubleType, _, _), Cast(r, DoubleType, _, _), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  /** `acc + v` in either order (double addition is bitwise commutative). */
  private def isSum(body: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = body match {
    case Add(l, r, _) =>
      (sameVar(l, acc) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, acc))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(finArg: NamedLambdaVariable), _))
          // raw-bits zero check: a -0.0 seed would make the HOF return
          // -0.0 on empty arrays where FloatVecDot returns +0.0
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            isFloatArray(a) && isFloatArray(b) &&
            isDoubleProduct(mul, x, y) && isSum(merge, acc, v) &&
            sameVar(fin, finArg) =>
        FloatVecDot(a, b)
    }
}
