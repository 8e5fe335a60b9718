package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the composable higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * and substitute the codegen'd native [[DotProductDouble]].
  *
  * Why a `Rule[LogicalPlan]`: HOFs evaluate interpreted (per-element
  * lambda dispatch, boxed lambda variables, an intermediate array),
  * which is ~10× slower in n²-pair similarity loops — but the HOF
  * form is what users naturally write in SQL or the DataFrame API.
  * The engine should accept the declarative spelling and pick the
  * fast plan, the same bargain Catalyst makes everywhere else.
  * [[DotProductDouble]] reproduces the HOF semantics exactly (fold
  * order, null element / null array / length-mismatch behavior), so
  * the substitution is unconditional.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`), so it
  * applies to passthrough SQL as well as library code.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVarPair(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(m: Multiply,
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(a: Add,
            Seq(ma: NamedLambdaVariable, mb: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(fa: NamedLambdaVariable), _))
          if isDoubleArray(l) && isDoubleArray(r) &&
            isVarPair(m.left, m.right, zx, zy) &&
            isVarPair(a.left, a.right, ma, mb) &&
            fin.exprId == fa.exprId =>
        DotProductDouble(l, r)
    }
}
