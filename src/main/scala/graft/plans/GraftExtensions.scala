package graft.plans

import graft.functions.{VecDot, VecNorm2}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, _}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rule: rewrite interpreted higher-order-function vector
  * math into the codegen'd kernels (SURVEY §4.2(2)).
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x)`  → VecDot(a,b)
  * `aggregate(a, 0.0, (acc,x) -> acc + x*x)`                          → VecNorm2(a)
  *
  * ArrayAggregate/ZipWith are CodegenFallback (per-element interpreted
  * lambdas) — ~20× slower than the fused loop in the KNN hot path. With this
  * rule installed, code written naively against [[graft.functions.Vec]] gets
  * the fast kernels automatically; the rewrite preserves results bitwise
  * (same left-to-right summation over the same doubles).
  */
object RewriteVectorHofs extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object IdentityLambda {
    def unapply(l: LambdaFunction): Boolean = l.function match {
      case v: NamedLambdaVariable => l.arguments.lastOption.exists(_.exprId == v.exprId)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dot: fold of an element-wise product of two double arrays
    case ArrayAggregate(
        ZipWith(l, r, LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
        fin @ IdentityLambda())
        if isDoubleArray(l) && isDoubleArray(r) =>
      VecDot(l, r)

    // norm²: fold of x*x over one double array
    case ArrayAggregate(
        arr,
        Literal(0.0, DoubleType),
        LambdaFunction(Add(_: NamedLambdaVariable,
          Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), _), _, _),
        fin @ IdentityLambda())
        if isDoubleArray(arr) && x.exprId == y.exprId =>
      VecNorm2(arr)
  }
}

/** Session extension entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * [[GraftExtensions.install]] on an already-running session.
  *
  * Besides the optimizer rule and the top-k planner strategy, the vector
  * kernels are registered as SQL functions so `spark.sql` users get them
  * too: `vec_dot(a, b)`, `vec_norm2(a)`, `vec_cosine(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteVectorHofs)
    e.injectOptimizerRule(_ => RewriteRangeJoins)
    e.injectPlannerStrategy(_ => PartialTopKStrategy)
    GraftExtensions.sqlFunctions.foreach { case (id, info, builder) =>
      e.injectFunction((id, info, builder))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier

  private def cosineExpr(a: Expression, b: Expression): Expression =
    Divide(VecDot(a, b), Multiply(Sqrt(VecNorm2(a)), Sqrt(VecNorm2(b))))

  /** (identifier, info, builder) triples for FunctionRegistry injection. */
  val sqlFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("vec_norm2"),
      new ExpressionInfo(classOf[VecNorm2].getName, "vec_norm2"),
      (args: Seq[Expression]) => VecNorm2(args(0))),
    (FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine"),
      (args: Seq[Expression]) => cosineExpr(args(0), args(1))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NormalizeUnicode].getName, "nfc_normalize"),
      (args: Seq[Expression]) => graft.functions.NormalizeUnicode(args(0), "NFC")),
    (FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(classOf[graft.functions.NormalizeUnicode].getName, "nfkc_normalize"),
      (args: Seq[Expression]) => graft.functions.NormalizeUnicode(args(0), "NFKC")))

  def install(spark: SparkSession): Unit = {
    for (rule <- Seq(RewriteVectorHofs, RewriteRangeJoins))
      if (!spark.experimental.extraOptimizations.contains(rule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
    sqlFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
