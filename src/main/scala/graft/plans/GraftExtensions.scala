package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Add, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Optimizer rule: rewrite the built-in higher-order dot-product
  * pattern
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (acc,x) => acc+x)`
  * into the fused, codegen'd [[DotProduct]] expression.
  *
  * The HOF form materializes a product array per row and interprets two
  * lambdas per element; the fused kernel is one loop inside whole-stage
  * codegen. Applies only when both element types are non-null doubles
  * (null elements would change semantics: the HOF form yields null,
  * graft_dot reads raw slots) — and note graft_dot raises on mismatched
  * array lengths where zip_with would null-pad, i.e. the rewrite
  * enforces the engine's strict-dimension contract.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isNonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable,
                y: NamedLambdaVariable, _), Seq(x2, y2), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable,
              elem: NamedLambdaVariable, _), Seq(acc2, elem2), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fin2), _))
          if x.exprId == x2.exprId && y.exprId == y2.exprId &&
            acc.exprId == acc2.exprId && elem.exprId == elem2.exprId &&
            fin.exprId == fin2.exprId &&
            isNonNullDoubleArray(a) && isNonNullDoubleArray(b) =>
        DotProduct(a, b)
    }
}

/** Session-extensions installer (`spark.sql.extensions=graft.plans.
  * GraftExtensions` or `builder.withExtensions(new GraftExtensions)`):
  * registers the engine's native expressions as SQL functions and
  * injects [[FuseDotProduct]] into the optimizer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0),
        litInt(args(1), "shingle width"),
        distinct = args.length > 2 &&
          args(2).eval() == java.lang.Boolean.TRUE)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        litInt(args(1), "signature width"))))
    ext.injectOptimizerRule(_ => FuseDotProduct)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
