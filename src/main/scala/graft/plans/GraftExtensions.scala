package graft.plans

import graft.functions.{BloomFilterAgg, CountMinAgg, DotProduct, KmvAgg, MinHashAgg, MisraGriesAgg, SimHashAgg, TopKAgg}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Session extensions (SparkSessionExtensions): SQL faces for graft's
  * custom expressions plus an optimizer rule that rewrites the
  * compositional dot-product fold into the codegen'd [[DotProduct]].
  *
  * Register with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[graft.functions.HammingDistance].getName,
        "graft_hamming"),
      (exprs: Seq[Expression]) =>
        graft.functions.HammingDistance(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash"),
      (exprs: Seq[Expression]) =>
        MinHashAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashAgg].getName, "graft_simhash"),
      (exprs: Seq[Expression]) =>
        SimHashAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"graft_topk(score, id, k) takes 3 arguments, got ${exprs.length}")
        val k = exprs(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_topk(score, id, k): k must be an INT literal, got $other")
        }
        TopKAgg.coerced(exprs(0), exprs(1), k).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName,
        "graft_heavy_hitters"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_heavy_hitters(item, k) takes 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters(item, k): k must be an INT literal, got $other")
        }
        val item = if (exprs.head.dataType == LongType) exprs.head
          else Cast(exprs.head, LongType)
        MisraGriesAgg(item, k).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_bloom"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"graft_bloom(item, m, k) takes 3 arguments, got ${exprs.length}")
        val (m, k) = (exprs(1), exprs(2)) match {
          case (Literal(mv: Int, _), Literal(kv: Int, _)) => (mv, kv)
          case other => throw new IllegalArgumentException(
            s"graft_bloom(item, m, k): m and k must be INT literals, got $other")
        }
        BloomFilterAgg(exprs.head, m, k).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_kmv(item, k) takes 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv(item, k): k must be an INT literal, got $other")
        }
        val item = if (exprs.head.dataType == LongType) exprs.head
          else Cast(exprs.head, LongType)
        KmvAgg(item, k).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[graft.functions.HllAgg].getName,
        "graft_hll"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"graft_hll(hash60, p) takes 2 arguments, got ${exprs.length}")
        val p = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_hll(hash60, p): p must be an INT literal, got $other")
        }
        val h = if (exprs.head.dataType == LongType) exprs.head
          else Cast(exprs.head, LongType)
        graft.functions.HllAgg(h, p).toAggregateExpression()
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_countmin"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "graft_countmin"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"graft_countmin(item, d, w) takes 3 arguments, got ${exprs.length}")
        val (d, w) = (exprs(1), exprs(2)) match {
          case (Literal(dv: Int, _), Literal(wv: Int, _)) => (dv, wv)
          case other => throw new IllegalArgumentException(
            s"graft_countmin(item, d, w): d and w must be INT literals, got $other")
        }
        CountMinAgg(exprs.head, d, w).toAggregateExpression()
      }))
    e.injectOptimizerRule(_ => RewriteDotProductFold)
    e.injectPlannerStrategy(_ => graft.operators.AsOfJoinStrategy)
  }
}

/** Rewrites `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) ->
  * acc+x)` over array<double> into [[DotProduct]](a, b) — same
  * left-to-right semantics, no intermediate array, codegen'd loop. Users
  * writing the idiomatic-but-slow fold get the fast path for free.
  *
  * Soundness: the lambdas must be EXACTLY the pairwise product and the
  * accumulating sum of the lambda's own (distinct) arguments — checked
  * by reference against the analyzer-bound NamedLambdaVariables, in
  * either operand order (double add/multiply are commutative), so e.g.
  * `(x, y) -> x * x` or `(acc, v) -> acc + 1.0` never match. Unequal
  * lengths and null elements need no guard: [[DotProduct]] implements
  * the fold's null semantics exactly (NULL on length mismatch — the
  * zip_with null padding — and on any null element).
  */
object RewriteDotProductFold extends Rule[LogicalPlan] {
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** f is `(p, q) -> p * q` over its own two distinct args. */
  private def isPairwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(p: NamedLambdaVariable, q: NamedLambdaVariable), _) =>
      ((x eq p) && (y eq q)) || ((x eq q) && (y eq p))
    case _ => false
  }

  /** f is `(acc, el) -> acc + el` over its own two distinct args. */
  private def isAccumulatingSum(f: Expression): Boolean = f match {
    case LambdaFunction(
        Add(u: NamedLambdaVariable, v: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _) =>
      ((u eq acc) && (v eq el)) || ((u eq el) && (v eq acc))
    case _ => false
  }

  /** f is `acc -> acc` — the same variable instance, nothing else. */
  private def finishIsIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v eq arg
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, merge), Literal(0.0, DoubleType), update, finish)
        if isDoubleArray(a) && isDoubleArray(b) &&
          isPairwiseProduct(merge) && isAccumulatingSum(update) &&
          finishIsIdentity(finish) =>
        DotProduct(a, b)
    }
}
