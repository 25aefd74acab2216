package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

import graft.functions.{VecDist2, VecDot, VecDotL}

/** Optimizer rule fusing the idiomatic higher-order dot product into
  * the codegen'd [[VecDot]] kernel.
  *
  * A user writing the obvious Spark-first dot product —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * pays for it three ways: zip_with materializes the products as an
  * intermediate array per row, every element goes through an
  * interpreted lambda dispatch (HOFs never enter whole-stage codegen),
  * and the fold adds a second pass. This rule rewrites the exact
  * pattern into one fused loop over both ArrayData buffers — the
  * vector-similarity hot kernel (SURVEY §2.9 X2) — so the HOF form and
  * the `vec_dot` function are the same plan, and naive user code gets
  * the kernel for free.
  *
  * Exactness: VecDot sums left-to-right in double with null-element /
  * length-mismatch propagating NULL — bit-identical to the fold form
  * on EVERY input (VecDotRewriteSpec pins results and null edges).
  *
  * Scope guards (all must hold, else the expression is left alone):
  *  - the zip_with lambda is exactly `x * y` over its two arguments in
  *    order, with no other references;
  *  - the fold zero is the double literal 0.0 (a decimal or float zero
  *    changes intermediate types);
  *  - the merge lambda is exactly `acc + v` in order;
  *  - the finish lambda is the identity;
  *  - both array children are float/double arrays, possibly under a
  *    widening `cast(array<float> as array<double>)`, which the
  *    rewrite strips: float -> double is exact, and VecDot widens
  *    per element itself.
  *
  * Two further cases fuse the exact-integer siblings — the same
  * pattern over `array<bigint>` with a `0L` seed into [[VecDotL]] (the
  * quantized-cosine kernel, SURVEY §2.9 X36), and the squared-L2 form
  * `(x - y) * (x - y)` into [[VecDist2]] (the X17/X19 kernel). Overflow guard: long
  * arithmetic diverges by eval mode on overflow (ANSI throws, TRY
  * nulls, LEGACY wraps), and VecDotL wraps (Java `*`/`+`) — so this
  * case additionally requires the fold's Multiply AND Add to be in
  * LEGACY mode, where the fusion is bit-identical on every input
  * including the wrap. Under the ANSI default the long case simply
  * never fires (library call sites that know their quantization bounds
  * overflow cannot occur use [[VecDotL.vecDotL]] directly instead);
  * VecDotRewriteSpec pins both the LEGACY fusion and the ANSI
  * leave-alone.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isIdentity(l: Expression): Boolean = l match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => v.exprId == a.exprId
    case _ => false
  }

  /** The expression itself when it is a float/double array; the child
    * of a pure widening array cast (stripped); None otherwise. */
  private def vecChild(e: Expression): Option[Expression] = e match {
    case c: Cast =>
      (c.child.dataType, c.dataType) match {
        case (ArrayType(FloatType | DoubleType, _),
              ArrayType(DoubleType, _)) => Some(c.child)
        case _ => None
      }
    case _ => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => Some(e)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            Multiply(xv: NamedLambdaVariable, yv: NamedLambdaVariable, _),
            Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          // raw-bits zero test, not `Literal(0.0, ...)`: Scala numeric
          // == matches -0.0 too, and a -0.0 seed is NOT equivalent (an
          // empty array folds to the seed itself; VecDot seeds +0.0) —
          // the rule's bit-identical contract demands exactly +0.0
          Literal(seed: Double, DoubleType),
          LambdaFunction(
            Add(accv: NamedLambdaVariable, inv: NamedLambdaVariable, _),
            Seq(aacc: NamedLambdaVariable, ain: NamedLambdaVariable), _),
          finish)
        if java.lang.Double.doubleToRawLongBits(seed) == 0L &&
          xv.exprId == ax.exprId && yv.exprId == ay.exprId &&
          accv.exprId == aacc.exprId && inv.exprId == ain.exprId &&
          isIdentity(finish) =>
        (vecChild(l), vecChild(r)) match {
          case (Some(a), Some(b)) => VecDot(a, b)
          case _ => agg
        }
      // the exact-integer sibling: same shape over array<bigint> with a
      // 0L seed -> VecDotL. LEGACY-mode arithmetic only (see scaladoc):
      // on overflow ANSI throws and TRY nulls, VecDotL wraps — only the
      // LEGACY fold is bit-identical. No cast stripping — any cast on a
      // long array changes element types and is left alone.
      case agg @ ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            m @ Multiply(xv: NamedLambdaVariable, yv: NamedLambdaVariable, _),
            Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(
            a @ Add(accv: NamedLambdaVariable, inv: NamedLambdaVariable, _),
            Seq(aacc: NamedLambdaVariable, ain: NamedLambdaVariable), _),
          finish)
        if xv.exprId == ax.exprId && yv.exprId == ay.exprId &&
          accv.exprId == aacc.exprId && inv.exprId == ain.exprId &&
          isIdentity(finish) &&
          m.evalContext.evalMode == EvalMode.LEGACY &&
          a.evalContext.evalMode == EvalMode.LEGACY =>
        (l.dataType, r.dataType) match {
          case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
            VecDotL(l, r)
          case _ => agg
        }
      // squared-L2 sibling: (x - y) * (x - y) over array<bigint> with a
      // 0L seed -> VecDist2 (the X17/X19 kernel) — same LEGACY-only
      // overflow guard as the long dot above
      case agg @ ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            m @ Multiply(
              s1 @ Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
              s2 @ Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
            Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
          Literal(0L, LongType),
          LambdaFunction(
            a @ Add(accv: NamedLambdaVariable, inv: NamedLambdaVariable, _),
            Seq(aacc: NamedLambdaVariable, ain: NamedLambdaVariable), _),
          finish)
        if x1.exprId == ax.exprId && y1.exprId == ay.exprId &&
          x2.exprId == ax.exprId && y2.exprId == ay.exprId &&
          accv.exprId == aacc.exprId && inv.exprId == ain.exprId &&
          isIdentity(finish) &&
          m.evalContext.evalMode == EvalMode.LEGACY &&
          s1.evalContext.evalMode == EvalMode.LEGACY &&
          s2.evalContext.evalMode == EvalMode.LEGACY &&
          a.evalContext.evalMode == EvalMode.LEGACY =>
        (l.dataType, r.dataType) match {
          case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
            VecDist2(l, r)
          case _ => agg
        }
    }
}
