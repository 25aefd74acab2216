package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule rescuing naive hamming-distance joins.
  *
  * A user writing the obvious similarity join over 64-bit signatures —
  *
  * {{{ a.join(b, bit_count(a("sig") ^ b("sig")) <= k) }}}
  *
  * gives Catalyst no equi-join key, so the planner falls back to
  * BroadcastNestedLoopJoin: O(n·m) comparisons regardless of how few
  * pairs qualify — unusable at 100 TB. This rule rewrites the plan into
  * the EXACT pigeonhole band form (same construction as
  * [[graft.ops.Dedup.simhashNearDupPairs]], proven equivalent in
  * HammingJoinRewriteSpec): split the 64 bits into k+1 bands — any pair
  * within hamming distance k matches at least one band exactly — then
  * equi-join on (band index, band bits), verify the full predicate, and
  * keep only each pair's FIRST matching band so no duplicates arise.
  * The planner turns the rewritten join into a shuffled hash/sort-merge
  * join keyed on the band value, restoring linear-in-candidates scaling.
  *
  * Scope guards:
  *  - only inner joins whose condition's conjuncts include the hamming
  *    predicate over one LongType attribute from each side;
  *  - skipped when any conjunct is already an equality (the planner
  *    would pick a hash join anyway, and the guard makes the rewrite
  *    non-re-entrant: the banded join it emits IS equality-keyed, so a
  *    re-run of the rule — e.g. AQE logical re-optimization — matches
  *    nothing).
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEquality = conjuncts.exists {
        case EqualTo(_, _) | EqualNullSafe(_, _) => true
        case _ => false
      }
      val hamming = if (hasEquality) None else conjuncts.collectFirst {
        case p @ LessThanOrEqual(
              BitwiseCount(BitwiseXor(a: AttributeReference,
                b: AttributeReference)), IntegerLiteral(k))
            if sidesMatch(a, b, left, right) && k >= 0 && k < 64 =>
          (orient(a, b, left), k, p)
      }
      hamming match {
        case Some(((a, b), k, pred)) =>
          rewrite(j, left, right, a, b, k, pred, conjuncts, hint)
        case None => j
      }
  }

  private def sidesMatch(a: AttributeReference, b: AttributeReference,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    a.dataType == LongType && b.dataType == LongType &&
      ((left.outputSet.contains(a) && right.outputSet.contains(b)) ||
        (left.outputSet.contains(b) && right.outputSet.contains(a)))

  /** (leftAttr, rightAttr) regardless of how the user wrote the xor. */
  private def orient(a: AttributeReference, b: AttributeReference,
      left: LogicalPlan): (AttributeReference, AttributeReference) =
    if (left.outputSet.contains(a)) (a, b) else (b, a)

  private def bandWidth(bands: Int, b: Int): Int =
    if (b == bands - 1) 64 - b * (64 / bands) else 64 / bands

  /** Bits [b·w, b·w + width(b)) of `e` as a long. */
  private def bandBits(e: Expression, bands: Int, b: Int): Expression = {
    val w = bandWidth(bands, b)
    val mask = if (w == 64) -1L else (1L << w) - 1L
    BitwiseAnd(ShiftRightUnsigned(e, Literal(b * (64 / bands))),
      Literal(mask))
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      a: AttributeReference, b: AttributeReference, k: Int,
      hammingPred: Expression, conjuncts: Seq[Expression],
      hint: JoinHint): LogicalPlan = {
    val bands = k + 1

    def generate(child: LogicalPlan, sig: AttributeReference,
        tag: String): (LogicalPlan, Attribute, Attribute) = {
      val arr = CreateArray((0 until bands).map(bandBits(sig, bands, _)))
      val pos = AttributeReference(s"__band_$tag", IntegerType,
        nullable = false)()
      val value = AttributeReference(s"__bandval_$tag", LongType,
        nullable = true)()
      (Generate(PosExplode(arr), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(pos, value),
        child = child), pos, value)
    }

    val (leftGen, posL, valL) = generate(left, a, "l")
    val (rightGen, posR, valR) = generate(right, b, "r")

    val bandJoin = Join(leftGen, rightGen, Inner,
      Some(And(EqualTo(posL, posR), EqualTo(valL, valR))), hint)

    // keep each qualifying pair only at its FIRST matching band: all
    // earlier bands of sigL xor sigR must be non-zero
    val xor = BitwiseXor(a, b)
    def bandDiffers(i: Int): Expression =
      Not(EqualTo(bandBits(xor, bands, i), Literal(0L)))
    val firstMatch = (0 until bands).map { bnd =>
      (0 until bnd).map(bandDiffers)
        .foldLeft[Expression](EqualTo(posL, Literal(bnd)))(And(_, _))
    }.reduceLeft[Expression](Or(_, _))

    val verify = conjuncts.foldLeft(firstMatch)(And(_, _))
    Project(j.output, Filter(verify, bandJoin))
  }
}
