package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays (float or
  * double elements), accumulating in double.
  *
  * The built-in composition `aggregate(zip_with(a, b, _ * _), 0d, _ + _)`
  * is semantically identical but materializes the products as an
  * intermediate array per row and dispatches a lambda per element. This
  * expression emits one fused loop over both ArrayData buffers — the
  * hot inner kernel of every cosine-similarity operator (SURVEY §2.9
  * X2): the one place in the engine where a custom Catalyst Expression
  * beats the built-ins.
  *
  * Sum order is left-to-right, matching the higher-order-function form
  * bit-for-bit, so oracle hashes are unchanged. Edge semantics match
  * the fold form too: a null element or a length mismatch yields NULL
  * (zip_with pads the shorter array with nulls and the aggregate
  * lambda propagates them), never a silent partial sum — the VecDist2
  * contract, and what makes [[graft.plans.VecDotRewrite]]'s automatic
  * HOF-to-kernel rewrite exact on every input.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL can arise from a null element / length mismatch even when both
  // input columns are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float> or array<double> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Register `vec_dot` in the session's function registry (idempotent);
    * afterwards it is callable from SQL and from `expr("vec_dot(...)")`. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("vec_dot")
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
        { args =>
          require(args.length == 2, "vec_dot takes exactly 2 arguments")
          VecDot(args.head, args(1))
        })
  }

  /** Column-level entry point; registers on first use per session. */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  }
}

/** Native codegen'd EXACT squared-L2 distance over two `array<bigint>`
  * columns — the [[VecDot]] pattern for the integer-quantized vector
  * kernels (k-means assignment X17, within-cluster NN X19): one fused
  * long-accumulating loop, no intermediate array, no per-element lambda
  * dispatch. Sum order is left-to-right, identical to the
  * `aggregate(zip_with(...))` form — and the arithmetic is exact
  * integers, so results are bit-identical, just faster. Edge semantics
  * match the fold form too: a null element or a length mismatch yields
  * NULL (zip_with pads the shorter array with nulls and the aggregate
  * lambda propagates them), never a silent partial sum. */
case class VecDist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  // NULL can arise from a null element / length mismatch even when both
  // input columns are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dist2 requires array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDist2 = copy(left = newLeft, right = newRight)
}

/** Native EXACT integer dot product over two `array<bigint>` columns —
  * [[VecDist2]]'s sibling for the quantized-cosine kernels (semantic
  * decontamination X36): one fused long-accumulating loop, no
  * intermediate array, no per-element lambda dispatch. Bit-identical
  * to `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (s, v) -> s + v)`
  * (exact integers, order irrelevant), with the same edge semantics:
  * null element or length mismatch yields NULL, never a silent partial
  * sum. Matters even where it cannot codegen — inside a higher-order
  * lambda (the x36 per-eval transform) it is evaluated via ONE
  * `nullSafeEval` tight loop per call instead of ~4 interpreted
  * expression dispatches + an intermediate array per element. */
case class VecDotL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot_l requires array<bigint> arguments, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotL = copy(left = newLeft, right = newRight)
}

object VecDotL {
  /** Builder tuple shared by the per-session [[register]] fallback and
    * the [[graft.GraftExtensions]] spark-submit deployment path. */
  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dot_l"),
      new ExpressionInfo(classOf[VecDotL].getName, "vec_dot_l"),
      { args =>
        require(args.length == 2, "vec_dot_l takes exactly 2 arguments")
        VecDotL(args.head, args(1))
      })

  /** Register `vec_dot_l` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = injection
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Column-level entry point; registers on first use per session. */
  def vecDotL(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot_l", a, b)
  }
}

object VecDist2 {
  /** Builder tuple shared by the per-session [[register]] fallback and
    * the [[graft.GraftExtensions]] spark-submit deployment path. */
  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("vec_dist2"),
      new ExpressionInfo(classOf[VecDist2].getName, "vec_dist2"),
      { args =>
        require(args.length == 2, "vec_dist2 takes exactly 2 arguments")
        VecDist2(args.head, args(1))
      })

  /** Register `vec_dist2` in the session's function registry
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = injection
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Column-level entry point; registers on first use per session. */
  def vecDist2(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dist2", a, b)
  }
}
