package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a
  * `TypedImperativeAggregate` — the third mergeable-sketch family next
  * to HLL (q33) and KLL quantiles (q34): approximate per-item
  * FREQUENCIES from sub-linear state. Buffer is a depth x width long
  * grid; each input increments one counter per row (xxhash64 seeded by
  * the row index), estimates take the min over rows, and grids merge by
  * elementwise ADDITION — so daily partial sketches roll up without
  * re-reading raw data and the shuffle carries depth*width longs per
  * group, never items.
  *
  * Guarantees (the SketchSpec-checkable contract): estimate >= true
  * count always (over-count only), and estimate <= true + epsilon*N
  * with probability 1 - delta, where epsilon = e/width (Euler's
  * e ~ 2.718), delta = exp(-depth), N = total increments.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 2, "count_min_agg: depth >= 1, width >= 2")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  // row-major depth x width grid
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_min_agg requires a string column, got ${child.dataType.sql}")

  private lazy val seeds: Array[Long] =
    Array.tabulate(depth)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (portable) {
        // md5-affine family (PortableHash): one md5 per value, depth
        // affine slots — bit-identical to PortableHash.h(col, i) % width,
        // which is what lets the q44 grid be rebuilt by a DuckDB oracle
        val w = PortableHash.md5wBytes(s.getBytes) % PortableHash.M
        var i = 0
        while (i < depth) {
          val slot = ((PortableHash.a(i) * w + PortableHash.b(i))
            % PortableHash.P) % width
          buffer(i * width + slot.toInt) += 1L
          i += 1
        }
      } else {
        var i = 0
        while (i < depth) {
          val h = XXH64.hashUTF8String(s, seeds(i))
          val slot = ((h % width) + width) % width
          buffer(i * width + slot.toInt) += 1L
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long],
      other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) {
      buffer(i) += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  private def intOf(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Builder tuple shared by the per-session [[register]] fallback and
    * the [[graft.GraftExtensions]] spark-submit deployment path. */
  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("count_min_agg"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min_agg"),
      { args =>
        require(args.length == 3,
          "count_min_agg takes (column, depth literal, width literal)")
        CountMinAgg(args.head, intOf(args(1), "depth"),
          intOf(args(2), "width")).toAggregateExpression()
      })

  /** Register `count_min_agg(col, depth, width)` in the session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = injection
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  def countMinAgg(spark: SparkSession, item: Column, depth: Int,
      width: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("count_min_agg", item,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))
  }

  /** Portable-family variant of [[countMinAgg]] — same grid layout and
    * merge algebra, slots from [[PortableHash]] so an external oracle
    * can rebuild the whole sketch. */
  /** Builder tuple for the portable variant — see [[injection]]. */
  val injectionPortable: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("count_min_agg_portable"),
      new ExpressionInfo(classOf[CountMinAgg].getName,
        "count_min_agg_portable"),
      { args =>
        require(args.length == 3,
          "count_min_agg_portable takes (column, depth, width)")
        CountMinAgg(args.head, intOf(args(1), "depth"),
          intOf(args(2), "width"), portable = true).toAggregateExpression()
      })

  def registerPortable(spark: SparkSession): Unit = {
    val (id, info, builder) = injectionPortable
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  def countMinAggPortable(spark: SparkSession, item: Column, depth: Int,
      width: Int): Column = {
    registerPortable(spark)
    org.apache.spark.sql.functions.call_function("count_min_agg_portable",
      item,
      org.apache.spark.sql.functions.lit(depth),
      org.apache.spark.sql.functions.lit(width))
  }

  /** Point-estimate column for `item` against a sketch column laid out
    * row-major depth x width: min over rows of the item's counter.
    * The hash family mirrors [[CountMinAgg.update]] via the builtin
    * `xxhash64(lit(row), item)` chaining (same trick as MinHashAgg).
    * Pure builtin expression — needs no session. */
  def estimate(sketch: Column, item: Column,
      depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { i =>
      val slot = pmod(xxhash64(lit(i), item), lit(width.toLong))
      element_at(sketch, (lit(i.toLong * width) + slot + 1L).cast("int"))
    }.reduce(least(_, _))
  }

  /** [[estimate]] against a PORTABLE-family grid — the slot expression
    * mirrors the portable `update` path via [[PortableHash.h]]. */
  def estimatePortable(sketch: Column, item: Column,
      depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { i =>
      val slot = PortableHash.h(item, i) % lit(width.toLong)
      element_at(sketch, (lit(i.toLong * width) + slot + 1L).cast("int"))
    }.reduce(least(_, _))
  }
}
