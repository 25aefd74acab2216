package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash signature as ONE imperative aggregate: the buffer is a
  * long[64] of per-bit vote counters, updated with a single xxhash64
  * per token, where the declarative form
  * ([[graft.ops.Dedup.simhash]]) evaluates 64 independent
  * `sum(when(shiftright(xxhash64(tok), j) & 1 ...))` aggregate columns —
  * re-hashing every token 64 times (aggregate expressions share no
  * common subexpressions across columns).
  *
  * A LongType child selects RAW-BITS mode: the input's own bits are the
  * votes (no hashing) — how the portable md5-plane SimHash
  * ([[graft.ops.Dedup.simhashPortable]]) rides the same buffer.
  *
  * Bit semantics reproduce the declarative form exactly (default
  * xxhash64 seed 42; bit j of the result is 1 iff the count of tokens
  * with bit j set strictly exceeds the count without) — asserted in
  * SimHashAggSpec. Partial aggregation merges counters elementwise, so
  * the shuffle carries 64 longs per group, never tokens.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a string or bigint column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // String input: one xxhash64 per token (null parity with the
    // declarative form — xxhash64(null) evaluates to the seed 42, so a
    // null token still votes the seed's bits). Long input: RAW-BITS
    // mode — the caller already computed the 64 vote bits (e.g. the
    // portable md5 planes, packed hi << 32 | lo); a null long votes -1
    // on every bit, matching the declarative `when(bit === 1, 1)
    // .otherwise(-1)` whose null condition takes the otherwise branch.
    val h =
      if (child.dataType == LongType) {
        if (v == null) 0L else v.asInstanceOf[Long]
      } else if (v == null) 42L
      else XXH64.hashUTF8String(v.asInstanceOf[UTF8String], 42L)
    var j = 0
    while (j < 64) {
      buffer(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
      j += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) {
      buffer(j) += other(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var out = 0L
    var j = 0
    while (j < 64) {
      if (buffer(j) > 0L) out |= (1L << j)
      j += 1
    }
    out
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 64)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Register `simhash_agg(tok)` in the session registry. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("simhash_agg")
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[SimHashAgg].getName, "simhash_agg"),
        { args =>
          require(args.length == 1, "simhash_agg takes (column)")
          SimHashAgg(args.head).toAggregateExpression()
        })
  }

  def simhashAgg(spark: SparkSession, tok: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("simhash_agg", tok)
  }
}
