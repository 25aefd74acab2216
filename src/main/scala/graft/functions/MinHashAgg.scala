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

/** MinHash sketch as ONE imperative aggregate (SURVEY §7.5's
  * `TypedImperativeAggregate`): the buffer is a single long[k] of
  * per-seed minima, updated in one pass per token and merged
  * elementwise — where the declarative form runs k independent
  * `min(xxhash64(i, tok))` aggregate columns, each re-hashing the token.
  *
  * The hash family reproduces `xxhash64(lit(i), tok)` bit-exactly
  * (seed 42 chained over the int then the UTF8 bytes, same as the
  * builtin), so [[graft.ops.Dedup.minhashSignatures]] built on either
  * form yields identical signatures — asserted in MinHashAggSpec.
  *
  * Partial aggregation works as usual: per-partition sketches merge by
  * elementwise min, so the shuffle carries k longs per group, not
  * tokens.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires a string column, got ${child.dataType.sql}")

  // per-seed chained init: xxhash64(lit(i), tok) hashes the int i first
  // (seed 42), then the token bytes seeded by that result
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUTF8String(s, seeds(i))
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    } else {
      // declarative parity: xxhash64 SKIPS null children, so
      // min(xxhash64(lit(i), tok)) sees a null token as the bare seed
      // chain — hashInt(i, 42) = seeds(i) — not as an absent row.
      // Dropping nulls here silently diverged the signature (and the
      // LSH candidate set) from the documented equivalent on any
      // nullable token column; TokenKernels preserves the same rule.
      var i = 0
      while (i < numHashes) {
        if (seeds(i) < buffer(i)) buffer(i) = seeds(i)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long],
      other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Register `minhash_agg(tok, k)` in the session registry. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("minhash_agg")
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
        { args =>
          require(args.length == 2,
            "minhash_agg takes (column, numHashes literal)")
          val k = args(1).eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"numHashes must be an integer literal, got $other")
          }
          MinHashAgg(args.head, k).toAggregateExpression()
        })
  }

  def minhashAgg(spark: SparkSession, tok: Column, numHashes: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_agg", tok,
      org.apache.spark.sql.functions.lit(numHashes))
  }
}
