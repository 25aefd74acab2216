package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., "Mergeable Summaries", PODS 2012) as a
  * `TypedImperativeAggregate` — the fourth sketch family next to HLL
  * (q33), KLL quantiles (q34), and Count-Min (q44): approximate TOP
  * FREQUENCIES from O(capacity) state with a deterministic,
  * UNDER-count-only error bound. Dual to Count-Min: CM over-counts
  * every key and keeps none, MG under-counts and keeps only candidate
  * heavy hitters — the pair brackets the true frequency.
  *
  * Buffer is a (item -> counter) map of at most `capacity` entries:
  *  - update(x): increment if tracked; insert at 1 if room; else
  *    decrement ALL counters, dropping zeros (one "vote" cancels one
  *    occurrence of every tracked item — O(capacity), a constant).
  *  - merge(a, b): add counters pointwise; if over capacity, subtract
  *    the (capacity+1)-th largest counter from all and drop <= 0 (the
  *    PODS-2012 merge that preserves the error bound).
  *
  * Guarantees (SketchSpec-asserted): for every item,
  * `true - N/(capacity+1) <= est <= true` with N the stream length,
  * and any item with true frequency > N/(capacity+1) IS in the summary
  * — so a shuffle carries `capacity` (item, counter) pairs per group,
  * never the item universe. When the distinct-item count never exceeds
  * `capacity` no decrement can ever fire, every counter is EXACT, and
  * the output is the exact frequency table regardless of partitioning
  * or merge order — the q68 registry entry runs in that regime so the
  * whole sketch is hash-oracle-gated; the approximate regime is
  * spec-gated on adversarial streams instead.
  *
  * eval() emits the summary sorted (counter desc, item asc) — a total
  * order, so downstream top-k cuts are deterministic.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, "misra_gries_agg: capacity >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries_agg requires a string column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buffer.get(item) match {
        case Some(c) => buffer(item) = c + 1L
        case None if buffer.size < capacity => buffer(item) = 1L
        case None =>
          // decrement-all vote: drops at least one counter to zero
          val dead = mutable.Buffer.empty[String]
          buffer.mapValuesInPlace((_, c) => c - 1L)
          buffer.foreach { case (k, c) => if (c <= 0L) dead += k }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buffer(k) = buffer.getOrElse(k, 0L) + c
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything:
      // at most `capacity` survive, each having absorbed one more
      // N/(capacity+1)-bounded deduction
      val cut = buffer.values.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      val dead = mutable.Buffer.empty[String]
      buffer.mapValuesInPlace((_, c) => c - cut)
      buffer.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val rows = buffer.toArray.sortBy { case (k, c) => (-c, k) }
      .map { case (k, c) =>
        new GenericInternalRow(
          Array[Any](UTF8String.fromString(k), c))
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buffer.toArray
    val byteArrays = entries.map(_._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + byteArrays.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m(new String(arr, StandardCharsets.UTF_8)) = bb.getLong
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Register `misra_gries_agg(col, capacity)` in the session. */
  /** Builder tuple shared by the per-session [[register]] fallback and
    * the [[graft.GraftExtensions]] spark-submit deployment path. */
  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("misra_gries_agg"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName,
        "misra_gries_agg"),
      { args =>
        require(args.length == 2,
          "misra_gries_agg takes (column, capacity literal)")
        val cap = args(1).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"capacity must be an integer literal, got $other")
        }
        MisraGriesAgg(args.head, cap).toAggregateExpression()
      })

  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = injection
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** `array<struct<item, est>>` summary column, sorted (est desc,
    * item asc). */
  def mgSummary(spark: SparkSession, item: Column, capacity: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("misra_gries_agg", item,
      org.apache.spark.sql.functions.lit(capacity))
  }
}
