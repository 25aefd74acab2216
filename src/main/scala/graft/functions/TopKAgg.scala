package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-k (score, id) pairs per group as ONE bounded-buffer aggregate
  * (the §7.5 `Aggregator`-style operator): the buffer is a size-k
  * min-heap on score, updated per row and merged heap-into-heap.
  *
  * Versus the window form (`row_number().over(partitionBy(g).orderBy
  * (desc(score)))` + filter <= k): the window must SHUFFLE AND SORT
  * every row of every group; this aggregate reduces map-side to k rows
  * per group per partition before the shuffle — at 100 TB, the
  * difference between shuffling the table and shuffling k rows per
  * group. Determinism: ties on score break toward the smaller id, so
  * output matches the window form with (desc(score), asc(id)) ordering.
  *
  * Output: array<struct<score: double, id: long>> sorted score-desc,
  * id-asc; explode to rows at the call site.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Heap] {

  import TopKAgg.Heap

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType),
      StructField("id", LongType))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_agg requires (double, bigint), got " +
        s"${scoreExpr.dataType.sql}, ${idExpr.dataType.sql}")

  override def createAggregationBuffer(): Heap = new Heap(k)

  override def update(buffer: Heap, input: InternalRow): Heap = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null)
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Heap, other: Heap): Heap = {
    other.foreach((s, id) => buffer.offer(s, id))
    buffer
  }

  override def eval(buffer: Heap): Any = {
    val sorted = buffer.sortedDesc
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id)
    })
  }

  override def serialize(buffer: Heap): Array[Byte] = {
    val entries = buffer.sortedDesc
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new Heap(k)
    (0 until n).foreach(_ => h.offer(bb.getDouble, bb.getLong))
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren.head, idExpr = newChildren(1))
}

object TopKAgg {

  /** Bounded top-k buffer: keeps the k best (score desc, id asc)
    * entries. Simple sorted-insert on small k — k is single digits in
    * every top-k-per-group workload, so O(k) insert beats heap
    * constant factors. Ordering: (s1, id1) beats (s2, id2) iff
    * s1 > s2 || (s1 == s2 && id1 < id2), under SPARK'S double total
    * order (java.lang.Double.compare: NaN greatest, -0.0 < 0.0) — IEEE
    * `>`/`==` are both false against NaN, which made the buffer
    * arrival-order dependent (a NaN in the last slot rejected every
    * later real score) and diverged from the row_number-over-desc
    * window form this aggregate documents bit-parity with. */
  final class Heap(k: Int) {
    private var scores = new Array[Double](k)
    private var ids = new Array[Long](k)
    private var n = 0

    private def beats(s1: Double, id1: Long, s2: Double, id2: Long) = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && id1 < id2)
    }

    def offer(s: Double, id: Long): Unit = {
      if (n < k || beats(s, id, scores(n - 1), ids(n - 1))) {
        var i = math.min(n, k - 1)
        while (i > 0 && beats(s, id, scores(i - 1), ids(i - 1))) {
          scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
        }
        scores(i) = s; ids(i) = id
        if (n < k) n += 1
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      (0 until n).foreach(i => f(scores(i), ids(i)))

    def sortedDesc: Array[(Double, Long)] =
      (0 until n).map(i => (scores(i), ids(i))).toArray
  }

  /** Register `topk_agg(score, id, k)` in the session registry. */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("topk_agg")
    if (!spark.sessionState.functionRegistry.functionExists(id))
      spark.sessionState.functionRegistry.registerFunction(
        id,
        new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
        { args =>
          require(args.length == 3,
            "topk_agg takes (score, id, k literal)")
          val k = args(2).eval(null) match {
            case i: Int => i
            case l: Long => l.toInt
            case other => throw new IllegalArgumentException(
              s"k must be an integer literal, got $other")
          }
          TopKAgg(args.head, args(1), k).toAggregateExpression()
        })
  }

  def topkAgg(spark: SparkSession, score: Column, id: Column,
      k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("topk_agg", score, id,
      org.apache.spark.sql.functions.lit(k))
  }
}
