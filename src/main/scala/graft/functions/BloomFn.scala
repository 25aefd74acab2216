package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-surface registration for Spark's OWN bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the exact
  * machinery Catalyst's runtime-filter join optimization
  * (`InjectRuntimeFilter`) plans internally, but Spark leaves them out
  * of the public `FunctionRegistry`, so they are unreachable from the
  * DataFrame/SQL surface. Registering them (rather than re-implementing
  * a sketch) gives the engine a broadcastable membership filter with
  * zero new aggregate code:
  *
  *  - `bloom_filter_agg(xxhash64(k), estItems, numBits)` -> binary
  *  - `might_contain(bf, xxhash64(k))` -> boolean
  *
  * The 100 TB use is the decontamination / semi-join pre-filter: build
  * the sketch over the SMALL side (an eval benchmark's shingles), then
  * cut the corpus-sized probe side with a broadcast `might_contain`
  * BEFORE the exact shuffle join. False positives only re-admit rows
  * the exact join then rejects, so the composed operator stays exact.
  */
object BloomFn {

  private def buildAgg(args: Seq[Expression]): Expression = {
    require(args.length == 3,
      "bloom_filter_agg takes (value, estItems literal, numBits literal)")
    new BloomFilterAggregate(args(0), args(1), args(2)).toAggregateExpression()
  }

  private def buildMight(args: Seq[Expression]): Expression = {
    require(args.length == 2, "might_contain takes (bloom binary, value)")
    BloomFilterMightContain(args(0), args(1))
  }

  /** Idempotent per-session registration (the VecDot fallback pattern
    * for sessions built without GraftExtensions). Iterates the SAME
    * [[injections]] list the extension path installs, so the two
    * registration surfaces cannot drift. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    injections.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }

  /** Extension-injection tuples for [[graft.GraftExtensions]]. */
  def injections: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_filter_agg"), buildAgg _),
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "might_contain"), buildMight _))
}
