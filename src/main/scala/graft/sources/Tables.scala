package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Typed rows for the fixture tables where a case-class Encoder aids
  * compile-time safety (SURVEY §1.4); `Tables.load` stays the dynamic
  * `DataFrame` path. */
object Typed {
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
}

/** Fixture-table loaders with explicit schemas.
  *
  * The reference relies on `inferSchema=True` CSV reads (an extra full
  * pass per file — reference `main.py:34-41`); the engine instead declares
  * every schema up front (`FIXTURES.md`), so a scan never pays an
  * inference pass and Catalyst can prune columns/predicates against a
  * known `StructType`. At 100 TB this is the difference between one scan
  * and two.
  */
object Tables {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  // `ts` has shipped in two physical encodings across fixture
  // generations: logical TIMESTAMP(MICROS) (current) and
  // TIMESTAMP(NANOS) (older drops). Spark has no nanosecond timestamp
  // type, so nanos files are read as raw int64
  // (spark.sql.legacy.parquet.nanosAsLong=true, set by GraftSession /
  // Verify / Bench) and converted with an integer `div 1000` (a double
  // division would lose precision above 2^53); micros files are read as
  // TimestampType directly. load() sniffs which encoding a file uses
  // from its footer — see loadEvents().
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Read schema for the TIMESTAMP(NANOS) fixture generation: ts as the
    * raw int64 the nanosAsLong flag exposes. Also the declared payload
    * contract for the Kafka JSON source (EventStreams.fromKafka). */
  val eventsRawNanos =
    StructType(events.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = LongType) else f))

  /** True when the events parquet at `path` (file or dir) stores `ts` as
    * raw int64 nanos rather than logical TIMESTAMP(MICROS). Schema
    * inference is a driver-only footer read — no data scan; with
    * nanosAsLong=true a NANOS column infers as LongType. */
  def eventsTsIsRawNanos(spark: SparkSession, path: String): Boolean =
    spark.read.parquet(path).schema("ts").dataType == LongType

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Typed loaders: same scans, case-class rows. */
  def events(spark: SparkSession, dir: String): Dataset[Typed.Event] = {
    import spark.implicits._
    load(spark, dir, "events").as[Typed.Event]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Typed.Document] = {
    import spark.implicits._
    load(spark, dir, "documents").as[Typed.Document]
  }
  def embeddings(spark: SparkSession, dir: String): Dataset[Typed.Embedding] = {
    import spark.implicits._
    load(spark, dir, "embeddings").as[Typed.Embedding]
  }

  /** Round-robin repartition to the session's default parallelism.
    *
    * The fixture parquet files are single-row-group, and Spark cannot
    * split a row group — so every scan of them is ONE partition, and an
    * operator doing heavy per-row text compute downstream (explode,
    * higher-order-function folds, regex) serializes on one core. A
    * few-MB shuffle buys full-core parallelism for that compute
    * (measured: the bigram explode alone dropped 2.3s -> 0.3s at
    * local[32]). Use it ONLY in front of compute-heavy narrow maps.
    *
    * CONDITIONAL: at real scale inputs arrive in thousands of splits,
    * where an unconditional repartition would add a full shuffle AND
    * could REDUCE parallelism to defaultParallelism — so the
    * repartition fires only when the input has fewer partitions than
    * the session's parallelism (the starved-scan case it exists for).
    *
    * SCAN-ROOTED ONLY: the partition-count probe reads
    * `df.rdd.getNumPartitions`, which is plan-time-cheap for a narrow
    * scan plan but — with AQE enabled — eagerly materializes query
    * stages (submits real jobs) the moment the plan contains an
    * exchange. So spread() refuses to probe anything that is not a
    * Project/Filter chain over a leaf relation and returns such frames
    * unchanged: a shuffled frame already has shuffle-partition
    * parallelism and was never the starved single-row-group case this
    * helper exists for. */
  def spread(df: DataFrame): DataFrame = {
    // Fan-out target: the session's SHUFFLE parallelism, not
    // defaultParallelism (round 14). The two agree on a cluster
    // (shuffle.partitions ~ 3x cores), but under the data-sized local
    // regime (GraftSession.dataSizedLocalConf) shuffle.partitions is
    // right-sized to the input (~2 MiB/task) while defaultParallelism
    // stays at core count — and a 32-way fan-out of a 5k-row kernel
    // frame pays ~0.1 s of fixed per-task cost for 150-row payloads.
    // A/B at sf0.1 (3-run warm): width 8 beat width 32 on every spread
    // consumer probed (t_oov 0.99->0.63 s, t_lang_id 0.37->0.21 s,
    // x4e 0.96->0.65 s, x8 0.41->0.28 s; none worse).
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    if (!scanRooted(df.queryExecution.analyzed)) df
    else if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p)
  }

  private def scanRooted(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    plan match {
      case _: LeafNode          => true
      case Project(_, child)    => scanRooted(child)
      case Filter(_, child)     => scanRooted(child)
      case SubqueryAlias(_, c)  => scanRooted(c)
      case _                    => false
    }
  }

  /** Per-(session, dir, table) DataFrame handles: `spark.read.parquet`
    * builds a fresh file index (a driver-side listing) and re-analyzes
    * the scan on every call, which a 100+-query session pays hundreds
    * of times for the same immutable tables — the same reuse a table
    * catalog provides. DataFrames are immutable, so sharing the handle
    * is safe; keyed by session so test suites with their own sessions
    * never see a foreign session's plan.
    *
    * CACHE CONTRACT: `dir` contents must be immutable for the lifetime
    * of the session — the cached DataFrame pins the file index built at
    * first load, so a fixture dir rewritten in place would serve stale
    * file listings (write to a fresh dir instead, as every sink entry
    * in this repo does). Entries whose session has been stopped are
    * evicted on the next load() so dead sessions (and their plans) are
    * not pinned until the size bound trips. */
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String),
      DataFrame]()

  /** Load a fixture table from `dir` with its declared schema. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // drop handles owned by stopped sessions first; only if the map is
    // still oversized (256 live session x dir x table combos) fall back
    // to the wholesale clear that bounds JVM-lifetime growth
    if (handles.size > 256) {
      val it = handles.keySet.iterator()
      while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
      if (handles.size > 256) handles.clear()
    }
    handles.computeIfAbsent((spark, dir, name), _ => {
      if (name == "events") loadEvents(spark, s"$dir/$name.parquet")
      else spark.read.schema(schemas(name)).parquet(s"$dir/$name.parquet")
    })
  }

  /** Load `events`, sniffing the `ts` encoding from the parquet footer.
    *
    * Schema inference (a driver-only footer read — no data scan) tells
    * the two fixture generations apart: with nanosAsLong=true a
    * TIMESTAMP(NANOS) column infers as LongType, while a
    * TIMESTAMP(MICROS) column infers as a timestamp type. Only the nanos
    * generation needs the int64 `div 1000` conversion; applying it to a
    * micros file would compress 30 days of events into ~43 minutes
    * (the round-7 q21/q22/q23/q27/q55 oracle break). The per-(session,
    * dir) handle cache above means the sniff runs once per fixture dir,
    * not per query. */
  private def loadEvents(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    if (eventsTsIsRawNanos(spark, path))
      spark.read.schema(eventsRawNanos).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.read.schema(events).parquet(path)
  }
}
