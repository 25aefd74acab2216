package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the "learn
  * a vocabulary from the corpus" step of an LLM data pipeline (the
  * counting/token side of which t_vocab/t_token_count already cover).
  *
  * Algorithm (Sennrich et al. 2016, word-frequency formulation): corpus
  * -> (word, freq) table once; then per merge step, count adjacent
  * symbol pairs weighted by word freq, take the most frequent pair
  * (deterministic tie-break: count desc, pair asc), and fuse that pair
  * inside every word's symbol array, greedy left-to-right — Keras/HF
  * tokenizer-trainer parity at the semantic level.
  *
  * Distribution shape: ONE corpus-wide shuffle total (the initial word
  * count), after which the capped (word, freq) table is fit state on
  * the driver and the merge loop runs in memory — see [[fit]]. Encoding
  * stays fully distributed ([[encodeStats]]): the learned merges ship
  * into the plan as literals and the fuse is a pure `aggregate` fold
  * per distinct word — no UDFs anywhere.
  */
object BpeTrain {

  /** One learned merge: `left`+`right` fused at `step` with corpus
    * weight `n` (sum of word freqs x in-word occurrences). */
  final case class Merge(step: Long, left: String, right: String, n: Long)

  /** End-of-word marker (classic BPE): keeps "low" + "er" distinct from
    * "lower"'s interior and makes learned tokens word-boundary-aware. */
  val EndOfWord = "</w>"

  /** Adjacent (l, r) pairs of a string array — shared by BPE pair
    * counting and bigram extraction (t_bigram_lm). Guards single-element
    * arrays: sequence(1, 0) DESCENDS ([1,0]) and would feed element_at
    * an out-of-range index. */
  def adjacentPairs(symbols: Column): Column =
    when(size(symbols) >= 2,
      transform(sequence(lit(1), size(symbols) - 1),
        i => struct(element_at(symbols, i).as("l"),
          element_at(symbols, i + 1).as("r"))))
      .otherwise(typedLit(Seq.empty[(String, String)])
        .cast("array<struct<l:string,r:string>>"))

  /** Greedy left-to-right fuse of (a, b) inside a symbol array — the
    * fold the probe semantics demand: [a,b,a,b,c] -> [ab,ab,c] and
    * [a,a,a] -> [aa,a] for the (a,a) merge (no overlap reuse). */
  def fuse(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, typedLit(Seq.empty[String]),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Learn `steps` merges from the corpus. Stops early if no adjacent
    * pair occurs at least `minCount` times. Tie-break contract: pairs
    * with equal counts order by Spark's string comparison, i.e. UTF-8
    * BINARY order — for supplementary-plane characters (surrogate pairs)
    * this differs from Java's UTF-16 `compareTo`; any reference
    * implementation must compare UTF-8 bytes (BpeTrainSpec does).
    *
    * Execution shape (the industry trainer shape, e.g. HF `tokenizers`):
    * the CORPUS is touched exactly once — one distributed word-count
    * aggregation — and the merge loop then runs driver-side over the
    * collected (word, freq) table, which is fit state bounded by
    * `maxWords` (top-N by freq desc / word asc — a total order, word is
    * unique — so the cap is deterministic at any scale). At 100 TB the
    * capped vocabulary is a few MB while the corpus is trillions of
    * occurrences; iterating on the driver costs zero scheduler floor
    * per step, where the previous per-step job form paid 2 jobs x
    * `steps` (profiled: ~1.7s for 12 steps at sf0.1 vs ~0.4s for the
    * single aggregation). The driver loop replays the exact engine
    * semantics: code-point symbols, freq-weighted pair counts, UTF-8
    * tie-break, greedy left-to-right fuse. */
  def fit(df: DataFrame, textCol: String, steps: Int,
      minCount: Long = 2L, maxWords: Int = MaxFitWords): Seq[Merge] =
    fitWithVocab(df, textCol, steps, minCount, maxWords)._1

  /** [[fit]] that also returns the fused vocabulary — (word, final token
    * list) for every word of the capped fit table — from the SAME single
    * corpus aggregation. Callers that encode right after training
    * ([[encodeStatsWithVocab]]) skip a second corpus-wide distinct-word
    * discovery AND the per-distinct-word merge replay: the fit loop has
    * already fused every table word as a side effect of pair counting.
    * The vocabulary is fit state (capped by `maxWords`), NOT a full
    * corpus vocabulary — encode falls back to the fold for unseen words. */
  def fitWithVocab(df: DataFrame, textCol: String, steps: Int,
      minCount: Long = 2L, maxWords: Int = MaxFitWords)
      : (Seq[Merge], Seq[(String, Seq[String])]) = {
    val words = graft.sources.Tables.spread(df)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // sort + limit: only the capped top-N ever reaches the driver.
      // (Caps below spark.sql.execution.topKSortFallbackThreshold plan
      // as TakeOrderedAndProject; above it this is one global sort of
      // the vocabulary-sized COUNT frame — still never the corpus.)
      .orderBy(col("freq").desc, col("word").asc)
      // one sentinel row past the cap: if it comes back, the vocabulary
      // exceeded maxWords and pair counts will exclude the tail — warn
      // loudly so large-vocab callers notice the semantics shift vs an
      // uncapped fit (the oracle mirrors the cap, so results stay
      // engine-consistent either way)
      .limit(maxWords + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (words.length > maxWords)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"BpeTrain.fit: vocabulary exceeds maxWords=$maxWords; " +
          "pair counts exclude the dropped tail (capped-fit semantics)")
    fitInMemoryFull(words.take(maxWords), steps, minCount)
  }

  /** Driver-memory cap for [[fit]]'s word table (~a few tens of MB of
    * strings at the default; raise it only with driver heap to match). */
  val MaxFitWords: Int = 1 << 20

  /** UTF-8 binary string order — the engine/oracle tie-break contract
    * (Spark UTF8String and DuckDB's default collation both compare
    * UTF-8 bytes; Java's `compareTo` is UTF-16 order and diverges on
    * supplementary-plane characters). */
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val (ab, bb) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(ab.length, bb.length)
    var i = 0
    var c = 0
    while (i < n && c == 0) {
      c = java.lang.Integer.compare(ab(i) & 0xff, bb(i) & 0xff)
      i += 1
    }
    if (c != 0) c else java.lang.Integer.compare(ab.length, bb.length)
  }

  /** The in-memory merge loop over a (word, freq) table: semantics
    * identical to the distributed fold ([[fuse]]) step for step
    * (BpeTrainSpec pins this against an independent replay). Symbols
    * split by CODE POINT, matching Spark's `split(word, "")` (zero-width
    * regex matches advance by code point, never through a surrogate
    * pair). */
  private def fitInMemory(words: Array[(String, Long)], steps: Int,
      minCount: Long): Seq[Merge] =
    fitInMemoryFull(words, steps, minCount)._1

  /** [[fitInMemory]] plus the word table AFTER all merges — each word's
    * final token list, i.e. the fused vocabulary the encode side would
    * otherwise recompute by replaying the merges per distinct word. */
  private def fitInMemoryFull(words: Array[(String, Long)], steps: Int,
      minCount: Long): (Seq[Merge], Seq[(String, Seq[String])]) = {
    def codePoints(w: String): List[String] =
      w.codePoints().toArray.toList
        .map(cp => new String(Character.toChars(cp)))
    var table: Array[(List[String], Long)] =
      words.map { case (w, f) => (codePoints(w) :+ EndOfWord, f) }
    val pairOrd = Ordering.Tuple2(utf8Order, utf8Order)
    var out = List.empty[Merge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        syms.lazyZip(syms.tail).foreach { (l, r) =>
          counts((l, r)) = counts.getOrElse((l, r), 0L) + f
        }
      }
      val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
        case (acc, kv) => acc match {
          case Some(b) if b._2 > kv._2 ||
            (b._2 == kv._2 && pairOrd.lteq(b._1, kv._1)) => acc
          case _ => Some(kv)
        }
      }
      best.filter(_._2 >= minCount) match {
        case None => done = true
        case Some(((a, b), n)) =>
          out ::= Merge(step.toLong, a, b, n)
          table = table.map { case (syms, f) =>
            (fuseInMemory(syms, a, b), f)
          }
          step += 1
      }
    }
    (out.reverse,
      words.map(_._1).zip(table.map(_._1)).toSeq)
  }

  /** Greedy left-to-right fuse, driver twin of the [[fuse]] column. */
  private def fuseInMemory(syms: List[String], a: String,
      b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    syms.foreach { s =>
      if (buf.nonEmpty && buf.last == a && s == b)
        buf.update(buf.length - 1, a + b)
      else buf += s
    }
    buf.toList
  }

  /** Tokenize a text column with a learned merge list: char-split every
    * word, then replay the merges in learned order (merge order is the
    * BPE contract — later merges build on earlier fusions). Empty words
    * (doubled/leading/trailing spaces) are dropped, matching [[fit]]'s
    * training-side word filter. Output: array of token arrays, one per
    * word. */
  def applyMerges(textCol: Column, merges: Seq[Merge]): Column =
    transform(filter(split(textCol, " "), w => length(w) > 0), w => {
      val init = concat(split(w, ""), array(lit(EndOfWord)))
      merges.foldLeft(init)((symsCol, m) => fuse(symsCol, m.left, m.right))
    })

  /** Corpus tokenization stats via the VOCABULARY-JOIN plan: the merge
    * replay runs once per DISTINCT word (the fold depends only on the
    * word), and documents join their words back positionally — vs
    * [[applyMerges]]'s once per word OCCURRENCE. At sf0.1 that is ~30k
    * folds instead of 2.5M (measured 7.8s -> ~1.5s), and at 100 TB it
    * is the only viable shape: the vocabulary is millions of rows
    * where the corpus is trillions of occurrences. Output per doc:
    * (idCol, n_words, n_tokens, h = md5 of the space-joined token
    * stream) — byte-identical to folding every occurrence. Ordered
    * reassembly: sort_array over (position, tokens) structs, because
    * collect_list order is shuffle-dependent. */
  def encodeStats(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    val vocab = graft.sources.Tables.spread(docs)
      .select(explode(words).as("word")).distinct()
      .withColumn("toks", merges.foldLeft(
        concat(split(col("word"), ""), array(lit(EndOfWord)))
      )((c, m) => fuse(c, m.left, m.right)))
    // spread BEFORE the positional explode: the occurrence side is
    // corpus-sized and the explode + join-probe work is per-occurrence —
    // on the single-row-group fixture scan it would otherwise serialize
    // in one task (the vocab side above is already spread)
    val pos = graft.sources.Tables.spread(docs)
      .select(col(idCol), posexplode(words))
      .select(col(idCol), col("pos"), col("col").as("word"))
    val agg = pos.join(vocab, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).cast("long").as("n_tokens"),
        md5(array_join(flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("toks")))),
          s => s.getField("toks"))), " ")).as("h"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("h"), md5(lit(""))).as("h"))
  }

  /** Per-key encoded-length rollup: word and BPE-piece counts grouped
    * by `keyCol` (e.g. source) — the tokenizer-FERTILITY aggregation
    * (pieces per word), which needs neither per-doc ordering nor the
    * content hash, so it skips [[encodeStatsWithVocab]]'s positional
    * explode and ordered reassembly entirely: flat word explode,
    * broadcast vocabulary join (merge-replay fold only on cap
    * misses), ONE key-keyed exchange with map-side partial sums. */
  def encodeLenByKey(docs: DataFrame, textCol: String, keyCol: String,
      merges: Seq[Merge], vocab: Seq[(String, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vdf = broadcast(vocab.toDF("word", "vtoks"))
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    val fold = merges.foldLeft(
      concat(split(col("word"), ""), array(lit(EndOfWord)))
    )((c, m) => fuse(c, m.left, m.right))
    graft.sources.Tables.spread(docs)
      .select(col(keyCol), explode(words).as("word"))
      .join(vdf, Seq("word"), "left")
      .withColumn("toks", coalesce(col("vtoks"), fold))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).cast("long").as("n_tokens"))
  }

  /** [[encodeStats]] against a driver-held fused vocabulary (from
    * [[fitWithVocab]]): the per-word token lists ship as a BROADCAST
    * literal frame instead of being recomputed by a distinct + fold pass
    * over the corpus — one corpus-side exchange (the per-doc rollup)
    * instead of three. Words outside the capped vocabulary fall back to
    * the merge-replay fold inline (coalesce short-circuits, so the fold
    * evaluates only on misses), keeping output byte-identical to
    * [[encodeStats]] at any vocabulary size. The broadcast is bounded by
    * the fit cap (`maxWords`), the same state the fit already held. */
  def encodeStatsWithVocab(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge], vocab: Seq[(String, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vdf = broadcast(vocab.toDF("word", "vtoks"))
    val words = filter(split(col(textCol), " "), w => length(w) > 0)
    val pos = graft.sources.Tables.spread(docs)
      .select(col(idCol), posexplode(words))
      .select(col(idCol), col("pos"), col("col").as("word"))
    val fold = merges.foldLeft(
      concat(split(col("word"), ""), array(lit(EndOfWord)))
    )((c, m) => fuse(c, m.left, m.right))
    val agg = pos.join(vdf, Seq("word"), "left")
      .withColumn("toks", coalesce(col("vtoks"), fold))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).cast("long").as("n_tokens"),
        md5(array_join(flatten(transform(
          sort_array(collect_list(struct(col("pos"), col("toks")))),
          s => s.getField("toks"))), " ")).as("h"))
    docs.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("h"), md5(lit(""))).as("h"))
  }
}
