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
  * count). Every merge iteration then runs on the vocabulary-sized
  * frame — pair explode + hash agg + top-1 (TakeOrderedAndProject), one
  * action per step, previous iteration's cache released after the next
  * is materialized (the resolveClusters discipline). At 100 TB the
  * vocab frame is millions of rows, not the corpus: iterating there is
  * what makes distributed BPE feasible. The merge itself is a pure
  * `aggregate` fold per word — no UDFs anywhere.
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

  /** The (word, freq, symbols) table BPE iterates on: one corpus-wide
    * aggregation, symbols = characters + [[EndOfWord]]. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    graft.sources.Tables.spread(df)
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symbols",
        concat(split(col("word"), ""), array(lit(EndOfWord))))

  /** Learn `steps` merges from the corpus. Stops early if no adjacent
    * pair occurs at least `minCount` times. Tie-break contract: pairs
    * with equal counts order by Spark's string comparison, i.e. UTF-8
    * BINARY order — for supplementary-plane characters (surrogate pairs)
    * this differs from Java's UTF-16 `compareTo`; any reference
    * implementation must compare UTF-8 bytes (BpeTrainSpec does). */
  def fit(df: DataFrame, textCol: String, steps: Int,
      minCount: Long = 2L): Seq[Merge] = {
    // localCheckpoint, not persist: each step's table is the previous
    // one plus a nested `fuse` fold, so under persist() the LOGICAL
    // plan still deepens by one fold per step and the analyzer re-walks
    // the whole chain on every action — measured ~3.7s of driver-side
    // planning vs ~1s of execution for 12 steps at sf0.1. Checkpointing
    // truncates lineage to a flat scan per step (constant planning
    // cost); eager=true makes the materialization the step's job. The
    // executor-loss caveat of localCheckpoint is acceptable: a lost
    // executor fails the fit, which simply reruns — same contract as
    // any other driver-side iterative fit in ml/.
    var cached = wordTable(df, textCol).localCheckpoint(true)
    var out = List.empty[Merge]
    var step = 1
    var done = false
    while (step <= steps && !done) {
      // weight each in-word pair occurrence by the word's corpus freq
      val top = cached
        .select(col("freq"), explode(adjacentPairs(col("symbols"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      top.headOption.filter(_.getAs[Long]("n") >= minCount) match {
        case None => done = true
        case Some(row) =>
          val (a, b, n) = (row.getAs[String]("l"), row.getAs[String]("r"),
            row.getAs[Long]("n"))
          out ::= Merge(step.toLong, a, b, n)
          cached = cached.withColumn("symbols",
            fuse(col("symbols"), a, b)).localCheckpoint(true)
          step += 1
      }
    }
    out.reverse
  }

  /** Tokenize a text column with a learned merge list: char-split every
    * word, then replay the merges in learned order (merge order is the
    * BPE contract — later merges build on earlier fusions). Empty words
    * (doubled/leading/trailing spaces) are dropped, matching
    * [[wordTable]]'s training-side filter. Output: array of token
    * arrays, one per word. */
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
    val pos = docs.select(col(idCol), posexplode(words))
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
}
