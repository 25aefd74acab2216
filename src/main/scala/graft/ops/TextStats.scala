package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, token counting, language-ID heuristic, quality scoring,
  * document fingerprinting.
  *
  * All are single-pass narrow transforms built from codegen'd built-ins
  * (`split`, `regexp_*`, higher-order array functions) — no UDFs, no
  * shuffles; at 100 TB they pipeline inside one WholeStageCodegen span
  * per scan.
  */
object TextStats {

  /** Whitespace tokenizer (the fixture corpus is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: word pieces, digit runs, or single non-space
    * symbols — the standard pre-tokenization regex shape, kept
    * RE2/Java-regex portable. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  /** Deterministic language-ID heuristic: script detection first (CJK,
    * Cyrillic, Hangul), then high-frequency function-word hits, else en.
    */
  def langId(text: Column): Column =
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
      .when(text.rlike("[\\x{0400}-\\x{04ff}]"), "ru")
      .when(text.rlike("[\\x{ac00}-\\x{d7af}]"), "ko")
      .when(text.rlike("(^| )(el|la|los|las|una|es|que) "), "es")
      .when(text.rlike("(^| )(le|les|des|est|une|dans) "), "fr")
      .when(text.rlike("(^| )(der|die|das|und|ist|nicht) "), "de")
      .otherwise("en")

  private val stopwords = Seq("the", "a", "an", "of", "to", "in", "and",
    "is", "it", "that")

  /** Stopword hits among whitespace tokens. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords))).cast("long")

  /** Quality-scoring signals: doc length, mean token length, stopword
    * ratio, non-alphanumeric ratio — the standard cheap filters run
    * before expensive dedup in a data pipeline. Appends columns to df.
    *
    * The counts come from ONE fused pass over the text
    * ([[graft.functions.TextQualityCounts]]) instead of four separate
    * scans (split + interpreted stopword lambda + a regexp_extract_all
    * that materialized every symbol match as an array element); the
    * ratio arithmetic is the same expressions over the same integers,
    * so outputs are bit-identical (TextStatsSpec pins the old forms).
    * CollapseProject folds the field reads back onto the kernel call;
    * whole-stage codegen's subexpression elimination then evaluates it
    * once per row for all four consumers.
    */
  def qualityColumns(df: DataFrame, textCol: String): DataFrame = {
    val qc = graft.functions.TokenKernelFns
      .textQualityCounts(df.sparkSession, col(textCol))
    // select-based projection, no staging column: the old
    // withColumn("__qc", ...) + drop would silently OVERWRITE and then
    // remove a caller's own __qc column. Direct field reads off the
    // kernel struct fold identically under CollapseProject +
    // subexpression elimination (one kernel eval per row).
    // Replace semantics: drop any pre-existing output-named columns from
    // the input projection first — select(col("*"), ...) would otherwise
    // emit DUPLICATE n_tok/mean_tok_len/... names (ambiguous downstream)
    // where the old withColumn form replaced them in place.
    val base = df.drop("n_tok", "mean_tok_len", "stopword_ratio",
      "symbol_ratio")
    base.select(col("*"),
      qc.getField("n_tok").as("n_tok"),
      round(qc.getField("n_char").cast("double")
        / greatest(qc.getField("n_tok"), lit(1L)), 4).as("mean_tok_len"),
      round(qc.getField("n_stop").cast("double")
        / greatest(qc.getField("n_tok"), lit(1L)), 4).as("stopword_ratio"),
      round(qc.getField("n_sym").cast("double")
        / greatest(qc.getField("n_char"), lit(1L)), 4).as("symbol_ratio"))
  }

  /** Rolling polynomial fingerprint over the token stream:
    * h = fold(tokens, 0, (acc, t) -> (acc * 31 + v(t)) mod 1e9+7) with
    * v(t) = codepoint(t[0]) * 131 + len(t). Cross-engine deterministic
    * (no engine-private hash function), order-sensitive like a real
    * rolling hash.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + (ascii(t).cast("long") * 131L
        + length(t).cast("long"))) % 1000000007L)
}
