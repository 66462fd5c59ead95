package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
import graft.functions.{BpeMergeStepExpr, BpeTokenizeExpr}

/** Distributed BPE tokenizer training — learn a byte-pair-encoding
  * merge list from the corpus itself (Sennrich et al. 2016), the
  * "train the tokenizer on the data you're about to train on" pass of
  * an LLM data pipeline.
  *
  * Scale design (the classic one, and the reason BPE trains fine at
  * 100 TB):
  *
  *  - **Train on the word VOCABULARY, not the corpus.** The first and
  *    only corpus-wide pass is a word-count aggregation (map-side
  *    combined; the exchange carries distinct words + counts). Every
  *    merge iteration after that runs over the vocab table — millions
  *    of rows at web scale, not billions — with pair frequencies
  *    weighted by word counts. A 1000-executor cluster spends one
  *    shuffle on the corpus and M shuffles on a table ~10^5× smaller.
  *  - **One tiny argmax per iteration.** The best pair is
  *    `orderBy(freq desc, l, r).limit(1)` — TakeOrdered (a per-
  *    partition heap + a 1-row driver merge), never a global sort.
  *  - **Lineage-safe iteration.** Each merge rewrites the vocab's
  *    symbol arrays; the result is re-staged per iteration
  *    ([[Checkpoints.stage]] — reliable under a checkpoint dir, local
  *    otherwise), so M=32k merges cannot build an M-deep lineage.
  *  - **Application is narrow.** [[bpeTokens]] rides the scan as one
  *    native expression call per word with the learned merges inlined
  *    — no vocab join, no shuffle, whole-corpus tokenization is
  *    embarrassingly parallel.
  *
  * Determinism: pair frequencies are exact integer sums; the argmax
  * tiebreak is (freq DESC, l ASC, r ASC) with bytewise string order —
  * identical in Spark (UTF8String) and DuckDB (binary collation), so
  * the learned merge list is bit-reproducible and oracle-checkable.
  *
  * Training on a deterministic sample: at 100 TB you train the
  * tokenizer on a slice — compose with
  * [[Training.weightedBernoulli]] (content-hash admission) so the
  * sample, and therefore the tokenizer, is reproducible run-over-run.
  */
object Tokenizer {

  /** A learned merge: at `step`, the adjacent pair (`lhs`, `rhs`) had
    * the highest weighted frequency `freq` and was fused.
    */
  final case class BpeMerge(step: Int, lhs: String, rhs: String, freq: Long)

  /** Boundary-mark guard: words containing the U+001E / U+001F marker
    * code points the oracle's string rendering uses are excluded from
    * training and application in BOTH engines (they cannot occur in
    * natural text; the guard keeps the arms' semantics identical).
    */
  private def cleanWord(w: Column): Column =
    w =!= "" && !w.contains(lit("\u001e")) && !w.contains(lit("\u001f"))

  /** Corpus word vocabulary: (word, cnt, syms) with `syms` the
    * code-point symbol array — the table every merge iteration runs
    * over. The single corpus-wide pass.
    */
  def wordVocab(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(text, " ")).as("word"))
      .where(cleanWord(col("word")))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        toColumn(BpeTokenizeExpr(toExpression(col("word")), Seq.empty)))

  /** Adjacent symbol pairs of a vocab row, weighted by the word count:
    * (l, r, cnt). Guarded `sequence` (size >= 2 rows only) so the
    * descending-sequence footgun cannot fire.
    */
  private def vocabPairs(vocab: DataFrame): DataFrame =
    vocab.where(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("l"),
          element_at(col("syms"), i + 2).as("r")))).as("pr"))
      .select(col("pr.l").as("l"), col("pr.r").as("r"), col("cnt"))

  /** Learn `merges` BPE merges from the corpus. Returns the learned
    * list in order; stops early if no adjacent pair remains.
    */
  def bpeTrain(df: DataFrame, text: Column, merges: Int): Seq[BpeMerge] = {
    require(merges >= 1, "merges must be >= 1")
    var vocab = Checkpoints.stage(wordVocab(df, text))
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val top = vocabPairs(vocab)
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += BpeMerge(step, l, r, f)
        vocab = Checkpoints.stage(vocab.withColumn("syms",
          toColumn(BpeMergeStepExpr(toExpression(col("syms")), l, r))))
        step += 1
      }
    }
    out.toSeq
  }

  /** Tokenize a word column with a learned merge list — one narrow
    * native call per row, merges inlined (no vocab join).
    */
  def bpeTokens(word: Column, merges: Seq[BpeMerge]): Column =
    toColumn(BpeTokenizeExpr(toExpression(word),
      merges.map(m => (m.lhs, m.rhs))))

  /** Per-document token statistics under a learned tokenizer:
    * (id, n_words, n_sym) — word count and total post-merge symbol
    * count. One explode + one aggregation; the tokenizer itself is
    * narrow.
    */
  def bpeTokenStats(df: DataFrame, id: Column, text: Column,
                    merges: Seq[BpeMerge]): DataFrame =
    df.select(id.as("id"), explode(split(text, " ")).as("word"))
      .where(cleanWord(col("word")))
      .select(col("id"), size(bpeTokens(col("word"), merges)).as("n"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("n_sym"))

  /** TOKENIZER COMPRESSION AUDIT: per-group (language, domain, …)
    * characters-per-token under the learned merges — the vocabulary-
    * coverage metric a multilingual corpus release is judged by (a
    * language the tokenizer undersegments pays more tokens per char
    * of content, skewing its effective epoch weight; tokenizer
    * fairness audits track exactly this ratio per language). Returns
    * (grp, n_words, n_chars, n_tokens, chars_per_token) with the
    * ratio a SINGLE IEEE division of exact integer sums
    * (engine-portable — the x_collocations discipline).
    *
    * Scale: one explode + one hash aggregate with map-side partials;
    * the merge list is a driver-side constant compiled into the
    * tokenization expression (codegen'd, no join). No windows.
    */
  def bpeCompressionStats(df: DataFrame, group: Column, text: Column,
                          merges: Seq[BpeMerge]): DataFrame =
    df.select(group.as("grp"), explode(split(text, " ")).as("word"))
      .where(cleanWord(col("word")))
      .select(col("grp"),
        length(col("word")).cast("long").as("nc"),
        size(bpeTokens(col("word"), merges)).cast("long").as("nt"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_words"), sum(col("nc")).as("n_chars"),
        sum(col("nt")).as("n_tokens"))
      .select(col("grp"), col("n_words"), col("n_chars"),
        col("n_tokens"),
        (col("n_chars").cast("double") / col("n_tokens"))
          .as("chars_per_token"))
}
