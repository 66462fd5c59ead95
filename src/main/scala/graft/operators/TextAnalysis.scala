package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization
  * stats, quality scoring, language ID, content fingerprinting.
  *
  * All pure Catalyst expressions (split / higher-order functions) — no
  * UDFs, so they stay inside whole-stage codegen and scale linearly with
  * input bytes; every operator is a narrow map (no shuffle).
  */
object TextAnalysis {

  /** Whitespace tokens. `split` on a single space matches the oracle's
    * `string_split(text, ' ')` exactly (no regex collapsing).
    */
  def tokens(text: Column): Column = split(text, " ")

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Language marker words (tiny deterministic heuristic — the real thing
    * would be char-n-gram profiles; the *operator shape* is what matters:
    * a narrow, codegen'd per-row classification).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => x.isin(words: _*))).cast("long")

  /** Token/char counts per document. */
  def withTokenStats(df: DataFrame, text: Column = col("text")): DataFrame =
    df.withColumn("n_chars_txt", length(text).cast("long"))
      .withColumn("n_tokens", size(tokens(text)).cast("long"))

  /** Quality signals: token count, stopword count/ratio, mean token
    * length, and a boolean gate — the usual pre-training heuristics.
    */
  def withQuality(df: DataFrame, text: Column = col("text")): DataFrame = {
    val toks = tokens(text)
    val stopCount = element_at(
      org.apache.spark.sql.GraftSqlBridge.toColumn(
        graft.functions.MarkerVotesExpr(
          org.apache.spark.sql.GraftSqlBridge.toExpression(text),
          Seq(stopwords))), 1)
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_stop", stopCount)
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("mean_tok_len",
        (length(text) - col("n_tokens") + lit(1)).cast("double") /
          col("n_tokens"))
      .withColumn("quality_ok",
        (col("n_tokens") >= 5 && col("n_tokens") <= 100000 &&
          col("stop_ratio") <= 0.5).cast("int"))
  }

  /** Deterministic language vote: count marker-word hits per language,
    * pick the max with a fixed priority order (en > es > de > fr), 'und'
    * when nothing matches. All four counts come from ONE native
    * tokenize pass (MarkerVotesExpr) — the interpreted
    * `size(filter(toks, isin))` lambda form costs ~4 boxed scans per
    * row; the `__votes` alias is deliberately kept in its own
    * projection so CollapseProject doesn't inline (and re-evaluate) the
    * expression per consumer.
    */
  def withLangId(df: DataFrame, text: Column = col("text")): DataFrame = {
    val order = Seq("en", "es", "de", "fr")
    val votesExpr = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.MarkerVotesExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(text),
        order.map(langMarkers)))
    val withVotes = df.withColumn("__votes", votesExpr)
    val ven = element_at(col("__votes"), 1)
    val ves = element_at(col("__votes"), 2)
    val vde = element_at(col("__votes"), 3)
    val vfr = element_at(col("__votes"), 4)
    withVotes
      .withColumn("votes_en", ven).withColumn("votes_es", ves)
      .withColumn("votes_de", vde).withColumn("votes_fr", vfr)
      .withColumn("pred_lang",
        when(ven >= ves && ven >= vde && ven >= vfr && ven > 0, "en")
          .when(ves >= vde && ves >= vfr && ves > 0, "es")
          .when(vde >= vfr && vde > 0, "de")
          .when(vfr > 0, "fr")
          .otherwise("und"))
      .drop("__votes")
  }

  /** Rolling polynomial content fingerprint:
    * `h = (h*31 + codepoint) mod 1e9+7` left-folded over the characters.
    * Oracle-reproducible (DuckDB `list_reduce` over `unicode()`) unlike
    * murmur/xxhash. One native call per row (PolyFingerprintExpr) — the
    * composable `aggregate(transform(split))` fold is semantically
    * identical but evaluates interpreted lambdas per character.
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.PolyFingerprintExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(text)))

  /** Score every document with a hashing-trick linear classifier —
    * the inference half of a fasttext-style learned quality filter
    * (the production replacement for [[withQuality]]'s heuristics):
    * token → polynomial fingerprint → feature id (mod weights.length)
    * → weight, summed per document. `weights` IS the model; training
    * happens offline, inference here is a narrow codegen-friendly map
    * over the corpus — no shuffle, no model service in the loop.
    * Integer weights keep scores bit-reproducible on any engine (the
    * DuckDB oracle recomputes them exactly), unlike float dot
    * products whose sum order would differ. Gate downstream by
    * comparing `score` against `n_tokens`-scaled integer thresholds.
    */
  def linearQualityScore(df: DataFrame, id: Column, text: Column,
                         weights: Array[Long]): DataFrame = {
    val score = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.LinearTextScoreExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(text), weights))
    df.select(id.as("id"),
      size(tokens(text)).cast("long").as("n_tokens"),
      score.as("score"))
  }

  /** Canonical text normalization: collapse whitespace runs to a single
    * space, trim, lowercase. Run BEFORE exact/near dedup so that
    * whitespace-only variants collapse to one digest. Narrow map,
    * codegen'd regex. The character class is spelled explicitly
    * ([ \t\n\r]) rather than \s because \s differs between regex
    * engines (Java includes \x0B, RE2 does not) and normalization must
    * be reproducible everywhere.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "[ \\t\\n\\r]+", " ")))

  /** PII scrubbing: mask email addresses and long digit runs (ids,
    * phone numbers) with typed placeholder tokens. Patterns restricted
    * to syntax RE2 and java.util.regex interpret identically. Narrow
    * map — at 100 TB this is a pure scan-transform with no shuffle.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{6,}"

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongNumberPattern, "<NUM>")

  /** Top-k salient terms per document by an integer-exact TF-IDF-style
    * rank: term frequency desc, corpus document-frequency asc (rarer =
    * more salient), term asc as tiebreak — no float log-idf, so the
    * ranking is reproducible bit-for-bit on any engine. Stopwords and
    * empty tokens excluded. The document-frequency side is a small
    * (|vocab| rows) aggregate joined back; at 100 TB vocab still fits
    * the broadcast threshold after the aggregate, and the per-doc TF
    * aggregate partial-aggregates map-side.
    */
  def topTerms(df: DataFrame, id: Column, text: Column, k: Int,
               docFilter: Column => Column = _ => lit(true)): DataFrame = {
    val toks = df.select(id.as("id"), explode(tokens(text)).as("term"))
      .where(col("term") =!= "" && !col("term").isin(stopwords: _*))
    val tf = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term"))
      .agg(count_distinct(col("id")).as("df"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.where(docFilter(col("id")))
      .join(dfreq, "term")
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("term"), col("tf"), col("df"))
  }
}
