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

  /** Deterministic text → vector embedding (signed feature hashing,
    * [[graft.functions.HashEmbedExpr]]): the model-free arm of the
    * similarity stack — text → `hashEmbed` → cosine ANN runs with no
    * external encoder, and the whole embedding step is a narrow map.
    * `normalize = false` yields integer-count vectors whose cosines
    * are exact integer arithmetic (order-free, oracle-hashable);
    * `normalize = true` composes directly with
    * [[Similarity.signBuckets]] / IVF for the 100 TB ANN path.
    */
  def hashEmbed(text: Column, dim: Int = 64,
                normalize: Boolean = true): Column =
    org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.HashEmbedExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(text),
        dim, normalize))

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

  /** BM25 relevance of every matching document against a literal query
    * term set — the scoring half of full-text retrieval over a corpus
    * (the ranking a training-data pipeline uses to mine topic-focused
    * subsets or to audit eval-set leakage by query).
    *
    * Shape, built for 100 TB: per-term term frequencies come from ONE
    * native tokenize pass (MarkerVotesExpr over singleton marker sets —
    * no explode, no token shuffle); corpus statistics (N, Σdl, per-term
    * document frequency) reduce to a single 1-row aggregate that
    * broadcasts back; scoring is then a narrow codegen-friendly map and
    * the top-k is a TakeOrdered. Total cost: two columnar scans (stats
    * pass + score pass, the dropFrequentLines two-pass pattern) and one
    * 1-row exchange — nothing data-sized ever shuffles. A dedicated
    * inverted index would only change the SCAN side (posting-list
    * pruning); the scoring algebra here is what it would feed.
    *
    * `idfMode`:
    *  - "rational" (default): idf = (2N − 2df + 1)/(2df + 1) — the
    *    Robertson–Sparck-Jones odds WITHOUT the log. Monotone in the
    *    same direction, and — being a single division of exact
    *    integers — bit-reproducible on any IEEE-754 engine, so the
    *    DuckDB oracle can hash-match scores exactly. (ln differs in the
    *    last ulp across libm implementations; a hash gate cannot
    *    tolerate that.)
    *  - "lucene": idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — the
    *    textbook BM25+ idf, for production ranking where
    *    cross-engine bit-equality is not required. Spec-covered
    *    (ranking agreement with the rational arm on fixtures).
    *
    * Every float literal is built as the same EXPRESSION the oracle
    * spells (`1.2 + 1.0`, `1.0 - 0.75`) rather than a pre-evaluated
    * constant, so both engines round identically. Per-doc totals sum
    * the per-term scores left-to-right in query-term order — a fixed
    * association, never a float aggregate over rows.
    */
  def bm25Scores(df: DataFrame, id: Column, text: Column,
                 queryTerms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75,
                 idfMode: String = "rational"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(idfMode == "rational" || idfMode == "lucene",
      s"unknown idfMode: $idfMode")
    val tfsExpr = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.MarkerVotesExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(text),
        queryTerms.map(Seq(_))))
    val idx = queryTerms.indices
    val base = df.select(id.as("id"),
      size(tokens(text)).cast("long").as("dl"), tfsExpr.as("__tf"))
    val withTf = base.select(
      col("id") +: col("dl") +:
        idx.map(i => element_at(col("__tf"), i + 1).as(s"tf_$i")): _*)
    val statCols = count(lit(1)).as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      idx.map(i => sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = bm25ScoreExpr(idx, k1, b, idfMode)
    scored
      .where(idx.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .select(col("id") +: idx.map(i => col(s"tf_$i")) :+
        col("dl") :+ score.as("score"): _*)
  }

  /** The BM25 scoring expression over columns `tf_i`, `dl`, `n_docs`,
    * `sum_dl`, `df_i` — ONE expression tree shared by the full-scan
    * path ([[bm25Scores]]) and the inverted-index path
    * ([[Retrieval.bm25TopKIndexed]]), so the two produce
    * bit-identical doubles (same casts, same operation order, same
    * left-fold over terms) and can share one oracle.
    */
  private[operators] def bm25ScoreExpr(idx: Seq[Int], k1: Double,
                                       b: Double,
                                       idfMode: String): Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(i: Int): Column = idfMode match {
      case "rational" =>
        (lit(2L) * col("n_docs") - lit(2L) * col(s"df_$i") + lit(1L))
          .cast("double") /
          (lit(2L) * col(s"df_$i") + lit(1L)).cast("double")
      case "lucene" =>
        log(lit(1.0) +
          (col("n_docs").cast("double") - col(s"df_$i") + lit(0.5)) /
            (col(s"df_$i").cast("double") + lit(0.5)))
    }
    def termScore(i: Int): Column =
      idf(i) * (col(s"tf_$i").cast("double") * (lit(k1) + lit(1.0))) /
        (col(s"tf_$i").cast("double") +
          lit(k1) * ((lit(1.0) - lit(b)) +
            lit(b) * col("dl").cast("double") / avgdl))
    idx.map(termScore).reduceLeft(_ + _)
  }

  /** Top-k BM25 retrieval: [[bm25Scores]] then a TakeOrdered on
    * (score desc, id asc) — the doc-id tiebreak makes the k-boundary
    * cut deterministic under equal scores.
    */
  def bm25TopK(df: DataFrame, id: Column, text: Column,
               queryTerms: Seq[String], k: Int, k1: Double = 1.2,
               b: Double = 0.75,
               idfMode: String = "rational"): DataFrame =
    bm25Scores(df, id, text, queryTerms, k1, b, idfMode)
      .orderBy(col("score").desc, col("id"))
      .limit(k)

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

  /** COLLOCATION MINING by pointwise mutual information over adjacent
    * token pairs — the corpus-analysis step that surfaces multiword
    * expressions ("new york", "machine learning") worth atomic
    * treatment in a tokenizer or worth indexing as phrases. The score
    * is `lift = N·c(x,y) / (c(x,·)·c(·,y))` over the bigram-position
    * event space (left/right marginals, N = bigram positions);
    * PMI = log2(lift), but lift itself ships because it is ONE IEEE
    * division of two exact integer products — bit-identical on any
    * engine, no platform-log drift — and log is monotone, so the
    * ranking is the PMI ranking. `minCount` drops sparse-count pairs
    * (PMI's classic failure mode: two hapaxes that co-occur once get
    * an enormous score).
    *
    * Scale: ONE data-sized aggregate (pairs → bigram vocab, map-side
    * partials); the marginals and N are re-aggregates of the STAGED
    * bigram-vocab table, never of the data; the 1-row N broadcast
    * cross join is bounded by construction. Integer products stay
    * exact below 2^53 — at corpus sizes beyond ~10^15 bigrams move
    * the score to log space; the ranking tolerates that, the
    * hash-exact oracle contract is what pins this formulation.
    */
  def collocations(df: DataFrame, id: Column, text: Column,
                   minCount: Long = 5L, k: Int = 20): DataFrame = {
    val pairCounts = Checkpoints.stage(
      Dedup.wordShingles(df, id, text, n = 2, dedup = false)
        .select(split(col("shingle"), " ").as("__p"))
        .select(element_at(col("__p"), 1).as("x"),
          element_at(col("__p"), 2).as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy")))
    val left = pairCounts.groupBy(col("x"))
      .agg(sum(col("c_xy")).as("c_left"))
    val right = pairCounts.groupBy(col("y"))
      .agg(sum(col("c_xy")).as("c_right"))
    val n = pairCounts.agg(sum(col("c_xy")).as("__n"))
    pairCounts.where(col("c_xy") >= minCount)
      .join(left, "x").join(right, "y")
      .crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("c_xy"), col("c_left"),
        col("c_right"),
        ((col("__n") * col("c_xy")).cast("double") /
          (col("c_left") * col("c_right")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(k)
  }
}
